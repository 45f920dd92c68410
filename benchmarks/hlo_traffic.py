"""HBM-traffic audit of the flagship bf16 serving program.

The flagship forward is bandwidth-bound (XLA cost_analysis: ~8 ms MXU
floor vs tens of GB of HBM movement), so bytes ~= time. This tool compiles
the exact program bench.py times, then reports:

  * total flops / bytes accessed (XLA cost_analysis) + roofline floors
    for v5e (197 TFLOP/s bf16, 819 GB/s HBM);
  * materialized output bytes per top-level HLO instruction (fusion
    bodies excluded — their interiors live in registers/VMEM), grouped by
    the flax module path in op metadata, so the fattest *writers* per
    model stage are visible;
  * bytes spent on pure `copy` ops (layout changes / concat staging).

Usage: python benchmarks/hlo_traffic.py [--top N] [--stage PREFIX]
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

_DTYPE_BYTES = {
    'f64': 8, 'f32': 4, 'f16': 2, 'bf16': 2, 'f8e4m3fn': 1, 'f8e5m2': 1,
    's64': 8, 'u64': 8, 's32': 4, 'u32': 4, 's16': 2, 'u16': 2,
    's8': 1, 'u8': 1, 'pred': 1, 'token': 0, 'opaque': 0,
}

_SHAPE_RE = re.compile(r'(\w+)\[([\d,]*)\]')


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples by summing)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_NAME_RE = re.compile(r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*')
_OPCODE_RE = re.compile(r'\s*([\w\-]+)\(')
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _parse_instr(line):
    """Parse `%name = SHAPE opcode(operands...)` -> (name, shape, opcode,
    end_of_opcode_paren_idx) or None. The shape is scanned with a paren/
    brace balance (regexes fail on tuple shapes and tiled layouts, both
    of which nest parens: `(bf16[2]{0:T(8,128)(2,1)}, u32[])`)."""
    nm = _NAME_RE.match(line)
    if not nm:
        return None
    i, depth = nm.end(), 0
    while i < len(line):
        ch = line[i]
        if ch in '({[':
            depth += 1
        elif ch in ')}]':
            depth -= 1
        elif ch == ' ' and depth == 0:
            break
        i += 1
    om = _OPCODE_RE.match(line, i)
    if not om:
        return None
    return nm.group(1), line[nm.end():i], om.group(1), om.end()


# A computation header sits at column 0: `[ENTRY ]%name (params) -> type {`.
# `.*` (greedy) is required: tuple-typed params (every while body/cond, e.g.
# `%region_0.1 (arg_tuple.1: (s32[], f32[8,8])) -> (...)`) contain nested
# parens that a lazy `[^)]*` stops at, silently mis-tracking body state.
_COMP_HEADER_RE = re.compile(r'^(ENTRY\s+)?(%?[\w.\-]+)\s+\(.*\)\s*->')

_SKIP_OPCODES = ('parameter', 'constant', 'tuple', 'get-tuple-element',
                 'bitcast')


_OPERAND_RE = re.compile(r'%?([\w.\-]+)')


# rows whose producer-chain walk ran out of hop budget without finding an
# op_name (they fall back to '' → '?' attribution). Counted globally so
# main() can report them instead of silently under-attributing — the
# repo-wide 'no silent caps' convention. Reset per audit via
# reset_exhausted_chains().
_EXHAUSTED_CHAINS = 0
_CHAIN_HOP_BUDGET = 64


def reset_exhausted_chains() -> None:
    global _EXHAUSTED_CHAINS
    _EXHAUSTED_CHAINS = 0


def exhausted_chains() -> int:
    return _EXHAUSTED_CHAINS


def _inherit_opnames(raw_rows, chain):
    """Rows whose instruction carries no op_name metadata (late-pass
    copies, layout-assignment staging, async copy-start/copy-done pairs)
    inherit the op_name of their first operand, transitively — so a
    `copy(convolution_add_fusion.8)` is attributed to the stage that
    produced the convolution instead of '?'. ``chain`` maps EVERY
    instruction (including get-tuple-element/bitcast links that are not
    materialized rows themselves) to (op_name, first_operand) so chains
    survive the skipped glue opcodes. Walks that exhaust the hop budget
    are counted in ``exhausted_chains()`` rather than silently reverting
    to '?' attribution."""
    global _EXHAUSTED_CHAINS
    out = []
    for name, opcode, b, op, _ in raw_rows:
        cur = name
        for _hop in range(_CHAIN_HOP_BUDGET):
            c_op, c_fo = chain.get(cur, ('', ''))
            if c_op:
                op = c_op
                break
            if not c_fo:
                break
            cur = c_fo
        else:
            _EXHAUSTED_CHAINS += 1
        out.append((name, opcode, b, op))
    return out


def _iter_computations(hlo_text: str):
    """Yield (comp_name, is_entry, instr_rows) per computation; instr_rows
    are (instr_name, opcode, out_bytes, op_name) with missing op_names
    inherited from the producer chain (see _inherit_opnames)."""
    comp, is_entry, rows, chain = None, False, [], {}
    for line in hlo_text.splitlines():
        if line and not line[0].isspace():
            hm = _COMP_HEADER_RE.match(line)
            if hm:
                if comp is not None:
                    yield comp, is_entry, _inherit_opnames(rows, chain)
                comp, is_entry = hm.group(2).lstrip('%'), bool(hm.group(1))
                rows, chain = [], {}
            continue
        parsed = _parse_instr(line)
        if parsed is None or comp is None:
            continue
        name, shape, opcode, args_at = parsed
        om = _OPNAME_RE.search(line)
        fom = _OPERAND_RE.match(line[args_at:])
        op_name = om.group(1) if om else ''
        first_operand = fom.group(1) if fom else ''
        if opcode != 'parameter':     # chains must not cross into inputs
            chain[name] = (op_name, first_operand)
        # async `-start` halves are skipped: the matching `-done` carries
        # the materialized output (counting both would double the bytes,
        # and a start's tuple shape includes its own operands as aliases)
        if opcode in _SKIP_OPCODES or opcode.endswith('-start'):
            continue
        rows.append((name, opcode, shape_bytes(shape), op_name, first_operand))
    if comp is not None:
        yield comp, is_entry, _inherit_opnames(rows, chain)


def audit(hlo_text: str):
    """Yield (instr_name, opcode, out_bytes, op_name) for instructions the
    ENTRY computation materializes. Fusion bodies live in registers/VMEM;
    called computations (while/cond regions, wrapped_* helpers) are
    represented by their call-site instruction's output bytes — their
    interiors are NOT expanded (a while body's per-iteration writes are
    reported separately by ``region_write_totals``).

    Owns the exhausted-chain accounting ('no silent caps'): the counter
    is reset here and a warning is printed on exhaustion, so EVERY
    caller (main() below, train_hlo_traffic.py) reports under-attributed
    rows without having to remember reset_exhausted_chains()."""
    import sys
    reset_exhausted_chains()
    for _, is_entry, rows in _iter_computations(hlo_text):
        if is_entry:
            yield from rows
    if _EXHAUSTED_CHAINS:
        print(f'WARNING: {_EXHAUSTED_CHAINS} rows exhausted the '
              f'{_CHAIN_HOP_BUDGET}-hop producer-chain budget and fell '
              f'back to \'?\' attribution', file=sys.stderr)


def region_write_totals(hlo_text: str):
    """(comp_name, bytes) per NON-entry, non-fusion computation body —
    the per-ITERATION materialized writes of while/cond regions (a loop
    executing T times writes T x this; the trip count is not recoverable
    from HLO text, so these are reported unweighted)."""
    for comp, is_entry, rows in _iter_computations(hlo_text):
        if is_entry or comp.startswith('fused_computation'):
            continue
        total = sum(r[2] for r in rows)
        if total:
            yield comp, total


def stage_of(op_name: str) -> str:
    """Collapse a flax op_name path to a model stage label."""
    for key in ('encoder_forward', 'Encoder', 'bev_pool', 'static_splat',
                'projection_to_birds_eye_view', 'temporal_model',
                'distribution', 'future_prediction', 'decoder', 'Planning',
                'plan'):
        if key in op_name:
            return key
    parts = [p for p in op_name.split('/') if p]
    return parts[1] if len(parts) > 1 else (parts[0] if parts else '?')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--stage', default=None,
                    help='print top instructions whose op_name contains this')
    args = ap.parse_args()

    import bench
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _init_flagship, _planning_extras
    from stp3_tpu.models.stp3 import STP3, STP3Config
    from stp3_tpu.utils.precision import cast_floating, policy_dtype

    cfg = _flagship_cfg()
    model_cfg = STP3Config.from_cfg(cfg)
    model = STP3(model_cfg)
    variables, (image, k, e, ego), extras = _init_flagship(
        model, cfg, _planning_extras)
    trajs, gt = extras['trajs'], extras['gt_trajs']
    commands, target = extras['commands'], extras['target_points']
    dt = policy_dtype(cfg)
    variables = cast_floating(variables, dt)
    image = image.astype(dt)
    trajs, gt, target = (a.astype(dt) for a in (trajs, gt, target))

    def plan_step(variables, image, k, e, ego, carry):
        img = image + carry * 0.0
        out = model.apply(variables, img, k, e, ego, train=False)
        rf = model_cfg.receptive_field
        seg_pred = out['segmentation'].argmax(-1)
        ped_pred = out['pedestrian'].argmax(-1)
        occupancy = jnp.logical_or(seg_pred, ped_pred).astype(jnp.float32)
        _, traj = model.apply(variables, out['cam_front'], trajs, gt,
                              out['costvolume'][:, rf:], occupancy[:, rf:],
                              out['hdmap'], commands, target,
                              train=False, method=STP3.plan)
        return traj, traj[0, 0, 0]

    carry = jnp.zeros((), dt)
    compiled = jax.jit(plan_step).lower(
        variables, image, k, e, ego, carry).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get('flops', 0.0)
    byt = ca.get('bytes accessed', 0.0)
    print(f'flops/step:          {flops/1e9:8.1f} GFLOP '
          f'(MXU floor {flops/197e12*1e3:5.1f} ms @197 bf16 TFLOP/s)')
    print(f'bytes accessed/step: {byt/1e9:8.1f} GB    '
          f'(HBM floor {byt/819e9*1e3:5.1f} ms @819 GB/s)')

    rows = list(audit(compiled.as_text()))   # audit resets + reports
    total_w = sum(r[2] for r in rows)        # exhausted chains itself
    print(f'materialized writes: {total_w/1e9:8.1f} GB '
          f'({len(rows)} top-level instructions)')

    by_stage = collections.Counter()
    by_opcode = collections.Counter()
    for _, opcode, b, op_name in rows:
        by_stage[stage_of(op_name)] += b
        by_opcode[opcode] += b
    print('\n-- writes by stage --')
    for s, b in by_stage.most_common(args.top):
        print(f'{b/1e6:10.1f} MB  {s}')
    print('\n-- writes by opcode --')
    for s, b in by_opcode.most_common(12):
        print(f'{b/1e6:10.1f} MB  {s}')

    regions = sorted(region_write_totals(compiled.as_text()),
                     key=lambda r: -r[1])[:10]
    if regions:
        print('\n-- while/cond region bodies (bytes PER ITERATION, '
              'not in the totals above) --')
        for comp, b in regions:
            print(f'{b/1e6:10.1f} MB  {comp}')

    if args.stage:
        print(f'\n-- top instructions matching "{args.stage}" --')
        sel = [r for r in rows if args.stage in r[3]]
        for name, opcode, b, op_name in sorted(
                sel, key=lambda r: -r[2])[:args.top]:
            print(f'{b/1e6:9.1f} MB  {opcode:12s} {op_name[-110:]}')


if __name__ == '__main__':
    main()
