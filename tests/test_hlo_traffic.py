"""benchmarks/hlo_traffic.py parser: the HBM-write audit that guides the
bandwidth-bound perf work must count materialized instructions correctly."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'benchmarks'))

from hlo_traffic import audit, region_write_totals, shape_bytes, stage_of  # noqa: E402


def test_shape_bytes():
    assert shape_bytes('f32[10,20]') == 800
    assert shape_bytes('bf16[4,8]') == 64
    assert shape_bytes('pred[16]') == 16
    assert shape_bytes('(f32[2,2], bf16[4])') == 24   # tuple sums
    assert shape_bytes('token[]') == 0
    assert shape_bytes('s32[]') == 4                  # scalar


_HLO = '''
HloModule jit_step

%fused_computation.1 (param_0.1: f32[8,8]) -> f32[8,8] {
  %param_0.1 = f32[8,8]{1,0} parameter(0)
  %mul.inner = f32[8,8]{1,0} multiply(%param_0.1, %param_0.1)
  ROOT %add.inner = f32[8,8]{1,0} add(%mul.inner, %param_0.1)
}

ENTRY %main (p0: f32[8,8]) -> f32[8,8] {
  %p0 = f32[8,8]{1,0} parameter(0)
  %copy.1 = f32[8,8]{1,0} copy(%p0), metadata={op_name="jit(step)/STP3/decoder/transpose"}
  %fusion.1 = f32[8,8]{1,0} fusion(%copy.1), kind=kLoop, calls=%fused_computation.1, metadata={op_name="jit(step)/STP3/future_prediction/DualGRU_0/mul"}
  ROOT %tuple.out = f32[8,8]{1,0} copy(%fusion.1)
}
'''


def test_audit_skips_fusion_bodies_and_parameters():
    rows = list(audit(_HLO))
    names = [r[0] for r in rows]
    # interior of the fusion body must NOT be counted
    assert 'mul.inner' not in names and 'add.inner' not in names
    # parameters are not materialized writes
    assert 'p0' not in names
    assert 'copy.1' in names and 'fusion.1' in names
    by_name = {r[0]: r for r in rows}
    assert by_name['copy.1'][2] == 256          # 8*8*4 bytes
    assert by_name['copy.1'][1] == 'copy'
    assert 'decoder' in by_name['copy.1'][3]


def test_audit_inherits_opname_from_producer_chain():
    """Metadata-less late-pass ops (tuple.out = copy(fusion.1) above)
    must be attributed to their producer's stage, not '?' — this is what
    keeps the per-stage write tables honest when layout assignment
    inserts copies after metadata is assigned."""
    by_name = {r[0]: r for r in audit(_HLO)}
    assert 'future_prediction' in by_name['tuple.out'][3]
    assert stage_of(by_name['tuple.out'][3]) == 'future_prediction'


_HLO_TUPLES = '''
HloModule jit_loop

%wrapped_add (a.1: f32[8,8], b.1: f32[8,8]) -> f32[8,8] {
  %a.1 = f32[8,8]{1,0} parameter(0)
  %b.1 = f32[8,8]{1,0} parameter(1)
  ROOT %add.w = f32[8,8]{1,0} add(%a.1, %b.1)
}

%region_0.1 (arg_tuple.1: (s32[], f32[8,8])) -> (s32[], f32[8,8]) {
  %arg_tuple.1 = (s32[], f32[8,8]{1,0}) parameter(0)
  %gte.0 = s32[] get-tuple-element(%arg_tuple.1), index=0
  %gte.1 = f32[8,8]{1,0} get-tuple-element(%arg_tuple.1), index=1
  %dot.body = f32[8,8]{1,0} dot(%gte.1, %gte.1), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  %one.b = s32[] constant(1)
  %next.i = s32[] add(%gte.0, %one.b)
  ROOT %tuple.body = (s32[], f32[8,8]{1,0}) tuple(%next.i, %dot.body)
}

%region_1.2 (arg_tuple.2: (s32[], f32[8,8])) -> pred[] {
  %arg_tuple.2 = (s32[], f32[8,8]{1,0}) parameter(0)
  %gte.c = s32[] get-tuple-element(%arg_tuple.2), index=0
  %limit = s32[] constant(4)
  ROOT %lt = pred[] compare(%gte.c, %limit), direction=LT
}

ENTRY %main (p0: f32[8,8]) -> f32[8,8] {
  %p0 = f32[8,8]{1,0} parameter(0)
  %zero = s32[] constant(0)
  %init = (s32[], f32[8,8]{1,0}) tuple(%zero, %p0)
  %while.1 = (s32[], f32[8,8]{1,0}) while(%init), condition=%region_1.2, body=%region_0.1
  %gte.out = f32[8,8]{1,0} get-tuple-element(%while.1), index=1
  ROOT %fusion.2 = f32[8,8]{1,0} fusion(%gte.out, %gte.out), kind=kLoop, calls=%wrapped_add
}
'''


def test_audit_excludes_tuple_param_region_bodies():
    """While body/cond computations have tuple-typed params whose nested
    parens broke the old lazy header regex — their interiors (and
    wrapped_* helper bodies) must NOT count as ENTRY writes."""
    rows = list(audit(_HLO_TUPLES))
    names = [r[0] for r in rows]
    assert 'dot.body' not in names          # while-body interior
    assert 'next.i' not in names
    assert 'add.w' not in names             # wrapped_* helper interior
    assert 'lt' not in names                # cond interior
    # the ENTRY-visible materializations ARE counted
    assert 'while.1' in names and 'fusion.2' in names
    by_name = {r[0]: r for r in rows}
    assert by_name['while.1'][2] == 4 + 256  # (s32[], f32[8,8]) carry
    assert by_name['fusion.2'][2] == 256


def test_region_write_totals_reports_loop_bodies():
    totals = dict(region_write_totals(_HLO_TUPLES))
    # per-iteration writes of the while body (dot 256B + add 4B) are
    # reported unweighted, separate from the ENTRY totals
    assert totals['region_0.1'] == 256 + 4
    assert 'fused_computation' not in ''.join(totals)
    # wrapped helpers show up here (their call site is the fusion in ENTRY)
    assert totals['wrapped_add'] == 256


def test_stage_of_collapses_model_paths():
    assert stage_of('jit(step)/STP3/future_prediction/DualGRU_0/mul') == 'future_prediction'
    assert stage_of('jit(step)/STP3/decoder/Conv_0') == 'decoder'
    assert stage_of('jit(step)/STP3/temporal_model/TemporalBlock_0/add') == 'temporal_model'
