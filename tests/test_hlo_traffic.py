"""benchmarks/hlo_traffic.py parser: the HBM-write audit that guides the
bandwidth-bound perf work must count materialized instructions correctly."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'benchmarks'))

from hlo_traffic import audit, shape_bytes, stage_of  # noqa: E402


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


def test_stage_of_collapses_model_paths():
    assert stage_of('jit(step)/STP3/future_prediction/DualGRU_0/mul') == 'future_prediction'
    assert stage_of('jit(step)/STP3/decoder/Conv_0') == 'decoder'
    assert stage_of('jit(step)/STP3/temporal_model/TemporalBlock_0/add') == 'temporal_model'
