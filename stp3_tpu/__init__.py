"""stp3_tpu: a TPU-native (JAX/XLA/Pallas/pjit) end-to-end driving framework
with the capabilities of OpenDriveLab/ST-P3 (perception -> prediction ->
planning), re-designed TPU-first rather than ported."""

__version__ = '0.1.0'
