"""Subprocess driver for the multi-process training integration test.

Runs the REAL ``train.py`` CLI as one process of a multi-process JAX job
on CPU virtual devices (gloo collectives). Launched by
tests/test_multiprocess.py with:

    XLA_FLAGS=--xla_force_host_platform_device_count=K
    STP3_COORDINATOR_ADDRESS / STP3_NUM_PROCESSES / STP3_PROCESS_ID

followed by train.py CLI args (which must include PARALLEL.MULTIHOST True
so train.main() calls jax.distributed.initialize from those env vars).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# force CPU before any backend client exists (the axon sitecustomize hook
# would otherwise register the tunneled TPU in every process)
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

import train  # noqa: E402

if __name__ == '__main__':
    import faulthandler
    # if a rank wedges (collective mismatch), dump where before the
    # test's subprocess timeout reaps it
    faulthandler.dump_traceback_later(360, exit=False)
    sys.argv = ['train.py'] + sys.argv[1:]
    train.main()
    print(f'[driver] rank {jax.process_index()} finished train.main()',
          flush=True)
