"""One-command checkpoint-import dress rehearsal (scripts/dress_rehearsal.py):
reference-format torch .ckpt -> import CLI -> Orbax -> evaluate.py on the
fake-devkit nuScenes backend, asserting finite metrics come out — the
exact chain needed when real data appears (reference evaluate.py:28-44)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts'))


@pytest.mark.slow
def test_dress_rehearsal_end_to_end(tmp_path):
    import dress_rehearsal
    results = dress_rehearsal.main(workdir=str(tmp_path))
    assert any(k.startswith('plan_L2') for k in results)
    assert all(np.isfinite(float(v)) for v in results.values())
    # the chain really produced an Orbax checkpoint with a stored config
    assert os.path.exists(tmp_path / 'imported' / 'step_0' / 'config.json')
