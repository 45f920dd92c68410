"""Visualisation utilities: flow colouring, instance palette, panels."""
import numpy as np

from stp3_tpu.utils import visualisation as V


def test_flow_to_image_shapes_and_range():
    rng = np.random.RandomState(0)
    flow = rng.randn(16, 16, 2).astype(np.float32)
    img = V.flow_to_image(flow)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8


def test_flow_zero_is_near_white():
    img = V.flow_to_image(np.zeros((4, 4, 2), np.float32))
    assert (img > 200).all()  # zero flow -> unsaturated (white-ish)


def test_colourise_instances():
    inst = np.zeros((8, 8), np.int64)
    inst[2:4, 2:4] = 1
    inst[5:7, 5:7] = 2
    img = V.colourise_instances(inst)
    assert img.shape == (8, 8, 3)
    assert (img[0, 0] == 0).all()                       # background black
    assert not (img[2, 2] == img[5, 5]).all()           # distinct colours


def test_visualise_output_panel():
    b, s, h, w = 1, 3, 16, 16
    rng = np.random.RandomState(1)
    labels = {'segmentation': rng.randint(0, 2, (b, s, h, w)),
              'pedestrian': rng.randint(0, 2, (b, s, h, w))}
    output = {'segmentation': rng.randn(b, s, h, w, 2).astype(np.float32),
              'pedestrian': rng.randn(b, s, h, w, 2).astype(np.float32),
              'instance_center': rng.rand(b, s, h, w, 1).astype(np.float32),
              'instance_flow': rng.randn(b, s, h, w, 2).astype(np.float32)}
    panel = V.visualise_output(labels, output, cfg=None)
    assert panel.ndim == 4 and panel.shape[0] == s
    assert panel.shape[3] == 3 and panel.dtype == np.uint8
    assert panel.shape[2] == 6 * w  # 6 rows of panels side by side


def test_plot_planning_and_save(tmp_path):
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    gt = np.array([[0.0, 0], [0, 1], [0, 2]])
    sel = np.array([[0.1, 0], [0.1, 1], [0.2, 2]])
    V.plot_planning(ax, sel, gt, occupancy=np.zeros((16, 16)))
    out = str(tmp_path / 'p.png')
    fig.savefig(out)
    plt.close(fig)
    import os
    assert os.path.getsize(out) > 0
