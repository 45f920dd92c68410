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
    assert (img[0, 0] == 255).all()                     # background white
    assert not (img[2, 2] == img[5, 5]).all()           # distinct colours
    assert not (img[2, 2] == 255).all()                 # instances coloured


def test_visualise_output_panel():
    """Reference layout (visualisation.py:208-322): two columns (GT | pred),
    each 7 stacked panels."""
    b, s, h, w = 1, 3, 16, 16
    rng = np.random.RandomState(1)
    labels = {'segmentation': rng.randint(0, 2, (b, s, h, w)),
              'pedestrian': rng.randint(0, 2, (b, s, h, w)),
              'instance': rng.randint(0, 3, (b, s, h, w)),
              'centerness': rng.rand(b, s, h, w, 1).astype(np.float32),
              'offset': rng.randn(b, s, h, w, 2).astype(np.float32),
              'flow': rng.randn(b, s, h, w, 2).astype(np.float32)}
    output = {'segmentation': rng.randn(b, s, h, w, 2).astype(np.float32),
              'pedestrian': rng.randn(b, s, h, w, 2).astype(np.float32),
              'instance_center': rng.rand(b, s, h, w, 1).astype(np.float32),
              'instance_offset': rng.randn(b, s, h, w, 2).astype(np.float32),
              'instance_flow': rng.randn(b, s, h, w, 2).astype(np.float32)}
    panel = V.visualise_output(labels, output, cfg=None)
    assert panel.shape == (s, 7 * h, 2 * w, 3)
    assert panel.dtype == np.uint8


def test_visualise_output_with_cfg_planning_row():
    """With a cfg + hdmap/trajectory, the planning row renders the HD map,
    ego box and trajectory (reference plot_planning :331-379)."""
    from helpers import make_test_cfg
    cfg = make_test_cfg()
    b, s, h, w = 1, 2, 16, 16
    rng = np.random.RandomState(2)
    labels = {'segmentation': rng.randint(0, 2, (b, s, h, w)),
              'hdmap': rng.randint(0, 2, (b, h, w, 2)),
              'gt_trajectory': np.cumsum(rng.rand(b, 3, 3), 1).astype(np.float32)}
    output = {'segmentation': rng.randn(b, s, h, w, 2).astype(np.float32),
              'hdmap': rng.randn(b, h, w, 4).astype(np.float32)}
    panel = V.visualise_output(labels, output, cfg=cfg)
    assert panel.shape == (s, 7 * h, 2 * w, 3)
    # the planning row (last h rows of the GT column) contains the
    # ego-green fill somewhere
    plan_row = panel[0, 6 * h:, :w]
    assert (plan_row == np.array([118, 185, 0])).all(-1).any()


def test_plot_planning_bev_contents():
    from helpers import make_test_cfg
    cfg = make_test_cfg()
    h = w = 16
    hdmap = np.zeros((h, w, 2), np.float32)
    hdmap[2:5, :, 0] = 1        # lane band
    hdmap[8:14, :, 1] = 1       # drivable band
    traj = np.array([[0.0, 0.0], [0.0, 3.0], [1.0, 6.0]], np.float32)
    img = V.plot_planning_bev(hdmap, traj, cfg)
    assert img.shape == (h, w, 3) and img.dtype == np.uint8
    # all three overlays present: ego green, trajectory blue, map tint
    assert (img == np.array([118, 185, 0])).all(-1).any()
    assert (img == np.array([31, 119, 180])).all(-1).any()
    n_unique = len(np.unique(img.reshape(-1, 3), axis=0))
    assert n_unique >= 4


def test_make_contour_and_heatmap():
    img = np.full((8, 8, 3), 255, np.uint8)
    out = V.make_contour(img, colour=(1, 2, 3))
    assert (out[0, :] == (1, 2, 3)).all() and (out[:, -1] == (1, 2, 3)).all()
    assert (out[1:-1, 1:-1] == 255).all()
    hm = V.heatmap_image(np.linspace(0, 1, 64).reshape(8, 8))
    assert hm.shape == (8, 8, 3) and hm.dtype == np.uint8
    assert not (hm[0, 0] == hm[-1, -1]).all()


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


def test_save_eval_figure(tmp_path):
    """Reference 2x4 camera+BEV eval figure (evaluate.py:171-272)."""
    from helpers import make_test_cfg
    cfg = make_test_cfg()
    b, s, n, ih, iw = 1, 2, 2, 32, 64
    h = w = 16
    rng = np.random.RandomState(3)
    batch = {'image': rng.randn(b, s, n, ih, iw, 3).astype(np.float32)}
    output = {'segmentation': rng.randn(b, s, h, w, 2).astype(np.float32),
              'pedestrian': rng.randn(b, s, h, w, 2).astype(np.float32),
              'hdmap': rng.randn(b, h, w, 4).astype(np.float32)}
    labels = {'gt_trajectory': np.cumsum(rng.rand(b, 3, 3), 1).astype(np.float32)}
    out = V.save_eval_figure(output, labels, batch, n_present=2, frame=7,
                             save_path=str(tmp_path), cfg=cfg)
    import os
    assert os.path.basename(out) == '0007.png'
    assert os.path.getsize(out) > 1000
