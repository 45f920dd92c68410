import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stp3_tpu.ops import bev_pool as BP

BEV_DIM = np.array([10, 10, 1])
BEV_RES = np.array([1.0, 1.0, 20.0], dtype=np.float32)
BEV_START = np.array([-4.5, -4.5, 0.0], dtype=np.float32)


def _random_points(p=200, c=4, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(p, c).astype(np.float32)
    coords = rng.randint(-2, 12, size=(p, 3)).astype(np.int32)
    coords[:, 2] = np.clip(coords[:, 2], 0, 0)
    valid = np.all((coords >= 0) & (coords < BEV_DIM), axis=-1)
    return feats, coords, valid


@pytest.mark.parametrize('method', ['sort', 'scatter'])
def test_bev_pool_matches_dense_oracle(method):
    feats, coords, valid = _random_points()
    out = np.asarray(BP.bev_pool(jnp.asarray(feats), jnp.asarray(coords),
                                 jnp.asarray(valid), BEV_DIM, method=method))
    oracle = BP.bev_pool_dense_reference(feats, coords, valid, BEV_DIM)
    np.testing.assert_allclose(out, oracle, atol=1e-4)


def test_bev_pool_gradient_matches_oracle():
    """VJP check replacing the reference's hand-written VoxelsSumming.backward:
    d(sum(out * g))/d(feats[p]) = g[cell(p)] for valid p, else 0."""
    feats, coords, valid = _random_points(p=50, c=3, seed=1)
    g = np.random.RandomState(2).randn(10, 10, 3).astype(np.float32)

    def f(x):
        return jnp.sum(BP.bev_pool(x, jnp.asarray(coords), jnp.asarray(valid), BEV_DIM) * g)

    grad = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    expected = np.zeros_like(feats)
    for p in range(feats.shape[0]):
        if valid[p]:
            expected[p] = g[coords[p, 0], coords[p, 1]]
    np.testing.assert_allclose(grad, expected, atol=1e-5)


def test_bev_pool_pallas_matches_oracle_interpret():
    """Pallas kernel vs dense oracle (+ VJP) in interpreter mode (the real
    compile path runs on TPU; see benchmarks/bev_pool_bench.py)."""
    from jax.experimental.pallas import tpu as pltpu
    feats, coords, valid = _random_points(p=300, c=8, seed=3)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(BP.bev_pool(jnp.asarray(feats), jnp.asarray(coords),
                                     jnp.asarray(valid), BEV_DIM, method='pallas'))
        oracle = BP.bev_pool_dense_reference(feats, coords, valid, BEV_DIM)
        np.testing.assert_allclose(out, oracle, atol=1e-4)

        g = np.random.RandomState(4).randn(10, 10, 8).astype(np.float32)

        def f(x):
            return jnp.sum(BP.bev_pool(x, jnp.asarray(coords), jnp.asarray(valid),
                                       BEV_DIM, method='pallas') * g)
        grad = np.asarray(jax.grad(f)(jnp.asarray(feats)))
        expected = np.zeros_like(feats)
        for p in range(feats.shape[0]):
            if valid[p]:
                expected[p] = g[coords[p, 0], coords[p, 1]]
        np.testing.assert_allclose(grad, expected, atol=1e-5)


def test_bev_pool_pallas_v2_matches_oracle_interpret():
    """v2 kernel (branch-free overflow row, in-kernel fp32 staging,
    unrolled rank walk) vs dense oracle (+ VJP), interpreter mode."""
    from jax.experimental.pallas import tpu as pltpu
    feats, coords, valid = _random_points(p=300, c=8, seed=5)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(BP.bev_pool(jnp.asarray(feats), jnp.asarray(coords),
                                     jnp.asarray(valid), BEV_DIM, method='pallas2'))
        oracle = BP.bev_pool_dense_reference(feats, coords, valid, BEV_DIM)
        np.testing.assert_allclose(out, oracle, atol=1e-4)

        g = np.random.RandomState(6).randn(10, 10, 8).astype(np.float32)

        def f(x):
            return jnp.sum(BP.bev_pool(x, jnp.asarray(coords), jnp.asarray(valid),
                                       BEV_DIM, method='pallas2') * g)
        grad = np.asarray(jax.grad(f)(jnp.asarray(feats)))
        expected = np.zeros_like(feats)
        for p in range(feats.shape[0]):
            if valid[p]:
                expected[p] = g[coords[p, 0], coords[p, 1]]
        np.testing.assert_allclose(grad, expected, atol=1e-5)


def test_bev_pool_pallas_v2_bf16_inputs_interpret():
    """bf16 feats path: fp32 accumulation inside the kernel, bf16 out."""
    from jax.experimental.pallas import tpu as pltpu
    feats, coords, valid = _random_points(p=260, c=8, seed=7)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(BP.bev_pool(
            jnp.asarray(feats).astype(jnp.bfloat16), jnp.asarray(coords),
            jnp.asarray(valid), BEV_DIM, method='pallas2'), dtype=np.float32)
    oracle = BP.bev_pool_dense_reference(
        np.asarray(jnp.asarray(feats).astype(jnp.bfloat16), dtype=np.float32),
        coords, valid, BEV_DIM)
    np.testing.assert_allclose(out, oracle, rtol=0.02, atol=0.05)


def test_bev_pool_pallas_v2_multichunk_interpret():
    """Grid with several chunks: the VMEM accumulator must persist across
    grid steps (zero-initialised only at step 0) and padding points must
    land on the overflow row."""
    from jax.experimental.pallas import tpu as pltpu
    from stp3_tpu.ops.pallas import bev_pool_kernel as K
    rng = np.random.RandomState(11)
    p, c, ncells = 600, 8, 100
    feats = rng.randn(p, c).astype(np.float32)
    ranks = rng.randint(0, ncells + 1, size=(p,)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(K._forward_v2(jnp.asarray(feats), jnp.asarray(ranks),
                                       ncells, chunk=256, unroll=4))
    oracle = np.zeros((ncells, c), np.float64)
    for i in range(p):
        if ranks[i] < ncells:
            oracle[ranks[i]] += feats[i]
    np.testing.assert_allclose(out, oracle, atol=1e-4)


def test_bev_pool_pallas_v2_batched_interpret():
    """Frame-batched kernel (one launch, grid over frames) == per-frame
    oracle, forward and VJP; also drives project_to_birds_eye_view's
    pallas2 path against the scatter path."""
    from jax.experimental.pallas import tpu as pltpu
    from stp3_tpu.ops.pallas import bev_pool_kernel as K
    rng = np.random.RandomState(13)
    f, p, c, ncells = 3, 300, 8, 100
    feats = rng.randn(f, p, c).astype(np.float32)
    ranks = rng.randint(0, ncells + 1, size=(f, p)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(K.bev_pool_pallas_v2_batched(
            jnp.asarray(feats), jnp.asarray(ranks), ncells))
        g = rng.randn(f, ncells, c).astype(np.float32)

        def loss(x):
            return jnp.sum(K.bev_pool_pallas_v2_batched(
                x, jnp.asarray(ranks), ncells) * g)
        grad = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    oracle = np.zeros((f, ncells, c), np.float64)
    gexp = np.zeros_like(feats)
    for fi in range(f):
        for i in range(p):
            if ranks[fi, i] < ncells:
                oracle[fi, ranks[fi, i]] += feats[fi, i]
                gexp[fi, i] = g[fi, ranks[fi, i]]
    np.testing.assert_allclose(out, oracle, atol=1e-4)
    np.testing.assert_allclose(grad, gexp, atol=1e-5)


def test_gather_rows_pallas_interpret():
    """Row-gather kernel (v2 scatter's measured-candidate backward) ==
    numpy indexing, multi-chunk, bf16 table + out."""
    from jax.experimental.pallas import tpu as pltpu
    from stp3_tpu.ops.pallas.bev_pool_kernel import gather_rows_pallas
    rng = np.random.RandomState(19)
    t, c, p = 64, 8, 600
    table = rng.randn(t, c).astype(np.float32)
    ranks = rng.randint(0, t, size=(p,)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(gather_rows_pallas(jnp.asarray(table),
                                            jnp.asarray(ranks), chunk=256))
        out16 = np.asarray(gather_rows_pallas(
            jnp.asarray(table).astype(jnp.bfloat16), jnp.asarray(ranks),
            chunk=256), dtype=np.float32)
    np.testing.assert_allclose(out, table[ranks], atol=1e-6)
    np.testing.assert_allclose(
        out16, np.asarray(jnp.asarray(table).astype(jnp.bfloat16),
                          dtype=np.float32)[ranks], atol=1e-6)


def test_v2_backward_env_hatch_matches_default(monkeypatch):
    """STP3_SPLAT_BWD=pallas routes the v2 VJP through the row-gather
    kernel; gradients must equal the default XLA-gather backward."""
    from jax.experimental.pallas import tpu as pltpu
    from stp3_tpu.ops.pallas.bev_pool_kernel import bev_pool_pallas_v2
    rng = np.random.RandomState(23)
    p, c, ncells = 600, 8, 64
    feats = jnp.asarray(rng.randn(p, c).astype(np.float32))
    ranks = jnp.asarray(np.concatenate([
        rng.randint(0, ncells, size=(p - 20,)),
        np.full((20,), ncells)]).astype(np.int32))  # 20 invalid points
    g = rng.randn(ncells, c).astype(np.float32)

    def loss(x):
        return jnp.sum(bev_pool_pallas_v2(x, ranks, ncells) * g)

    with pltpu.force_tpu_interpret_mode():
        grad_default = np.asarray(jax.grad(loss)(feats))
        monkeypatch.setenv('STP3_SPLAT_BWD', 'pallas')
        grad_pallas = np.asarray(jax.grad(loss)(feats))
    np.testing.assert_allclose(grad_pallas, grad_default, atol=1e-6)
    # invalid points get zero gradient
    np.testing.assert_array_equal(grad_pallas[-20:], 0.0)


@pytest.mark.parametrize('method', ['pallas2', 'pallas2b'])
def test_project_pallas2_matches_scatter_interpret(method):
    """Full project_to_birds_eye_view: pallas2 (per-frame launches) and
    pallas2b (one frame-batched launch) == scatter (XLA) including the
    ego-motion pre-warp and discount accumulate."""
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(17)
    b, s, n, d, hf, wf, c = 1, 2, 2, 4, 3, 5, 6
    feats = jnp.asarray(rng.randn(b, s, n, d, hf, wf, c).astype(np.float32))
    geom = jnp.asarray((rng.rand(b, s, n, d, hf, wf, 3) * 14 - 7).astype(np.float32))
    ego = jnp.asarray(np.tile(np.array([1.0, 0, 0, 0, 0, 0.1], np.float32),
                              (b, s, 1)))
    args = (feats, geom, ego, jnp.asarray(BEV_RES), jnp.asarray(BEV_START),
            BEV_DIM)
    ref = BP.project_to_birds_eye_view(*args, method='scatter')
    with pltpu.force_tpu_interpret_mode():
        out = BP.project_to_birds_eye_view(*args, method=method)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_lift_splat_matches_materialized():
    """Fused pallas lift+splat == softmax-outer-product + scatter path,
    forward AND gradients (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(5)
    b, s, n, d, hf, wf, c = 1, 2, 2, 3, 2, 3, 4
    ctx = jnp.asarray(rng.rand(b, s, n, hf, wf, c).astype(np.float32))
    depth = jnp.asarray(rng.randn(b, s, n, hf, wf, d).astype(np.float32))
    geometry = jnp.asarray((rng.rand(b, s, n, d, hf, wf, 3) * 12 - 6).astype(np.float32))
    ego = jnp.asarray(np.tile(np.array([-1.0, 0, 0, 0, 0, 0.0], np.float32), (b, s, 1)))

    def materialized(ctx, depth):
        dp = jax.nn.softmax(depth, -1)
        lifted = jnp.moveaxis(dp, -1, 3)[..., None] * ctx[:, :, :, None]
        return BP.project_to_birds_eye_view(lifted, geometry, ego, BEV_RES,
                                            BEV_START, BEV_DIM, method='scatter')

    def fused(ctx, depth):
        return BP.project_lift_splat_fused(ctx, depth, geometry, ego, BEV_RES,
                                           BEV_START, BEV_DIM)

    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(materialized(ctx, depth))
        out = np.asarray(fused(ctx, depth))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

        gref = jax.grad(lambda a, b_: (materialized(a, b_) ** 2).sum(), argnums=(0, 1))(ctx, depth)
        gout = jax.grad(lambda a, b_: (fused(a, b_) ** 2).sum(), argnums=(0, 1))(ctx, depth)
        np.testing.assert_allclose(np.asarray(gout[0]), np.asarray(gref[0]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gout[1]), np.asarray(gref[1]), rtol=1e-4, atol=1e-5)


def test_voxelize_matches_reference_quantization():
    pts = np.array([[[-4.99, 0.0, 0.0], [4.99, -4.99, 0.0], [5.01, 0.0, 0.0]]], dtype=np.float32)
    coords, valid = BP.voxelize_coords(jnp.asarray(pts), BEV_RES, BEV_START, BEV_DIM)
    coords, valid = np.asarray(coords), np.asarray(valid)
    # (p - (start - res/2)) / res = (-4.99 + 5.0) / 1 = 0.01 -> 0
    np.testing.assert_array_equal(coords[0, 0], [0, 5, 0])
    np.testing.assert_array_equal(coords[0, 1], [9, 0, 0])
    assert valid[0, 0] and valid[0, 1] and not valid[0, 2]


def test_discounted_temporal_accumulate():
    """Reference stp3.py:296: bev_t = bev_{t-1} * discount + splat_t."""
    b, s, n, d, hf, wf, c = 1, 3, 1, 1, 1, 1, 2
    feats = np.ones((b, s, n, d, hf, wf, c), dtype=np.float32)
    # all points land in the same cell (origin), no egomotion
    geometry = np.zeros((b, s, n, d, hf, wf, 3), dtype=np.float32)
    ego = np.zeros((b, s, 6), dtype=np.float32)
    out = np.asarray(BP.project_to_birds_eye_view(
        jnp.asarray(feats), jnp.asarray(geometry), jnp.asarray(ego),
        BEV_RES, BEV_START, BEV_DIM, discount=0.5))
    cell = (4, 4)  # origin voxelizes to ((0 - (-5))/1) = 5 -> wait, computed below
    coords, _ = BP.voxelize_coords(jnp.zeros((1, 3)), BEV_RES, BEV_START, BEV_DIM)
    cx, cy = int(coords[0, 0]), int(coords[0, 1])
    np.testing.assert_allclose(out[0, 0, cx, cy], [1.0, 1.0])
    np.testing.assert_allclose(out[0, 1, cx, cy], [1.5, 1.5])
    np.testing.assert_allclose(out[0, 2, cx, cy], [1.75, 1.75])
    # everything else zero
    mask = np.ones((10, 10), dtype=bool)
    mask[cx, cy] = False
    assert np.abs(out[0, :, mask]).max() == 0.0


def test_prewarp_moves_past_frame_points():
    """Past-frame geometry must be shifted by the ego-motion before splatting."""
    b, s, c = 1, 2, 1
    feats = np.ones((b, s, 1, 1, 1, 1, c), dtype=np.float32)
    geometry = np.zeros((b, s, 1, 1, 1, 1, 3), dtype=np.float32)
    ego = np.zeros((b, s, 6), dtype=np.float32)
    ego[0, 0, 0] = 2.0  # frame0 -> frame1 motion: +2m in x
    out = np.asarray(BP.project_to_birds_eye_view(
        jnp.asarray(feats), jnp.asarray(geometry), jnp.asarray(ego),
        BEV_RES, BEV_START, BEV_DIM, discount=0.5))
    coords0, _ = BP.voxelize_coords(jnp.asarray([[2.0, 0.0, 0.0]]), BEV_RES, BEV_START, BEV_DIM)
    coords1, _ = BP.voxelize_coords(jnp.asarray([[0.0, 0.0, 0.0]]), BEV_RES, BEV_START, BEV_DIM)
    x0, y0 = int(coords0[0, 0]), int(coords0[0, 1])
    x1, y1 = int(coords1[0, 0]), int(coords1[0, 1])
    # frame 0: point warped to +2m
    assert out[0, 0, x0, y0, 0] == 1.0
    # frame 1: original cell has the fresh splat + 0.5 * nothing-there
    assert out[0, 1, x1, y1, 0] == 1.0
    # frame 1 also carries 0.5 * frame0's shifted splat
    assert out[0, 1, x0, y0, 0] == 0.5
