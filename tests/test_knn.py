import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import knn_gather, knn_points

from oracles import knn_backward_np, knn_np


def _rand_clouds(key, N, P1, P2, D, ragged=True):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p1 = jax.random.normal(k1, (N, P1, D), jnp.float32)
    p2 = jax.random.normal(k2, (N, P2, D), jnp.float32)
    if ragged:
        lengths1 = jax.random.randint(k3, (N,), 1, P1 + 1)
        lengths2 = jax.random.randint(k4, (N,), 1, P2 + 1)
    else:
        lengths1 = jnp.full((N,), P1, jnp.int32)
        lengths2 = jnp.full((N,), P2, jnp.int32)
    return p1, p2, lengths1, lengths2


@pytest.mark.parametrize("norm", [1, 2])
@pytest.mark.parametrize("K", [1, 4, 16])
@pytest.mark.parametrize("ragged", [False, True])
def test_knn_forward_vs_oracle(norm, K, ragged):
    key = jax.random.PRNGKey(norm * 100 + K)
    p1, p2, l1, l2 = _rand_clouds(key, 3, 33, 47, 3, ragged)
    out = knn_points(p1, p2, l1, l2, norm=norm, K=K)
    ref_d, ref_i = knn_np(
        np.asarray(p1), np.asarray(p2), np.asarray(l1), np.asarray(l2), K, norm
    )
    np.testing.assert_allclose(np.asarray(out.dists), ref_d, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.idx), ref_i)


def test_knn_k_larger_than_p2():
    key = jax.random.PRNGKey(0)
    p1, p2, l1, l2 = _rand_clouds(key, 2, 10, 6, 3, ragged=True)
    K = 8  # > P2 for some clouds
    out = knn_points(p1, p2, l1, l2, K=K)
    ref_d, ref_i = knn_np(
        np.asarray(p1), np.asarray(p2), np.asarray(l1), np.asarray(l2), K, 2
    )
    np.testing.assert_allclose(np.asarray(out.dists), ref_d, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.idx), ref_i)
    # pads are exactly (0, 0)
    k_pad = np.arange(K)[None, None, :] >= np.asarray(l2)[:, None, None]
    assert (np.asarray(out.dists)[np.broadcast_to(k_pad, out.dists.shape)] == 0).all()
    assert (np.asarray(out.idx)[np.broadcast_to(k_pad, out.idx.shape)] == 0).all()


def test_knn_tiled_matches_full():
    """The streaming scan path must agree with the single-shot path."""
    from pytorch3d_pointops_tpu.ops import knn as knn_mod

    key = jax.random.PRNGKey(3)
    p1, p2, l1, l2 = _rand_clouds(key, 2, 150, 300, 3, ragged=True)
    full = knn_mod._knn_forward_full(p1, p2, l1, l2, 8, 2)
    old_t1, old_t2 = knn_mod._TILE_P1, knn_mod._TILE_P2
    knn_mod._TILE_P1, knn_mod._TILE_P2 = 64, 128  # force multi-tile
    try:
        tiled = knn_mod._knn_forward_tiled(p1, p2, l1, l2, 8, 2)
    finally:
        knn_mod._TILE_P1, knn_mod._TILE_P2 = old_t1, old_t2
    np.testing.assert_allclose(
        np.asarray(full[0]), np.asarray(tiled[0]), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(tiled[1]))


@pytest.mark.parametrize("norm", [1, 2])
def test_knn_backward_vs_oracle(norm):
    key = jax.random.PRNGKey(42 + norm)
    p1, p2, l1, l2 = _rand_clouds(key, 2, 12, 17, 3, ragged=True)
    K = 4

    def loss(p1_, p2_):
        out = knn_points(p1_, p2_, l1, l2, norm=norm, K=K)
        w = jnp.arange(out.dists.size, dtype=jnp.float32).reshape(out.dists.shape)
        return (out.dists * w).sum()

    g1, g2 = jax.grad(loss, argnums=(0, 1))(p1, p2)

    out = knn_points(p1, p2, l1, l2, norm=norm, K=K)
    w = np.arange(out.dists.size, dtype=np.float32).reshape(out.dists.shape)
    ref_g1, ref_g2 = knn_backward_np(
        np.asarray(p1), np.asarray(p2), np.asarray(l1), np.asarray(l2),
        np.asarray(out.idx), norm, w,
    )
    np.testing.assert_allclose(np.asarray(g1), ref_g1, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), ref_g2, atol=1e-3, rtol=1e-4)


def test_knn_self_distance_zero():
    """Self-KNN: nearest neighbor of each point is itself with distance ~0
    (reference examples/knn_on_pointclouds.py:107-113)."""
    key = jax.random.PRNGKey(7)
    p = jax.random.normal(key, (2, 64, 3))
    out = knn_points(p, p, K=1)
    np.testing.assert_allclose(np.asarray(out.dists), 0.0, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out.idx[..., 0]), np.broadcast_to(np.arange(64), (2, 64))
    )


def test_knn_gather_matches_return_nn():
    key = jax.random.PRNGKey(9)
    p1, p2, l1, l2 = _rand_clouds(key, 2, 20, 30, 3, ragged=True)
    out = knn_points(p1, p2, l1, l2, K=5, return_nn=True)
    nn2 = knn_gather(p2, out.idx, l2)
    np.testing.assert_array_equal(np.asarray(out.knn), np.asarray(nn2))
    # zero-fill where k >= lengths2
    K = 5
    mask = np.arange(K)[None, None, :] >= np.asarray(l2)[:, None, None]
    got = np.asarray(nn2)
    assert (got[np.broadcast_to(mask[..., None], got.shape)] == 0).all()


def test_knn_gather_features_dim():
    """knn_gather works for arbitrary feature dim U != D."""
    key = jax.random.PRNGKey(11)
    p1, p2, l1, l2 = _rand_clouds(key, 2, 8, 12, 3, ragged=True)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 7))
    out = knn_points(p1, p2, l1, l2, K=3)
    g = knn_gather(feats, out.idx, l2)
    assert g.shape == (2, 8, 3, 7)
    idx = np.asarray(out.idx)
    for n in range(2):
        for i in range(8):
            for k in range(min(3, int(l2[n]))):
                np.testing.assert_array_equal(
                    np.asarray(g)[n, i, k], np.asarray(feats)[n, idx[n, i, k]]
                )


def test_knn_jit_and_vmap_composable():
    key = jax.random.PRNGKey(13)
    p1, p2, l1, l2 = _rand_clouds(key, 2, 16, 24, 3, False)
    jitted = jax.jit(lambda a, b: knn_points(a, b, K=4).dists)
    np.testing.assert_allclose(
        np.asarray(jitted(p1, p2)),
        np.asarray(knn_points(p1, p2, K=4).dists),
        atol=1e-6,
    )


def test_knn_validation_errors():
    p1 = jnp.zeros((2, 4, 3))
    with pytest.raises(ValueError):
        knn_points(p1, jnp.zeros((3, 4, 3)))
    with pytest.raises(ValueError):
        knn_points(p1, jnp.zeros((2, 4, 2)))
    with pytest.raises(ValueError):
        knn_points(p1, p1, norm=3)


def test_knn_return_sorted_false():
    """return_sorted=False returns kernel (scan) order: ascending neighbor
    index among the same K winners, pads at the tail (reference
    functions/knn.py:77-89 skips the post-sort when K > 1)."""
    key = jax.random.PRNGKey(17)
    p1, p2, l1, l2 = _rand_clouds(key, 2, 12, 20, 3, True)
    srt = knn_points(p1, p2, l1, l2, K=6)
    uns = knn_points(p1, p2, l1, l2, K=6, return_sorted=False)
    for n in range(2):
        kv = min(6, int(l2[n]))
        for i in range(int(l1[n])):
            # same neighbor SET per query
            assert set(np.asarray(srt.idx)[n, i, :kv].tolist()) == set(
                np.asarray(uns.idx)[n, i, :kv].tolist()
            )
            # unsorted order = ascending neighbor index
            vals = np.asarray(uns.idx)[n, i, :kv]
            assert (np.diff(vals) > 0).all(), vals
            # dists stay paired with their idx
            d_expect = ((np.asarray(p1)[n, i, None] - np.asarray(p2)[n, vals]) ** 2).sum(-1)
            np.testing.assert_allclose(
                np.asarray(uns.dists)[n, i, :kv], d_expect, atol=1e-5
            )
        # pads remain at the tail
        if kv < 6:
            assert (np.asarray(uns.idx)[n, : int(l1[n]), kv:] == 0).all()
            assert (np.asarray(uns.dists)[n, : int(l1[n]), kv:] == 0).all()


def test_knn_return_sorted_false_grads_flow():
    key = jax.random.PRNGKey(19)
    p1, p2, l1, l2 = _rand_clouds(key, 1, 8, 14, 3, False)

    def loss(a, srt):
        out = knn_points(a, p2, K=3, return_sorted=srt)
        return (out.dists * jnp.arange(3.0)[None, None, :]).sum()

    g_sorted = jax.grad(lambda a: loss(a, True))(p1)
    g_unsorted = jax.grad(lambda a: loss(a, False))(p1)
    # different weighting order -> different grads, but both finite nonzero
    assert np.isfinite(np.asarray(g_unsorted)).all()
    assert np.abs(np.asarray(g_unsorted)).sum() > 0
    assert np.isfinite(np.asarray(g_sorted)).all()


def test_knn_forced_pallas_off_tpu_raises():
    """Forcing impl='pallas' on a non-TPU backend must raise a clear
    ValueError, not an opaque Mosaic lowering failure (tests run on CPU)."""
    p1 = jnp.zeros((1, 8, 3))
    p2 = jnp.zeros((1, 8, 3))
    with pytest.raises(ValueError, match="requires a TPU backend"):
        knn_points(p1, p2, K=2, impl="pallas")


def test_knn_auto_dispatch_large_k_stays_on_kernel(monkeypatch):
    """K > 64 auto dispatch stays on the Pallas kernel — chained 64-key
    rounds give any-K at kernel speed (the reference V0 bar, knn.cu:28-67)
    — and the full op's results through that path match the XLA twin."""
    from pytorch3d_pointops_tpu.kernels import knn_pallas as kp
    from pytorch3d_pointops_tpu.ops import knn as knn_mod

    monkeypatch.setattr(knn_mod, "_default_impl", lambda norm: "pallas")
    calls = {}
    orig = kp.knn_forward_pallas

    def spy(p1, p2, l2, K, norm, *args, **kw):
        if args or kw:  # chained-round inner calls: pass through unchanged
            return orig(p1, p2, l2, K, norm, *args, **kw)
        calls["K"] = K
        return orig(p1, p2, l2, K, norm, 32, 128, True)  # interpret on CPU

    monkeypatch.setattr(kp, "knn_forward_pallas", spy)
    p1 = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 3))
    p2 = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 3))
    out = knn_mod.knn_points(p1, p2, K=100, impl="auto")
    assert calls.get("K") == 100 and out.idx.shape == (1, 32, 100)
    ref = knn_mod.knn_points(p1, p2, K=100, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out.dists), np.asarray(ref.dists), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out.idx), np.asarray(ref.idx))


def test_knn_tiled_matches_full_large_k():
    """The K > 64 auto fallback rides the tiled streaming path at scale;
    index parity (incl. within-tile ties via quantized coords) must hold at
    a K spanning multiple merge rounds."""
    from pytorch3d_pointops_tpu.ops import knn as knn_mod

    key = jax.random.PRNGKey(13)
    k1, k2 = jax.random.split(key)
    p1 = jnp.round(jax.random.normal(k1, (2, 60, 3)) * 2) / 2
    p2 = jnp.round(jax.random.normal(k2, (2, 400, 3)) * 2) / 2
    l1 = jnp.asarray([60, 41], jnp.int32)
    l2 = jnp.asarray([400, 233], jnp.int32)
    full = knn_mod._knn_forward_full(p1, p2, l1, l2, 100, 2)
    old_t1, old_t2 = knn_mod._TILE_P1, knn_mod._TILE_P2
    knn_mod._TILE_P1, knn_mod._TILE_P2 = 32, 128
    try:
        tiled = knn_mod._knn_forward_tiled(p1, p2, l1, l2, 100, 2)
    finally:
        knn_mod._TILE_P1, knn_mod._TILE_P2 = old_t1, old_t2
    np.testing.assert_allclose(
        np.asarray(full[0]), np.asarray(tiled[0]), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(tiled[1]))
