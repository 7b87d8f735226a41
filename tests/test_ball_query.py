import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import ball_query

from oracles import ball_query_np, knn_backward_np


def _clouds(key, N=3, P1=25, P2=40, D=3):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p1 = jax.random.uniform(k1, (N, P1, D))
    p2 = jax.random.uniform(k2, (N, P2, D))
    l1 = jax.random.randint(k3, (N,), 1, P1 + 1)
    l2 = jax.random.randint(k4, (N,), 1, P2 + 1)
    return p1, p2, l1, l2


@pytest.mark.parametrize("K,radius", [(5, 0.3), (20, 0.5), (3, 0.1)])
def test_ball_query_vs_oracle(K, radius):
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(K))
    out = ball_query(p1, p2, l1, l2, K=K, radius=radius, return_nn=False)
    ref_d, ref_i = ball_query_np(
        np.asarray(p1), np.asarray(p2), np.asarray(l1), np.asarray(l2), K, radius
    )
    np.testing.assert_array_equal(np.asarray(out.idx), ref_i)
    np.testing.assert_allclose(np.asarray(out.dists), ref_d, atol=1e-5)


def test_ball_query_streaming_matches_full():
    import importlib

    bq_mod = importlib.import_module("pytorch3d_pointops_tpu.ops.ball_query")

    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(0), N=2, P1=30, P2=200)
    full = bq_mod._ball_query_forward(p1, p2, l1, l2, 8, 0.4)
    old_max, old_tile = bq_mod._FULL_MATRIX_MAX_ELEMS, bq_mod._TILE_P2
    bq_mod._FULL_MATRIX_MAX_ELEMS, bq_mod._TILE_P2 = 1, 64
    try:
        tiled = bq_mod._ball_query_forward(p1, p2, l1, l2, 8, 0.4)
    finally:
        bq_mod._FULL_MATRIX_MAX_ELEMS, bq_mod._TILE_P2 = old_max, old_tile
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(tiled[1]))
    np.testing.assert_allclose(np.asarray(full[0]), np.asarray(tiled[0]), atol=1e-6)


def test_ball_query_all_within_radius():
    """Every returned squared distance is < radius^2
    (reference examples/ball_query_on_pointclouds.py:100-106)."""
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(5))
    radius = 0.35
    out = ball_query(p1, p2, l1, l2, K=10, radius=radius, return_nn=True)
    d = np.asarray(out.dists)
    i = np.asarray(out.idx)
    assert (d[i >= 0] < radius**2).all()
    assert (d[i == -1] == 0).all()
    # neighbors are zero-filled at pads
    nn = np.asarray(out.knn)
    assert (nn[i == -1] == 0).all()


def test_ball_query_backward_vs_oracle():
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(2), N=2, P1=12, P2=18)
    K, radius = 4, 0.5

    def loss(a, b):
        out = ball_query(a, b, l1, l2, K=K, radius=radius, return_nn=False)
        w = jnp.arange(out.dists.size, dtype=jnp.float32).reshape(out.dists.shape)
        return (out.dists * w).sum()

    g1, g2 = jax.grad(loss, argnums=(0, 1))(p1, p2)
    out = ball_query(p1, p2, l1, l2, K=K, radius=radius, return_nn=False)
    w = np.arange(out.dists.size, dtype=np.float32).reshape(out.dists.shape)
    ref_g1, ref_g2 = knn_backward_np(
        np.asarray(p1), np.asarray(p2), np.asarray(l1), np.asarray(l2),
        np.asarray(out.idx), 2, w,
    )
    np.testing.assert_allclose(np.asarray(g1), ref_g1, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), ref_g2, atol=1e-3, rtol=1e-4)


def test_ball_query_defaults_jit():
    p1, p2, _, _ = _clouds(jax.random.PRNGKey(1), N=1, P1=10, P2=10)
    out = jax.jit(lambda a, b: ball_query(a, b, K=4, radius=0.6).dists)(p1, p2)
    assert out.shape == (1, 10, 4)


def test_ball_query_forced_pallas_off_tpu_raises():
    """Forcing impl='pallas' on a non-TPU backend must raise a clear
    ValueError, not an opaque Mosaic lowering failure (tests run on CPU)."""
    p1 = jnp.zeros((1, 8, 3))
    p2 = jnp.zeros((1, 8, 3))
    with pytest.raises(ValueError, match="requires a TPU backend"):
        ball_query(p1, p2, K=2, radius=0.5, impl="pallas")
