"""Native C++ host library vs JAX ops: the dual-implementation oracle
pattern of SURVEY §4 item 1, with the roles reversed — the C++ library is an
independent implementation checked against the JAX/XLA path (and vice
versa)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import native
from pytorch3d_pointops_tpu.ops.ball_query import ball_query
from pytorch3d_pointops_tpu.ops.fps import sample_farthest_points
from pytorch3d_pointops_tpu.ops.knn import knn_backward, knn_points
from pytorch3d_pointops_tpu.ops.packed_padded import (
    packed_to_padded,
    padded_to_packed,
)
from pytorch3d_pointops_tpu.ops.sample_pdf import sample_pdf

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no C++ toolchain"
)


def _clouds(seed, N=3, P1=64, P2=80, D=3):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    p1 = jax.random.normal(k1, (N, P1, D), jnp.float32)
    p2 = jax.random.normal(k2, (N, P2, D), jnp.float32)
    l1 = jax.random.randint(k3, (N,), 1, P1 + 1)
    l2 = jax.random.randint(k4, (N,), 1, P2 + 1)
    return p1, p2, l1, l2


@pytest.mark.parametrize("norm", [1, 2])
@pytest.mark.parametrize("K", [1, 5, 16])
def test_knn_native_vs_jax(norm, K):
    p1, p2, l1, l2 = _clouds(norm * 10 + K)
    d_j, i_j, _ = knn_points(p1, p2, l1, l2, norm=norm, K=K)
    d_n, i_n = native.knn_points(p1, p2, l1, l2, K=K, norm=norm)
    np.testing.assert_allclose(d_n, np.asarray(d_j), atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(i_n, np.asarray(i_j))


def test_knn_backward_native_vs_jax():
    p1, p2, l1, l2 = _clouds(3)
    K = 4
    _, idx, _ = knn_points(p1, p2, l1, l2, K=K)
    g = jax.random.normal(jax.random.PRNGKey(9), idx.shape, jnp.float32)
    gp1_j, gp2_j = knn_backward(p1, p2, l1, l2, idx, 2, g)
    gp1_n, gp2_n = native.knn_backward(p1, p2, idx, g, l1, l2, norm=2)
    np.testing.assert_allclose(gp1_n, np.asarray(gp1_j), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gp2_n, np.asarray(gp2_j), atol=1e-4, rtol=1e-4)


def test_ball_query_native_vs_jax():
    p1, p2, l1, l2 = _clouds(5)
    out = ball_query(p1, p2, l1, l2, K=8, radius=0.9, return_nn=False)
    d_n, i_n = native.ball_query(p1, p2, l1, l2, K=8, radius=0.9)
    np.testing.assert_allclose(d_n, np.asarray(out.dists), atol=1e-5)
    np.testing.assert_array_equal(i_n, np.asarray(out.idx))


def test_fps_native_vs_jax():
    pts = jax.random.normal(jax.random.PRNGKey(0), (3, 50, 3))
    lengths = jnp.asarray([50, 30, 7])
    _, idx_j = sample_farthest_points(pts, lengths, K=[12, 5, 12])
    idx_n = native.sample_farthest_points(pts, lengths, K=[12, 5, 12])
    np.testing.assert_array_equal(idx_n, np.asarray(idx_j))


def test_packed_padded_native_vs_jax():
    F, D = 25, 4
    inputs = jax.random.normal(jax.random.PRNGKey(1), (F, D), jnp.float32)
    first = jnp.asarray([0, 10, 13], jnp.int32)
    pad_j = packed_to_padded(inputs, first, 12)
    pad_n = native.packed_to_padded(inputs, first, 12)
    np.testing.assert_allclose(pad_n, np.asarray(pad_j), atol=1e-6)
    back_j = padded_to_packed(pad_j, first, F)
    back_n = native.padded_to_packed(pad_n, first, F)
    np.testing.assert_allclose(back_n, np.asarray(back_j), atol=1e-6)


def test_sample_pdf_native_vs_jax():
    B, n_bins, S = 6, 20, 15
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    bins = jnp.sort(jax.random.uniform(k1, (B, n_bins + 1)), axis=-1)
    weights = jax.random.uniform(k2, (B, n_bins))
    out_j = sample_pdf(bins, weights, S, det=True)
    u = np.broadcast_to(
        np.linspace(0.0, 1.0, S, dtype=np.float32), (B, S)
    )
    out_n = native.sample_pdf(bins, weights, u)
    np.testing.assert_allclose(out_n, np.asarray(out_j), atol=1e-5)
