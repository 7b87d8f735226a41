import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu import (
    get_point_covariances,
    masked_gather,
    wmean,
)


def test_masked_gather_2d_idx():
    pts = jnp.arange(24, dtype=jnp.float32).reshape(2, 4, 3)
    idx = jnp.asarray([[0, 2, -1], [3, -1, -1]])
    out = np.asarray(masked_gather(pts, idx))
    np.testing.assert_array_equal(out[0, 0], np.asarray(pts[0, 0]))
    np.testing.assert_array_equal(out[0, 1], np.asarray(pts[0, 2]))
    assert (out[0, 2] == 0).all()
    np.testing.assert_array_equal(out[1, 0], np.asarray(pts[1, 3]))
    assert (out[1, 1:] == 0).all()


def test_masked_gather_3d_idx():
    pts = jnp.arange(30, dtype=jnp.float32).reshape(1, 10, 3)
    idx = jnp.asarray([[[1, -1], [9, 0]]])  # (1, 2, 2)
    out = np.asarray(masked_gather(pts, idx))
    assert out.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(out[0, 0, 0], np.asarray(pts[0, 1]))
    assert (out[0, 0, 1] == 0).all()
    np.testing.assert_array_equal(out[0, 1, 0], np.asarray(pts[0, 9]))


def test_masked_gather_differentiable():
    pts = jnp.ones((1, 5, 3))
    idx = jnp.asarray([[0, 2, -1]])

    def f(p):
        return masked_gather(p, idx).sum()

    g = np.asarray(jax.grad(f)(pts))
    np.testing.assert_array_equal(g[0, 0], [1, 1, 1])
    np.testing.assert_array_equal(g[0, 2], [1, 1, 1])
    np.testing.assert_array_equal(g[0, 1], [0, 0, 0])  # ungathered
    np.testing.assert_array_equal(g[0, 3], [0, 0, 0])


def test_wmean():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(wmean(x)), np.asarray(x).mean(1, keepdims=True), atol=1e-6
    )
    w = jnp.asarray([[1.0, 2, 0, 1, 1], [1, 1, 1, 1, 1]])
    got = np.asarray(wmean(x, w))
    ref = (np.asarray(x) * np.asarray(w)[..., None]).sum(1, keepdims=True) / np.asarray(
        w
    ).sum(1)[:, None, None]
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # zero weights clamp the denominator rather than dividing by zero
    w0 = jnp.zeros((2, 5))
    assert np.isfinite(np.asarray(wmean(x, w0))).all()


def test_point_covariances_shape_structure():
    """Sphere -> isotropic eigenvalues; flat disc -> rank-2 structure
    (reference examples/utils_on_pointclouds.py:83-133)."""
    rng = np.random.default_rng(1)
    # points on a plane z=0
    plane = rng.normal(size=(1, 200, 3)).astype(np.float32)
    plane[..., 2] = 0.0
    cov, knn = get_point_covariances(
        jnp.asarray(plane), jnp.asarray([200]), neighborhood_size=16
    )
    assert cov.shape == (1, 200, 3, 3)
    assert knn.shape == (1, 200, 16, 3)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    # smallest eigenvalue ~0 for planar neighborhoods
    assert np.abs(evals[..., 0]).max() < 1e-5
    assert evals[..., 2].min() > 1e-6
