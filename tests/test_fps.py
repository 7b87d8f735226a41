import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import (
    sample_farthest_points,
    sample_farthest_points_naive,
)

from oracles import fps_np


def _clouds(key, N=3, P=50):
    k1, k2 = jax.random.split(key)
    pts = jax.random.normal(k1, (N, P, 3))
    lengths = jax.random.randint(k2, (N,), 1, P + 1)
    return pts, lengths


@pytest.mark.parametrize("K", [1, 5, 12])
def test_fps_vs_oracle(K):
    pts, lengths = _clouds(jax.random.PRNGKey(K))
    sampled, idx = sample_farthest_points(pts, lengths, K)
    ref_idx = fps_np(
        np.asarray(pts), np.asarray(lengths),
        np.full(3, K), np.zeros(3, np.int64),
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    # gathered points: zero at -1 pads, exact at valid slots
    got = np.asarray(sampled)
    for n in range(3):
        for k in range(K):
            if ref_idx[n, k] == -1:
                assert (got[n, k] == 0).all()
            else:
                np.testing.assert_array_equal(
                    got[n, k], np.asarray(pts)[n, ref_idx[n, k]]
                )


def test_fps_per_cloud_K():
    pts, lengths = _clouds(jax.random.PRNGKey(0))
    K = [3, 7, 5]
    sampled, idx = sample_farthest_points(pts, lengths, K)
    assert idx.shape == (3, 7)
    ref_idx = fps_np(
        np.asarray(pts), np.asarray(lengths), np.asarray(K), np.zeros(3, np.int64)
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_fps_naive_matches_device():
    """Exact index parity between the fori_loop device implementation and the
    numpy naive oracle (reference examples/fps_on_pointclouds.py:152-154
    asserts torch.equal)."""
    pts, lengths = _clouds(jax.random.PRNGKey(10), N=4, P=64)
    _, idx_dev = sample_farthest_points(pts, lengths, 16)
    _, idx_naive = sample_farthest_points_naive(pts, lengths, 16)
    np.testing.assert_array_equal(np.asarray(idx_dev), np.asarray(idx_naive))


def test_fps_random_start():
    pts, lengths = _clouds(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(99)
    _, idx = sample_farthest_points(pts, lengths, 5, random_start_point=True, key=key)
    starts = np.asarray(idx[:, 0])
    assert (starts >= 0).all()
    assert (starts < np.asarray(lengths)).all()
    _, idx_naive = sample_farthest_points_naive(
        pts, lengths, 5, random_start_point=True, key=key
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_naive))
    with pytest.raises(ValueError):
        sample_farthest_points(pts, lengths, 5, random_start_point=True)


def test_fps_k_exceeds_lengths():
    pts = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 3))
    lengths = jnp.array([4, 10])
    _, idx = sample_farthest_points(pts, lengths, 8)
    idx = np.asarray(idx)
    assert (idx[0, 4:] == -1).all()
    assert (idx[0, :4] >= 0).all()
    assert (idx[1] >= 0).all()
    # samples within a cloud are unique
    assert len(set(idx[0, :4].tolist())) == 4
    assert len(set(idx[1].tolist())) == 8


def test_fps_uniform_coverage_property():
    """FPS spreads samples: the min pairwise distance among FPS samples should
    exceed that of the first-K prefix (a weak but meaningful property)."""
    pts = jax.random.normal(jax.random.PRNGKey(8), (1, 200, 3))
    sampled, _ = sample_farthest_points(pts, K=16)
    s = np.asarray(sampled[0])
    prefix = np.asarray(pts[0, :16])

    def min_pair(a):
        d = ((a[:, None] - a[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    assert min_pair(s) > min_pair(prefix)


def test_fps_jittable():
    pts, lengths = _clouds(jax.random.PRNGKey(5))
    f = jax.jit(lambda p, l: sample_farthest_points(p, l, 6)[1])
    np.testing.assert_array_equal(
        np.asarray(f(pts, lengths)),
        np.asarray(sample_farthest_points(pts, lengths, 6)[1]),
    )


def test_fps_forced_pallas_off_tpu_raises():
    """Forcing either FPS Pallas kernel on a non-TPU backend must raise a
    clear ValueError, not an opaque Mosaic lowering failure."""
    pts = jnp.zeros((2, 16, 3))
    for impl in ("pallas", "pallas_batched"):
        with pytest.raises(ValueError, match="requires a TPU backend"):
            sample_farthest_points(pts, K=4, impl=impl)


def test_fps_chunked_rejects_high_d():
    """The chunked kernel's partials slab holds max+argmax+coords in 8
    sublane rows, so D > 6 must raise instead of silently zeroing coords
    (round-3 advisor finding); auto-dispatch routes D > 6 giants to XLA."""
    from pytorch3d_pointops_tpu.kernels.fps_pallas import fps_pallas_chunked

    pts = jnp.zeros((1, 2048, 7))
    with pytest.raises(ValueError, match="D <= 6"):
        fps_pallas_chunked(
            pts,
            jnp.asarray([2048], jnp.int32),
            jnp.asarray([4], jnp.int32),
            jnp.asarray([0], jnp.int32),
            4,
            interpret=True,
        )
