"""Seeded randomized property tests: many small shape/parameter combinations
against the oracles in one sweep, catching corners the directed tests miss
(tile-boundary sizes, K near P2, ragged lengths incl. zero, duplicates).

Shapes stay tiny — the Pallas kernels run in interpret mode here (Python
per grid step), so the value is breadth of configurations, not size.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu.kernels.knn_pallas import knn_forward_pallas
from pytorch3d_pointops_tpu.ops.ball_query import _ball_query_forward
from pytorch3d_pointops_tpu.ops.knn import _knn_forward_full, knn_points
from pytorch3d_pointops_tpu.ops.fps import (
    sample_farthest_points,
    sample_farthest_points_naive,
)


def test_fuzz_knn_pallas_vs_oracle():
    rng = np.random.default_rng(0)
    for trial in range(12):
        N = int(rng.integers(1, 3))
        P1 = int(rng.integers(1, 70))
        P2 = int(rng.integers(1, 130))
        D = int(rng.choice([1, 2, 3, 5]))
        K = int(rng.integers(1, min(P2, 9) + 1))
        norm = int(rng.choice([1, 2]))
        t1 = int(rng.choice([8, 16, 32]))
        t2 = int(rng.choice([16, 32, 64]))
        dup = rng.random() < 0.4  # quantized coords force distance ties
        key = jax.random.PRNGKey(trial)
        k1, k2 = jax.random.split(key)
        p1 = jax.random.normal(k1, (N, P1, D), jnp.float32)
        p2 = jax.random.normal(k2, (N, P2, D), jnp.float32)
        if dup:
            p1 = jnp.round(p1 * 2) / 2
            p2 = jnp.round(p2 * 2) / 2
        l1 = jnp.asarray(rng.integers(0, P1 + 1, size=N), jnp.int32)
        l2 = jnp.asarray(rng.integers(0, P2 + 1, size=N), jnp.int32)
        d_pal, i_pal = knn_forward_pallas(
            p1, p2, l2, K=K, norm=norm, tile_p1=t1, tile_p2=t2, interpret=True
        )
        d_ref, i_ref = _knn_forward_full(p1, p2, l1, l2, K, norm)
        cfg = dict(N=N, P1=P1, P2=P2, D=D, K=K, norm=norm, t=(t1, t2),
                   dup=dup, trial=trial)
        # compare only valid (n, k) cells — pad conventions differ pre-wrap
        for n in range(N):
            kv = min(K, int(l2[n]))
            np.testing.assert_allclose(
                np.asarray(d_pal)[n, :, :kv],
                np.asarray(d_ref)[n, :, :kv],
                atol=1e-5, rtol=1e-5, err_msg=str(cfg),
            )
            np.testing.assert_array_equal(
                np.asarray(i_pal)[n, :, :kv],
                np.asarray(i_ref)[n, :, :kv],
                err_msg=str(cfg),
            )


def test_fuzz_public_knn_wrapper_conventions():
    """The public wrapper's pad conventions across random ragged configs:
    idx/dists zero past lengths, ascending order, idx within lengths2."""
    rng = np.random.default_rng(1)
    for trial in range(8):
        N = int(rng.integers(1, 4))
        P1 = int(rng.integers(2, 40))
        P2 = int(rng.integers(2, 60))
        K = int(rng.integers(1, 10))
        key = jax.random.PRNGKey(100 + trial)
        k1, k2 = jax.random.split(key)
        p1 = jax.random.normal(k1, (N, P1, 3), jnp.float32)
        p2 = jax.random.normal(k2, (N, P2, 3), jnp.float32)
        l1 = jnp.asarray(rng.integers(1, P1 + 1, size=N), jnp.int32)
        l2 = jnp.asarray(rng.integers(1, P2 + 1, size=N), jnp.int32)
        out = knn_points(p1, p2, l1, l2, K=K)
        d, i = np.asarray(out.dists), np.asarray(out.idx)
        for n in range(N):
            kv = min(K, int(l2[n]))
            assert (i[n, : int(l1[n]), :kv] < int(l2[n])).all()
            assert (np.diff(d[n, : int(l1[n]), :kv], axis=1) >= 0).all()
            assert (d[n, int(l1[n]):] == 0).all()
            assert (i[n, int(l1[n]):] == 0).all()
            assert (d[n, :, kv:] == 0).all()
            assert (i[n, :, kv:] == 0).all()


def test_fuzz_ball_query_scan_order():
    """Random radii/configs: XLA path returns exactly the first-K in-radius
    scan-order indices, verified against a numpy replay of the CUDA scan."""
    rng = np.random.default_rng(2)
    for trial in range(8):
        N = int(rng.integers(1, 3))
        P1 = int(rng.integers(1, 30))
        P2 = int(rng.integers(1, 80))
        K = int(rng.integers(1, 12))
        radius = float(rng.uniform(0.2, 1.5))
        key = jax.random.PRNGKey(200 + trial)
        k1, k2 = jax.random.split(key)
        p1 = np.asarray(jax.random.normal(k1, (N, P1, 3), jnp.float32))
        p2 = np.asarray(jax.random.normal(k2, (N, P2, 3), jnp.float32))
        l1 = rng.integers(1, P1 + 1, size=N)
        l2 = rng.integers(1, P2 + 1, size=N)
        _, idx = _ball_query_forward(
            jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(l1, jnp.int32), jnp.asarray(l2, jnp.int32),
            K, radius, impl="xla",
        )
        idx = np.asarray(idx)
        for n in range(N):
            for i in range(int(l1[n])):
                d2 = ((p1[n, i] - p2[n, : int(l2[n])]) ** 2).sum(-1)
                want = np.flatnonzero(d2 < radius**2)[:K]
                got = idx[n, i][idx[n, i] >= 0]
                np.testing.assert_array_equal(got, want, err_msg=f"t{trial}")


def test_fuzz_fps_exact_parity():
    rng = np.random.default_rng(3)
    for trial in range(8):
        N = int(rng.integers(1, 4))
        P = int(rng.integers(1, 60))
        K = int(rng.integers(1, 20))
        key = jax.random.PRNGKey(300 + trial)
        pts = jax.random.normal(key, (N, P, 3), jnp.float32)
        lengths = jnp.asarray(rng.integers(1, P + 1, size=N), jnp.int32)
        _, idx = sample_farthest_points(pts, lengths, K=K, impl="xla")
        _, idx_naive = sample_farthest_points_naive(pts, lengths, K=K)
        np.testing.assert_array_equal(
            np.asarray(idx), np.asarray(idx_naive), err_msg=f"t{trial}"
        )
