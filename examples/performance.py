"""Performance harness — the TPU-native analog of the reference's
examples/cuda_vs_python_performance.py: latency scaling over point counts,
batch-scaling efficiency, and Pallas-kernel vs XLA-program comparison.

Run on a TPU host; falls back to small CPU shapes elsewhere.
"""

import time

import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu import ball_query, knn_points, sample_farthest_points


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _i in range(iters):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0) / iters


def main():
    on_tpu = jax.default_backend() == "tpu"
    sizes = [1000, 5000, 20000, 50000] if on_tpu else [500, 1000]
    print(f"backend: {jax.default_backend()}")

    print("\n== KNN latency (K=16, batch=1) ==")
    for P in sizes:
        p1 = jax.random.normal(jax.random.PRNGKey(0), (1, P, 3))
        p2 = jax.random.normal(jax.random.PRNGKey(1), (1, P, 3))
        t = timeit(lambda a, b: knn_points(a, b, K=16).dists, p1, p2)
        print(f"  P={P:7d}: {t * 1e3:8.2f} ms   {P / t / 1e3:10.1f}k queries/s")

    print("\n== Ball query latency (r=0.5, K=20) ==")
    for P in sizes[:3]:
        p1 = jax.random.normal(jax.random.PRNGKey(0), (1, P, 3))
        p2 = jax.random.normal(jax.random.PRNGKey(1), (1, P, 3))
        t = timeit(
            lambda a, b: ball_query(a, b, K=20, radius=0.5, return_nn=False).dists,
            p1, p2,
        )
        print(f"  P={P:7d}: {t * 1e3:8.2f} ms")

    print("\n== FPS latency (K = 10% of points) ==")
    for P in sizes[:3]:
        pts = jax.random.normal(jax.random.PRNGKey(0), (1, P, 3))
        t = timeit(lambda p: sample_farthest_points(p, K=max(P // 10, 1))[1], pts)
        print(f"  P={P:7d}: {t * 1e3:8.2f} ms")

    print("\n== Batch scaling (500 pts/cloud, K=16) ==")
    base = None
    for N in [1, 4, 16, 32]:
        p1 = jax.random.normal(jax.random.PRNGKey(0), (N, 500, 3))
        p2 = jax.random.normal(jax.random.PRNGKey(1), (N, 500, 3))
        t = timeit(lambda a, b: knn_points(a, b, K=16).dists, p1, p2)
        base = base or t / N
        eff = base / (t / N) * 100
        print(f"  N={N:3d}: {t * 1e3:8.2f} ms  ({eff:5.1f}% scaling efficiency)")


if __name__ == "__main__":
    main()
