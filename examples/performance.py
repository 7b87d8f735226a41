"""Performance harness — the TPU-native analog of the reference's
examples/cuda_vs_python_performance.py: latency scaling over point counts,
batch-scaling efficiency, and Pallas-kernel vs XLA-program comparison.

Run on a TPU host; falls back to small CPU shapes elsewhere.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
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

    # == Memory accounting ==
    # The TPU analog of the reference's torch.cuda.max_memory_allocated
    # section (cuda_vs_python_performance.py:266-310): XLA's static memory
    # analysis of the compiled KNN program — argument, output, and peak
    # temporary HBM per problem size.  A streaming kernel's temp memory
    # must stay ~flat while the O(P^2) distance matrix would explode.
    print("\n== KNN memory accounting (K=32, compiled program) ==")
    print(f"  {'P':>8} {'args MB':>9} {'out MB':>8} {'temp MB':>9} "
          f"{'out/peak':>9}")
    for P in (sizes if on_tpu else sizes[:2]):
        p1 = jax.random.normal(jax.random.PRNGKey(0), (1, P, 3))
        compiled = (
            jax.jit(lambda a, b: knn_points(a, b, K=32).dists)
            .lower(p1, p1)
            .compile()
        )
        mem = compiled.memory_analysis()
        if mem is None:
            print("  (memory analysis unavailable on this backend)")
            break
        mb = 1024 * 1024
        args = mem.argument_size_in_bytes / mb
        out = mem.output_size_in_bytes / mb
        temp = mem.temp_size_in_bytes / mb
        peak = max(args + out + temp, 1e-9)
        print(f"  {P:8d} {args:9.2f} {out:8.2f} {temp:9.2f} "
              f"{out / peak:9.2f}")

    # == Empirical complexity exponent ==
    # Mirror of cuda_vs_python_performance.py:313-361: fit the growth rate
    # of KNN latency between consecutive sizes.  Brute-force KNN is O(P^2)
    # compute, but small sizes are dispatch-bound, so the exponent climbs
    # toward 2 as sizes grow.
    print("\n== Empirical KNN complexity exponent ==")
    import numpy as np

    exp_sizes = [2000, 5000, 10000, 20000, 50000] if on_tpu else [500, 1000, 2000]
    times = []
    for P in exp_sizes:
        p1 = jax.random.normal(jax.random.PRNGKey(0), (1, P, 3))
        p2 = jax.random.normal(jax.random.PRNGKey(1), (1, P, 3))
        t = timeit(lambda a, b: knn_points(a, b, K=16).dists, p1, p2)
        times.append(t)
        print(f"  P={P:7d}: {t * 1e3:8.2f} ms   t/P={t / P * 1e6:7.3f} us"
              f"   t/P^2={t / P**2 * 1e9:8.4f} ns")
    rates = [
        np.log(times[i] / times[i - 1]) / np.log(exp_sizes[i] / exp_sizes[i - 1])
        for i in range(1, len(times))
    ]
    print(f"  empirical exponent between sizes: "
          f"{', '.join(f'{r:.2f}' for r in rates)}")
    print(f"  mean O(n^{np.mean(rates):.2f})  "
          "(theory: O(n^2) brute force; low exponents at small n are "
          "dispatch-overhead-bound)")


if __name__ == "__main__":
    main()
