"""Headline benchmark: brute-force KNN queries/s at the BASELINE.json
north-star config (N=M=100k points, K=16, single cloud) on one chip.

Prints ONE JSON line:
  {"metric": "knn_100k_k16_queries_per_s", "value": <qps>,
   "unit": "queries/s", "vs_baseline": <pallas_vs_xla_speedup>}

``vs_baseline`` is the speedup of the Pallas streaming kernel over the
XLA-compiled tiled implementation of the same op on the same chip (the
reference publishes no numbers — BASELINE.md:3 — so the measured XLA program
is the baseline the kernel must beat).  Run with BENCH_QUICK=1 for a smaller
problem on CPU-only machines.
"""

import json
import os
import time


def _time(fn, *args, iters=5):
    """Min over runs: the tunnel dispatch RTT is ~28 ms with high variance,
    so the mean over-reports op cost; min is the robust throughput
    estimator (same policy as scripts/bench_all.py timeit_min)."""
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())  # force through tunnel
    best = float("inf")
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.time() - t0)
    return best


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from pytorch3d_pointops_tpu.kernels.knn_pallas import knn_forward_pallas
    from pytorch3d_pointops_tpu.ops import knn as knn_mod

    on_tpu = jax.default_backend() == "tpu"
    quick = os.environ.get("BENCH_QUICK") == "1" or not on_tpu
    P = 20_000 if quick else 100_000
    K = 16

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)

    xla_fn = jax.jit(
        lambda a, b: knn_mod._knn_forward_tiled(a, b, lengths, lengths, K, 2)[0]
    )
    iters = 1 if quick else 5
    t_xla = _time(xla_fn, p1, p2, iters=iters)

    if on_tpu:
        def pallas_fn(a, b):
            return knn_forward_pallas(a, b, lengths, K=K)[0]

        t_pallas = _time(pallas_fn, p1, p2, iters=iters)
    else:
        # Interpret-mode Pallas is a Python-per-grid-step simulator — not a
        # performance path; report the XLA program on non-TPU hosts.
        t_pallas = t_xla

    qps = P / t_pallas
    print(
        json.dumps(
            {
                "metric": f"knn_{P // 1000}k_k16_queries_per_s",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(t_xla / t_pallas, 3),
            }
        )
    )
