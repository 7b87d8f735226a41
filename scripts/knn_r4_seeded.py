"""Round-4 measurement: sampled kth-bound seeding on SINGLE-round KNN.

The chained big-K path seeds by default (see knn_r4_chain.py for its
sweep); this script measures the opt-in single-round variant at the
headline config (100k x 100k, K=16) and at K=64, across sample sizes.

Expectation from the admission math (see kernels/knn_pallas.py margins):
at K=16 the absolute margin floor (~8 ranks) dominates the target
quantile (s*K/n ~ 2 at the default s), so the bound only beats the
unfiltered E[admissions] = K*ln(n/K) ~ 140 once s approaches the P2/4 gate — i.e. the
headline win should be small-to-neutral and the sweep is here to confirm
or refute that, not to tune a foregone conclusion.  K=64 has 4x the
quantile for the same margin floor, so seeding should clearly win there.

Timing: jit, warm-up, min over ITERS, host fetch via float(sum).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu.kernels.knn_pallas import knn_forward_pallas

N, P, D = 1, 100_000, 3
ITERS = 3


def _force(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args):
    _force(fn(*args))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.time()
        _force(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    k = jax.random.PRNGKey(0)
    p1 = jax.random.normal(jax.random.fold_in(k, 0), (N, P, D), jnp.float32)
    p2 = jax.random.normal(jax.random.fold_in(k, 1), (N, P, D), jnp.float32)
    l2 = jnp.full((N,), P, jnp.int32)

    for K in (16, 64):

        def ctl(p1, p2, l2, K=K):
            return knn_forward_pallas(p1, p2, l2, K)

        t0 = timeit(ctl, p1, p2, l2)
        print(f"K={K:3d} control (unseeded):      {t0*1e3:8.1f} ms",
              flush=True)

        # Max sweepable s is P2//4 = 25000 (the seeding gate; larger s
        # would be loudly ignored and time the control).
        for s in (6144, 12288, 24576):

            def seeded(p1, p2, l2, K=K, s=s):
                return knn_forward_pallas(
                    p1, p2, l2, K, sample_bound=True, sample_s=s
                )

            try:
                t = timeit(seeded, p1, p2, l2)
            except Exception as e:
                print(f"K={K:3d} seeded s={s:6d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            print(f"K={K:3d} seeded s={s:6d}:       {t*1e3:8.1f} ms "
                  f"({(t0-t)/t0*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
