"""Round-4 probe: does a deeper fold pay at 1M x 1M, K=16?

At 100k x 100k / K=16 depth2 measured WORSE (120.7 vs 118.0 ms) — phase-2
collisions are rare at K=16 there.  At 1M the stream is 10x longer and the
full kernel sits at ~2.4x the distance-only floor, so the phase-1/phase-2
balance may differ.  This measures depth 1/2/3 at the production tiling,
plus fwd+bwd at the winning depth (VERDICT r3 #4: 1M fwd+bwd <= 7.0 s bar).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu.kernels.knn_pallas import knn_forward_pallas

N, P, D, K = 1, 1_000_000, 3, 16
ITERS = 2


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

    for depth in (1, 2, 3):

        def fwd(p1, p2, l2, depth=depth):
            return knn_forward_pallas(p1, p2, l2, K, depth=depth)

        t = timeit(fwd, p1, p2, l2)
        print(f"1M x 1M K=16 depth={depth}: {t:7.3f} s", flush=True)

    # Sampled kth-bound seeding at 1M (round 4 second half): expected
    # admissions 16*ln(P2/16) ~ 177 -> 16*ln(count/16) ~ 62 at s=65536
    # (count ~ 19*P2/s ~ 290); the sample pass costs ~s/P2 of a distance
    # pass.  s=131072 halves count's margin share at 2x the sample cost.
    for s in (65536, 131072):

        def fwd_seeded(p1, p2, l2, s=s):
            return knn_forward_pallas(
                p1, p2, l2, K, sample_bound=True, sample_s=s
            )

        try:
            t = timeit(fwd_seeded, p1, p2, l2)
        except Exception as e:
            print(f"1M x 1M K=16 seeded s={s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        print(f"1M x 1M K=16 seeded s={s}: {t:7.3f} s", flush=True)


if __name__ == "__main__":
    main()
