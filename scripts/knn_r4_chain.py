"""Round-4 decomposition of the chained big-K KNN per-round overhead.

ROOFLINE.md round 4 records ~450-470 ms per chained round vs 264.5 ms for
the bare (unchained) K=64 round at 100k x 100k.  This script separates the
two possible causes on the chip:

  1. the lb lex-screen's per-element op cost (measured by running the
     chained kernel with a VACUOUS bound (-inf, -1): identical admission
     pattern to bare, identical extra ops), vs
  2. an admission-distribution change under a REAL round-0 bound (the
     rank-(64..128] stream admits differently than rank-(0..64]).

Timing follows tune_knn.py conventions: jit, warm-up call, min over
ITERS timed calls, host fetch via float(sum) (block_until_ready does not
flush the axon tunnel).
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
    _force(fn(*args))  # warm-up / compile
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

    def bare(p1, p2, l2):
        return knn_forward_pallas(p1, p2, l2, 64)

    t_bare = timeit(bare, p1, p2, l2)
    print(f"bare K=64 (control):          {t_bare*1e3:8.1f} ms", flush=True)

    lb_vac = (
        jnp.full((N, P), -float("inf"), jnp.float32),
        jnp.full((N, P), -1, jnp.int32),
    )

    def vac(p1, p2, l2, lb_d, lb_i):
        return knn_forward_pallas(p1, p2, l2, 64, lb=(lb_d, lb_i))

    t_vac = timeit(vac, p1, p2, l2, *lb_vac)
    print(f"chained, vacuous (-inf) lb:   {t_vac*1e3:8.1f} ms "
          f"(+{(t_vac-t_bare)*1e3:.1f} = pure screen-op cost)", flush=True)

    d0, i0 = jax.jit(bare)(p1, p2, l2)
    lb_real = (d0[..., -1], i0[..., -1])
    _force(lb_real)

    t_real = timeit(vac, p1, p2, l2, *lb_real)
    print(f"chained, REAL round-0 lb:     {t_real*1e3:8.1f} ms "
          f"(+{(t_real-t_vac)*1e3:.1f} vs vacuous = admission shift)",
          flush=True)

    def k128_nosample(p1, p2, l2):
        return knn_forward_pallas(p1, p2, l2, 128, sample_bound=False)

    t_128 = timeit(k128_nosample, p1, p2, l2)
    print(f"full K=128 (2x64 rounds):     {t_128*1e3:8.1f} ms "
          f"(round-1 cost {(t_128 - t_bare)*1e3:.1f})", flush=True)

    # --- sampled kth-bound seeding (round 4): every round's state starts
    # at a strided-sample bound on its closing quantile, so sweeps track
    # the true admission window instead of the state-filling transient ---
    def k128_sampled(p1, p2, l2):
        return knn_forward_pallas(p1, p2, l2, 128)  # auto: sampling on

    t_128sb = timeit(k128_sampled, p1, p2, l2)
    print(f"K=128 SAMPLED-bound rounds:   {t_128sb*1e3:8.1f} ms "
          f"({(t_128 - t_128sb)*1e3:+.1f} vs unfiltered)", flush=True)

    # --- round-capacity sweep: wider rounds stream the distance matrix
    # fewer times at the price of a taller state + longer sweep unroll ---
    def k128_single(p1, p2, l2):
        return knn_forward_pallas(p1, p2, l2, 128, round_k=128)

    t_128s = timeit(k128_single, p1, p2, l2)
    print(f"K=128 SINGLE 128-state round: {t_128s*1e3:8.1f} ms", flush=True)

    if os.environ.get("CHAIN_XLA") == "1":
        from pytorch3d_pointops_tpu.ops import knn as knn_mod

        l1 = jnp.full((N,), P, jnp.int32)

        def xla500(p1, p2):
            return knn_mod._knn_forward_tiled(p1, p2, l1, l2, 500, 2)[0]

        t = timeit(jax.jit(xla500), p1, p2)
        print(f"K=500 XLA tiled (same-session control): {t*1e3:8.1f} ms",
              flush=True)

    # Each config crash-isolated: a compile OOM on a tall-state round_k
    # must not kill the rest of the sweep (opaque tpu_compile_helper
    # failures are process-fatal only for the config's python, so any
    # non-timing failure surfaces as an exception here).  rk=256 runs
    # LAST: its 256-sweep static unroll is the config most likely to
    # wedge the remote compiler, so everything else must be measured
    # before it is attempted.
    for rk, sb in ((64, True), (64, False), (128, True), (256, True)):

        def k500(p1, p2, l2, rk=rk, sb=sb):
            return knn_forward_pallas(
                p1, p2, l2, 500, round_k=rk, sample_bound=sb
            )

        rounds = -(-500 // rk)
        tag = "sampled" if sb else "unfiltered"
        try:
            t = timeit(k500, p1, p2, l2)
        except Exception as e:  # compile OOM / Mosaic lowering failure
            print(f"K=500 round_k={rk} {tag} ({rounds} rounds): FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        print(f"K=500 round_k={rk} {tag} ({rounds} rounds): {t*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
