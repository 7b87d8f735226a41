"""Chip benchmark for the banked VMEM row-scatter kernel (round 5).

The KNN backward's grad_p2 segment-sum at 1M x 1M / K=16 is 16M
contributions into 1M rows; the XLA scatter was measured at 983 ms
(ROOFLINE.md backward study).  This script times the Pallas kernel against
that control at 100k and 1M scale, sweeps (chunk, banks), and checks
exactness against the XLA scatter on the same inputs.

Timing follows tune_knn.py conventions: jit, warm-up, min over ITERS,
host fetch via float(sum).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu.kernels.scatter_pallas import (
    scatter_add_rows_pallas,
)

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


def xla_scatter(idx, v, P2):
    def one(i, vv):
        return jnp.zeros((P2, v.shape[2]), jnp.float32).at[i].add(vv)

    return jax.vmap(one)(jnp.maximum(idx, 0), v)


def run_scale(P2, K, sweep):
    E = P2 * K
    k = jax.random.PRNGKey(0)
    idx = jax.random.randint(k, (1, E), 0, P2, jnp.int32)
    v = jax.random.normal(jax.random.fold_in(k, 1), (1, E, 3), jnp.float32)
    print(f"--- P2={P2} E={E} ---", flush=True)

    t_x = timeit(jax.jit(lambda i, vv: xla_scatter(i, vv, P2)), idx, v)
    print(f"XLA scatter control: {t_x*1e3:8.1f} ms", flush=True)

    configs = (
        [(2048, 4)]
        if not sweep
        else [(2048, 4), (2048, 8), (4096, 4), (8192, 8), (1024, 2),
              (2048, 2), (2048, 16)]
    )
    best = None
    for chunk, banks in configs:
        fn = jax.jit(
            lambda i, vv, c=chunk, b=banks: scatter_add_rows_pallas(
                i, vv, P2, chunk=c, banks=b
            )
        )
        try:
            t = timeit(fn, idx, v)
        except Exception as e:
            print(f"pallas chunk={chunk} banks={banks}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        ns = t * 1e9 / E
        print(f"pallas chunk={chunk} banks={banks}: {t*1e3:8.1f} ms "
              f"({ns:.1f} ns/entry, {t_x/t:.1f}x vs XLA)", flush=True)
        if best is None or t < best[0]:
            best = (t, chunk, banks, fn)

    if best is None:
        # Remote-compile OOMs can fail every config; report and move on so
        # main() still runs the remaining scales.
        print("all pallas configs FAILED; XLA control stands", flush=True)
        return None

    # Exactness vs the XLA scatter (deterministic f32 sums can differ by
    # rounding order on duplicate rows; tolerance covers that).
    out_p = np.asarray(best[3](idx, v))
    out_x = np.asarray(jax.jit(lambda i, vv: xla_scatter(i, vv, P2))(idx, v))
    err = np.abs(out_p - out_x).max()
    print(f"max |pallas - xla| = {err:.2e}", flush=True)
    assert err < 1e-3, "scatter mismatch"
    return best


def main():
    run_scale(100_000, 16, sweep=True)
    if os.environ.get("SCATTER_1M", "1") == "1":
        run_scale(1_000_000, 16, sweep=False)


if __name__ == "__main__":
    main()
