"""Round-5 experiment: Morton-ordered QUERIES for the KNN kernel.

Hypothesis (from the measured counters, COUNTERS_r05.json): executed
phase-1 sweeps are the JOINT max over a program's 1024 lanes of per-lane
admission needs — 4.62/tile executed vs ~1.0/tile per-lane need, a 4.6x
inflation because random query order makes lane needs independent.
Spatially sorting the queries (Morton/Z-order) makes lanes in the same
program spatially coherent, so their admission events are POSITIVELY
CORRELATED (a candidate near one lane's query is near them all) and the
joint max shrinks toward the per-lane need.  The sort permutes only
QUERY rows: per-query results are block-independent, p2 scan order is
untouched, so dists/idx (after un-permuting rows) are bit-identical —
tie semantics cannot change.

Measures, on the chip at the shipped 100k config:
  1. instrumented sweep/firing counters, random vs Morton order
  2. end-to-end kernel time, random vs Morton (sort+gather included)
  3. exact parity of the un-permuted outputs
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu.kernels.knn_pallas import (
    _COUNTER_LANES,
    knn_forward_pallas,
)


def _part1by2(u):
    # Spread the low 10 bits of u to every 3rd bit (x -> x??x??x...).
    u = (u | (u << 16)) & 0x030000FF
    u = (u | (u << 8)) & 0x0300F00F
    u = (u | (u << 4)) & 0x030C30C3
    u = (u | (u << 2)) & 0x09249249
    return u


def morton_order(p):
    """(N, P, 3) -> (N, P) int32 permutation sorting points along a 30-bit
    Z-order curve (10 bits/axis, per-cloud bounding box)."""
    lo = p.min(axis=1, keepdims=True)
    hi = p.max(axis=1, keepdims=True)
    q = (p - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.int32)
    code = (
        _part1by2(q[..., 0])
        | (_part1by2(q[..., 1]) << 1)
        | (_part1by2(q[..., 2]) << 2)
    )
    return jnp.argsort(code, axis=1).astype(jnp.int32)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.time() - t0)
    return best, out


def main():
    P = int(os.environ.get("SORT_P", "100000"))
    K = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)

    # --- counters: random vs Morton ---------------------------------
    def counters(p1_in):
        out = knn_forward_pallas(p1_in, p2, lengths, K, instrument=True)
        return out

    for name, pp in (
        ("random", p1),
        ("morton", jnp.take_along_axis(p1, morton_order(p1)[..., None], 1)),
    ):
        _, _, cnt = jax.jit(counters)(pp)
        c = np.asarray(cnt)[:, :, 0, :]  # (N, nb, 128)
        L = _COUNTER_LANES
        tiles = c[..., L["tiles"]].sum()
        print(
            f"[counters {name}] p1_sweeps/tile "
            f"{c[..., L['p1_sweeps']].sum()/tiles:.2f}  "
            f"admissions/query {c[..., L['admissions']].sum()/P:.1f}  "
            f"p2_firing {c[..., L['p2_firings']].sum()/tiles:.3f}  "
            f"p2_sweeps/firing "
            f"{c[..., L['p2_sweeps']].sum()/max(c[..., L['p2_firings']].sum(),1):.2f}",
            flush=True,
        )

    # --- timing ------------------------------------------------------
    base = jax.jit(
        lambda a, b: knn_forward_pallas(a, b, lengths, K)
    )
    t_rand, (d0, i0) = timeit(base, p1, p2)
    print(f"random order:  {t_rand*1e3:8.1f} ms", flush=True)

    @jax.jit
    def sorted_knn(a, b):
        order = morton_order(a)
        a_s = jnp.take_along_axis(a, order[..., None], axis=1)
        d, i = knn_forward_pallas(a_s, b, lengths, K)
        inv = jnp.zeros_like(order).at[0, order[0]].set(
            jnp.arange(a.shape[1], dtype=jnp.int32)
        )
        return (
            jnp.take_along_axis(d, inv[..., None], axis=1),
            jnp.take_along_axis(i, inv[..., None], axis=1),
        )

    t_sort, (d1, i1) = timeit(sorted_knn, p1, p2)
    print(f"morton order:  {t_sort*1e3:8.1f} ms "
          f"({t_rand/t_sort:.3f}x)", flush=True)

    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=0)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    print("exact parity (bit-identical dists, identical idx) OK", flush=True)

    # sort-alone cost, for the decomposition
    sort_only = jax.jit(
        lambda a: jnp.take_along_axis(a, morton_order(a)[..., None], 1)
    )
    t_s, _ = timeit(sort_only, p1)
    print(f"sort+gather alone: {t_s*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
