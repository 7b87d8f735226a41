"""Round-5 experiment 2: Morton-order BOTH sides of the KNN kernel.

Sorting p2 concentrates each query's neighbors in a few spatially-local
tiles: once the scan passes a query block's home region the threshold is
near-final and later tiles admit ~nothing (the sweep region is
pl.when-gated on maxc > 0, so non-winning tiles skip it entirely).

SIMULATION ONLY: the production kernel derives candidate indices from
scan position, so ties would resolve to the lowest PERMUTED index — this
script remaps indices through the permutation afterwards, which is exact
for tie-free random clouds (asserted) but NOT reference-tie-stable.  A
shippable version must stream the original indices through the kernel as
lex keys (they already drive a (value, index) insertion).

Measures at SORT_P (default 100k): counters + time for
  random | morton queries | morton both | morton both + block-rotated scan
The last one cannot be simulated without a kernel change; we approximate
its ceiling by reporting per-block winning-tile rates under morton-both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu.kernels.knn_pallas import (
    _COUNTER_LANES,
    knn_forward_pallas,
)
from knn_r5_sorted import morton_order, timeit  # noqa: E402


def main():
    P = int(os.environ.get("SORT_P", "100000"))
    K = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)

    o1 = morton_order(p1)
    o2 = morton_order(p2)
    p1s = jnp.take_along_axis(p1, o1[..., None], 1)
    p2s = jnp.take_along_axis(p2, o2[..., None], 1)

    def run_counters(a, b, name):
        _, _, cnt = jax.jit(
            lambda x, y: knn_forward_pallas(x, y, lengths, K, instrument=True)
        )(a, b)
        c = np.asarray(cnt)[:, :, 0, :]
        L = _COUNTER_LANES
        tiles = c[..., L["tiles"]].sum()
        print(
            f"[counters {name}] p1_sweeps/tile "
            f"{c[..., L['p1_sweeps']].sum()/tiles:.2f}  "
            f"winning_tiles {c[..., L['winning_tiles']].sum()/tiles:.3f}  "
            f"admissions/query {c[..., L['admissions']].sum()/P:.1f}  "
            f"p2_firing {c[..., L['p2_firings']].sum()/tiles:.3f}",
            flush=True,
        )

    run_counters(p1, p2, "random")
    run_counters(p1s, p2, "morton-q")
    run_counters(p1s, p2s, "morton-both")

    base = jax.jit(lambda a, b: knn_forward_pallas(a, b, lengths, K))
    t0, (d0, i0) = timeit(base, p1, p2)
    print(f"random:       {t0*1e3:8.1f} ms", flush=True)
    t1, _ = timeit(base, p1s, p2)
    print(f"morton-q:     {t1*1e3:8.1f} ms ({t0/t1:.3f}x)", flush=True)
    t2, (d2, i2) = timeit(base, p1s, p2s)
    print(f"morton-both:  {t2*1e3:8.1f} ms ({t0/t2:.3f}x)", flush=True)

    # Value parity (index parity requires the gidx-carrying kernel):
    inv1 = jnp.zeros_like(o1).at[0, o1[0]].set(
        jnp.arange(P, dtype=jnp.int32)
    )
    d2u = jnp.take_along_axis(d2, inv1[..., None], 1)
    i2u = jnp.take_along_axis(
        jnp.take_along_axis(o2, i2.reshape(1, -1), 1).reshape(i2.shape),
        inv1[..., None],
        1,
    )
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d2u), atol=0)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i2u))
    print("exact parity after remap (tie-free cloud) OK", flush=True)


if __name__ == "__main__":
    main()
