"""Measure the KNN kernel's sweep/firing counters on hardware (round 5).

VERDICT r4 ask #2: the ROOFLINE.md floor decomposition rests on a MODELED
per-query admission count (K*ln(P2/K)); this script records the MEASURED
per-block distributions at the shipped config so the 74%-of-floor headline
is settled by data:

  * sweeps/tile (phase 1), phase-2 firing rate and phase-2 sweeps/firing,
  * admissions/query vs the K*ln(P2/K) model,
  * the implied floor: sweep work the ALGORITHM requires (admissions-driven)
    vs sweep work the joint gating actually executes (max over 1024 lanes).

Also times instrumented vs plain kernels (the counter RMW rides the
critical path; the production kernel compiles it out — this quantifies the
observer effect).

Writes COUNTERS_r05.json at the repo root.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu.kernels.knn_pallas import (
    _COUNTER_LANES,
    knn_forward_pallas,
)

N, P, D, K = 1, 100_000, 3, 16
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

    def plain(p1, p2, l2):
        return knn_forward_pallas(p1, p2, l2, K)

    def inst(p1, p2, l2):
        return knn_forward_pallas(p1, p2, l2, K, instrument=True)

    t_plain = timeit(plain, p1, p2, l2)
    print(f"plain kernel:        {t_plain*1e3:8.1f} ms", flush=True)
    t_inst = timeit(inst, p1, p2, l2)
    print(f"instrumented kernel: {t_inst*1e3:8.1f} ms "
          f"(observer effect {100*(t_inst/t_plain-1):+.1f}%)", flush=True)

    _, _, cnt = jax.jit(inst)(p1, p2, l2)
    c = np.asarray(cnt)[:, :, 0, :]  # (N, nb, 128)
    L = _COUNTER_LANES
    tiles = c[..., L["tiles"]]
    winning = c[..., L["winning_tiles"]]
    p1_sweeps = c[..., L["p1_sweeps"]]
    admissions = c[..., L["admissions"]]
    p2_firings = c[..., L["p2_firings"]]
    p2_sweeps = c[..., L["p2_sweeps"]]

    # Per-block (1024 queries each) rates; distributions over blocks.
    def stats(x):
        return dict(
            mean=float(np.mean(x)), p10=float(np.percentile(x, 10)),
            p50=float(np.percentile(x, 50)), p90=float(np.percentile(x, 90)),
            max=float(np.max(x)),
        )

    total_tiles = float(tiles.sum())
    out = {
        "config": dict(N=N, P=P, K=K, tiles_per_block=float(tiles[0, 0])),
        "winning_tile_rate": float(winning.sum() / total_tiles),
        "p1_sweeps_per_tile": stats(p1_sweeps / tiles),
        "p1_sweeps_per_winning_tile": stats(
            p1_sweeps / np.maximum(winning, 1)
        ),
        "p2_firing_rate_per_winning_tile": stats(
            p2_firings / np.maximum(winning, 1)
        ),
        "p2_sweeps_per_firing": stats(p2_sweeps / np.maximum(p2_firings, 1)),
        "p2_share_of_sweeps": float(
            p2_sweeps.sum() / (p1_sweeps.sum() + p2_sweeps.sum())
        ),
        "admissions_per_query": float(admissions.sum() / (N * P)),
        "admissions_model_k_ln_p2_over_k": K * math.log(P / K),
        "sweeps_per_query_executed": float(
            (p1_sweeps.sum() + p2_sweeps.sum()) * 1024 / (N * P)
        ),
        "timing_ms": {
            "plain": t_plain * 1e3,
            "instrumented": t_inst * 1e3,
        },
    }
    print(json.dumps(out, indent=1), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "COUNTERS_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(path)}", flush=True)


if __name__ == "__main__":
    main()
