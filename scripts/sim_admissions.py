"""Monte-Carlo simulation of KNN kernel sweep counts: unfiltered vs
sampled-bound-seeded states.

The kernel's phase-1/2 cost tracks Sum_tiles maxc(tile), where maxc is the
max over all C*W program lanes (sweeps are jointly gated across chains) of
per-lane admissions in that tile — an admission being a candidate that
beats the lane's current kth (strict <) and, when seeded, sits at or below
the lane's sampled bound tau.

For random clouds distances are i.i.d. per (query, candidate), so
admissions depend only on rank statistics: the t-th ELIGIBLE candidate a
lane sees is admitted with probability min(1, K/t), independently across t
(the relative rank of the t-th element among the first t is uniform).
Eligibility: global rank >= lb_rank (chained rounds) and, seeded,
global rank < count(d <= tau), where count | (tau = m-th sample) is
NegBinomial(m, s/n) + m.  That lets us simulate every production shape
without a distance matrix.

Run on CPU (no TPU needed):  python scripts/sim_admissions.py
Prints sweeps/tile for the v5e production configs.

Simulated results (seed 0; sweeps/tile = E[maxc] over lanes, so Jensen
inflation vs the per-lane mean is included):

  K=16 100k T2=1024 (headline): 5.38 unfiltered -> 4.10 @ s=6144 (-24%),
      3.93 @ 12288 (-27%), 3.70 @ 24576 (-31%)   [measured kernel ~6.8]
  K=64 100k T2=2048:           18.85 -> 10.53 (-44%) / 9.66 / 8.94 (-53%)
  K=16 1M  T2=1024:             1.88 -> 1.65 @ s=65536 (-12%), 1.58 (-16%)
  K=500 tail round (lb=448):   18.68 -> 11.84 @ s=6144 (-37%)

Read: seeding pays most where admissions are dense (K=64 rounds, big-K
chains); the 1M case is already admission-sparse so the sample pass is
mostly overhead there.  Hardware numbers land via scripts/knn_r4_seeded.py
and scripts/knn_r4_chain.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pytorch3d_pointops_tpu.kernels.knn_pallas import _bound_m


def _sim_dense(rng, n, K, T2, lanes, reps, lb_rank=0, chunk=64):
    """Exact vectorized simulation when (almost) every candidate is
    eligible: admission draws at every stream position.  With a lower rank
    bound the t-index at position j concentrates at j*M/n (M = n - lb)."""
    tiles = -(-n // T2)  # P2 is padded to a tile multiple in the kernel
    n_pad = tiles * T2
    M = n - lb_rank
    t_of_j = np.maximum(1, ((np.arange(n, dtype=np.float64) + 1) * M / n))
    # Admission at position j = P(eligible) * P(top-K among eligibles) —
    # eligibility thinning M/n matters only for chained (lb_rank > 0) runs.
    p = ((M / n) * np.minimum(1.0, K / t_of_j)).astype(np.float32)
    p = np.pad(p, (0, n_pad - n))
    tot = 0.0
    for _ in range(reps):
        per_tile = np.zeros(tiles, np.int64)
        for c0 in range(0, lanes, chunk):
            c = min(chunk, lanes - c0)
            adm = rng.random((c, n_pad), dtype=np.float32) < p[None, :]
            counts = adm.reshape(c, tiles, T2).sum(axis=2)
            per_tile = np.maximum(per_tile, counts.max(axis=0))
        tot += per_tile.sum()
    return tot / reps, tot / reps / tiles


def _sim_window(rng, n, K, T2, lanes, reps, s, kq, lb_rank=0):
    """Per-lane simulation when a sampled bound caps eligibility at
    count(d <= tau) candidates: eligible stream positions are a uniform
    random subset, admissions Bernoulli(min(1, K/t)) by eligible index."""
    tiles = -(-n // T2)
    m = _bound_m(s * kq / n)
    tot = 0.0
    for _ in range(reps):
        per_tile = np.zeros(tiles, np.int64)
        for _l in range(lanes):
            count = rng.negative_binomial(m, s / n) + m
            M = max(0, min(n, count) - lb_rank)
            if M == 0:
                continue
            pos = np.sort(rng.integers(0, n, M))
            t = np.arange(1, M + 1, dtype=np.float64)
            adm = rng.random(M) < np.minimum(1.0, K / t)
            per_tile = np.maximum(
                per_tile,
                np.bincount(pos[adm] // T2, minlength=tiles),
            )
        tot += per_tile.sum()
    return tot / reps, tot / reps / tiles


def main():
    rng = np.random.default_rng(0)
    cfgs = [
        ("K=16 100k T2=1024 (headline)",
         dict(n=100_000, K=16, T2=1024, lanes=1024), 6, (6144, 12288, 24576)),
        ("K=64 100k T2=2048",
         dict(n=100_000, K=64, T2=2048, lanes=512), 6, (6144, 12288, 24576)),
        ("K=16 1M T2=1024",
         dict(n=1_000_000, K=16, T2=1024, lanes=1024), 2, (65536, 131072)),
    ]
    for name, cfg, reps, svals in cfgs:
        tot0, pt0 = _sim_dense(rng, reps=reps, **cfg)
        print(f"{name}: unfiltered sweeps/tile {pt0:6.2f} "
              f"(total {tot0:8.0f})", flush=True)
        for s in svals:
            tot, pt = _sim_window(rng, reps=reps, s=s, kq=cfg["K"], **cfg)
            print(f"{name}: seeded s={s:6d} sweeps/tile {pt:6.2f} "
                  f"({(pt - pt0) / pt0 * 100:+.0f}%)", flush=True)

    # One chained K=500 tail round (window (448, 512], Kc=64): the lb-only
    # control vs the (lb, tau] seeded window.
    n, Kc, T2, lanes = 100_000, 64, 2048, 512
    tot0, pt0 = _sim_dense(rng, n, Kc, T2, lanes, reps=6, lb_rank=448)
    print(f"K=500 tail round (lb=448): unfiltered sweeps/tile {pt0:6.2f}",
          flush=True)
    tot, pt = _sim_window(rng, n, Kc, T2, lanes, reps=6, s=6144, kq=512,
                          lb_rank=448)
    print(f"K=500 tail round (lb=448): seeded s=6144 sweeps/tile {pt:6.2f} "
          f"({(pt - pt0) / pt0 * 100:+.0f}%)", flush=True)


if __name__ == "__main__":
    main()
