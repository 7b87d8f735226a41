"""FPS kernel tuning + roofline analysis (VERDICT r1 weak #6).

Measures the three FPS implementations — batched Pallas (clouds advance
together), dense8 per-cloud Pallas (VMEM-resident up to ~4M points), and
the XLA fori_loop fallback (re-streams the cloud from HBM every round) —
across the shapes that matter, including a single 1M-point cloud.

Roofline model printed alongside:
* XLA fallback: every round reads the (P, 3) cloud + the min-dist buffer
  from HBM -> bytes = K * P * 16 B; at ~800 GB/s that is the floor for the
  streaming path.
* Pallas dense8: points + min-dist stay in VMEM; each round is ~4 VPU ops
  per point (diff x3 fused, min, compare) -> compute floor ~ K * P * 4 /
  (~4e12 op/s), plus a fixed per-round cost (reduction trees + control).
* Dispatch: every invocation pays the ~28 ms tunnel RTT on this host;
  subtract it when reading small configs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu.ops.fps import sample_farthest_points


def _force(o):
    return float(jax.tree_util.tree_leaves(o)[0].sum())


def timeit(fn, *args, iters=3):
    _force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _force(fn(*args))
    return (time.time() - t0) / iters


def main():
    print(f"backend: {jax.default_backend()}")
    RTT = 0.028 if jax.default_backend() == "tpu" else 0.0

    configs = [
        # (N, P, K) — grouping shapes + big single clouds
        (32, 4096, 512),
        (8, 16384, 1024),
        (1, 131072, 2048),
        (1, 1_000_000, 2048),
        # past the dense8 VMEM cap: the HBM-streaming chunked kernel
        # (r3: 3M/K=2048 398 ms, 4M/K=2048 ~0.5 s; XLA extrapolates ~30 s)
        (1, 4_194_304, 2048),
    ]
    for N, P, K in configs:
        pts = jax.random.normal(jax.random.PRNGKey(0), (N, P, 3), jnp.float32)
        lengths = jnp.full((N,), P, jnp.int32)
        print(f"\n== N={N} P={P} K={K} ==")
        # HBM-streaming floor for the XLA path; VMEM/compute floor for pallas
        hbm_floor = K * P * 16 / 800e9
        vpu_floor = N * K * P * 4 / 4e12
        print(f"  floors: XLA-HBM ~{hbm_floor * 1e3:.1f} ms, "
              f"pallas-VPU ~{vpu_floor * 1e3:.1f} ms (+{RTT * 1e3:.0f} ms RTT)")
        for impl in ("pallas_batched", "pallas", "pallas_chunked", "xla"):
            if impl == "pallas_batched" and (N < 4 or N * P > 4 * 1024 * 1024):
                continue
            if impl == "pallas" and P > 2 * 1024 * 1024:
                continue
            if impl == "pallas_chunked" and P < 500_000:
                continue
            if impl == "xla" and P > 2 * 1024 * 1024:
                continue  # ~30 s+ per call at this scale; see 1M row
            try:
                t = timeit(
                    lambda p, impl=impl: sample_farthest_points(
                        p, lengths, K=K, impl=impl
                    )[1],
                    pts,
                    iters=2,
                )
                print(f"  {impl:15s}: {t * 1e3:9.1f} ms "
                      f"({(t - RTT) * 1e3:9.1f} ms - RTT)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {impl:15s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main()
