"""Full benchmark matrix over the BASELINE.json configs, run on the attached
accelerator (TPU when present).  Prints one JSON line per config and writes
the full results to BENCH_DETAIL.json at the repo root.

Configs (BASELINE.json "configs"):
  1. knn_small        — 2-cloud batch (1000/800 pts, K=8) forward
  2. pointnetpp_group — batch=32 ragged ~4k pts: FPS K=512 + ball query
                        r=0.2 K=32 (PointNet++ set-abstraction workload)
  3. chamfer_train    — chamfer fwd+bwd with normals+colors features,
                        batch=16, 10k pts/cloud
  4. knn_1m           — single-cloud KNN N=M=1M pts K=16 forward (+bwd)
  5. multi-host       — covered by tests/test_ring.py + __graft_entry__
                        dryrun (no pod attached here)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu import (
    ball_query,
    chamfer_distance,
    knn_points,
    sample_farthest_points,
)


def _force(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args, iters=3):
    _force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _force(fn(*args))
    return (time.time() - t0) / iters


def timeit_min(fn, *args, iters=10):
    """Min over runs: robust for dispatch-RTT-bound measurements where the
    tunnel round-trip variance exceeds the op cost."""
    _force(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        _force(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    results = {}
    on_tpu = jax.default_backend() == "tpu"
    quick = os.environ.get("BENCH_QUICK") == "1" or not on_tpu

    # ---- dispatch round-trip floor ----
    # Under the axon tunnel each dispatch+fetch pays ~28 ms of RTT; small
    # configs are RTT-bound, so measure the floor and report it alongside
    # (the driver's knn_small number is meaningless without it).
    k = jax.random.PRNGKey(0)
    noop = jax.jit(lambda x: x + 1.0)
    t_rtt = timeit_min(noop, jnp.zeros((8,), jnp.float32))
    results["dispatch_rtt_floor"] = {"ms": t_rtt * 1e3}

    # ---- config 1: 2-cloud batch (1000/800 pts, K=8) ----
    # The op is far below the ~28 ms tunnel RTT, so a single dispatch is
    # pure noise (round 2 measured ms_minus_rtt < 0).  Amortize: run R
    # iterations inside ONE on-device lax.fori_loop — each iteration
    # perturbs p1 so XLA cannot CSE the repeats — and report per-call
    # latency with error bars across outer runs.
    p1 = jax.random.normal(jax.random.fold_in(k, 0), (2, 1000, 3))
    p2 = jax.random.normal(jax.random.fold_in(k, 1), (2, 1000, 3))
    l1 = jnp.asarray([1000, 800], jnp.int32)
    l2 = jnp.asarray([1000, 800], jnp.int32)
    # R=1000 (round 4; was 100): at R=100 the residual per-dispatch noise
    # left a ~40% error bar on the ~0.03 ms/call value.
    R = 1000

    @jax.jit
    def knn_small_rep(a, b):
        def body(i, acc):
            aa = a + 1e-6 * i.astype(jnp.float32)
            d = knn_points(aa, b, l1, l2, K=8).dists
            return acc + d[0, 0, 0]

        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    _force(knn_small_rep(p1, p2))
    per_call = []
    for _ in range(5):
        t0 = time.time()
        _force(knn_small_rep(p1, p2))
        per_call.append((time.time() - t0 - t_rtt) / R)
    t1 = sorted(per_call)[len(per_call) // 2]  # median
    spread = (max(per_call) - min(per_call)) / 2
    results["knn_small"] = {
        "per_call_ms": t1 * 1e3,
        "per_call_ms_err": spread * 1e3,
        "queries_per_s": 1800 / t1,
        "repeat": R,
        "note": "R on-device fori_loop iterations per dispatch; RTT "
        "subtracted once and amortized 1/R",
    }

    # ---- config 2: PointNet++ grouping, batch=32 x 4k pts ----
    N, P = (8, 1024) if quick else (32, 4096)
    KF = 128 if quick else 512
    pts = jax.random.normal(jax.random.fold_in(k, 2), (N, P, 3))
    lengths = jnp.asarray([P - (i % 7) * (P // 64) for i in range(N)], jnp.int32)

    def group(points):
        cent, _ = sample_farthest_points(points, lengths, K=KF)
        # PointNet++ set abstraction: each centroid gathers its r-ball
        # neighborhood from the full cloud.
        g = ball_query(cent, points, lengths2=lengths, K=32, radius=0.2)
        return g.dists.sum() + cent.sum()

    # Amortize the dispatch RTT (a dev-harness artifact ~29 ms — see
    # ROOFLINE.md): R repeats inside one on-device fori_loop, inputs
    # perturbed per iteration so XLA cannot CSE them, the RTT subtracted
    # ONCE and amortized 1/R — the knn_small methodology, applied uniformly
    # (round 4 still charged ~t_rtt/R per call here; VERDICT r4 weak #5).
    Rg = 1 if quick else 5

    @jax.jit
    def group_rep(points):
        def body(i, acc):
            return acc + group(points + 1e-6 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, Rg, body, jnp.float32(0.0))

    t = (timeit_min(group_rep, pts, iters=5) - t_rtt) / Rg
    t_single = timeit_min(jax.jit(group), pts, iters=3)
    results["pointnetpp_group"] = {
        "ms": t * 1e3,
        "clouds_per_s": N / t,
        "batch": N,
        "pts": P,
        "fps_K": KF,
        "repeat": Rg,
        "single_dispatch_ms": t_single * 1e3,
        "note": "RTT subtracted once and amortized 1/R",
    }

    # ---- config 3: chamfer fwd+bwd with normals+colors, batch=16 x 10k ----
    N, P = (4, 2048) if quick else (16, 10240)
    x = jax.random.normal(jax.random.fold_in(k, 3), (N, P, 3))
    y = jax.random.normal(jax.random.fold_in(k, 4), (N, P, 3))
    xf = {
        "normals": jax.random.normal(jax.random.fold_in(k, 5), (N, P, 3)),
        "colors": jax.random.uniform(jax.random.fold_in(k, 6), (N, P, 3)),
    }
    yf = {
        "normals": jax.random.normal(jax.random.fold_in(k, 7), (N, P, 3)),
        "colors": jax.random.uniform(jax.random.fold_in(k, 8), (N, P, 3)),
    }

    def chamfer_loss(x, y, xf, yf):
        loss, lf = chamfer_distance(
            x, y, x_features=xf, y_features=yf,
            feature_names=["normals", "colors"],
        )
        return loss + lf["normals"] + lf["colors"]

    vg = jax.value_and_grad(chamfer_loss, argnums=(0, 1))
    Rc = 1 if quick else 5

    @jax.jit
    def fwdbwd_rep(x, y, xf, yf):
        def body(i, acc):
            loss, (gx, gy) = vg(x + 1e-6 * i.astype(jnp.float32), y, xf, yf)
            return acc + loss + gx[0, 0, 0]

        return jax.lax.fori_loop(0, Rc, body, jnp.float32(0.0))

    t = (timeit_min(fwdbwd_rep, x, y, xf, yf, iters=5) - t_rtt) / Rc
    t_single = timeit_min(
        jax.jit(lambda *a: vg(*a)[0]), x, y, xf, yf, iters=3
    )
    results["chamfer_train"] = {
        "ms": t * 1e3,
        "pairs_per_s": N * P / t,
        "batch": N,
        "pts": P,
        "repeat": Rc,
        "single_dispatch_ms": t_single * 1e3,
        "note": "RTT subtracted once and amortized 1/R",
    }

    # ---- config 4: single-cloud KNN 1M x 1M, K=16, forward AND fwd+bwd ----
    # The backward's grad_p2 segment-sum over N*P1*K (16M at 1M scale)
    # contributions runs the banked VMEM Pallas row scatter on TPU
    # (kernels/scatter_pallas.py; round 5 — the round-4 XLA scatter was
    # update-serialized at 983 ms), the TPU equivalent of knn.cu:467-517's
    # atomicAdd kernel but bit-deterministic.
    P = 100_000 if quick else 1_000_000
    p1 = jax.random.normal(jax.random.fold_in(k, 9), (1, P, 3))
    p2 = jax.random.normal(jax.random.fold_in(k, 10), (1, P, 3))
    f = jax.jit(lambda a, b: knn_points(a, b, K=16).dists)
    t = timeit(f, p1, p2, iters=1)
    fb = jax.jit(
        jax.value_and_grad(
            lambda a, b: knn_points(a, b, K=16).dists.sum(), argnums=(0, 1)
        )
    )
    t_fb = timeit(fb, p1, p2, iters=1)
    results["knn_1m" if not quick else "knn_100k"] = {
        "ms": t * 1e3,
        "queries_per_s": P / t,
        "fwdbwd_ms": t_fb * 1e3,
        "fwdbwd_queries_per_s": P / t_fb,
    }

    for name, r in results.items():
        print(json.dumps({"config": name, **{k: round(v, 2) if isinstance(v, float) else v for k, v in r.items()}}))

    out_path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
    with open(out_path, "w") as fh:
        json.dump(
            {"backend": jax.default_backend(), "quick": quick, "results": results},
            fh,
            indent=2,
        )
    print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
