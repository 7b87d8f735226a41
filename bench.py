"""Headline benchmark: brute-force KNN queries/s at the BASELINE.json
north-star config (N=M=100k points, K=16, single cloud) on one chip.

Prints ONE JSON line:
  {"metric": "knn_100k_k16_queries_per_s", "value": <qps>,
   "unit": "queries/s", "vs_baseline": <pallas_vs_xla_speedup>, ...}

``value`` is per-call throughput with the op repeated R=5 times inside one
on-device ``lax.fori_loop`` (inputs perturbed per iteration so XLA cannot
CSE the repeats).  On this host the chip is reached through the axon
tunnel, whose ~29 ms dispatch round-trip is a dev-harness artifact, not
chip cost — a single-dispatch timing charges it all to the op (the
round-2 review prescribed exactly this amortization for the small
config).  ``single_dispatch_qps`` reports the unamortized number
alongside for transparency.

``vs_baseline`` is the speedup of the Pallas streaming kernel over the
XLA-compiled tiled implementation of the same op on the same chip (the
reference publishes no numbers — BASELINE.md:3 — so the measured XLA
program is the baseline the kernel must beat; at ~4.5 s/call the RTT is
<1% for the XLA side, so it is timed single-dispatch).  Run with
BENCH_QUICK=1 for a smaller problem on CPU-only machines.
"""

import json
import os
import time


def _time_min(fn, *args, iters=5):
    """Min over runs: the tunnel dispatch RTT is ~29 ms with high variance,
    so the mean over-reports; min is the robust estimator."""
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())  # force through tunnel
    best = float("inf")
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.time() - t0)
    return best


if __name__ == "__main__":
    import jax

    # The axon tunnel to the chip flaps for hours at a time (round-4 saw a
    # >5 h outage); a backend-init failure here would lose the round's
    # bench artifact.  Retry by re-exec (backend-init errors are cached
    # per-process, so an in-process retry cannot recover) with a bounded
    # backoff before giving up.
    try:
        jax.devices()
    except RuntimeError as e:
        import sys

        attempt = int(os.environ.get("_BENCH_INIT_ATTEMPT", "0"))
        max_attempts = int(os.environ.get("BENCH_INIT_RETRIES", "10"))
        if attempt >= max_attempts:
            raise
        print(
            f"backend init failed (attempt {attempt + 1}/{max_attempts}), "
            f"retrying in 120 s: {e}",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(120)
        os.environ["_BENCH_INIT_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    import jax.numpy as jnp

    from pytorch3d_pointops_tpu.kernels.knn_pallas import knn_forward_pallas
    from pytorch3d_pointops_tpu.ops import knn as knn_mod

    on_tpu = jax.default_backend() == "tpu"
    quick = os.environ.get("BENCH_QUICK") == "1" or not on_tpu
    P = 20_000 if quick else 100_000
    K = 16
    R = 2 if quick else 5

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)

    xla_fn = jax.jit(
        lambda a, b: knn_mod._knn_forward_tiled(a, b, lengths, lengths, K, 2)[0]
    )
    t_xla = _time_min(xla_fn, p1, p2, iters=1 if quick else 3)

    if on_tpu:

        @jax.jit
        def pallas_rep(a, b):
            def body(i, acc):
                aa = a + 1e-6 * i.astype(jnp.float32)
                d, idx = knn_forward_pallas(aa, b, lengths, K)
                return acc + d[0, 0, 0] + idx[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        t_pallas = _time_min(pallas_rep, p1, p2) / R

        def pallas_one(a, b):
            return knn_forward_pallas(a, b, lengths, K)[0]

        t_single = _time_min(pallas_one, p1, p2)
    else:
        # Interpret-mode Pallas is a Python-per-grid-step simulator — not a
        # performance path; report the XLA program on non-TPU hosts.
        t_pallas = t_xla
        t_single = t_xla

    qps = P / t_pallas
    # Derive the roofline ratio from THIS run instead of hardcoding it
    # (round-5 review): fraction of the measured DISTANCE floor — the K=1
    # running-min kernel at the shipped tiles, timed with this same R-loop
    # methodology (28.7 ms net at 100k, /tmp-protocol in ROOFLINE.md round-5
    # carried-kernel section).  The earlier "selection-inclusive" floor
    # (65.6 ms) modeled sweep work the carried sorted-candidate kernel now
    # skips — the kernel beat it, so it no longer bounds anything.  RTT is
    # measured here with a no-op dispatch; the amortized per-call number
    # carries RTT/R of it.  Only meaningful at the non-quick TPU config.
    _FLOOR_MS = 28.7
    roofline_frac = None
    if on_tpu and not quick:
        noop = jax.jit(lambda s: s + 1.0)
        rtt_s = _time_min(noop, jnp.float32(0.0))
        net_ms = t_pallas * 1e3 - rtt_s * 1e3 / R
        if net_ms > 0:
            roofline_frac = round(_FLOOR_MS / net_ms, 2)
    print(
        json.dumps(
            {
                # "_amortized" suffix (round 4): the R-repeat on-device loop
                # changed the measurement in round 3; the rename keeps
                # historical "queries_per_s" JSON lines (single-dispatch)
                # comparable instead of silently conflating methodologies.
                "metric": f"knn_{P // 1000}k_k16_queries_per_s_amortized",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(t_xla / t_pallas, 3),
                "per_call_ms": round(t_pallas * 1e3, 2),
                "repeat": R,
                "single_dispatch_qps": round(P / t_single, 1),
                # The ONE roofline ratio (ROOFLINE.md round-5 settlement,
                # measured sweep counters in COUNTERS_r05.json): fraction
                # of the selection-inclusive floor, net of RTT on both
                # sides; ~1.0 against the exactness-inclusive floor.
                "roofline_frac": roofline_frac,
            }
        )
    )
