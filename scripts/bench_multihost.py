"""BASELINE config 5: chamfer training step over a sharded batch of large
clouds, with scaling-efficiency measurement.

On a real pod slice (N hosts):
    python scripts/bench_multihost.py          # after jax.distributed setup
measures the full training step (ring chamfer fwd+bwd + SGD update) at 1-way
and N-way point sharding and reports the scaling efficiency the BASELINE
demands (target >= 85%).

Without TPU pod hardware (this repo's CI): set MULTIHOST_VIRTUAL=1 to run
the same code on 8 virtual CPU devices — functional validation + a
relative-efficiency print (CPU numbers are NOT the perf claim; the driver's
dryrun_multichip covers compile validation separately).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("MULTIHOST_VIRTUAL") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if os.environ.get("MULTIHOST_VIRTUAL") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch3d_pointops_tpu.parallel import make_mesh, ring_chamfer_distance


def _force(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


def step_time(mesh, target, src, iters=3):
    def loss_fn(p):
        return ring_chamfer_distance(
            p, target, mesh=mesh, point_axis="sp", batch_axis="dp"
        )

    @jax.jit
    def train_step(p):
        loss, g = jax.value_and_grad(loss_fn)(p)
        return p - 0.05 * g, loss

    p, l = train_step(src)
    _force(l)
    t0 = time.time()
    for _ in range(iters):
        p, l = train_step(p)
        _force(l)
    return (time.time() - t0) / iters


def main():
    virtual = os.environ.get("MULTIHOST_VIRTUAL") == "1"
    devices = jax.devices()
    n = len(devices)
    if virtual:
        N, Ppts = 8, 512
    else:
        N, Ppts = 256, 100_000  # BASELINE config 5
    key = jax.random.PRNGKey(0)
    target = jax.random.normal(key, (N, Ppts, 3), jnp.float32)
    src = jax.random.normal(jax.random.PRNGKey(1), (N, Ppts, 3)) * 2.0

    results = {}
    # 1-way point sharding (all devices on dp) vs max sp sharding.
    for sp in (1, min(4, n)):
        dp = n // sp
        mesh = make_mesh((dp, sp), ("dp", "sp"), devices=devices[: dp * sp])
        sh = NamedSharding(mesh, P("dp", "sp", None))
        tgt = jax.device_put(target, sh)
        s = jax.device_put(src, sh)
        t = step_time(mesh, tgt, s)
        results[f"dp{dp}_sp{sp}"] = t * 1e3
        print(json.dumps({"mesh": f"dp{dp}xsp{sp}", "step_ms": round(t * 1e3, 2)}))

    keys = list(results)
    record = {
        "backend": jax.default_backend(),
        "n_devices": n,
        "virtual": virtual,
        "batch": N,
        "points": Ppts,
        "step_ms": {k: round(v, 2) for k, v in results.items()},
    }
    if len(keys) == 2:
        # Same total devices, deeper point sharding: efficiency = t1/t2 per
        # the BASELINE's 1-host->N-host framing (equal global work).
        eff = results[keys[0]] / results[keys[1]]
        record["sp_scaling_ratio"] = round(eff, 3)
        print(json.dumps({"metric": "sp_scaling_ratio", "value": round(eff, 3),
                          "note": "(>1 means sp sharding helps at this size)"}))

    # Persist the config-5 artifact at the repo root.
    out = os.path.join(os.path.dirname(__file__), "..", "MULTIHOST_BENCH.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=2)
    print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
