"""Tile sweep + cost decomposition for the fused bidirectional chamfer path
at BASELINE config 3 (batch=16 x 10240 pts, normals+colors features).

Stages timed (R on-device repeats amortize the ~29 ms tunnel RTT):
  kernel      — the fused NN kernel alone (both directions, one pass)
  fwd_plain   — chamfer_distance forward, no features
  fwd_feats   — forward with normals+colors cosine terms
  fwdbwd_plain/fwdbwd_feats — + gradients w.r.t. both clouds

Run on the TPU; prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu import chamfer_distance
from pytorch3d_pointops_tpu.kernels.chamfer_pallas import (
    chamfer_nn_bidirectional_pallas,
)


def tmin(fn, *a, iters=3):
    out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    best = float("inf")
    for _i in range(iters):
        t0 = time.time()
        out = fn(*a)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.time() - t0)
    return best


def rep(fn, R=5):
    """R dependent on-device repeats inside one dispatch."""

    @jax.jit
    def run(*args):
        def body(i, acc):
            out = fn(args[0] + 1e-6 * i.astype(jnp.float32), *args[1:])
            return acc + jax.tree_util.tree_leaves(out)[0].sum() * 1e-9

        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    return run, R


def main():
    N, P = 16, 10240
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(k, 5), (N, P, 3))
    y = jax.random.normal(jax.random.fold_in(k, 6), (N, P, 3))
    ll = jnp.full((N,), P, jnp.int32)
    xf = {
        "normals": jax.random.normal(jax.random.fold_in(k, 7), (N, P, 3)),
        "colors": jax.random.uniform(jax.random.fold_in(k, 8), (N, P, 3)),
    }
    yf = {
        "normals": jax.random.normal(jax.random.fold_in(k, 9), (N, P, 3)),
        "colors": jax.random.uniform(jax.random.fold_in(k, 10), (N, P, 3)),
    }

    if os.environ.get("CHAMFER_SWEEP") == "1":
        for t1, t2 in [(512, 2048), (1024, 1024), (256, 2048), (512, 1024),
                       (2048, 512), (256, 4096)]:
            try:
                f, R = rep(
                    lambda a, b, t1=t1, t2=t2: chamfer_nn_bidirectional_pallas(
                        a, b, ll, ll, 2, t1, t2
                    )[0]
                )
                t = tmin(f, x, y) / R
                print(json.dumps({"tile": [t1, t2], "kernel_ms": round(t * 1e3, 2)}), flush=True)
            except Exception as e:  # compile OOM / cliff shapes
                print(json.dumps({"tile": [t1, t2], "error": str(e)[:100]}), flush=True)

    stages = {}
    f, R = rep(lambda a, b: chamfer_nn_bidirectional_pallas(a, b, ll, ll, 2)[0])
    stages["kernel"] = tmin(f, x, y) / R

    f, R = rep(lambda a, b: chamfer_distance(a, b)[0])
    stages["fwd_plain"] = tmin(f, x, y) / R

    def loss_feats(a, b):
        loss, lf = chamfer_distance(
            a, b, x_features=xf, y_features=yf,
            feature_names=["normals", "colors"],
        )
        return loss + lf["normals"] + lf["colors"]

    f, R = rep(loss_feats)
    stages["fwd_feats"] = tmin(f, x, y) / R

    vg_plain = jax.value_and_grad(
        lambda a, b: chamfer_distance(a, b)[0], argnums=(0, 1)
    )
    f, R = rep(lambda a, b: vg_plain(a, b)[0])
    stages["fwdbwd_plain"] = tmin(f, x, y) / R

    vg = jax.value_and_grad(loss_feats, argnums=(0, 1))
    f, R = rep(lambda a, b: vg(a, b)[0])
    stages["fwdbwd_feats"] = tmin(f, x, y) / R

    for name, t in stages.items():
        print(
            json.dumps(
                {"stage": name, "ms": round(t * 1e3, 2),
                 "pairs_per_s": round(N * P / t)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
