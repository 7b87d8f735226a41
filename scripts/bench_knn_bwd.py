"""KNN backward at 1M x 1M: the SURVEY hard-part #4 tradeoff study.

The backward is a deterministic segment-sum of N*P1*K contributions into
grad_p2 (the TPU replacement for knn.cu:467-517's atomicAdd).  Candidates:

  scatter  — the shipped XLA ``.at[idx].add`` (ops/knn.py knn_backward)
  sorted   — argsort contributions by target index first, then scatter with
             ``indices_are_sorted=True`` (sort-based segment-sum)
  segsum   — ``jax.ops.segment_sum`` (XLA's own lowering of the same)
  onehot   — tiled one-hot matmul on the MXU: REJECTED on paper for 1M —
             contributions x P2 one-hot work is O(P1*K*P2) = 1.6e13 MXU
             flops at the flagship config, ~1000x the scatter's useful work.

Round-4 additions (attacking the scatter's serialization, not its traffic):

  inbounds — same scatter with ``mode="promise_in_bounds"`` (drops the
             clamp/select XLA otherwise wraps around every update)
  ksplit   — K independent scatters of P1 updates each into K private
             (P2, D) buffers, tree-summed: shorter per-op dependency
             chains, same total updates
  dup8     — 8-way split over the flattened contribution stream into 8
             private buffers, summed: like ksplit but split-axis-agnostic
  pad8     — single scatter with D padded 3 -> 8 (sublane-aligned update
             rows; 2.7x the update traffic but aligned)

Also times the backward's non-scatter pieces (gather + diff + grad_p1) in
isolation so the scatter's true share is measured, not assumed.
Prints one JSON line per measurement; run on the TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu.ops import knn as knn_mod


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


def backward_variants(p1, p2, lengths1, lengths2, idx, grad_dists, variant):
    """knn_backward with the grad_p2 scatter swapped per variant."""
    N, P1, K = idx.shape
    D = p1.shape[2]
    valid = (
        (jnp.arange(P1, dtype=jnp.int32)[None, :, None] < lengths1[:, None, None])
        & (jnp.arange(K, dtype=jnp.int32)[None, None, :] < lengths2[:, None, None])
        & (idx >= 0)
    )
    safe_idx = jnp.where(idx >= 0, idx, 0)
    p2_g = jnp.take_along_axis(
        p2[:, :, None, :], safe_idx.reshape(N, -1, 1, 1), axis=1
    ).reshape(N, P1, K, D)
    diff = 2.0 * grad_dists[..., None] * (p1[:, :, None, :] - p2_g)
    diff = jnp.where(valid[..., None], diff, 0.0)
    grad_p1 = diff.sum(axis=2)
    P2 = p2.shape[1]

    if variant == "nograd2":
        return grad_p1

    def scatter_one(i, v):
        fl = i.reshape(-1)
        vf = (-v).reshape(-1, D)
        if variant == "scatter":
            return jnp.zeros((P2, D), jnp.float32).at[fl].add(vf)
        if variant == "sorted":
            order = jnp.argsort(fl)
            return (
                jnp.zeros((P2, D), jnp.float32)
                .at[fl[order]]
                .add(vf[order], indices_are_sorted=True, unique_indices=False)
            )
        if variant == "segsum":
            return jax.ops.segment_sum(vf, fl, num_segments=P2)
        if variant == "inbounds":
            return (
                jnp.zeros((P2, D), jnp.float32)
                .at[fl]
                .add(vf, mode="promise_in_bounds")
            )
        if variant == "ksplit":
            # K independent scatters (one per neighbor rank) into private
            # buffers; XLA may overlap their shorter dependency chains.
            per_k = jax.vmap(
                lambda col_i, col_v: jnp.zeros((P2, D), jnp.float32)
                .at[col_i]
                .add(col_v, mode="promise_in_bounds")
            )(i.reshape(-1, K).T, (-v).reshape(-1, K, D).transpose(1, 0, 2))
            return per_k.sum(axis=0)
        if variant == "dup8":
            S = 8
            fs = fl.reshape(S, -1)
            vs = vf.reshape(S, -1, D)
            per_s = jax.vmap(
                lambda si, sv: jnp.zeros((P2, D), jnp.float32)
                .at[si]
                .add(sv, mode="promise_in_bounds")
            )(fs, vs)
            return per_s.sum(axis=0)
        if variant == "pad8":
            vp = jnp.pad(vf, ((0, 0), (0, 8 - D)))
            return (
                jnp.zeros((P2, 8), jnp.float32)
                .at[fl]
                .add(vp, mode="promise_in_bounds")[:, :D]
            )
        raise ValueError(variant)

    grad_p2 = jax.vmap(scatter_one)(safe_idx, diff)
    return grad_p1, grad_p2


def main():
    P = int(os.environ.get("BWD_P", "1000000"))
    K = 16
    k = jax.random.PRNGKey(0)
    p1 = jax.random.normal(jax.random.fold_in(k, 1), (1, P, 3), jnp.float32)
    p2 = jax.random.normal(jax.random.fold_in(k, 2), (1, P, 3), jnp.float32)
    ll = jnp.asarray([P], jnp.int32)

    fwd = jax.jit(lambda a, b: knn_mod._knn_points_core(a, b, ll, ll, K, 2, "auto"))
    dists, idx = fwd(p1, p2)
    idx = jax.block_until_ready(idx)
    g = jnp.ones_like(dists)

    results = {}
    variants = os.environ.get(
        "BWD_VARIANTS", "nograd2,scatter,sorted,segsum"
    ).split(",")
    for variant in variants:
        f = jax.jit(
            lambda a, b, i, gg, v=variant: backward_variants(
                a, b, ll, ll, i, gg, v
            )
        )
        t = tmin(f, p1, p2, idx, g)
        results[variant] = t
        print(json.dumps({"variant": variant, "ms": round(t * 1e3, 1)}), flush=True)

    # the full fwd+bwd number the BENCH_DETAIL config records
    fb = jax.jit(
        jax.value_and_grad(
            lambda a, b: knn_mod.knn_points(a, b, K=K).dists.sum(), argnums=(0, 1)
        )
    )
    t_fb = tmin(fb, p1, p2, iters=1)
    print(json.dumps({"variant": "full_fwdbwd", "ms": round(t_fb * 1e3, 1)}), flush=True)
    base = results["scatter"] - results["nograd2"]
    print(
        json.dumps(
            {
                "scatter_only_ms": round(base * 1e3, 1),
                "note": "scatter cost net of the gather/diff/grad_p1 work "
                "every variant shares",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
