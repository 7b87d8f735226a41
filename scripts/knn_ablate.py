"""HISTORICAL (round 1): ablation timing for the r1 NATURAL-layout KNN kernel
cost model (produces WRONG results on purpose — timing only).  The shipped
kernel is the r2 transposed multi-chain design; its ablations live in
scripts/knn_r2_transposed.py (stop modes).  Kept for the r1 measurement
record in CLAUDE.md:

  mode="screen"  : distance + admission screen, no extraction/merge
  mode="cap1"    : extraction capped at 1 sweep/tile
  mode="cap4"    : extraction capped at 4 sweeps/tile
  mode="full"    : the real algorithm (matches kernels/knn_pallas.py)
  mode="nomerge" : full sweeps, merge_topk skipped

Fits: fixed screen cost, per-sweep cost, merge cost.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch3d_pointops_tpu.kernels.knn_pallas import _merge_topk

_INF = float("inf")


def _kernel(l2_ref, p1_ref, p2_ref, od_ref, oi_ref, dw_ref, cd_ref, ci_ref,
             *, K, tile_p2, mode):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        od_ref[...] = jnp.full(od_ref.shape, _INF, jnp.float32)
        oi_ref[...] = jnp.zeros(oi_ref.shape, jnp.int32)

    x = p1_ref[0]
    y_t = p2_ref[0]
    D = x.shape[1]
    T1, T2 = x.shape[0], y_t.shape[1]
    d = jnp.zeros((T1, T2), jnp.float32)
    for di in range(D):
        diff = x[:, di][:, None] - y_t[di][None, :]
        d = d + diff * diff
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(j * tile_p2 + col < l2_ref[pl.program_id(0)], d, _INF)

    state_d = od_ref[0]
    thresh = state_d[:, K - 1][:, None]
    win = d < thresh
    maxc = jnp.minimum(jnp.max(jnp.sum(win.astype(jnp.int32), axis=1)), K)
    if mode == "screen":
        # keep the screen live via a cheap state poke
        od_ref[0] = jnp.where(maxc > 0, state_d - 0.0, state_d)
        return
    if mode == "cap1":
        maxc = jnp.minimum(maxc, 1)
    elif mode == "cap4":
        maxc = jnp.minimum(maxc, 4)

    @pl.when(maxc > 0)
    def _():
        dw_ref[...] = jnp.where(win, d, _INF)
        cd_ref[...] = jnp.full(cd_ref.shape, _INF, jnp.float32)
        for k in range(K):
            @pl.when(k < maxc)
            def _(k=k):
                dw = dw_ref[...]
                m = jnp.min(dw, axis=1)
                am = jnp.argmin(dw, axis=1).astype(jnp.int32)
                cd_ref[:, k] = m
                ci_ref[:, k] = j * tile_p2 + am
                @pl.when(k + 1 < maxc)
                def _():
                    dw_ref[...] = jnp.where(col == am[:, None], _INF, dw)
        if mode == "nomerge":
            od_ref[0] = jnp.minimum(state_d, cd_ref[...])
        else:
            cand_d = jnp.concatenate([state_d, cd_ref[...]], axis=1)
            cand_i = jnp.concatenate([oi_ref[0], ci_ref[...]], axis=1)
            nd, ni = _merge_topk(cand_d, cand_i, K)
            od_ref[0] = nd
            oi_ref[0] = ni


def run(p1, p2t, lengths2, K, t1, t2, mode):
    N, P1, D = p1.shape
    P2 = p2t.shape[2]
    kernel = functools.partial(_kernel, K=K, tile_p2=t2, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, P1 // t1, P2 // t2),
        in_specs=[
            pl.BlockSpec((1, t1, D), lambda n, i, j, _l: (n, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, t2), lambda n, i, j, _l: (n, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t1, K), lambda n, i, j, _l: (n, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t1, K), lambda n, i, j, _l: (n, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t1, t2), jnp.float32),
            pltpu.VMEM((t1, K), jnp.float32),
            pltpu.VMEM((t1, K), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, P1, K), jnp.float32),
            jax.ShapeDtypeStruct((N, P1, K), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lengths2, p1, p2t)


def _force(o):
    return float(jax.tree_util.tree_leaves(o)[0].sum())


if __name__ == "__main__":
    P, K, T1, T2 = 100_000, 16, 64, 4096
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    P1p = -(-P // T1) * T1
    P2p = -(-P // T2) * T2
    p1 = jnp.pad(jax.random.normal(k1, (1, P, 3)), ((0, 0), (0, P1p - P), (0, 0)))
    p2t = jnp.swapaxes(
        jnp.pad(jax.random.normal(k2, (1, P, 3)), ((0, 0), (0, P2p - P), (0, 0))),
        1, 2)
    lengths = jnp.asarray([P], jnp.int32)

    for mode in ("screen", "cap1", "cap4", "nomerge", "full"):
        f = jax.jit(functools.partial(run, K=K, t1=T1, t2=T2, mode=mode))
        _force(f(p1, p2t, lengths))
        t0 = time.time()
        for _ in range(3):
            _force(f(p1, p2t, lengths))
        t = (time.time() - t0) / 3
        print(f"{mode:8s}: {t*1e3:8.2f} ms")
