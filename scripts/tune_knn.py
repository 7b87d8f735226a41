"""Micro-benchmark for the Pallas KNN kernel: tile sweep + ablations.

Run on a real TPU.  Measures the full kernel at several (TILE_P1, TILE_P2)
configs and a distance-only ablation (merge removed) to separate the
distance/streaming floor from the top-K merge cost.
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

from pytorch3d_pointops_tpu.kernels.knn_pallas import knn_forward_pallas

_INF = float("inf")


def _dist_only_kernel(lengths2_ref, p1_ref, p2_ref, out_d_ref, *, tile_p2):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_d_ref[...] = jnp.full(out_d_ref.shape, _INF, jnp.float32)

    x = p1_ref[0]
    y_t = p2_ref[0]  # (D, T2) transposed like the real kernel
    D = x.shape[1]
    d = jnp.zeros((x.shape[0], y_t.shape[1]), jnp.float32)
    for di in range(D):
        diff = x[:, di][:, None] - y_t[di][None, :]
        d = d + diff * diff
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    len2 = lengths2_ref[pl.program_id(0)]
    d = jnp.where(j * tile_p2 + col < len2, d, _INF)
    # reduce to a min so the distance compute can't be DCE'd
    out_d_ref[0] = jnp.minimum(out_d_ref[0], jnp.min(d, axis=1, keepdims=True))


def dist_only(p1, p2t, lengths2, tile_p1, tile_p2):
    N, P1, D = p1.shape
    P2 = p2t.shape[2]
    grid = (N, P1 // tile_p1, P2 // tile_p2)
    kernel = functools.partial(_dist_only_kernel, tile_p2=tile_p2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_p1, D), lambda n, i, j, _l: (n, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, tile_p2), lambda n, i, j, _l: (n, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p1, 1), lambda n, i, j, _l: (n, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, P1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lengths2, p1, p2t)
    return out


def _force(out):
    # block_until_ready is not sufficient under the axon tunnel backend;
    # pull one scalar to the host to force completion (like bench.py).
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args, iters=3):
    _force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _force(fn(*args))
    return (time.time() - t0) / iters


if __name__ == "__main__":
    P = 100_000
    K = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)

    # tile_p1 is the TOTAL query width per program; multiples of 128 split
    # into 128-lane chains (1024x1024 -> the r3-tuned 8x128 production
    # shape; see scripts/knn_r3.py for the full rounds A-G sweep record).
    for t1, t2 in [(1024, 1024), (512, 2048), (512, 1024), (256, 2048)]:
        # pad P to multiples handled inside knn_forward_pallas
        try:
            t_full = timeit(
                lambda a, b: knn_forward_pallas(a, b, lengths, K=K,
                                                tile_p1=t1, tile_p2=t2)[0],
                p1, p2)
            print(f"full  T1={t1:5d} T2={t2:5d}: {t_full*1e3:8.2f} ms  "
                  f"({P/t_full:,.0f} q/s)")
        except Exception as e:  # noqa: BLE001
            print(f"full  T1={t1:5d} T2={t2:5d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")

    if "--dist-floor" in sys.argv:
        for t1, t2 in [(256, 2048)]:
            P1pad = -(-P // t1) * t1
            P2pad = -(-P // t2) * t2
            p1p = jnp.pad(p1, ((0, 0), (0, P1pad - P), (0, 0)))
            p2p = jnp.swapaxes(
                jnp.pad(p2, ((0, 0), (0, P2pad - P), (0, 0))), 1, 2
            )
            t_d = timeit(
                jax.jit(functools.partial(dist_only, tile_p1=t1, tile_p2=t2),
                        static_argnames=()),
                p1p, p2p, lengths)
            print(f"dist  T1={t1:5d} T2={t2:5d}: {t_d*1e3:8.2f} ms  "
                  f"({P/t_d:,.0f} q/s)")
