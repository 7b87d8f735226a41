"""Distance-pass-only microbench: how to produce a (T2, T1) distance tile.

  ycols : y fed (T2, D); per-axis lane-column extracts    (67 ms @ 100k)
  y4d   : y fed (D, T2, 1); coords arrive sublane-resident
  xpose : compute (T1, T2) with cheap broadcasts, transpose in-kernel
  nat   : natural (T1, T2) layout, no transpose — the r1 floor (~32 ms)
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

_INF = float("inf")


def _kernel(l2_ref, p1t_ref, p2_ref, p2t_ref, p2c_ref, out_ref, *, tile_p2, mode):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.full(out_ref.shape, _INF, jnp.float32)

    xt = p1t_ref[0]      # (D, T1)
    D, T1 = xt.shape
    T2 = tile_p2
    len2 = l2_ref[pl.program_id(0)]

    if mode == "nat":
        y_t = p2t_ref[0]
        d = jnp.zeros((T1, T2), jnp.float32)
        for di in range(D):
            diff = xt[di][:, None] - y_t[di][None, :]
            d = d + diff * diff
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d = jnp.where(j * tile_p2 + col < len2, d, _INF)
        out_ref[0, 0] = jnp.minimum(out_ref[0][0], jnp.min(d, axis=1)[:128])
        return

    if mode == "ycols":
        y = p2_ref[0]
        d = jnp.zeros((T2, T1), jnp.float32)
        for di in range(D):
            diff = y[:, di][:, None] - xt[di][None, :]
            d = d + diff * diff
    elif mode == "y4d":
        d = jnp.zeros((T2, T1), jnp.float32)
        for di in range(D):
            diff = p2c_ref[0, di] - xt[di][None, :]   # (T2,1) - (1,T1)
            d = d + diff * diff
    else:  # xpose
        y_t = p2t_ref[0]
        dn = jnp.zeros((T1, T2), jnp.float32)
        for di in range(D):
            diff = xt[di][:, None] - y_t[di][None, :]
            dn = dn + diff * diff
        d = dn.T

    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    d = jnp.where(j * tile_p2 + row < len2, d, _INF)
    out_ref[0, 0] = jnp.minimum(out_ref[0][0], jnp.min(d, axis=0)[:128])


@functools.partial(jax.jit, static_argnames=("tile_p1", "tile_p2", "mode"))
def dist_only(p1, p2, lengths2, tile_p1=256, tile_p2=2048, mode="ycols"):
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    p1_t = jnp.swapaxes(p1, 1, 2)
    p2_t = jnp.swapaxes(p2, 1, 2)
    p2_c = p2_t[..., None]          # (N, D, P2, 1)
    grid = (N, P1 // tile_p1, P2 // tile_p2)
    kernel = functools.partial(_kernel, tile_p2=tile_p2, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, tile_p1), lambda n, i, j, _l: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p2, D), lambda n, i, j, _l: (n, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, tile_p2), lambda n, i, j, _l: (n, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, tile_p2, 1), lambda n, i, j, _l: (n, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda n, i, j, _l: (n, 0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, 1, P1 // tile_p1 * 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lengths2.astype(jnp.int32), p1_t, p2, p2_t, p2_c)
    return out


def _force(o):
    return float(jax.tree_util.tree_leaves(o)[0].sum())


if __name__ == "__main__":
    P = 100_352  # multiple of 2048 and 256
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)
    for mode in ("ycols", "y4d", "xpose", "nat"):
        try:
            f = lambda: dist_only(p1, p2, lengths, mode=mode)  # noqa: E731
            _force(f())
            t0 = time.time()
            for _ in range(3):
                _force(f())
            t = (time.time() - t0) / 3
            print(f"{mode:6s}: {t*1e3:7.1f} ms  {P/t:,.0f} q/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:6s}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
