"""Pallas TPU kernels for iterative farthest point sampling.

TPU-native counterpart of the CUDA one-block-per-cloud kernel
(csrc/sample_farthest_points/sample_farthest_points.cu:19-104).  Two kernels
cover the two shapes of the problem:

* ``fps_pallas_batched`` — many clouds, moderate P (the PointNet++ set-
  abstraction shape).  ALL clouds advance through each selection round
  together: buffers are (N, P) — clouds on sublanes, points on lanes — so
  one round is a handful of dense 2D vector ops for the whole batch instead
  of N sequential per-cloud programs.  FPS rounds are tiny; batching them
  amortizes the per-op dispatch overhead that dominated the grid-(N,)
  design (round 1 ran 32 clouds x 511 rounds sequentially).

* ``fps_pallas`` — per-cloud grid for big clouds.  Points are packed
  **sublane-dense** as (D*8, P/8) and the running ``min_point_dist`` buffer
  as (8, P/8): 16 B/point of VMEM (vs ~64 B/point for the r1 (D, P)/(1, P)
  layout whose single-sublane rows wasted 7/8 of each tile).  With the
  per-kernel ``vmem_limit_bytes`` raised, clouds up to 2M points stay
  VMEM-resident across all K rounds — the XLA fori_loop fallback re-streams
  P*12 B from HBM per round; this kernel reads HBM once per cloud.

Selection semantics in both: the per-round argmax resolves ties to the
FIRST maximal index (expressed as a min over max-masked point ids),
matching ``std::max_element`` in the CPU reference
(sample_farthest_points_cpu.cpp:91-92) and our XLA/naive twins.

The kernels return indices only; the differentiable point gather happens in
the caller exactly like the reference (functions/sample_farthest_points.py:94).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_INF = float("inf")

# Per-cloud VMEM cap for the dense8 kernel: 16 B/point against the raised
# 100 MB vmem_limit_bytes.  Measured on v5e: 2M points compiles and runs
# (~50 ms/1024 rounds); 4M exceeds the compiler's stack budget.
MAX_VMEM_POINTS = 2 * 1024 * 1024
# Batched-kernel gate: total points across the batch (buffers are (N, P)).
MAX_BATCHED_ELEMS = 4 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _fps_batched_kernel(
    pts_ref,     # VMEM (D, N, P) f32
    lengths_ref,  # VMEM (N, 1) int32
    k_ref,       # VMEM (N, 1) int32
    start_ref,   # VMEM (N, 1) int32
    out_i_ref,   # VMEM (N, max_K) int32
    min_d_ref,   # VMEM scratch (N, P) f32
    *,
    max_K: int,
):
    D = pts_ref.shape[0]
    N, P = min_d_ref.shape
    lengths = lengths_ref[...]          # (N, 1)
    k_n = jnp.minimum(lengths, k_ref[...])
    start = start_ref[...]              # (N, 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
    valid = lane < lengths
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (N, max_K), 1)

    idx0 = jnp.where(k_n > 0, start, -1)  # (N, 1)
    out_i_ref[...] = jnp.where(out_lane == 0, idx0, -1)
    min_d_ref[...] = jnp.where(valid, _INF, -1.0)

    def round_fn(i, last):
        # last: (N, 1) int32 — per-cloud previously selected point.
        onehot = lane == last
        d2 = jnp.zeros((N, P), jnp.float32)
        for d in range(D):
            pts_d = pts_ref[d]          # (N, P)
            coord = jnp.sum(
                jnp.where(onehot, pts_d, 0.0), axis=1, keepdims=True
            )
            diff = pts_d - coord
            d2 = d2 + diff * diff
        min_d_ref[...] = jnp.minimum(
            min_d_ref[...], jnp.where(valid, d2, -1.0)
        )
        md = min_d_ref[...]
        m = jnp.max(md, axis=1, keepdims=True)
        # First maximal index (reference argmax tie-break).
        nxt = jnp.min(jnp.where(md == m, lane, P), axis=1, keepdims=True)
        active = i < k_n
        out_i_ref[...] = jnp.where(
            out_lane == i, jnp.where(active, nxt, -1), out_i_ref[...]
        )
        return jnp.where(active, nxt, last)

    jax.lax.fori_loop(1, max_K, round_fn, jnp.maximum(idx0, 0))


@functools.partial(jax.jit, static_argnames=("max_K", "interpret"))
def fps_pallas_batched(
    points: Array,
    lengths: Array,
    K: Array,
    start_idxs: Array,
    max_K: int,
    interpret: bool = False,
) -> Array:
    """Batched FPS: one kernel advances every cloud through each round.

    Args: points (N, P, D) f32 natural layout; lengths/K/start_idxs (N,).
    Returns idx (N, max_K) int32, -1-padded past min(K[n], lengths[n]).
    """
    N, P, D = points.shape
    if max_K == 0:
        return jnp.zeros((N, 0), jnp.int32)
    pts_t = jnp.moveaxis(points, 2, 0)  # (D, N, P)
    col = lambda x: x.astype(jnp.int32).reshape(N, 1)  # noqa: E731

    kernel = functools.partial(_fps_batched_kernel, max_K=max_K)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((D, N, P), lambda _: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda _: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda _: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda _: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (N, max_K), lambda _: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, max_K), jnp.int32),
        scratch_shapes=[pltpu.VMEM((N, P), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * N * max_K * P * D,
            bytes_accessed=4 * N * (D * P + max_K),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(pts_t, col(lengths), col(K), col(start_idxs))
    return out


def _fps_dense8_kernel(
    lengths_ref,  # scalar-prefetch SMEM (N,) int32
    k_ref,        # scalar-prefetch SMEM (N,) int32
    start_ref,    # scalar-prefetch SMEM (N,) int32
    pts_ref,      # VMEM (1, D*8, P8) f32 (sublane-dense packing)
    out_i_ref,    # VMEM (1, 1, max_K) int32
    min_d_ref,    # VMEM scratch (8, P8) f32
    *,
    max_K: int,
    D: int,
):
    n = pl.program_id(0)
    P8 = pts_ref.shape[2]
    length = lengths_ref[n]
    k_n = jnp.minimum(length, k_ref[n])
    start = start_ref[n]

    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, P8), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, P8), 1)
    # Host packs point p at (row = p // P8, col = p % P8) — a plain reshape.
    p_iota = row8 * P8 + col
    valid = p_iota < length
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, max_K), 1)

    idx0 = jnp.where(k_n > 0, start, -1)
    out_i_ref[0] = jnp.where(out_lane == 0, idx0, -1)
    min_d_ref[...] = jnp.where(valid, _INF, -1.0)

    pts = pts_ref[0]  # (D*8, P8)

    def round_fn(i, last):
        onehot = p_iota == last  # (8, P8)
        d2 = jnp.zeros((8, P8), jnp.float32)
        for d in range(D):
            pts_d = pts[d * 8 : (d + 1) * 8]
            coord = jnp.sum(jnp.where(onehot, pts_d, 0.0))
            diff = pts_d - coord
            d2 = d2 + diff * diff
        min_d_ref[...] = jnp.minimum(
            min_d_ref[...], jnp.where(valid, d2, -1.0)
        )
        md = min_d_ref[...]
        m = jnp.max(md)
        nxt = jnp.min(jnp.where(md == m, p_iota, 8 * P8))  # first max
        active = i < k_n
        out_i_ref[0] = jnp.where(
            out_lane == i, jnp.where(active, nxt, -1), out_i_ref[0]
        )
        return jnp.where(active, nxt, last)

    jax.lax.fori_loop(1, max_K, round_fn, jnp.maximum(idx0, 0))


@functools.partial(jax.jit, static_argnames=("max_K", "interpret"))
def fps_pallas(
    points: Array,
    lengths: Array,
    K: Array,
    start_idxs: Array,
    max_K: int,
    interpret: bool = False,
) -> Array:
    """Farthest point sampling indices on TPU, one grid program per cloud.

    Args:
        points: (N, P, D) f32 clouds (natural layout; packed internally).
        lengths: (N,) int32 valid lengths.
        K: (N,) int32 per-cloud sample counts.
        start_idxs: (N,) int32 starting indices.
        max_K: static max of K (output width).

    Returns:
        idx: (N, max_K) int32, -1-padded past min(K[n], lengths[n]).
    """
    N, P, D = points.shape
    if max_K == 0:
        return jnp.zeros((N, 0), jnp.int32)

    # Pack each cloud sublane-dense: (P,) -> (8, P8) row-major.
    P8 = -(-P // 1024) * 128
    Ppad = P8 * 8
    if Ppad != P:
        points = jnp.pad(points, ((0, 0), (0, Ppad - P), (0, 0)))
    pts8 = points.reshape(N, 8, P8, D)
    pts8 = jnp.moveaxis(pts8, 3, 1).reshape(N, D * 8, P8)

    kernel = functools.partial(_fps_dense8_kernel, max_K=max_K, D=D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(
                (1, D * 8, P8), lambda n, *_: (n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, max_K), lambda n, *_: (n, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((8, P8), jnp.float32)],
    )
    out3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, max_K), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * max_K * Ppad * D,
            bytes_accessed=4 * N * (D * Ppad + max_K),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        K.astype(jnp.int32),
        start_idxs.astype(jnp.int32),
        pts8,
    )
    return out3[:, 0]
