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

* ``fps_pallas_chunked`` — past the dense8 VMEM cap: only the 4 B/point
  min-dist buffer stays resident; dense8-packed point slabs stream from
  HBM once per round over a (N, max_K, nchunks) grid (Pallas
  double-buffers the slab DMA), and per-chunk (max, argmax, coords)
  partials replace any cross-chunk gather.  Measured on v5e: 3M pts
  K=2048 in 398 ms, 4M/K=2048 in 465 ms, 8M/K=1024 in 445 ms — the XLA
  fallback extrapolates to ~30 s at 4M.

Selection semantics in all three: the per-round argmax resolves ties to the
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
# Chunked-kernel gate: only the 4 B/point min-dist buffer stays VMEM-resident
# (64 MB at the cap); the point slabs re-stream from HBM every round.
MAX_CHUNKED_POINTS = 16 * 1024 * 1024
# Per-chunk slab budget (bytes of point data; double-buffered by pipelining).
_CHUNK_BYTES = 6 * 1024 * 1024
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


def _fps_chunked_kernel(
    lengths_ref,  # scalar-prefetch SMEM (N,) int32
    k_ref,        # scalar-prefetch SMEM (N,) int32
    start_ref,    # scalar-prefetch SMEM (N,) int32
    pts_ref,      # VMEM (1, 1, D*8, P8c) — chunk j's dense8 slab
    out_i_ref,    # VMEM (1, 1, max_K) int32
    min_d_ref,    # VMEM scratch (nchunks, 8, P8c) f32 — the ONLY full-P state
    part_ref,     # VMEM scratch (2, 8, CP) f32 — double-buffered partials
    *,
    max_K: int,
    D: int,
    nchunks: int,
):
    # Cross-round state is ONLY min_d plus the (max, argmax, coords) partial
    # column each chunk publishes per round.  The previous round's winner is
    # re-derived by every program from the other partial slot as rank-0
    # scalars — Mosaic supports scalar->tile broadcasts but NOT (1,1)-tile
    # broadcasts into both sublanes and lanes, so no coordinate buffer is
    # ever read back as a vector.
    n = pl.program_id(0)
    k = pl.program_id(1)
    j = pl.program_id(2)
    P8c = pts_ref.shape[3]
    CB = 8 * P8c  # points per chunk
    length = lengths_ref[n]
    k_n = jnp.minimum(length, k_ref[n])
    start = start_ref[n]
    slot_w = jax.lax.rem(k, 2)
    slot_r = jax.lax.rem(k + 1, 2)

    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, P8c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, P8c), 1)
    # Packing preserves the linear point index: p = j*CB + row*P8c + col.
    g_iota = j * CB + row8 * P8c + col
    g_iota_f = g_iota.astype(jnp.float32)
    valid = g_iota < length
    pts = pts_ref[0, 0]  # (D*8, P8c)

    lane_c = jax.lax.broadcasted_iota(jnp.int32, part_ref.shape[1:], 1)
    row_c = jax.lax.broadcasted_iota(jnp.int32, part_ref.shape[1:], 0)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, out_i_ref.shape[1:], 1)

    def publish(slot, m, arg_f, onehot):
        """Write (m, arg, coords-of-onehot-point) into partial column j."""
        vals = [m, arg_f]
        for d in range(D):
            vals.append(
                jnp.sum(jnp.where(onehot, pts[d * 8 : (d + 1) * 8], 0.0))
            )
        pr = part_ref[slot]
        upd = lane_c == j
        for r, v in enumerate(vals):
            pr = jnp.where(upd & (row_c == r), v, pr)
        part_ref[slot] = pr

    def read_winner(slot):
        """Reduce a partial slot to the global (argmax, coords) scalars.
        Chunks partition by increasing global index, so 'first maximal
        global index' = the smallest chunk attaining the max (each chunk's
        own argmax already being chunk-first-max)."""
        pr2 = part_ref[slot]
        mrow = jnp.where(row_c == 0, pr2, -_INF)
        gmax = jnp.max(mrow)
        win_f = jnp.min(
            jnp.where(mrow == gmax, lane_c.astype(jnp.float32), 3e38)
        )
        sel_mask = lane_c == win_f.astype(jnp.int32)
        garg_f = jnp.sum(jnp.where(sel_mask & (row_c == 1), pr2, 0.0))
        coords = [
            jnp.sum(jnp.where(sel_mask & (row_c == 2 + d), pr2, 0.0))
            for d in range(D)
        ]
        return garg_f, coords

    @pl.when(k == 0)
    def _():
        min_d_ref[j] = jnp.where(valid, _INF, -1.0)

        @pl.when(j == 0)
        def _():
            part_ref[...] = jnp.full(part_ref.shape, -_INF, jnp.float32)
            idx0 = jnp.where(k_n > 0, start, -1)
            out_i_ref[0] = jnp.where(out_lane == 0, idx0, -1)

        # Pseudo-partial for the start selection: the owning chunk writes a
        # finite max (0.0) + the start point's coords into slot 0; other
        # chunks stay -inf so round 1's read_winner resolves to the owner.
        @pl.when((j * CB <= start) & (start < (j + 1) * CB) & (k_n > 0))
        def _():
            publish(0, 0.0, start.astype(jnp.float32), g_iota == start)

    @pl.when((k > 0) & (k < k_n))
    def _():
        _, sel_c = read_winner(slot_r)  # round k-1's winner, as scalars
        d2 = jnp.zeros((8, P8c), jnp.float32)
        for d in range(D):
            diff = pts[d * 8 : (d + 1) * 8] - sel_c[d]
            d2 = d2 + diff * diff
        md = jnp.minimum(min_d_ref[j], jnp.where(valid, d2, -1.0))
        min_d_ref[j] = md
        m = jnp.max(md)
        larg = jnp.min(jnp.where(md == m, g_iota_f, 3e38))  # first max
        publish(slot_w, m, larg, g_iota_f == larg)

        @pl.when(j == nchunks - 1)
        def _():
            garg_f, _ = read_winner(slot_w)
            out_i_ref[0] = jnp.where(
                out_lane == k, garg_f.astype(jnp.int32), out_i_ref[0]
            )


@functools.partial(
    jax.jit, static_argnames=("max_K", "chunk_points", "interpret")
)
def fps_pallas_chunked(
    points: Array,
    lengths: Array,
    K: Array,
    start_idxs: Array,
    max_K: int,
    chunk_points: int = 0,
    interpret: bool = False,
) -> Array:
    """FPS for clouds past the dense8 VMEM cap (> ~2M points at D=3).

    Only the 4 B/point running min-dist buffer is VMEM-resident; the points
    stream from HBM in dense8-packed chunk slabs once per selection round
    (grid (N, max_K, nchunks), Pallas double-buffers the slab DMA).  Each
    chunk publishes its round (max, argmax, winner-coords) partial; the last
    chunk reduces them, so no dynamic cross-chunk gather is ever needed.
    Tie-breaks match the reference exactly: chunk-first max within a slab,
    smallest winning chunk across slabs = global first max
    (std::max_element semantics, sample_farthest_points_cpu.cpp:91-92).

    Args mirror ``fps_pallas``; ``chunk_points`` (0 = auto from the 6 MB
    slab budget) must be a multiple of 1024.
    Returns idx (N, max_K) int32, -1-padded.
    """
    N, P, D = points.shape
    if 2 + D > 8:
        # The per-chunk partials buffer carries (max, argmax, D coords) on
        # its 8 sublane rows; D > 6 coords would be silently dropped.
        raise ValueError(
            f"fps_pallas_chunked supports D <= 6 (got D={D}): the partials "
            "slab holds max+argmax+coords in 8 sublane rows. Use impl='xla'."
        )
    if max_K == 0:
        return jnp.zeros((N, 0), jnp.int32)
    if chunk_points == 0:
        chunk_points = max(1024, (_CHUNK_BYTES // (D * 4)) // 1024 * 1024)
    if chunk_points % 1024:
        raise ValueError("chunk_points must be a multiple of 1024")
    nchunks = -(-P // chunk_points)
    P8c = chunk_points // 8
    Ppad = nchunks * chunk_points
    if Ppad != P:
        points = jnp.pad(points, ((0, 0), (0, Ppad - P), (0, 0)))
    pts8 = points.reshape(N, nchunks, 8, P8c, D)
    pts8 = jnp.moveaxis(pts8, 4, 2).reshape(N, nchunks, D * 8, P8c)

    kernel = functools.partial(
        _fps_chunked_kernel, max_K=max_K, D=D, nchunks=nchunks
    )
    cp = max(128, nchunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, max_K, nchunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, D * 8, P8c), lambda n, k, j, *_: (n, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, max_K), lambda n, k, j, *_: (n, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((nchunks, 8, P8c), jnp.float32),
            pltpu.VMEM((2, 8, cp), jnp.float32),
        ],
    )
    out3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, max_K), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * max_K * Ppad * D,
            bytes_accessed=4 * N * max_K * Ppad * D,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
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
