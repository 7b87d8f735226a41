"""Pallas TPU kernel for bidirectional nearest-neighbor (chamfer) in ONE pass.

The chamfer loss needs knn(x, y, K=1) AND knn(y, x, K=1).  The reference —
and this repo through round 3 — streams the full O(P1*P2) distance work
twice, once per direction (reference functions/chamfer.py:134,318-330; two
CUDA kernel launches).  On TPU one streamed distance tile serves BOTH
directions: the row-wise (over y) minimum of a (T1, T2) tile advances the
x->y state while the column-wise (over x) minimum of the *same* tile
advances the y->x state — halving distance FLOPs, HBM reads, and grid steps.
This is a genuinely TPU-first redesign with no CUDA analog in the reference.

Layout (the ball-query orientation, kernels/ball_query_pallas.py): x points
on SUBLANES, y points on LANES.

* x->y state: (T1, 1) running (min, argmin) kept directly in the output
  blocks, which map on (n, i) and therefore stay VMEM-resident across the
  whole inner j sweep (the same revisit trick as the KNN kernel's top-K
  state).  Ascending-j strict-< merges keep the LOWEST y index on exact
  ties (MinK first-seen-wins, csrc/utils/mink.cuh:62-83); within a tile the
  argmin is recovered as the minimum masked f32 column id (dual-array folds
  SIGABRT Mosaic; value-only folds + one-hot id recovery are the proven
  workaround).

* y->x state: a lane-dense (nJ, T2) VMEM scratch pair (4 B/point — scratch
  persists across grid steps unconditionally).  Tile (i, j) sublane-reduces
  its column minima to a (1, T2) lane vector and merges it into scratch row
  j (dynamic sublane indexing, the chunked-FPS pattern); ascending-i
  strict-< again keeps the lowest x index.  Every visit flushes the merged
  row to the j-mapped output block — revisited output blocks are written
  back on each block change in grid order, so the final (i = I-1) write is
  the one that lands, and each flush writes the full block so no stale
  buffer contents ever escape.

Indices are carried as f32 in scratch/recovery (exact below 2**24; the
caller gates on that) because int min-reductions don't lower in Mosaic.

``lengths`` masking is two-sided and in-kernel: column minima exclude
x rows >= lengths1[n] and row minima exclude y columns >= lengths2[n].
Returns raw per-direction (dists, idx); the reference pad conventions
(knn.h:29-37) are applied by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_INF = float("inf")

# Tile shape: T1*T2 must stay at or below the measured ~1M-element Mosaic
# distance-tile cliff (ROOFLINE.md); swept on v5e in scripts/tune_chamfer.py.
DEFAULT_TILE_P1 = 512
DEFAULT_TILE_P2 = 2048


def _nn_bidir_kernel(
    lengths1_ref,  # scalar-prefetch SMEM (N,) int32
    lengths2_ref,  # scalar-prefetch SMEM (N,) int32
    p1_ref,  # VMEM (1, T1, D)
    p2t_ref,  # VMEM (1, D, T2) — y transposed: coords on sublanes
    xd_ref,  # VMEM out (1, T1, 1) f32 — x->y min dist (resident over j)
    xi_ref,  # VMEM out (1, T1, 1) int32 — x->y argmin (global y idx)
    yd_ref,  # VMEM out (1, 1, 1, T2) f32 — y->x min dist (flushed per visit)
    yi_ref,  # VMEM out (1, 1, 1, T2) int32
    ys_d,  # VMEM scratch (nJ, T2) f32 — y->x running min
    ys_i,  # VMEM scratch (nJ, T2) f32 — y->x running argmin (f32 ids)
    *,
    norm: int,
    tile_p1: int,
    tile_p2: int,
):
    n = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    T1, T2 = tile_p1, tile_p2

    x = p1_ref[0]  # (T1, D)
    yt = p2t_ref[0]  # (D, T2)
    D = yt.shape[0]

    # Exact f32 per-axis accumulation (reference knn.cu:100-109 numerics; no
    # bf16 MXU rounding, no |x|^2+|y|^2-2xy cancellation).
    d = jnp.zeros((T1, T2), jnp.float32)
    if norm == 2:
        for di in range(D):
            diff = x[:, di][:, None] - yt[di][None, :]
            d = d + diff * diff
    else:
        for di in range(D):
            d = d + jnp.abs(x[:, di][:, None] - yt[di][None, :])

    len1 = lengths1_ref[n]
    len2 = lengths2_ref[n]
    row = jax.lax.broadcasted_iota(jnp.int32, (T1, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T2), 1)
    row_f = row.astype(jnp.float32)
    col_f = col.astype(jnp.float32)
    xvalid = i * T1 + row < len1  # (T1, 1)
    yvalid = j * T2 + col < len2  # (1, T2)
    # ONE jointly-masked tile serves both directions: an invalid x ROW only
    # corrupts its own row minimum (a query the caller masks out anyway),
    # and an invalid y COLUMN only corrupts its own column minimum —
    # halving the full-tile select work vs separate dxy/dyx masks.
    dm = jnp.where(xvalid & yvalid, d, _INF)

    # ---- x -> y: row minima over the lane (y) axis ----
    rmin = jnp.min(dm, axis=1, keepdims=True)  # (T1, 1)
    ram = jnp.min(
        jnp.where(dm == rmin, col_f, 3e38), axis=1, keepdims=True
    )  # lowest matching column = lowest global y index

    @pl.when(j == 0)
    def _():
        xd_ref[0] = jnp.full((T1, 1), _INF, jnp.float32)
        xi_ref[0] = jnp.zeros((T1, 1), jnp.int32)

    prev_d = xd_ref[0]
    better = rmin < prev_d  # strict <: ascending j keeps first-seen (lowest)
    xd_ref[0] = jnp.where(better, rmin, prev_d)
    xi_ref[0] = jnp.where(
        better, j * T2 + ram.astype(jnp.int32), xi_ref[0]
    )

    # ---- y -> x: column minima over the sublane (x) axis ----
    cmin = jnp.min(dm, axis=0, keepdims=True)  # (1, T2)
    cam = jnp.min(
        jnp.where(dm == cmin, row_f, 3e38), axis=0, keepdims=True
    )
    gyi = i * T1 + cam  # f32 global x ids (exact < 2**24)

    @pl.when(i == 0)
    def _():
        ys_d[pl.ds(j, 1)] = cmin
        ys_i[pl.ds(j, 1)] = gyi

    @pl.when(i > 0)
    def _():
        pd = ys_d[pl.ds(j, 1)]
        bc = cmin < pd  # strict <: ascending i keeps the lowest x index
        ys_d[pl.ds(j, 1)] = jnp.where(bc, cmin, pd)
        ys_i[pl.ds(j, 1)] = jnp.where(bc, gyi, ys_i[pl.ds(j, 1)])

    # Flush the merged row every visit: the last (i = I-1) writeback is the
    # one that survives in HBM; full-block writes keep stale buffer contents
    # from ever escaping.
    merged_i = ys_i[pl.ds(j, 1)]
    yd_ref[0, 0] = ys_d[pl.ds(j, 1)]
    yi_ref[0, 0] = jnp.where(
        merged_i < 3e38, merged_i, 0.0
    ).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("norm", "tile_p1", "tile_p2", "interpret")
)
def chamfer_nn_bidirectional_pallas(
    p1: Array,
    p2: Array,
    lengths1: Array,
    lengths2: Array,
    norm: int = 2,
    tile_p1: int = None,
    tile_p2: int = None,
    interpret: bool = False,
) -> tuple[Array, Array, Array, Array]:
    """Both K=1 nearest-neighbor directions from one streamed distance pass.

    Args:
        p1: (N, P1, D) f32; p2: (N, P2, D) f32.
        lengths1 / lengths2: (N,) int32 valid counts per side.
        norm: 1 or 2 (squared L2).

    Returns:
        (d_xy (N, P1), i_xy (N, P1) int32, d_yx (N, P2), i_yx (N, P2) int32)
        — raw minima (inf where a side is fully masked); callers apply the
        reference pad conventions.
    """
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    if max(P1, P2) >= 2**24:
        raise ValueError(
            "chamfer_nn_bidirectional_pallas tracks indices as f32, exact "
            f"only below 2**24 points per cloud (got P1={P1}, P2={P2})."
        )
    if tile_p1 is None:
        tile_p1 = DEFAULT_TILE_P1
    if tile_p2 is None:
        tile_p2 = DEFAULT_TILE_P2
    # Sublane (x) tiles in multiples of 8, lane (y) tiles in multiples of
    # 128: Mosaic's native vreg tiling — non-multiples compile poorly or
    # not at all.
    tile_p1 = min(tile_p1, max(8, -(-P1 // 8) * 8))
    tile_p2 = min(tile_p2, max(128, -(-P2 // 128) * 128))
    P1pad = -(-P1 // tile_p1) * tile_p1
    P2pad = -(-P2 // tile_p2) * tile_p2
    if P1pad != P1:
        p1 = jnp.pad(p1, ((0, 0), (0, P1pad - P1), (0, 0)))
    if P2pad != P2:
        p2 = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0)))
    p2_t = jnp.swapaxes(p2, 1, 2)  # (N, D, P2pad)
    nI = P1pad // tile_p1
    nJ = P2pad // tile_p2

    kernel = functools.partial(
        _nn_bidir_kernel, norm=norm, tile_p1=tile_p1, tile_p2=tile_p2
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nI, nJ),
        in_specs=[
            pl.BlockSpec(
                (1, tile_p1, D), lambda n, i, j, *_: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, D, tile_p2), lambda n, i, j, *_: (n, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_p1, 1), lambda n, i, j, *_: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_p1, 1), lambda n, i, j, *_: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
            # y outputs are 4D (N, nJ, 1, T2) so the BLOCK's last two dims
            # (1, T2) equal the array's — a (1, 1, T2) block over a 3D
            # (N, nJ, T2) array violates the Mosaic block-shape rule
            # whenever nJ > 1 (second-minor 1 is neither divisible by 8 nor
            # equal to nJ).
            pl.BlockSpec(
                (1, 1, 1, tile_p2), lambda n, i, j, *_: (n, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, tile_p2), lambda n, i, j, *_: (n, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((nJ, tile_p2), jnp.float32),
            pltpu.VMEM((nJ, tile_p2), jnp.float32),
        ],
    )
    xd, xi, yd, yi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, P1pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, P1pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, nJ, 1, tile_p2), jnp.float32),
            jax.ShapeDtypeStruct((N, nJ, 1, tile_p2), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * P1pad * P2pad * D,
            bytes_accessed=4 * N * (P1pad * D + P2pad * D + 2 * (P1pad + P2pad)),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths1.astype(jnp.int32), lengths2.astype(jnp.int32), p1, p2_t)

    return (
        xd[:, :P1, 0],
        xi[:, :P1, 0],
        yd.reshape(N, P2pad)[:, :P2],
        yi.reshape(N, P2pad)[:, :P2],
    )


def _scatter_k1_kernel(
    idx_ref,  # VMEM (1, T1, 1) f32 — target index per contribution row
    ct_ref,  # VMEM (1, 8, T1) f32 — contributions, channels on sublanes
    out_ref,  # VMEM (1, 1, 8, T2) f32 — accumulated per-target sums
    *,
    tile_p1: int,
    tile_p2: int,
):
    i = pl.program_id(2)
    del i  # innermost: out block (n, j) stays resident across the i sweep
    j = pl.program_id(1)
    T1, T2 = tile_p1, tile_p2

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((8, T2), jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, T2), 1) + j * T2
    onehot = (idx_ref[0] == col.astype(jnp.float32)).astype(jnp.float32)
    # (8, T1) x (T1, T2) on the MXU; one-hot entries are exact 0/1 so the
    # products are exact and the fixed summation order is deterministic —
    # the TPU answer to knn.cu:514-515's nondeterministic atomicAdd.
    acc = jax.lax.dot_general(
        ct_ref[0],
        onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0, 0] += acc


@functools.partial(
    jax.jit, static_argnames=("P2", "tile_p1", "tile_p2", "interpret")
)
def scatter_add_k1_pallas(
    idx: Array,
    contrib: Array,
    P2: int = None,
    tile_p1: int = 512,
    tile_p2: int = 2048,
    interpret: bool = False,
) -> Array:
    """Deterministic segment-sum of per-row contributions into P2 targets
    via tiled ONE-HOT MATMULS on the MXU (SURVEY hard-part #4's one-hot
    option).  For K=1 gradients the one-hot work is O(P1*P2*C) — the same
    order as the forward distance pass — so this beats the serialized XLA
    scatter wherever the forward is already O(P1*P2).

    Args:
        idx: (N, P1) int32 target per row; NEGATIVE entries contribute
            nothing (callers also zero their contribution rows).
        contrib: (N, P1, C) f32, C <= 8.
        P2: number of targets (static).

    Returns: (N, P2, C) f32 sums.
    """
    if not isinstance(P2, int):
        raise ValueError("P2 must be a static int")
    N, P1 = idx.shape
    C = contrib.shape[2]
    if C > 8:
        raise ValueError(f"scatter_add_k1_pallas supports C <= 8 (got {C})")
    if max(P1, P2) >= 2**24:
        raise ValueError("indices tracked as f32: exact only below 2**24")
    tile_p1 = min(tile_p1, max(8, -(-P1 // 8) * 8))
    tile_p2 = min(tile_p2, max(128, -(-P2 // 128) * 128))
    P1pad = -(-P1 // tile_p1) * tile_p1
    P2pad = -(-P2 // tile_p2) * tile_p2
    idx_f = idx.astype(jnp.float32)[..., None]  # (N, P1, 1)
    if P1pad != P1:
        # -1 pads: matches no column, and the contrib rows are zero anyway.
        idx_f = jnp.pad(idx_f, ((0, 0), (0, P1pad - P1), (0, 0)),
                        constant_values=-1.0)
    ct = jnp.swapaxes(contrib, 1, 2)  # (N, C, P1)
    ct = jnp.pad(
        ct, ((0, 0), (0, 8 - C), (0, P1pad - P1))
    )  # (N, 8, P1pad)
    nI = P1pad // tile_p1
    nJ = P2pad // tile_p2

    kernel = functools.partial(
        _scatter_k1_kernel, tile_p1=tile_p1, tile_p2=tile_p2
    )
    out = pl.pallas_call(
        kernel,
        grid=(N, nJ, nI),
        in_specs=[
            pl.BlockSpec(
                (1, tile_p1, 1), lambda n, j, i: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, tile_p1), lambda n, j, i: (n, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, tile_p2), lambda n, j, i: (n, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, nJ, 8, tile_p2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * 8 * P1pad * P2pad,
            bytes_accessed=4 * N * (P1pad * 9 + P2pad * 8),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx_f, ct)
    out = jnp.moveaxis(out, 2, 3).reshape(N, P2pad, 8)
    return out[:, :P2, :C]
