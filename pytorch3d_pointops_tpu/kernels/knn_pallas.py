"""Pallas TPU kernel for brute-force KNN with streaming top-K selection.

The TPU-native replacement for the reference's four CUDA kernel variants
(csrc/knn/knn.cu:28-312).  Design:

* Grid ``(N, P1/TILE_P1, P2/TILE_P2)`` with the P2 axis innermost.  Each
  program computes a (TILE_P1, TILE_P2) distance tile — the L2 path uses the
  ``|x|^2 + |y|^2 - 2 x.y^T`` expansion so the cross term rides the MXU — and
  merges it into a running (TILE_P1, K) top-K state.
* The running state lives in the *output VMEM block*: consecutive P2 grid
  steps map to the same output block, which Pallas keeps resident, so the
  selection state never round-trips to HBM (the VMEM analog of the CUDA
  kernels' register-resident MinK, csrc/utils/mink.cuh:41-126).
* Top-K merge is **threshold-screened and group-batched**: the carried state
  is kept sorted, so its last column is the kth-smallest distance seen so
  far.  Each tile first computes, in one cheap pass, which candidates
  strictly beat that threshold (the MinK ``dist < max`` admission test,
  csrc/utils/mink.cuh:62-83); when none do — the overwhelmingly common case
  once enough points have streamed past, for the same reason the CUDA MinK's
  O(K) replace-max scan amortizes to O(1) — the tile costs one extra pass.
  Otherwise the survivors are extracted by K statically-unrolled min+argmin
  sweeps over a VMEM scratch buffer, each predicated on
  ``k < max_row_winners`` so a tile only pays for the admissions it
  actually has; each winner is inserted into the sorted state directly
  (rank + shift).  Ties keep the earlier-seen entry, preserving the
  reference's first-seen-wins + ascending-sort semantics
  (functions/knn.py:77-89).
* ``lengths2`` ragged masking happens in-kernel from an SMEM scalar;
  lengths1/row masking is applied by the caller (ops/knn.py
  ``_apply_pad_conventions``), mirroring the split in the reference.

Memory: one P1 tile of queries + one P2 tile of references + the (TILE_P1,
K + TILE_P2) candidate buffers; everything else streams, so P1/P2 are
unbounded (1M x 1M works in ~TILE-sized VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_INF = float("inf")  # plain float: jnp constants would be captured as operands

# Tuned on TPU v5e (scripts/tune_knn.py, N=M=100k K=16): with folded
# extraction the per-winner sweep cost no longer scales with TILE_P2, so
# large row tiles win — (256, 2048) = 535k q/s vs 402k at (64, 2048);
# (384+, 2048) and (128+, 4096) exceed VMEM at compile.
DEFAULT_TILE_P1 = 256
DEFAULT_TILE_P2 = 2048


def _fold_width(tile_p2: int) -> int:
    """Width of the folded group-minima buffer: halve while even, down to
    256 lanes (2 vregs) — the sweet spot between fold cost and sweep cost."""
    w = tile_p2
    while w % 2 == 0 and w > 256:
        w //= 2
    return w


def _merge_topk(cand_d: Array, cand_i: Array, K: int):
    """K-pass min-extraction: returns (TILE_P1, K) ascending dists + idx.

    Each pass takes the row-min (first occurrence on ties), recovers its
    index via a one-hot reduce, then masks it out.  All VPU-friendly 2D ops.
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
    out_d = []
    out_i = []
    for _ in range(K):
        m = jnp.min(cand_d, axis=1)
        am = jnp.argmin(cand_d, axis=1)
        onehot = cols == am[:, None]
        iv = jnp.max(jnp.where(onehot, cand_i, -1), axis=1)
        out_d.append(m)
        out_i.append(iv)
        cand_d = jnp.where(onehot, _INF, cand_d)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)


def _knn_kernel(
    lengths2_ref,  # scalar-prefetch SMEM (N,) int32
    p1_ref,  # VMEM (1, TILE_P1, D)
    p2_ref,  # VMEM (1, D, TILE_P2) — transposed: coord rows ride the lanes
    out_d_ref,  # VMEM (1, TILE_P1, K) — doubles as the running state
    out_i_ref,  # VMEM (1, TILE_P1, K)
    dw_ref,  # VMEM scratch (TILE_P1, TILE_P2) — screened distances
    af_ref,  # VMEM scratch (TILE_P1, GF) — folded per-group minima
    ai_ref,  # VMEM scratch (TILE_P1, GF) — their original lanes (f32)
    wm_ref,  # VMEM scratch (TILE_P1, GF) — per-group extraction watermark
    wml_ref,  # VMEM scratch (TILE_P1, GF) — watermark lane (f32)
    *,
    K: int,
    norm: int,
    tile_p2: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_d_ref[...] = jnp.full(out_d_ref.shape, _INF, jnp.float32)
        out_i_ref[...] = jnp.zeros(out_i_ref.shape, jnp.int32)

    x = p1_ref[0]  # (TILE_P1, D)
    y_t = p2_ref[0]  # (D, TILE_P2): y_t[di] is already lane-resident

    D = x.shape[1]
    T1 = x.shape[0]
    T2 = y_t.shape[1]
    if norm == 2 and D > 8:
        x2 = jnp.sum(x * x, axis=1, keepdims=True)  # (TILE_P1, 1)
        y2 = jnp.sum(y_t * y_t, axis=0, keepdims=True)  # (1, TILE_P2)
        xy = jax.lax.dot_general(
            x,
            y_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TILE_P1, TILE_P2) on the MXU
        d = jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)
    elif norm == 2:
        # Small D: exact f32 per-axis accumulation on the VPU — matches the
        # reference CUDA numerics (knn.cu:100-109) with no cancellation and
        # no bf16 MXU rounding.
        d = jnp.zeros((T1, T2), jnp.float32)
        for di in range(D):
            diff = x[:, di][:, None] - y_t[di][None, :]
            d = d + diff * diff
    else:
        d = jnp.zeros((T1, T2), jnp.float32)
        for di in range(D):
            d = d + jnp.abs(x[:, di][:, None] - y_t[di][None, :])

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    len2 = lengths2_ref[pl.program_id(0)]
    d = jnp.where(j * tile_p2 + col < len2, d, _INF)

    if K == 1:
        # Chamfer's case: the running top-1 is a plain min/argmin — no
        # screen, no extraction loop; ~2 VPU passes over the distance tile.
        m = jnp.min(d, axis=1)
        am = jnp.argmin(d, axis=1).astype(jnp.int32)
        better = m < out_d_ref[0][:, 0]
        out_d_ref[0] = jnp.where(better[:, None], m[:, None], out_d_ref[0])
        out_i_ref[0] = jnp.where(
            better[:, None], (j * tile_p2 + am)[:, None], out_i_ref[0]
        )
        return

    # Admission screen: the state is sorted ascending, so its last column is
    # the kth-smallest distance so far.  Strict < matches MinK's replace-max
    # test (first-seen wins on exact ties, mink.cuh:70).
    state_d = out_d_ref[0]  # (TILE_P1, K) sorted ascending
    thresh = state_d[:, K - 1][:, None]
    win = d < thresh
    maxc = jnp.minimum(jnp.max(jnp.sum(win.astype(jnp.int32), axis=1)), K)

    kcol = jax.lax.broadcasted_iota(jnp.int32, out_d_ref.shape[1:], 1)

    def insert(m, gidx):
        """Insert (m, gidx) per row into the sorted state, ordered
        lexicographically by (value, global index) — exactly the
        reference's stable first-seen-wins order, independent of the
        extraction schedule.  pos == K (lost to the tightened kth, or
        m == inf on exhausted rows) leaves real entries unchanged."""
        state = out_d_ref[0]
        sti = out_i_ref[0]
        mb = m[:, None]
        gb = gidx[:, None]
        pos = jnp.sum(
            ((state < mb) | ((state == mb) & (sti < gb))).astype(jnp.int32),
            axis=1,
        )[:, None]
        shifted_d = jnp.concatenate([state[:, :1], state[:, :-1]], axis=1)
        shifted_i = jnp.concatenate([sti[:, :1], sti[:, :-1]], axis=1)
        out_d_ref[0] = jnp.where(
            kcol < pos, state, jnp.where(kcol == pos, mb, shifted_d)
        )
        out_i_ref[0] = jnp.where(
            kcol < pos, sti, jnp.where(kcol == pos, gb, shifted_i)
        )

    GF = af_ref.shape[1]
    n_folds = (tile_p2 // GF).bit_length() - 1
    reps = T2 // GF
    col_f = col.astype(jnp.float32)
    col_gf = jax.lax.broadcasted_iota(jnp.int32, (T1, GF), 1)

    @pl.when(maxc > 0)
    def _():
        # Phase 1 — folded extraction.  Full-width min/argmin sweeps are
        # reduce-tree bound over the whole (T1, T2) buffer; instead, fold
        # the survivors to per-stride-group minima (T1, GF) with
        # contiguous-half pairwise minimum chains (group(lane) = lane % GF)
        # and sweep the much smaller buffer.  Lane ids are recovered with a
        # one-hot compare against the tiled group minima + a second minimum
        # fold of masked f32 lane ids — NO dual-array select chains, which
        # SIGABRT the Mosaic compiler (see CLAUDE.md), and f32 ids because
        # int min-reductions don't lower.  Each winner inserts straight
        # into the sorted state.
        dw_ref[...] = jnp.where(win, d, _INF)
        h = dw_ref[...]
        for _f in range(n_folds):
            half = h.shape[1] // 2
            h = jnp.minimum(h[:, :half], h[:, half:])
        af_ref[...] = h
        if n_folds > 0:
            gm_b = jnp.concatenate([h] * reps, axis=1)
            lane_val = jnp.where(dw_ref[...] == gm_b, col_f, 3e38)
            for _f in range(n_folds):
                half = lane_val.shape[1] // 2
                lane_val = jnp.minimum(
                    lane_val[:, :half], lane_val[:, half:]
                )
            ai_ref[...] = lane_val
        else:
            ai_ref[...] = col_f
        wm_ref[...] = jnp.full(wm_ref.shape, -_INF, jnp.float32)
        wml_ref[...] = jnp.full(wml_ref.shape, -1.0, jnp.float32)
        for k in range(K):

            @pl.when(k < maxc)
            def _(k=k):
                av = af_ref[...]
                mval = jnp.min(av, axis=1)
                # Lowest original lane among current minima (exact ties).
                lane_f = jnp.min(
                    jnp.where(av == mval[:, None], ai_ref[...], 3e38),
                    axis=1,
                )
                lane_sel = lane_f.astype(jnp.int32)
                insert(mval, j * tile_p2 + lane_sel)
                g_sel = lane_sel - (lane_sel // GF) * GF
                upd = (col_gf == g_sel[:, None]) & (mval[:, None] < _INF)
                af_ref[...] = jnp.where(upd, _INF, av)
                wm_ref[...] = jnp.where(upd, mval[:, None], wm_ref[...])
                wml_ref[...] = jnp.where(upd, lane_f[:, None], wml_ref[...])

        if n_folds > 0:
            # Phase 2 — rare fallback for same-group SECOND winners (phase 1
            # retires at most one element per fold group): per-group
            # (value, lane) watermarks identify survivors; the classic
            # full-width extraction finishes them.  Lex insertion keeps the
            # final order phase-independent.
            t_new = out_d_ref[0][:, K - 1][:, None]
            wm_b = jnp.concatenate([wm_ref[...]] * reps, axis=1)
            wml_b = jnp.concatenate([wml_ref[...]] * reps, axis=1)
            dwv = dw_ref[...]
            # Admit VALUE TIES with the new kth (<=, not <): a shadowed
            # same-group tie with a LOWER global index than an equal-valued
            # phase-1 insert must still displace it (first-seen-wins).  The
            # lexicographic insert rejects higher-index ties via pos == K,
            # and extraction retires lowest-(value, lane) first, so K sweeps
            # still suffice.  Clamping the threshold at 3e38 keeps inf
            # (masked / non-admitted) lanes out when t_new is still inf
            # (state not yet full) without an extra full-width temp.
            surv = (dwv <= jnp.minimum(t_new, 3e38)) & (
                (dwv > wm_b) | ((dwv == wm_b) & (col_f > wml_b))
            )
            maxc2 = jnp.minimum(
                jnp.max(jnp.sum(surv.astype(jnp.int32), axis=1)), K
            )

            @pl.when(maxc2 > 0)
            def _():
                dw_ref[...] = jnp.where(surv, dwv, _INF)
                for k in range(K):

                    @pl.when(k < maxc2)
                    def _(k=k):
                        dw = dw_ref[...]
                        m = jnp.min(dw, axis=1)
                        am = jnp.argmin(dw, axis=1).astype(jnp.int32)
                        insert(m, j * tile_p2 + am)

                        @pl.when(k + 1 < maxc2)
                        def _():
                            dw_ref[...] = jnp.where(
                                col == am[:, None], _INF, dw
                            )


@functools.partial(
    jax.jit, static_argnames=("K", "norm", "tile_p1", "tile_p2", "interpret")
)
def knn_forward_pallas(
    p1: Array,
    p2: Array,
    lengths2: Array,
    K: int,
    norm: int = 2,
    tile_p1: int = DEFAULT_TILE_P1,
    tile_p2: int = DEFAULT_TILE_P2,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Streaming brute-force KNN forward on TPU.

    Args:
        p1: (N, P1, D) queries; p2: (N, P2, D) references (f32).
        lengths2: (N,) valid reference counts.
        K: neighbors; norm: 1 or 2.

    Returns:
        (dists (N, P1, K) ascending, idx (N, P1, K) int32).  No lengths1/pad
        post-processing — callers apply the reference pad conventions.
    """
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    tile_p1 = min(tile_p1, max(8, P1))
    tile_p2 = min(tile_p2, max(8, P2))
    P1pad = -(-P1 // tile_p1) * tile_p1
    P2pad = -(-P2 // tile_p2) * tile_p2
    if P1pad != P1:
        p1 = jnp.pad(p1, ((0, 0), (0, P1pad - P1), (0, 0)))
    if P2pad != P2:
        p2 = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0)))
    # Transpose reference clouds host-side so each coordinate row is
    # lane-contiguous in VMEM — the kernel would otherwise pay a
    # sublane->lane relayout of every (TILE_P2, D) block per grid step.
    p2_t = jnp.swapaxes(p2, 1, 2)  # (N, D, P2pad)
    lengths2_smem = lengths2.astype(jnp.int32)

    grid = (N, P1pad // tile_p1, P2pad // tile_p2)

    kernel = functools.partial(_knn_kernel, K=K, norm=norm, tile_p2=tile_p2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_p1, D), lambda n, i, j, _l2: (n, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, D, tile_p2), lambda n, i, j, _l2: (n, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_p1, K), lambda n, i, j, _l2: (n, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_p1, K), lambda n, i, j, _l2: (n, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_p1, tile_p2), jnp.float32),
            pltpu.VMEM((tile_p1, _fold_width(tile_p2)), jnp.float32),
            pltpu.VMEM((tile_p1, _fold_width(tile_p2)), jnp.float32),
            pltpu.VMEM((tile_p1, _fold_width(tile_p2)), jnp.float32),
            pltpu.VMEM((tile_p1, _fold_width(tile_p2)), jnp.float32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, P1pad, K), jnp.float32),
            jax.ShapeDtypeStruct((N, P1pad, K), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * P1pad * P2pad * D,
            bytes_accessed=4 * N * (P1pad * D + P2pad * D + 2 * P1pad * K),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths2_smem, p1, p2_t)

    return out_d[:, :P1], out_i[:, :P1]
