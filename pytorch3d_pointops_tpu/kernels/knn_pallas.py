"""Pallas TPU kernel for brute-force KNN with streaming top-K selection.

The TPU-native replacement for the reference's four CUDA kernel variants
(csrc/knn/knn.cu:28-312).  Round-2 design — the selection runs in a
TRANSPOSED layout with queries on the 128-wide LANE dimension:

* Grid ``(N, P1/T1, P2/T2)``, P2 innermost.  Each program computes a
  (T2, T1) distance tile — candidate points on sublanes, queries on lanes —
  and merges it into a running (K, T1) sorted top-K state that lives in the
  output VMEM block (consecutive P2 steps revisit the same block, so the
  state never round-trips to HBM; the VMEM analog of the CUDA kernels'
  register-resident MinK, csrc/utils/mink.cuh:41-126).

  Why transposed: the r1 kernel kept state as (T1, K) — every insert op
  used K=16 of 128 lanes (7/8 of each vreg idle) and all per-query vectors
  were sublane-strided.  Transposed, the state is 4 dense vregs, per-query
  vectors are (1, T1) lane vectors, and the fold is a sublane-halving min
  chain.  Measured on v5e at N=M=100k/K=16: 547k -> 677k queries/s.

* Top-K merge is threshold-screened and fold-batched: the sorted state's
  last row is the kth-smallest distance seen so far; candidates that beat
  it (strict <, MinK's replace-max admission, mink.cuh:62-83) are folded to
  per-stride-group minima (group(row) = row % GF) with pairwise minimum
  chains, and up to ``maxc`` extraction sweeps pull the global winners out
  of the small (GF, T1) buffer.  Original rows are recovered with a one-hot
  compare + a second minimum fold of masked f32 row ids — dual-array select
  chains SIGABRT the Mosaic compiler (verified again in r2 for the sublane
  orientation), and int min-reductions don't lower.

* Each winner inserts into the sorted state at its lexicographic
  (value, global index) position (rank + sublane shift), which makes the
  final order independent of the extraction schedule and exactly
  reference-stable: ties keep the LOWEST index (first-seen-wins,
  functions/knn.py:77-89).

* Same-group SECOND winners (phase 1 retires at most one entry per fold
  group) are caught by per-group (value, row) watermarks + one full-width
  fallback pass.  The survivor screen admits value TIES with the new kth
  (<=, clamped at 3e38 to exclude inf) so a shadowed tie with a lower
  global index can still displace an equal-valued phase-1 insert; the
  lexicographic insert rejects higher-index ties via pos == K.

* ``lengths2`` ragged masking happens in-kernel from an SMEM scalar;
  lengths1/row masking is applied by the caller (ops/knn.py
  ``_apply_pad_conventions``), mirroring the split in the reference.

r2 variants measured and REJECTED (see scripts/knn_r2_transposed.py):
branch-free unconditional sweeps + rank-merge (601k), fori-loop sweeps
(672k), done-flag gating (623k), reshape-broadcast phase-2 (656k),
"gm" no-update watermarks (618k), dual-array index folds (Mosaic SIGABRT),
tile_p1 512 (382k), tile_p2 4096 (336k), xpose/y4d distance layouts (no
gain) — the kernel is bounded by per-tile serial dependency chains, not
element work or branch count.

Memory: one (D, T1) query tile + one (T2, D) candidate tile + the (T2, T1)
screened-distance scratch + four (GF, T1) fold buffers; everything else
streams, so P1/P2 are unbounded (1M x 1M works in tile-sized VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_INF = float("inf")  # plain float: jnp constants would init backends at import

# Tuned on TPU v5e (scripts/knn_r2_transposed.py, N=M=100k K=16): 677k q/s
# at (256, 2048, GF=64); (128, 2048) 668k, (512, 2048) 382k, (256, 4096)
# 336k, GF=128 653k.
DEFAULT_TILE_P1 = 256
DEFAULT_TILE_P2 = 2048
_KNN_FOLD_FLOOR = 64


def _fold_width(tile_p2: int, floor: int = 256) -> int:
    """Width of the folded group-minima buffer: halve while even, down to
    ``floor`` sublanes."""
    w = tile_p2
    while w % 2 == 0 and w > floor:
        w //= 2
    return w


def _knn_kernel(
    lengths2_ref,  # scalar-prefetch SMEM (N,) int32
    p1t_ref,  # VMEM (1, D, T1) — queries transposed: coords on sublanes
    p2_ref,  # VMEM (1, T2, D) — candidates natural
    out_d_ref,  # VMEM (1, K, T1) — the running sorted state (transposed)
    out_i_ref,  # VMEM (1, K, T1)
    dw_ref,  # VMEM scratch (T2, T1) — screened distances
    af_ref,  # VMEM scratch (GF, T1) — folded per-group minima
    ai_ref,  # VMEM scratch (GF, T1) — their original rows (f32)
    wm_ref,  # VMEM scratch (GF, T1) — per-group extraction watermark value
    wml_ref,  # VMEM scratch (GF, T1) — watermark row (f32)
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

    xt = p1t_ref[0]  # (D, T1)
    y = p2_ref[0]  # (T2, D)
    D = xt.shape[0]
    T1 = xt.shape[1]
    T2 = tile_p2

    if norm == 2 and D > 8:
        # Large D: |x|^2 + |y|^2 - 2 y.x on the MXU in HIGHEST precision.
        x2 = jnp.sum(xt * xt, axis=0, keepdims=True)  # (1, T1)
        y2 = jnp.sum(y * y, axis=1, keepdims=True)  # (T2, 1)
        yx = jax.lax.dot_general(
            y,
            xt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (T2, T1)
        d = jnp.maximum(y2 + x2 - 2.0 * yx, 0.0)
    elif norm == 2:
        # Small D: exact f32 per-axis accumulation on the VPU — matches the
        # reference CUDA numerics (knn.cu:100-109) with no cancellation and
        # no bf16 MXU rounding.
        d = jnp.zeros((T2, T1), jnp.float32)
        for di in range(D):
            diff = y[:, di][:, None] - xt[di][None, :]
            d = d + diff * diff
    else:
        d = jnp.zeros((T2, T1), jnp.float32)
        for di in range(D):
            d = d + jnp.abs(y[:, di][:, None] - xt[di][None, :])

    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    len2 = lengths2_ref[pl.program_id(0)]
    d = jnp.where(j * tile_p2 + row < len2, d, _INF)

    if K == 1:
        # Chamfer's case: the running top-1 is a plain min/argmin — no
        # screen, no extraction loop; ~2 VPU passes over the distance tile.
        m = jnp.min(d, axis=0)
        am = jnp.argmin(d, axis=0).astype(jnp.int32)
        better = m < out_d_ref[0][0]
        out_d_ref[0, 0] = jnp.where(better, m, out_d_ref[0, 0])
        out_i_ref[0, 0] = jnp.where(better, j * tile_p2 + am, out_i_ref[0, 0])
        return

    # Admission screen: the state is sorted ascending, so its last row is
    # the kth-smallest distance so far.  Strict < matches MinK's replace-max
    # test (first-seen wins on exact ties, mink.cuh:70).
    state_d = out_d_ref[0]  # (K, T1) sorted ascending
    thresh = state_d[K - 1][None, :]
    win = d < thresh
    cnt = jnp.sum(win.astype(jnp.int32), axis=0)  # (T1,)
    maxc = jnp.minimum(jnp.max(cnt), K)

    krow = jax.lax.broadcasted_iota(jnp.int32, (K, T1), 0)

    def insert(m, gidx):
        """Insert (m, gidx) per lane into the sorted state, ordered
        lexicographically by (value, global index) — exactly the
        reference's stable first-seen-wins order, independent of the
        extraction schedule.  pos == K (lost to the tightened kth, or
        m == inf on exhausted lanes) leaves real entries unchanged."""
        state = out_d_ref[0]
        sti = out_i_ref[0]
        mb = m[None, :]
        gb = gidx[None, :]
        pos = jnp.sum(
            ((state < mb) | ((state == mb) & (sti < gb))).astype(jnp.int32),
            axis=0,
        )[None, :]
        shifted_d = jnp.concatenate([state[:1], state[:-1]], axis=0)
        shifted_i = jnp.concatenate([sti[:1], sti[:-1]], axis=0)
        out_d_ref[0] = jnp.where(
            krow < pos, state, jnp.where(krow == pos, mb, shifted_d)
        )
        out_i_ref[0] = jnp.where(
            krow < pos, sti, jnp.where(krow == pos, gb, shifted_i)
        )

    GF = af_ref.shape[0]
    n_folds = (tile_p2 // GF).bit_length() - 1
    reps = T2 // GF
    row_f = row.astype(jnp.float32)
    row_gf = jax.lax.broadcasted_iota(jnp.int32, (GF, T1), 0)

    @pl.when(maxc > 0)
    def _():
        # Phase 1 — folded extraction.  Full-width min sweeps would be
        # reduce-tree bound over the whole (T2, T1) buffer; instead fold
        # the survivors to per-stride-group minima (GF, T1) with
        # sublane-halving pairwise minimum chains (group(row) = row % GF)
        # and sweep the much smaller buffer.  Rows are recovered with a
        # one-hot compare against the tiled group minima + a second minimum
        # fold of masked f32 row ids.
        dw_ref[...] = jnp.where(win, d, _INF)
        h = dw_ref[...]
        for _f in range(n_folds):
            half = h.shape[0] // 2
            h = jnp.minimum(h[:half], h[half:])
        af_ref[...] = h
        if n_folds > 0:
            gm_b = jnp.concatenate([h] * reps, axis=0)
            row_val = jnp.where(dw_ref[...] == gm_b, row_f, 3e38)
            for _f in range(n_folds):
                half = row_val.shape[0] // 2
                row_val = jnp.minimum(row_val[:half], row_val[half:])
            ai_ref[...] = row_val
        else:
            ai_ref[...] = row_f
        wm_ref[...] = jnp.full(wm_ref.shape, -_INF, jnp.float32)
        wml_ref[...] = jnp.full(wml_ref.shape, -1.0, jnp.float32)
        for k in range(K):

            @pl.when(k < maxc)
            def _(k=k):
                av = af_ref[...]
                mval = jnp.min(av, axis=0)  # (T1,)
                # Lowest original row among current minima (exact ties).
                sub_f = jnp.min(
                    jnp.where(av == mval[None, :], ai_ref[...], 3e38),
                    axis=0,
                )
                sub_sel = sub_f.astype(jnp.int32)
                insert(mval, j * tile_p2 + sub_sel)
                g_sel = sub_sel - (sub_sel // GF) * GF
                upd = (row_gf == g_sel[None, :]) & (mval[None, :] < _INF)
                af_ref[...] = jnp.where(upd, _INF, av)
                wm_ref[...] = jnp.where(upd, mval[None, :], wm_ref[...])
                wml_ref[...] = jnp.where(upd, sub_f[None, :], wml_ref[...])

        if n_folds > 0:
            # Phase 2 — fallback for same-group SECOND winners (phase 1
            # retires at most one element per fold group): per-group
            # (value, row) watermarks identify survivors; the classic
            # full-width extraction finishes them.  Lex insertion keeps the
            # final order phase-independent.  Admit VALUE TIES with the new
            # kth (<=, not <): a shadowed same-group tie with a LOWER
            # global index than an equal-valued phase-1 insert must still
            # displace it (first-seen-wins); the lexicographic insert
            # rejects higher-index ties via pos == K, and extraction
            # retires lowest-(value, row) first, so K sweeps suffice.
            # Clamping the threshold at 3e38 keeps inf (masked /
            # non-admitted) lanes out while t_new is still inf.
            t_new = out_d_ref[0][K - 1][None, :]
            wm_b = jnp.concatenate([wm_ref[...]] * reps, axis=0)
            wml_b = jnp.concatenate([wml_ref[...]] * reps, axis=0)
            dwv = dw_ref[...]
            surv = (dwv <= jnp.minimum(t_new, 3e38)) & (
                (dwv > wm_b) | ((dwv == wm_b) & (row_f > wml_b))
            )
            maxc2 = jnp.minimum(
                jnp.max(jnp.sum(surv.astype(jnp.int32), axis=0)), K
            )

            @pl.when(maxc2 > 0)
            def _():
                dw_ref[...] = jnp.where(surv, dwv, _INF)
                for k in range(K):

                    @pl.when(k < maxc2)
                    def _(k=k):
                        dw = dw_ref[...]
                        m = jnp.min(dw, axis=0)
                        am = jnp.argmin(dw, axis=0).astype(jnp.int32)
                        insert(m, j * tile_p2 + am)

                        @pl.when(k + 1 < maxc2)
                        def _():
                            dw_ref[...] = jnp.where(
                                row == am[None, :], _INF, dw
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
    # Queries transposed host-side so each coordinate is a sublane row that
    # broadcasts along the tile's lane (query) dimension for free.
    p1_t = jnp.swapaxes(p1, 1, 2)  # (N, D, P1pad)
    lengths2_smem = lengths2.astype(jnp.int32)

    grid = (N, P1pad // tile_p1, P2pad // tile_p2)
    gf = _fold_width(tile_p2, _KNN_FOLD_FLOOR)

    kernel = functools.partial(_knn_kernel, K=K, norm=norm, tile_p2=tile_p2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, D, tile_p1), lambda n, i, j, _l: (n, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_p2, D), lambda n, i, j, _l: (n, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, K, tile_p1), lambda n, i, j, _l: (n, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, K, tile_p1), lambda n, i, j, _l: (n, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_p2, tile_p1), jnp.float32),
            pltpu.VMEM((gf, tile_p1), jnp.float32),
            pltpu.VMEM((gf, tile_p1), jnp.float32),
            pltpu.VMEM((gf, tile_p1), jnp.float32),
            pltpu.VMEM((gf, tile_p1), jnp.float32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, K, P1pad), jnp.float32),
            jax.ShapeDtypeStruct((N, K, P1pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * P1pad * P2pad * D,
            bytes_accessed=4 * N * (P1pad * D + P2pad * D + 2 * P1pad * K),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths2_smem, p1_t, p2)

    return (
        jnp.swapaxes(out_d, 1, 2)[:, :P1],
        jnp.swapaxes(out_i, 1, 2)[:, :P1],
    )
