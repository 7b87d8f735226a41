"""Pallas TPU kernel for brute-force KNN with streaming top-K selection.

The TPU-native replacement for the reference's four CUDA kernel variants
(csrc/knn/knn.cu:28-312).  Round-3 design — TRANSPOSED, MULTI-CHAIN,
scratch-free screening with an exact phase-2 collision gate:

* Grid ``(N, P1/(C*W), P2/T2)``, P2 innermost.  Each program computes a
  (T2, C*W) distance tile — candidate points on sublanes, queries on the
  128-wide LANE dimension — and maintains C=4 independent 128-lane query
  "chains", each with its own (K, W) sorted top-K state resident in a
  private output VMEM block (consecutive P2 steps revisit the same blocks,
  so the states never round-trip to HBM; the VMEM analog of the CUDA
  kernels' register-resident MinK, csrc/utils/mink.cuh:41-126).

  Why transposed: the r1 kernel kept state as (T1, K) — every insert op
  used K=16 of 128 lanes (7/8 of each vreg idle).  Transposed, the state is
  lane-dense and per-query vectors are (1, W) lane vectors.
  Why chains: extraction sweeps are latency-bound (~0.3 us of serial
  reduce -> recover -> insert -> mask per sweep against ~0.03 us of element
  work); C independent chains amortize the per-tile scalar syncs over C*W
  queries while giving the VLIW scheduler independent chains to interleave.
  Measured on v5e at N=M=100k/K=16: r1 547k -> transposed 677k -> 4-chain
  745-769k -> r2 lite screen 809k -> r3 (no dw scratch + collision gate +
  8x128 @ T2=1024) 849k queries/s.  Mosaic collapses ~2x whenever the
  distance tile exceeds ~1M ELEMENTS ((2048, 1024), (4096, 512) and
  (1024, 1536) all cliff; (1024, 1024), (2048, 512), (512, 2048) are
  fine) — the r3 shape change rides that boundary at 8 chains.

* NO screened-distance scratch (r3): the (T2, W) per-chain ``dw`` buffers
  were pure re-materialization — one masked store per chain per winning
  tile plus 2x tile footprint; every later read is reproduced by a single
  select over the live distance tile (``dw_val``).  Phase-2 extraction,
  which previously mutated dw, walks survivors in (value, row) lex order
  with a (1, W) watermark instead.

* Top-K merge is threshold-screened and fold-batched per chain: the sorted
  state's last row is the kth-smallest distance seen so far; candidates
  that beat it (strict <, MinK's replace-max admission, mink.cuh:62-83) are
  folded to per-stride-group minima (group(row) = row % GF) with
  sublane-halving minimum chains, and up to ``maxc`` extraction sweeps
  (jointly gated across chains; empty chains extract inf harmlessly) pull
  the winners out of the small (GF, W) buffers.  Original rows are
  recovered with a one-hot compare + a second minimum fold of masked f32
  row ids — dual-array select chains SIGABRT the Mosaic compiler (verified
  again in r2 for the sublane orientation), and int min-reductions don't
  lower.

* Each winner inserts into its chain's sorted state at its lexicographic
  (value, global index) position (rank + sublane shift), which makes the
  final order independent of the extraction schedule and exactly
  reference-stable: ties keep the LOWEST index (first-seen-wins,
  functions/knn.py:77-89).

* Same-group SECOND winners (phase 1 retires at most one entry per fold
  group) are caught by per-group (value, row) watermarks + one full-width
  fallback pass per chain — but the whole fallback is SKIPPED by an exact
  collision gate (r3): a lane must admit more candidates than distinct
  fold groups (cnt > ng, both already computed) for phase 1 to leave
  anything behind; clean tiles (simulated 20-75% depending on stream
  position and GF) never pay the survivor screen.  The survivor screen
  admits value TIES with the new kth (<=, with an inf kth transformed to
  f32 max so finite distances always stay admissible) so a shadowed tie
  with a lower global index can still displace an equal-valued phase-1
  insert; the lexicographic insert rejects higher-index ties via pos == K.

* ``lengths2`` ragged masking happens in-kernel from an SMEM scalar;
  lengths1/row masking is applied by the caller (ops/knn.py
  ``_apply_pad_conventions``), mirroring the split in the reference.

r2 variants measured and REJECTED (scripts/knn_r2_transposed.py,
scripts/knn_r2_dualchain.py): branch-free unconditional sweeps + rank-merge
(601k), fori-loop sweeps (672k), done-flag gating (623k), lite 7-pass
phase-2 screen (no change), reshape-broadcast phase-2 (656k), "gm"
no-update watermarks (618k), dual-array index folds (Mosaic SIGABRT),
2x256 chains (354k), 8x128 chains (385k), tile_p2 1024/4096, GF 32/128.

Memory: one (D, C*W) query tile + one (T2, D) candidate tile + the
(T2, C*W) distance tile value + C x four (GF, W) fold/watermark buffers
(r3 removed the per-chain (T2, W) screened-distance scratch); everything
else streams, so P1/P2 are unbounded (1M x 1M works in tile-sized VMEM).
"""

from __future__ import annotations

import functools
import logging
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spatial_sort import morton_argsort, morton_code

logger = logging.getLogger(__name__)

Array = jnp.ndarray

_INF = float("inf")  # plain float: jnp constants would init backends at import

# Tuned on TPU v5e (scripts/knn_r3.py, N=M=100k K=16): 849k q/s at
# 8 chains x 128 lanes, T2=1024, GF=64 with the collision gate and no dw
# scratch (r2 shipped 4x128/T2=2048/809k).  T2=1024 wins once the dw
# rewrite is gone: smaller tiles admit/collide less, and the d_all
# element-count cliff (> 1M elements collapses ~2x) permits 8 chains.
DEFAULT_TILE_P1 = 1024
# Morton query sorting auto-on floor: below this the whole call is
# dispatch-bound and the argsort/gathers are pure overhead (the joint-max
# inflation it attacks needs several query blocks to matter).
_SORT_MIN_P1 = 8192
DEFAULT_TILE_P2 = 1024
_CHAIN_WIDTH = 128
_KNN_FOLD_FLOOR = 64

# Per-round top-K capacity for large K: the kernel statically unrolls up to
# 2*K extraction sweeps, so past this the unrolling stops paying for itself
# and remote TPU compiles blow up (same economics as the ball-query kernel's
# 64-key rounds, kernels/ball_query_pallas.py:16-28).  K > _ROUND_K chains
# rounds of the same compiled kernel with a per-query lexicographic
# (value, index) lower bound — round r admits only candidates strictly above
# round r-1's kth entry, so the concatenated rounds are exactly the global
# ascending (value, index) order chunked by _ROUND_K.
_ROUND_K = 64

# Sentinel index for ub-seeded states: slots still holding it after the
# stream are "never filled below the sampled bound" markers.  Real global
# indices are < P2pad << 2**31 - 1, so it can never collide.
_SENT = 2**31 - 1

# Sampled kth-distance bound margins (big-K rounds): the per-round state is
# seeded at tau_r, the m_r-th smallest of an s-point strided sample, where
# m_r = ceil(mu + SIGMA*sqrt(mu) + ABS) and mu = s*kq_r/len2 is the expected
# sample count at the target quantile kq_r.  The margin makes
# P(tau_r < true kq_r-th distance) ~ exp(-SIGMA^2/2)-level per query;
# failures are *detected* (a _SENT survives in a valid slot) and repaired by
# one unfiltered rerun, so the margin only tunes the rare-fallback rate —
# exactness never depends on it.
_BOUND_MARGIN_SIGMA = 6.0
_BOUND_MARGIN_ABS = 8.0


def _fold_width(tile_p2: int, floor: int = 256) -> int:
    """Width of the folded group-minima buffer: halve while even, down to
    ``floor`` sublanes."""
    w = tile_p2
    while w % 2 == 0 and w > floor:
        w //= 2
    return w


def _knn_kernel(
    *args,  # prefetch: lengths2 (N,) [starts (N, nb) if carried]; then p1t (1, D, C*W), p2 (1, T2, D), [gidx (1, T2, 1) f32 if carried], [lb (1,3,C*W) if chained], [ub (1,1,C*W) if seeded], C x (out_d (1,K,W), out_i), then C x (af, ai, wm, wml) scratch
    K: int,
    norm: int,
    tile_p2: int,
    chains: int,
    width: int,
    gf: int,
    chained: bool = False,
    seeded: bool = False,
    depth: int = 1,
    instrument: bool = False,
    carried: bool = False,
):
    # ``carried`` (round 5): candidates arrive PERMUTED (Morton-sorted p2,
    # per-block rotated scan) and each tile streams its rows' ORIGINAL
    # indices as f32 (< 2**24, exact).  Everywhere the identity-order
    # kernel uses the row iota as the candidate id — lengths masking, lex
    # insertion keys, fold row-recovery, group-update masks, watermarks,
    # the chained lb screen — the carried gidx column substitutes at equal
    # op count (ids only need uniqueness + the reference's (value, index)
    # lex order, which original indices give exactly).
    if carried:
        lengths2_ref, _starts_ref, p1t_ref, p2_ref, gidx_ref, *refs = args
    else:
        lengths2_ref, p1t_ref, p2_ref, *refs = args
    j = pl.program_id(2)
    C, W, GF, T2 = chains, width, gf, tile_p2
    if chained:
        lb_ref, refs = refs[0], refs[1:]
    if seeded:
        ub_ref, refs = refs[0], refs[1:]
    out_d = refs[0 : 2 * C : 2]
    out_i = refs[1 : 2 * C : 2]
    if instrument:
        # (1, 8, 128) f32 counter block, resident across the j stream like
        # the top-K states; lane layout in _COUNTER_LANES.  Statically
        # compiled OUT of the production kernel (instrument=False).
        cnt_ref = refs[2 * C]
        scratch = refs[2 * C + 1 :]
        cnt_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def _cnt_row(pairs):
            row = jnp.zeros((1, 128), jnp.float32)
            for lane, val in pairs:
                row = row + jnp.where(
                    cnt_lane == lane, val.astype(jnp.float32), 0.0
                )
            return row

        @pl.when(j == 0)
        def _():
            cnt_ref[0, 0] = jnp.zeros((8, 128), jnp.float32)

    else:
        scratch = refs[2 * C :]
    ns = 2 + 2 * depth
    af = scratch[0::ns]
    ai = scratch[1::ns]
    wm = scratch[2::ns]
    wml = scratch[3::ns]
    # Deeper fold levels (round 4): afs[m]/ais[m] hold each group's
    # (m+1)-th smallest (value, row); phase 1 retires up to ``depth``
    # winners per group before the phase-2 fallback is needed.
    afs = [af] + [scratch[4 + 2 * m :: ns] for m in range(depth - 1)]
    ais = [ai] + [scratch[5 + 2 * m :: ns] for m in range(depth - 1)]

    @pl.when(j == 0)
    def _():
        for c in range(C):
            if seeded:
                # Seed the sorted state at the per-query sampled kth-bound:
                # the admission screen (d < state[K-1]) then filters at the
                # bound from tile 0 instead of waiting K real admissions to
                # tighten from +inf.  Slots never displaced keep the _SENT
                # index, which the caller checks to detect a too-tight
                # bound (tau < true kth) and rerun unfiltered — exact by
                # construction.  ub arrives already nextafter'ed so d == tau
                # is admitted (the bound is inclusive).
                seed = ub_ref[0, 0, c * W : (c + 1) * W]
                out_d[c][...] = (
                    jnp.zeros(out_d[c].shape, jnp.float32)
                    + seed[None, None, :]
                )
                out_i[c][...] = jnp.full(out_i[c].shape, _SENT, jnp.int32)
            else:
                out_d[c][...] = jnp.full(out_d[c].shape, _INF, jnp.float32)
                out_i[c][...] = jnp.zeros(out_i[c].shape, jnp.int32)

    xt = p1t_ref[0]  # (D, C*W)
    y = p2_ref[0]  # (T2, D)
    D = xt.shape[0]

    # Joint distance tile over all chains, sliced per chain afterwards.
    if norm == 2 and D > 8:
        # Large D: |x|^2 + |y|^2 - 2 y.x on the MXU in HIGHEST precision.
        x2 = jnp.sum(xt * xt, axis=0, keepdims=True)  # (1, C*W)
        y2 = jnp.sum(y * y, axis=1, keepdims=True)  # (T2, 1)
        yx = jax.lax.dot_general(
            y,
            xt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d_all = jnp.maximum(y2 + x2 - 2.0 * yx, 0.0)
    elif norm == 2:
        # Small D: exact f32 per-axis accumulation on the VPU — matches the
        # reference CUDA numerics (knn.cu:100-109) with no cancellation and
        # no bf16 MXU rounding.
        d_all = jnp.zeros((T2, C * W), jnp.float32)
        for di in range(D):
            diff = y[:, di][:, None] - xt[di][None, :]
            d_all = d_all + diff * diff
    else:
        d_all = jnp.zeros((T2, C * W), jnp.float32)
        for di in range(D):
            d_all = d_all + jnp.abs(y[:, di][:, None] - xt[di][None, :])

    row = jax.lax.broadcasted_iota(jnp.int32, (T2, W), 0)
    len2 = lengths2_ref[pl.program_id(0)]
    if carried:
        gidx_col = gidx_ref[0]  # (T2, 1) f32 original candidate ids
        rmask = gidx_col < len2.astype(jnp.float32)  # broadcasts over W
    else:
        rmask = j * tile_p2 + row < len2

    if K == 1:
        # Chamfer's case: the running top-1 is a plain min/argmin per chain.
        for c in range(C):
            d_c = jnp.where(rmask, d_all[:, c * W : (c + 1) * W], _INF)
            m = jnp.min(d_c, axis=0)
            if carried:
                # Tile visit order is rotated: cross-tile value ties must
                # resolve by ORIGINAL index, not arrival order — lex update.
                gm_f = jnp.min(
                    jnp.where(d_c == m[None, :], gidx_col, 3e38), axis=0
                )
                gm = gm_f.astype(jnp.int32)
                cur_d, cur_i = out_d[c][0][0], out_i[c][0][0]
                better = (m < cur_d) | ((m == cur_d) & (gm < cur_i))
                out_d[c][0, 0] = jnp.where(better, m, cur_d)
                out_i[c][0, 0] = jnp.where(better, gm, cur_i)
            else:
                am = jnp.argmin(d_c, axis=0).astype(jnp.int32)
                better = m < out_d[c][0][0]
                out_d[c][0, 0] = jnp.where(better, m, out_d[c][0, 0])
                out_i[c][0, 0] = jnp.where(
                    better, j * tile_p2 + am, out_i[c][0, 0]
                )
        return

    # Admission screen per chain: each sorted state's last row is that
    # chain's kth-smallest so far.  Strict < matches MinK's replace-max
    # test (first-seen wins on exact ties, mink.cuh:70).  Chained rounds
    # additionally require candidates lexicographically ABOVE the previous
    # round's per-query (kth value, kth index) bound, so round r returns
    # exactly entries (r*K, (r+1)*K] of the global ascending order.
    # Round 5: the lex compare collapses to ONE biased-bound compare —
    # admit iff d >= (gidx > lbi ? lbd : nextafter(lbd)) — with
    # nextafter(lbd) precomputed HOST-side (lb row 1) and the index test
    # rewritten as a row compare (gidx > lbi <=> row > lbi - j*T2, both
    # sides exact f32 ints < 2**24), eliminating the (T2, W) gidx tile and
    # 3 of the 6 per-chain screen ops.  The round-4 form was measured at
    # +190 ms/round of PURE op cost at K=64 (scripts/knn_r4_chain.py:
    # vacuous-lb vs bare; admission shift +2.4 ms).
    if chained and not carried:
        row_f_scr = row.astype(jnp.float32)
        jt2_f = (j * tile_p2).astype(jnp.float32)
    slices = []
    wins = []
    cnts = []
    for c in range(C):
        d_c = d_all[:, c * W : (c + 1) * W]
        slices.append(d_c)
        thresh = out_d[c][0][K - 1][None, :]
        if carried:
            # Rotated arrival order breaks the "later arrival == higher
            # index" invariant the strict screen relies on: a candidate
            # EQUAL to the kth value with a LOWER original index must
            # still be admitted (the lex insert displaces the kth; a
            # higher-index tie is rejected there at pos == K).  Admitting
            # ALL value ties (<=) is the zero-cost exact fix — a lex
            # compare against the kth's index would read the out_i state
            # ref on the screen's critical path (measured: it erased the
            # carried win; the kernel is bounded by serial chains through
            # the state refs).  Extra sweeps only arise on exact-tie
            # candidates; seeded _SENT slots admit their d == seed edge
            # harmlessly (superset admissions, exact insert).
            win = (d_c <= thresh) & rmask
        else:
            win = (d_c < thresh) & rmask
        if chained:
            lbd = lb_ref[0, 0, c * W : (c + 1) * W][None, :]
            lbdp = lb_ref[0, 1, c * W : (c + 1) * W][None, :]
            if carried:
                # gidx IS the global index: compare it directly (no
                # j*T2 rebasing — the scan is rotated anyway).
                ig = gidx_col > lb_ref[0, 2, c * W : (c + 1) * W][None, :]
            else:
                lbr = lb_ref[0, 2, c * W : (c + 1) * W][None, :] - jt2_f
                ig = row_f_scr > lbr
            win = win & (d_c >= jnp.where(ig, lbd, lbdp))
        wins.append(win)
        cnts.append(jnp.sum(win.astype(jnp.int32), axis=0))
    maxc = jnp.minimum(
        functools.reduce(jnp.maximum, [jnp.max(cn) for cn in cnts]), K
    )
    if instrument:
        total_cnt = functools.reduce(
            lambda a, b: a + b, [jnp.sum(cn) for cn in cnts]
        )
        cnt_ref[0, 0, 0:1, :] = cnt_ref[0, 0, 0:1, :] + _cnt_row(
            [
                (0, jnp.int32(1)),  # tiles visited
                (1, (maxc > 0).astype(jnp.int32)),  # winning tiles
                (2, maxc),  # phase-1 sweeps executed
                (3, total_cnt),  # admissions (threshold-screen passers)
            ]
        )

    krow = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
    row_gf = jax.lax.broadcasted_iota(jnp.int32, (GF, W), 0)
    # The candidate-id source for recovery/watermark/lex logic: carried
    # original indices ((T2, 1), broadcasts over W) or the row iota.
    row_f = gidx_col if carried else row.astype(jnp.float32)
    n_folds = (tile_p2 // GF).bit_length() - 1
    reps = T2 // GF

    def insert(c, m, gidx):
        """Insert (m, gidx) per lane into chain c's sorted state, ordered
        lexicographically by (value, global index) — exactly the
        reference's stable first-seen-wins order, independent of the
        extraction schedule.  pos == K (lost to the tightened kth, or
        m == inf on exhausted lanes) leaves real entries unchanged."""
        state = out_d[c][0]
        sti = out_i[c][0]
        mb = m[None, :]
        gb = gidx[None, :]
        pos = jnp.sum(
            ((state < mb) | ((state == mb) & (sti < gb))).astype(jnp.int32),
            axis=0,
        )[None, :]
        sd = jnp.concatenate([state[:1], state[:-1]], axis=0)
        si = jnp.concatenate([sti[:1], sti[:-1]], axis=0)
        out_d[c][0] = jnp.where(
            krow < pos, state, jnp.where(krow == pos, mb, sd)
        )
        out_i[c][0] = jnp.where(
            krow < pos, sti, jnp.where(krow == pos, gb, si)
        )

    def dw_val(c):
        """Screened distances, recomputed from the live distance tile —
        round 3 removed the (T2, W) dw scratch refs entirely: materializing
        them cost a masked store per chain per winning tile and kept tile
        footprint at 2x d_all (win implies the rmask, so one select
        reproduces the buffer exactly)."""
        return jnp.where(wins[c], slices[c], _INF)

    @pl.when(maxc > 0)
    def _():
        # Phase 1 — folded extraction per chain: fold the survivors to
        # per-stride-group minima (GF, W) with sublane-halving minimum
        # chains and sweep the small buffers; rows recovered via one-hot
        # compare + a second minimum fold of masked f32 row ids.
        fire_terms = []
        for c in range(C):
            # depth-deep fold (round 4): carry each group's sorted smallest
            # ``depth`` values with pure min/max merge networks — no
            # dual-array SELECT folds, so it stays on the Mosaic-safe side
            # of the SIGABRT line.  Phase 1 can then retire ``depth``
            # winners per group and the exact collision gate weakens to
            # cnt > sum(ng_m) (some group must hold a (depth+1)-th
            # admission for phase 2 to have work).
            hs = [dw_val(c)] + [None] * (depth - 1)
            for m in range(1, depth):
                hs[m] = jnp.full(hs[0].shape, _INF, jnp.float32)
            for _f in range(n_folds):
                half = hs[0].shape[0] // 2
                a1, b1 = hs[0][:half], hs[0][half:]
                lo1, hi1 = jnp.minimum(a1, b1), jnp.maximum(a1, b1)
                new = [lo1]
                if depth >= 2:
                    lo2 = jnp.minimum(hs[1][:half], hs[1][half:])
                    new.append(jnp.minimum(hi1, lo2))
                if depth >= 3:
                    # kth of a two-sorted-list merge = min over i+j=k of
                    # max(A_i, B_j), with A = (lo1 <= lo2 <= ...) and
                    # B = (hi1 <= hi2 <= ...); hi_m with rank bound > depth
                    # drops out (hi2 for depth 3, hi3+ always).
                    lo3 = jnp.minimum(hs[2][:half], hs[2][half:])
                    m23 = jnp.maximum(lo2, hi1)
                    if depth == 3:
                        new.append(jnp.minimum(lo3, m23))
                    else:
                        hi2 = jnp.maximum(hs[1][:half], hs[1][half:])
                        new.append(
                            jnp.minimum(jnp.minimum(lo3, m23), hi2)
                        )
                if depth >= 4:
                    lo4 = jnp.minimum(hs[3][:half], hs[3][half:])
                    new.append(
                        jnp.minimum(
                            jnp.minimum(lo4, jnp.maximum(lo3, hi1)),
                            jnp.maximum(lo2, hi2),
                        )
                    )
                hs = new
            ng_total = None
            for m in range(depth):
                afs[m][c][...] = hs[m]
                ng_m = jnp.sum((hs[m] < _INF).astype(jnp.int32), axis=0)
                ng_total = ng_m if ng_total is None else ng_total + ng_m
            fire_terms.append(jnp.max(cnts[c] - ng_total))
            if n_folds > 0:
                # Row recovery per level: lowest row matching that level's
                # value, excluding the rows already claimed by shallower
                # levels (the exclusions only bite on exact value ties).
                prev_rv_bs = []
                for m in range(depth):
                    gm_b = jnp.concatenate([hs[m]] * reps, axis=0)
                    rv = jnp.where(dw_val(c) == gm_b, row_f, 3e38)
                    for pb in prev_rv_bs:
                        rv = jnp.where(row_f != pb, rv, 3e38)
                    for _f in range(n_folds):
                        half = rv.shape[0] // 2
                        rv = jnp.minimum(rv[:half], rv[half:])
                    ais[m][c][...] = rv
                    if m + 1 < depth:
                        prev_rv_bs.append(
                            jnp.concatenate([rv] * reps, axis=0)
                        )
            else:
                ai[c][...] = row_f + jnp.zeros((T2, W), jnp.float32)
                for m in range(1, depth):
                    ais[m][c][...] = jnp.full(
                        ais[m][c].shape, 3e38, jnp.float32
                    )
            wm[c][...] = jnp.full(wm[c].shape, -_INF, jnp.float32)
            wml[c][...] = jnp.full(wml[c].shape, -1.0, jnp.float32)

        for k in range(K):

            @pl.when(k < maxc)
            def _(k=k):
                # C independent sweep bodies back to back: chains that ran
                # dry extract inf (insert rejects at pos == K), keeping the
                # region branch-free and the chains interleavable.
                for c in range(C):
                    av = af[c][...]
                    mval = jnp.min(av, axis=0)  # (W,)
                    sub_f = jnp.min(
                        jnp.where(av == mval[None, :], ai[c][...], 3e38),
                        axis=0,
                    )
                    if carried:
                        # sub_f IS the winner's original index; its fold
                        # group is found by matching the (unique) id in the
                        # level-0 id buffer — same one-compare-and-mask
                        # cost as the row arithmetic below.
                        insert(c, mval, sub_f.astype(jnp.int32))
                        upd = (ai[c][...] == sub_f[None, :]) & (
                            mval[None, :] < _INF
                        )
                    else:
                        sub_sel = sub_f.astype(jnp.int32)
                        insert(c, mval, j * tile_p2 + sub_sel)
                        g_sel = sub_sel - (sub_sel // GF) * GF
                        upd = (row_gf == g_sel[None, :]) & (
                            mval[None, :] < _INF
                        )
                    if depth > 1:
                        # Shift the group's deeper (value, row) slots up one
                        # level so the next sweep can retire the next-best;
                        # the deepest slot empties.
                        for m in range(depth - 1):
                            src_af = afs[m + 1][c][...]
                            src_ai = ais[m + 1][c][...]
                            cur = av if m == 0 else afs[m][c][...]
                            afs[m][c][...] = jnp.where(upd, src_af, cur)
                            ais[m][c][...] = jnp.where(
                                upd, src_ai, ais[m][c][...]
                            )
                        afs[depth - 1][c][...] = jnp.where(
                            upd, _INF, afs[depth - 1][c][...]
                        )
                    else:
                        af[c][...] = jnp.where(upd, _INF, av)
                    wm[c][...] = jnp.where(upd, mval[None, :], wm[c][...])
                    wml[c][...] = jnp.where(upd, sub_f[None, :], wml[c][...])

        if n_folds > 0:
            # Phase 2 — fallback for same-group SECOND winners (phase 1
            # retires at most one element per fold group), skipped outright
            # when the collision detector proves no lane left anything
            # behind (fires on ~25-80% of winning tiles depending on
            # stream position).  When fired: per-group (value, row)
            # watermarks identify survivors; extraction walks them in
            # (value, row) lex order tracked by a (1, W) watermark instead
            # of mutating a buffer (there is no dw scratch to clear).  Lex
            # insertion keeps the final order phase-independent.  Admit
            # VALUE TIES with the new kth (<=, not <): a shadowed
            # same-group tie with a LOWER global index than an equal-valued
            # phase-1 insert must still displace it (first-seen-wins); the
            # lexicographic insert rejects higher-index ties via pos == K,
            # and extraction retires lowest-(value, row) first, so K sweeps
            # suffice.  Replacing an inf t_new by f32-max keeps masked /
            # non-admitted (inf) lanes out while every finite distance
            # stays admissible — exact, and only a (1, W) op.
            @pl.when(functools.reduce(jnp.maximum, fire_terms) > 0)
            def _():
                survs = []
                m2s = []
                for c in range(C):
                    t_new = out_d[c][0][K - 1][None, :]
                    wm_b = jnp.concatenate([wm[c][...]] * reps, axis=0)
                    wml_b = jnp.concatenate([wml[c][...]] * reps, axis=0)
                    dwv = dw_val(c)
                    f32max = float(jnp.finfo(jnp.float32).max)
                    thr = jnp.where(t_new == _INF, f32max, t_new)
                    if depth > 1:
                        # With multiple extractions per group the 3-op collapse
                        # is no longer exact: on an exact value tie between
                        # the 1st and 2nd winners, the 1st winner's row is
                        # BELOW the (2nd-winner) watermark row yet equal in
                        # value — "row != wml" would wrongly resurrect it.
                        # Full lex compare against the last-extracted
                        # (value, row) per group stays exact.
                        surv = (dwv <= thr) & (
                            (dwv > wm_b)
                            | ((dwv == wm_b) & (row_f > wml_b))
                        )
                    else:
                        # 3-op lex screen: "lex(dwv,row) > lex(wm,wml)"
                        # collapses to "dwv >= wm and row != wml" because a
                        # tie candidate with a LOWER row than the extracted
                        # watermark cannot exist — extraction retires
                        # lowest-(value, row) first.  Measured +5% over the
                        # 5-op form (762k -> 798k q/s).
                        surv = (
                            (dwv <= thr) & (dwv >= wm_b) & (row_f != wml_b)
                        )
                    survs.append(surv)
                    m2s.append(
                        jnp.max(jnp.sum(surv.astype(jnp.int32), axis=0))
                    )
                maxc2 = jnp.minimum(functools.reduce(jnp.maximum, m2s), K)
                if instrument:
                    cnt_ref[0, 0, 0:1, :] = cnt_ref[0, 0, 0:1, :] + _cnt_row(
                        [
                            (4, jnp.int32(1)),  # phase-2 firings
                            (5, maxc2),  # phase-2 sweeps executed
                        ]
                    )

                @pl.when(maxc2 > 0)
                def _():
                    # The (GF, W) wm/wml refs are dead after the survivor
                    # screen — reuse their row 0 as the lex watermark
                    # (pl.when regions can't carry values across sweeps).
                    for c in range(C):
                        wm[c][0:1] = jnp.full((1, W), -_INF, jnp.float32)
                        wml[c][0:1] = jnp.full((1, W), -1.0, jnp.float32)
                    for k in range(K):

                        @pl.when(k < maxc2)
                        def _(k=k):
                            for c in range(C):
                                dwc = jnp.where(survs[c], dw_val(c), _INF)
                                lv = wm[c][0:1]
                                lr = wml[c][0:1]
                                live = (dwc > lv) | (
                                    (dwc == lv) & (row_f > lr)
                                )
                                dvx = jnp.where(live, dwc, _INF)
                                m = jnp.min(dvx, axis=0)
                                am_f = jnp.min(
                                    jnp.where(
                                        dvx == m[None, :], row_f, 3e38
                                    ),
                                    axis=0,
                                )
                                am = am_f.astype(jnp.int32)
                                insert(
                                    c, m,
                                    am if carried else j * tile_p2 + am,
                                )
                                wm[c][0:1] = m[None, :]
                                wml[c][0:1] = am_f[None, :]


# Lane layout of the per-(n, i)-block instrumentation counters (f32 sums,
# exact: per-block magnitudes stay far below 2**24):
#   0 tiles visited, 1 winning tiles (maxc > 0), 2 phase-1 sweeps executed,
#   3 admissions (threshold-screen passers), 4 phase-2 firings,
#   5 phase-2 sweeps executed.
_COUNTER_LANES = {
    "tiles": 0,
    "winning_tiles": 1,
    "p1_sweeps": 2,
    "admissions": 3,
    "p2_firings": 4,
    "p2_sweeps": 5,
}


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "norm", "tile_p1", "tile_p2", "interpret", "gf", "depth",
        "round_k", "sample_bound", "sample_s", "instrument",
        "sort_queries", "sort_candidates",
    ),
)
def knn_forward_pallas(
    p1: Array,
    p2: Array,
    lengths2: Array,
    K: int,
    norm: int = 2,
    tile_p1: int = None,
    tile_p2: int = None,
    interpret: bool = False,
    lb: tuple = None,
    ub: Array = None,
    gf: int = None,
    depth: int = None,
    round_k: int = None,
    sample_bound: bool = None,
    sample_s: int = None,
    instrument: bool = False,
    sort_queries: bool = None,
    sort_candidates: bool = None,
    cand_ids: Array = None,
) -> tuple[Array, Array]:
    """Streaming brute-force KNN forward on TPU.

    Args:
        p1: (N, P1, D) queries; p2: (N, P2, D) references (f32).
        lengths2: (N,) valid reference counts.
        K: neighbors; norm: 1 or 2.  K > 64 chains rounds of the 64-key
            kernel with per-query lexicographic lower bounds (one XLA
            program, ceil(K/64) streams over p2) — the TPU answer to the
            reference V0 kernel's any-K support (knn.cu:28-67).
        tile_p1: TOTAL query lanes per program; split into 128-lane chains
            when divisible (8 x 128 is the tuned production shape).  None
            (default) auto-selects; an explicit value is honored verbatim
            (tile sweeps must measure what they ask for).
        lb: internal (chained rounds): per-query exclusive lexicographic
            lower bound as (lb_dists (N, P1) f32, lb_idx (N, P1) int32);
            only candidates with (d, idx) lex-above the bound are admitted.
        ub: optional per-query INCLUSIVE upper bound (N, P1) f32 on the kth
            distance: the sorted state is seeded at ``nextafter(ub)`` with
            ``_SENT`` indices, so the admission screen filters at the bound
            from the first tile.  Slots still holding ``_SENT`` afterwards
            mark queries whose bound was too tight (fewer than K candidates
            at or below it) — callers MUST detect those and rerun with
            ``ub=+inf`` (see ``_knn_forward_pallas_bigk``) for exactness.
        round_k: per-round top-K capacity for the chained big-K path
            (default ``_ROUND_K``).  Larger rounds stream the distance
            matrix fewer times at the price of a taller VMEM state and a
            longer static sweep unroll — a measured tradeoff, not a free
            knob (see scripts/knn_r4_chain.py).
        sample_bound: seed the top-K state(s) with a sampled per-query
            kth-distance bound (one strided-sample KNN computes every
            round's bound; a detected-too-tight bound falls back to one
            rerun of the same compiled kernel with +inf bounds).  None =
            ON for the chained big-K path, OFF for single-round K <=
            round_k (opt in with True; K=1 has no admission-gated work to
            save and never seeds).  True is loudly ignored (logger
            warning) when P2 < 4*s or the deepest quantile outgrows the
            sample.  Note the sample pass runs even when every cloud's
            lengths2 < P2//2 later disables its bounds (the usability
            gate is per-cloud and dynamic) — pass False for heavily
            padded ragged batches.  sample_s: sample size override
            (default ~P2/16 in [4096, 65536]).

        instrument: when True, additionally return per-(n, query-block)
            counter blocks (N, nb, 8, 128) f32 — row 0, lanes per
            ``_COUNTER_LANES`` — measuring tiles, winning tiles, executed
            phase-1/2 sweeps, phase-2 firings and admissions on the REAL
            kernel (the ROOFLINE.md floor decomposition's measured
            counterpart).  Statically compiled out when False; single-round
            K > 1 calls only.  (With sorting on, counters describe the
            sorted blocks — per-query totals are order-independent.)
        sort_candidates: Morton-sort the CANDIDATE rows too, stream each
            tile's original indices into the kernel as the (value, index)
            lex keys, and rotate each query block's p2 scan to start at
            its own spatial region (per-block start tiles ride the scalar
            prefetch).  The threshold is then near-final after the first
            visited tile, so later tiles admit ~nothing and their entire
            sweep region is skipped (``winning_tiles`` collapses).
            Results stay EXACT — indices are compared by original value,
            so tie order is scan-order independent.  None = auto: ON for
            compiled K > 1 calls with P2 >= 4096 (measured wins at every
            such config — see the auto-gate comment), OFF for K=1 and
            interpret runs.  cand_ids: internal — the original-index
            permutation when p2 arrives pre-sorted (chained rounds and
            seeded reruns reuse the outer call's sort).
        sort_queries: Morton-sort the query rows before the kernel and
            un-permute the outputs after (kernels/spatial_sort.py): lanes
            of a program become spatially coherent, shrinking the
            joint-max sweep gate and phase-2 firing rate (114.8 ->
            104.2 ms at the 100k headline, measured).  Results are
            bit-identical — only the computation order changes.  None =
            auto: ON for compiled multi-query runs (K > 1, P1 >=
            _SORT_MIN_P1) where the sort cost is noise; OFF in interpret
            mode and for tiny/K=1 calls.

    Returns:
        (dists (N, P1, K) ascending, idx (N, P1, K) int32).  No lengths1/pad
        post-processing — callers apply the reference pad conventions.
        With ``instrument=True``: (dists, idx, counters).
    """
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    if round_k is None:
        round_k = _ROUND_K
    if instrument and (K == 1 or K > round_k or sample_bound):
        raise ValueError(
            "instrument=True supports single-round, unsampled K > 1 calls"
        )
    if sort_candidates is None:
        # Hardware A/B (scripts/knn_r5_carried.py, one v5e, vs the
        # query-sorted base): 100k/K=16 102.7 -> 80.7 ms, K=64 +34%,
        # K=128 +16%, K=500 +8.6%, 1M +11.8%, 10k +9%, 512x100k +1.7%;
        # K=1 LOSES 5% (a running top-1 has no admission-gated sweeps to
        # save, and pays the lex tie update) — so auto is ON for every
        # compiled K > 1 call and OFF for K=1 and interpret runs.
        sort_candidates = not interpret and K > 1 and P2 >= 4096
    if sort_candidates and cand_ids is None:
        # ONE candidate sort covers every inner path (chained rounds,
        # seeded reruns): the permutation travels as cand_ids.  The JOINT
        # bounding box keeps p1-block codes and p2-tile boundary codes on
        # the same curve for the per-block scan starts computed at the
        # leaf.
        lo = jnp.minimum(
            jnp.min(p1, axis=1, keepdims=True),
            jnp.min(p2, axis=1, keepdims=True),
        )
        hi = jnp.maximum(
            jnp.max(p1, axis=1, keepdims=True),
            jnp.max(p2, axis=1, keepdims=True),
        )
        cand_ids = jnp.argsort(morton_code(p2, lo, hi), axis=1).astype(
            jnp.int32
        )
        p2 = jnp.take_along_axis(p2, cand_ids[..., None], axis=1)
    if sort_queries is None:
        sort_queries = (
            not interpret
            and K > 1
            and lb is None  # chained rounds inherit the outer call's sort
            and ub is None
            and P1 >= _SORT_MIN_P1
        )
    if sort_queries:
        # Sort, recurse with sorting off (ONE sort covers every inner
        # path — seeded reruns and all chained big-K rounds), un-permute.
        # Per-query bounds travel with their rows.
        order, inverse = morton_argsort(p1)
        p1s = jnp.take_along_axis(p1, order[..., None], axis=1)
        lbs = None if lb is None else (
            jnp.take_along_axis(lb[0], order, axis=1),
            jnp.take_along_axis(lb[1], order, axis=1),
        )
        ubs = None if ub is None else jnp.take_along_axis(ub, order, axis=1)
        out = knn_forward_pallas(
            p1s, p2, lengths2, K, norm, tile_p1, tile_p2, interpret,
            lb=lbs, ub=ubs, gf=gf, depth=depth, round_k=round_k,
            sample_bound=sample_bound, sample_s=sample_s,
            instrument=instrument, sort_queries=False,
            sort_candidates=False, cand_ids=cand_ids,
        )
        d, i = out[0], out[1]
        d = jnp.take_along_axis(d, inverse[..., None], axis=1)
        i = jnp.take_along_axis(i, inverse[..., None], axis=1)
        return (d, i, out[2]) if instrument else (d, i)
    if K > round_k:
        if lb is not None or ub is not None:
            raise ValueError(
                "lb/ub are only supported for single-round calls"
            )
        return _knn_forward_pallas_bigk(
            p1, p2, lengths2, K, norm, tile_p1, tile_p2, interpret, gf,
            round_k=round_k, sample_bound=sample_bound, sample_s=sample_s,
            cand_ids=cand_ids,
        )
    chained = lb is not None
    seeded = ub is not None
    if (chained or seeded) and K == 1:
        raise ValueError("chained/seeded rounds require K > 1")
    if sample_bound and not chained and not seeded and K > 1:
        # Single-round sampled seeding (opt-in for K <= round_k; the big-K
        # path above seeds by default): same bound/detect/fallback scheme
        # with one quantile.  K=1 is excluded — its min-only fast path has
        # no admission-gated work for a seed to save.
        s = sample_s if sample_s is not None else _default_sample_s(P2)
        taus = None
        if P2 >= 4 * s:
            taus = _bigk_round_bounds(
                p1, p2, lengths2, [K], norm, s, interpret, tile_p1, tile_p2
            )
        if taus is None:
            # Loudly fall through: a silent no-op would contaminate any
            # seeded-vs-unseeded comparison the caller is running.
            logger.warning(
                "sample_bound=True ignored: P2=%d needs >= 4*s=%d (or the "
                "deepest quantile outgrew the sample) — running unseeded",
                P2, 4 * s,
            )
        else:
            def seeded_run(ub_r):
                return knn_forward_pallas(
                    p1, p2, lengths2, K, norm, tile_p1, tile_p2, interpret,
                    ub=ub_r, gf=gf, depth=depth, round_k=round_k,
                    sort_queries=False, sort_candidates=False,
                    cand_ids=cand_ids,
                )

            d, i = seeded_run(taus[0])
            inf_tau = jnp.full((N, P1), _INF, jnp.float32)
            return _repair_sentinels(
                d, i, lengths2, K, lambda: seeded_run(inf_tau)
            )
    if tile_p2 is None:
        # Round 5: large K tiles at 4x128 @ T2=1024.  The old (512, 2048)
        # default sits EXACTLY at the 1M-element Mosaic cliff; the chained
        # lb screen's temporaries pushed it over, which is where the
        # +190 ms/round chained tax actually lived (vacuous-lb probes:
        # +174.6 ms at (512, 2048) vs +8.3 ms at (512, 1024); bare K=64 is
        # also faster at 266.0 vs 277.9 ms same-session, v5e 100k).
        tile_p2 = DEFAULT_TILE_P2
        if tile_p1 is None and K > 32:
            tile_p1 = 512
        elif tile_p1 is None and K <= 32 and P2 >= 512 * 1024:
            # Admission-sparse deep streams prefer the flatter 4x128 @
            # T2=2048 shape: 1M x 1M / K=16 sweep (scripts/knn_r5_1m.py,
            # v5e) measures 5.70 s vs 6.25 s for the 100k-tuned 8x128 @
            # 1024 (gf 128, 256x4096, 512x1024, 1024x512 all worse).  The
            # 100k headline keeps the r3 shape (849k vs 809k q/s there).
            tile_p1, tile_p2 = 512, 2048
    auto_tile_p1 = tile_p1 is None
    if auto_tile_p1:
        tile_p1 = DEFAULT_TILE_P1
    tile_p1 = min(tile_p1, max(8, P1))
    tile_p2 = min(tile_p2, max(8, P2))
    if auto_tile_p1 and tile_p1 >= 2 * _CHAIN_WIDTH:
        # Prefer a multi-chain tile (wide single chains measured ~2x
        # slower), ideally under ~12.5% query-padding waste — e.g.
        # P1=1000 picks 4x128 (pad to 1024), P1>=8k picks 8x128.  Only
        # applied when the caller left tile_p1 at the default; explicit
        # values are honored (tile sweeps must measure what they ask for).
        for cand in (1024, 512, 384, 256, 128):
            if cand <= tile_p1 and (-(-P1 // cand) * cand) <= 1.125 * P1:
                tile_p1 = cand
                break
        else:
            # No low-waste candidate (e.g. P1=520): for tiles past 512
            # lanes take the padding hit rather than a wide single chain —
            # C*W > 512 single-chain shapes sit in the measured ~2x Mosaic
            # cliff.  Narrower tiles stay single-chain as before.
            if tile_p1 > 512:
                tile_p1 = min(512, tile_p1 // _CHAIN_WIDTH * _CHAIN_WIDTH)
    if tile_p1 % _CHAIN_WIDTH == 0:
        chains, width = tile_p1 // _CHAIN_WIDTH, _CHAIN_WIDTH
    else:
        chains, width = 1, tile_p1
    CW = chains * width
    P1pad = -(-P1 // CW) * CW
    P2pad = -(-P2 // tile_p2) * tile_p2
    carried = cand_ids is not None
    if carried:
        # Per-block rotated scan starts: each query block's p2 stream
        # begins at its own spatial region, so the threshold is near-final
        # after the first tile and later tiles admit ~nothing.  Block
        # median query codes are searched into the sorted candidates' tile
        # boundary codes — both on the JOINT box, the same curve the
        # candidate sort used.  Wrong starts can only cost speed, never
        # correctness (the full cycle always streams every tile).
        nJ = P2pad // tile_p2
        nb_loc = P1pad // CW
        lo_j = jnp.minimum(
            jnp.min(p1, axis=1, keepdims=True),
            jnp.min(p2, axis=1, keepdims=True),
        )
        hi_j = jnp.maximum(
            jnp.max(p1, axis=1, keepdims=True),
            jnp.max(p2, axis=1, keepdims=True),
        )
        c2 = morton_code(p2, lo_j, hi_j)  # ascending: rows arrive sorted
        bpos = jnp.minimum(
            jnp.arange(nJ, dtype=jnp.int32) * tile_p2, P2 - 1
        )
        bounds = jnp.take_along_axis(
            c2, jnp.broadcast_to(bpos[None, :], (N, nJ)), axis=1
        )
        c1 = morton_code(p1, lo_j, hi_j)
        mpos = jnp.minimum(
            jnp.arange(nb_loc, dtype=jnp.int32) * CW + CW // 2, P1 - 1
        )
        med = jnp.take_along_axis(
            c1, jnp.broadcast_to(mpos[None, :], (N, nb_loc)), axis=1
        )
        starts = jax.vmap(
            lambda b, m: jnp.searchsorted(b, m, side="right")
        )(bounds, med)
        starts = jnp.clip(starts - 1, 0, nJ - 1).astype(jnp.int32)
        gidx_arr = cand_ids.astype(jnp.float32)
        if P2pad != P2:
            gidx_arr = jnp.pad(
                gidx_arr, ((0, 0), (0, P2pad - P2)),
                constant_values=float(P2pad),
            )
        gidx_arr = gidx_arr[..., None]  # (N, P2pad, 1)
    if P1pad != P1:
        p1 = jnp.pad(p1, ((0, 0), (0, P1pad - P1), (0, 0)))
    if P2pad != P2:
        p2 = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0)))
    # Queries transposed host-side so each coordinate is a sublane row that
    # broadcasts along the tile's lane (query) dimension for free.
    p1_t = jnp.swapaxes(p1, 1, 2)  # (N, D, P1pad)
    lengths2_smem = lengths2.astype(jnp.int32)

    nb = P1pad // CW
    grid = (N, nb, P2pad // tile_p2)
    if gf is None:
        # GF=64 wins at every K swept (v5e, 100k x 100k: K=64 GF 64/128/256/
        # 512 -> 879/919/1028/1274 ms) — wider fold buffers cost more in
        # fold/recovery than they save in phase-2 collisions.
        gf = _fold_width(tile_p2, _KNN_FOLD_FLOOR)
    if depth is None:
        # Deeper folds pay extra dependent selects per sweep but slash
        # phase-2 firings; measured at 100k x 100k (v5e, (512,2048,64)):
        # K=64 depth 1/2/3/4 -> 879/461/264/431 ms, K=32 depth 2/3 ->
        # 202/178 ms, but K=16 depth2 120.7 vs depth1 118.0 (collisions
        # already rare at K=16, so K <= 16 stays 1-deep).  depth4's merge
        # network (3 extra min/max per fold step) costs more than the
        # phase-2 firings it removes — 3 is the sweet spot.
        depth = 3 if K > 16 else 1

    kernel = functools.partial(
        _knn_kernel, K=K, norm=norm, tile_p2=tile_p2, chains=chains,
        width=width, gf=gf, chained=chained, seeded=seeded, depth=depth,
        instrument=instrument, carried=carried,
    )
    out_specs = []
    out_shapes = []
    for _c in range(chains):
        out_specs += [
            pl.BlockSpec(
                (1, K, width), lambda n, i, j, *_p: (n, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, K, width), lambda n, i, j, *_p: (n, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((N, K, nb * width), jnp.float32),
            jax.ShapeDtypeStruct((N, K, nb * width), jnp.int32),
        ]
    if instrument:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 8, 128), lambda n, i, j, *_p: (n, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((N, nb, 8, 128), jnp.float32)
        )
    scratch = []
    for _c in range(chains):
        scratch += [pltpu.VMEM((gf, width), jnp.float32)] * (2 + 2 * depth)
    in_specs = [
        pl.BlockSpec(
            (1, D, CW), lambda n, i, j, *_p: (n, 0, i),
            memory_space=pltpu.VMEM,
        ),
    ]
    if carried:
        nJ_s = P2pad // tile_p2

        def _rot(n, i, j, _l, s):
            jj = j + s[n, i]
            return (n, jnp.where(jj >= nJ_s, jj - nJ_s, jj), 0)

        in_specs += [
            pl.BlockSpec(
                (1, tile_p2, D), _rot, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_p2, 1), _rot, memory_space=pltpu.VMEM
            ),
        ]
        operands = [lengths2_smem, starts, p1_t, p2, gidx_arr]
    else:
        in_specs.append(
            pl.BlockSpec(
                (1, tile_p2, D), lambda n, i, j, *_p: (n, j, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands = [lengths2_smem, p1_t, p2]
    if chained:
        lb_d, lb_i = lb
        # Row 1 = nextafter(lbd): "d > lbd" becomes "d >= row1" (f32 d
        # values are exactly representable).  Floor at f32 tiny where
        # lbd >= 0: nextafter(0) is a denormal the TPU flushes to zero
        # (which would re-admit already-taken d == 0 duplicates); kernel
        # distances are themselves flushed, so {d > 0} == {d >= tiny}
        # exactly.  -inf (vacuous round-0 pads) keeps nextafter = -f32max,
        # which admits everything, matching lex > (-inf, -1).
        lb_dp = jnp.nextafter(lb_d, jnp.float32(_INF))
        lb_dp = jnp.where(
            lb_d >= 0,
            jnp.maximum(lb_dp, jnp.float32(jnp.finfo(jnp.float32).tiny)),
            lb_dp,
        )
        lb_arr = jnp.stack(
            [lb_d, lb_dp, lb_i.astype(jnp.float32)], axis=1
        )  # (N, 3, P1)
        if P1pad != P1:
            lb_arr = jnp.pad(
                lb_arr, ((0, 0), (0, 0), (0, P1pad - P1)),
                constant_values=-_INF,
            )
        in_specs.append(
            pl.BlockSpec(
                (1, 3, CW), lambda n, i, j, *_p: (n, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(lb_arr)
    if seeded:
        # Inclusive bound -> exclusive seed: nextafter keeps d == ub
        # admissible under the kernel's strict-< screen.  inf pads (and
        # per-query inf = "no bound") stay inf.  Floor at the smallest
        # NORMAL f32: nextafter(0) is a denormal the TPU flushes to zero
        # (turning "admit d == 0" into "admit nothing"); a larger seed is
        # always safe — it only admits extra sub-denormal candidates, and
        # the sorted state keeps the exact smallest K regardless.
        ub_arr = jnp.maximum(
            jnp.nextafter(ub.astype(jnp.float32), jnp.float32(_INF)),
            jnp.float32(jnp.finfo(jnp.float32).tiny),
        )[:, None, :]  # (N, 1, P1)
        if P1pad != P1:
            ub_arr = jnp.pad(
                ub_arr, ((0, 0), (0, 0), (0, P1pad - P1)),
                constant_values=_INF,
            )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, CW), lambda n, i, j, *_p: (n, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(ub_arr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if carried else 1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * P1pad * P2pad * D,
            bytes_accessed=4 * N * (P1pad * D + P2pad * D + 2 * P1pad * K),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    counters = outs[2 * chains] if instrument else None
    if chains == 1:
        d_full, i_full = outs[0], outs[1]
    else:
        # De-interleave chains: chain c's block i covers queries
        # [i*CW + c*width, i*CW + (c+1)*width) — stack gives
        # (..., i*W + w, c); reorder to (i, c, w) before flattening.
        def deinterleave(arrs):
            st = jnp.stack(arrs, axis=3).reshape(N, K, nb, width, chains)
            return jnp.moveaxis(st, 4, 3).reshape(N, K, P1pad)

        d_full = deinterleave(outs[0 : 2 * chains : 2])
        i_full = deinterleave(outs[1 : 2 * chains : 2])

    d_out = jnp.swapaxes(d_full, 1, 2)[:, :P1]
    i_out = jnp.swapaxes(i_full, 1, 2)[:, :P1]
    if instrument:
        return d_out, i_out, counters
    return d_out, i_out


def _default_sample_s(P2: int) -> int:
    """Default strided-sample size for kth-bound seeding: ~P2/16 (the
    sample pass then costs ~6% of one full round), lane-rounded, clamped
    to [4096, 65536]."""
    return min(max(P2 // 16 // 1024 * 1024, 4096), 65536)


def _rank_formula(mu, sqrt, ceil):
    """The ONE margin-rank expression — shared by the static m_max
    (math.*) and the per-cloud jnp ranks, so the ``m_r <= m_max`` usability
    gate can never drift from the rank it bounds."""
    return ceil(mu + _BOUND_MARGIN_SIGMA * sqrt(mu) + _BOUND_MARGIN_ABS)


def _bound_m(mu: float) -> int:
    """Static sample rank for a target quantile with expected sample count
    ``mu`` — see _BOUND_MARGIN_* for the tail math."""
    return int(_rank_formula(mu, math.sqrt, math.ceil))


def _repair_sentinels(d, i, lengths2, K, rerun):
    """Shared exactness repair for ub-seeded runs: a ``_SENT`` in any slot
    the cloud could have filled (k < lengths2) means some bound was too
    tight for some query — one ``lax.cond`` reruns via ``rerun()`` (the
    same compiled kernel fed +inf bounds).  Legit sentinels (k >= lengths2
    exhaustion) are excluded from detection and mapped to the unseeded
    path's (value, 0) fill, preserving the documented contract downstream
    (ring merge, pad conventions)."""
    k_live = (
        jnp.arange(K, dtype=jnp.int32)[None, None, :]
        < lengths2[:, None, None]
    )
    fail = jnp.any((i == _SENT) & k_live)
    d, i = jax.lax.cond(fail, rerun, lambda: (d, i))
    return d, jnp.where(i == _SENT, 0, i)


def _bigk_round_bounds(
    p1, p2, lengths2, kqs, norm, s, interpret, tile_p1, tile_p2
):
    """Per-round sampled kth-distance bounds for the chained big-K path.

    One KNN over an s-point strided sample of p2 (run through this very
    kernel, so the bound shares the exact distance numerics of the main
    pass) yields, for every round r, ``tau_r`` = the m_r-th smallest sample
    distance — an upper bound on the true kq_r-th distance except with the
    tail probability bounded by _BOUND_MARGIN_* (and those rare failures
    are detected downstream, never silent).  Returns a list of (N, P1) f32
    bounds (+inf disables filtering: short clouds, exhausted quantiles).
    """
    N, P1, _ = p1.shape
    P2 = p2.shape[1]
    len_eff = max(P2 // 2, 1)  # worst cloud length the static rank covers
    m_max = _bound_m(s * kqs[-1] / len_eff)
    if m_max > min(s, 512):
        return None  # sample too small for the deepest quantile
    # Strided sample: any subset gives a valid (detected-if-loose) bound, a
    # stride just keeps the gather coalesced.  f32 stride math can round;
    # the clamp keeps indices in range, duplicates only loosen nothing —
    # filtered clouds have len2 >= len_eff > s, so strides stay distinct.
    stride = lengths2.astype(jnp.float32)[:, None] / float(s)
    sidx = jnp.minimum(
        (jnp.arange(s, dtype=jnp.float32)[None, :] * stride).astype(
            jnp.int32
        ),
        jnp.maximum(lengths2[:, None] - 1, 0),
    )  # (N, s)
    p2s = jnp.take_along_axis(p2, sidx[:, :, None], axis=1)  # (N, s, D)
    len_s = jnp.minimum(lengths2, s)
    m_pad = -(-m_max // 8) * 8  # sublane-friendly state height
    d_s, _ = knn_forward_pallas(
        p1, p2s, len_s, min(m_pad, s), norm, tile_p1, tile_p2,
        interpret=interpret, sample_bound=False,
    )  # (N, P1, >=m_max) ascending; exhausted slots carry +inf
    taus = []
    mu_all = s * jnp.asarray(kqs, jnp.float32)[None, :] / jnp.maximum(
        lengths2.astype(jnp.float32)[:, None], 1.0
    )  # (N, R) per-cloud expected sample counts
    m_r = _rank_formula(mu_all, jnp.sqrt, jnp.ceil).astype(
        jnp.int32
    )  # (N, R) per-cloud exact ranks
    usable = (m_r <= m_max) & (lengths2[:, None] >= len_eff)
    m_r = jnp.clip(m_r, 1, m_max)
    for r in range(len(kqs)):
        tau = jnp.take_along_axis(
            d_s, jnp.broadcast_to(m_r[:, r][:, None, None] - 1, (N, P1, 1)),
            axis=2,
        )[..., 0]
        taus.append(jnp.where(usable[:, r][:, None], tau, _INF))
    return taus


def _knn_forward_pallas_bigk(
    p1, p2, lengths2, K, norm, tile_p1, tile_p2, interpret, gf=None,
    round_k=None, sample_bound=None, sample_s=None, cand_ids=None,
):
    """K > 64 via round chaining (all rounds inside one XLA program, one
    kernel compilation): round r re-runs the 64-key kernel admitting only
    candidates lexicographically above round r-1's per-query (kth value,
    kth index), so the concatenated rounds are exactly the global ascending
    (value, index) order — the order MinK + the reference post-sort produce
    (functions/knn.py:77-89).  Rounds past ceil(min(K, P2)/64) cannot admit
    anything and are skipped; exhausted entries carry the kernel's
    (inf, 0) fill, which the caller's pad conventions zero out.

    Round 4: every round's state is additionally SEEDED at a sampled
    per-query bound on its closing quantile (kq_r = (r+1)*Kc), so the
    admission window is (lb_r, tau_r] from the first tile — insertion
    sweeps track the true window content instead of the state-filling
    transient.  A too-tight bound leaves a ``_SENT`` index in a valid slot;
    one ``lax.cond`` reruns the whole chain with tau=+inf (the SAME
    compiled kernel, just inf operands) — results are exact regardless of
    the sample."""
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    Kc = _ROUND_K if round_k is None else round_k
    rounds = max(1, -(-min(K, P2) // Kc))

    def run(taus):
        ds, idxs = [], []
        lb = None  # round 0's lower bound is vacuous: run unchained
        for r in range(rounds):
            d, i = knn_forward_pallas(
                p1, p2, lengths2, Kc, norm, tile_p1, tile_p2, interpret,
                lb=lb, ub=None if taus is None else taus[r], gf=gf,
                round_k=Kc, sort_queries=False, sort_candidates=False,
                cand_ids=cand_ids,
            )
            ds.append(d)
            idxs.append(i)
            # Exhausted queries carry lb_d = inf: finite distances can
            # never lex-exceed it, so later rounds admit nothing for them.
            lb = (d[..., -1], i[..., -1])
        d = ds[0] if rounds == 1 else jnp.concatenate(ds, axis=2)
        i = idxs[0] if rounds == 1 else jnp.concatenate(idxs, axis=2)
        if d.shape[2] < K:
            d = jnp.pad(
                d, ((0, 0), (0, 0), (0, K - d.shape[2])),
                constant_values=_INF,
            )
            i = jnp.pad(i, ((0, 0), (0, 0), (0, K - i.shape[2])))
        return d[:, :, :K], i[:, :, :K]

    explicit = sample_bound is True
    if sample_bound is None:
        sample_bound = True
    s = sample_s if sample_s is not None else _default_sample_s(P2)
    taus = None
    if sample_bound and P2 >= 4 * s:
        kqs = [min((r + 1) * Kc, K) for r in range(rounds)]
        taus = _bigk_round_bounds(
            p1, p2, lengths2, kqs, norm, s, interpret, tile_p1, tile_p2
        )
    if taus is None:
        if explicit:
            logger.warning(
                "sample_bound=True ignored: P2=%d needs >= 4*s=%d (or the "
                "deepest quantile outgrew the sample) — running unseeded",
                P2, 4 * s,
            )
        return run(None)

    d, i = run(taus)
    inf_taus = [jnp.full((N, P1), _INF, jnp.float32)] * rounds
    return _repair_sentinels(d, i, lengths2, K, lambda: run(inf_taus))
