"""Round-2 KNN kernel experiment: TRANSPOSED selection layout.

The r1 kernel computes distance tiles as (T1, T2) (queries on sublanes) and
keeps its running top-K state as (T1, K) — so every insert/extract op uses
K=16 of 128 lanes (7/8 of each vreg idle), and per-row vectors (T1,) are
sublane-resident, making state updates strided.

This experiment flips the selection to (T2, T1): queries ride the LANES.
 - top-K state is (K, T1): 4 vregs instead of 32 for every insert op
 - per-query vectors (mval, lanes, thresh) are (1, T1) lane vectors
 - the fold to group minima is a sublane-halving min chain
 - sublane concat/roll replace lane-strided shifts in the insert

Distance production strategies compared (the selection wants d as (T2,T1)):
  dist=xpose : compute (T1,T2) natural (cheap broadcasts) then transpose
  dist=ycols : y fed natural (T2, D); per-axis column extracts
Correctness is checked against ops.knn._knn_forward_full before timing.

Run on the TPU:  python scripts/knn_r2_transposed.py
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


def _kernel(
    l2_ref,      # SMEM (N,)
    p1t_ref,     # VMEM (1, D, T1)   queries transposed (coords on sublanes)
    p2_ref,      # VMEM (1, T2, D)   refs natural   (dist=ycols)
    p2t_ref,     # VMEM (1, D, T2)   refs transposed (dist=xpose)
    out_d_ref,   # VMEM (1, K, T1)   running state, transposed
    out_i_ref,   # VMEM (1, K, T1)
    dw_ref,      # VMEM (T2, T1)
    af_ref,      # VMEM (GF, T1)
    ai_ref,      # VMEM (GF, T1)
    wm_ref,      # VMEM (GF, T1)
    wml_ref,     # VMEM (GF, T1)
    done_ref,    # SMEM (1,) int32 — done-flag sweep gating
    *,
    K: int,
    tile_p2: int,
    gf: int,
    dist: str,
    blocks: int,
    p2s: str,
    rec: str,    # "onehot" | "dualfold" — fold index recovery scheme
    p2b: str,    # "concat" | "reshape" — phase-2 watermark broadcast
    gate: str,   # "cnt" | "done"      — sweep-count gating
    sweeps: str, # "gated" | "uncond"  — branchy maxc-gated vs branch-free K
    stop: str,   # ablation: "dist"|"screen"|"fold"|"sweeps"|"" (full)
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_d_ref[...] = jnp.full(out_d_ref.shape, _INF, jnp.float32)
        out_i_ref[...] = jnp.zeros(out_i_ref.shape, jnp.int32)

    xt = p1t_ref[0]          # (D, T1)
    D = xt.shape[0]
    T1 = xt.shape[1]
    T2 = tile_p2

    if dist == "xpose":
        y_t = p2t_ref[0]     # (D, T2)
        d_n = jnp.zeros((T1, T2), jnp.float32)
        for di in range(D):
            diff = xt[di][:, None] - y_t[di][None, :]
            d_n = d_n + diff * diff
        d = d_n.T            # (T2, T1)
    else:  # ycols
        y = p2_ref[0]        # (T2, D)
        d = jnp.zeros((T2, T1), jnp.float32)
        for di in range(D):
            diff = y[:, di][:, None] - xt[di][None, :]
            d = d + diff * diff

    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    len2 = l2_ref[pl.program_id(0)]
    d = jnp.where(j * tile_p2 + row < len2, d, _INF)

    if K == 1:
        m = jnp.min(d, axis=0)
        am = jnp.argmin(d, axis=0).astype(jnp.int32)
        better = m < out_d_ref[0][0]
        out_d_ref[0, 0] = jnp.where(better, m, out_d_ref[0, 0])
        out_i_ref[0, 0] = jnp.where(better, j * tile_p2 + am, out_i_ref[0, 0])
        return

    if stop == "dist":
        out_d_ref[0, 0] = jnp.minimum(out_d_ref[0][0], jnp.min(d, axis=0))
        return

    state_d = out_d_ref[0]                 # (K, T1)
    thresh = state_d[K - 1][None, :]       # (1, T1)
    win = d < thresh
    if gate == "cnt":
        cnt = jnp.sum(win.astype(jnp.int32), axis=0)   # (T1,)
        maxc_all = jnp.minimum(jnp.max(cnt), K)
        any_win = maxc_all > 0
    else:
        # done-flag gating: one per-lane min pass instead of the count
        # reduction; sweeps self-terminate when the fold buffer empties.
        minr = jnp.min(d, axis=0)          # (T1,)
        any_win = jnp.max(jnp.where(minr < thresh[0], 1, 0)) > 0

    if stop == "screen":
        poke = maxc_all if gate == "cnt" else jnp.where(any_win, 1, 0)
        out_d_ref[0, 0] = jnp.minimum(
            out_d_ref[0][0], jnp.min(d, axis=0) + poke.astype(jnp.float32)
        )
        return

    krow = jax.lax.broadcasted_iota(jnp.int32, (K, T1), 0)

    def insert(m, gidx, ls, le):
        """Insert block-local (m (bw,), gidx (bw,)) into lane-slice [ls:le)
        of the sorted (K, T1) state, lexicographic (value, index)."""
        state = out_d_ref[0][:, ls:le]
        sti = out_i_ref[0][:, ls:le]
        mb = m[None, :]
        gb = gidx[None, :]
        pos = jnp.sum(
            ((state < mb) | ((state == mb) & (sti < gb))).astype(jnp.int32),
            axis=0,
        )[None, :]
        shifted_d = jnp.concatenate([state[:1], state[:-1]], axis=0)
        shifted_i = jnp.concatenate([sti[:1], sti[:-1]], axis=0)
        kr = krow[:, ls:le]
        out_d_ref[0, :, ls:le] = jnp.where(
            kr < pos, state, jnp.where(kr == pos, mb, shifted_d)
        )
        out_i_ref[0, :, ls:le] = jnp.where(
            kr < pos, sti, jnp.where(kr == pos, gb, shifted_i)
        )

    GF = gf
    n_folds = (tile_p2 // GF).bit_length() - 1
    reps = T2 // GF
    row_f = row.astype(jnp.float32)
    row_gf = jax.lax.broadcasted_iota(jnp.int32, (GF, T1), 0)

    @pl.when(any_win)
    def _():
        dw_ref[...] = jnp.where(win, d, _INF)
        if rec == "dualfold":
            # Fold (value, row-id) pairs with select chains: half the ops of
            # value-fold + one-hot recovery.  keep = lo <= hi keeps the LOWER
            # original row on ties (lo half rows < hi half rows always).
            h = dw_ref[...]
            hidx = row_f
            for _f in range(n_folds):
                half = h.shape[0] // 2
                lo, hiv = h[:half], h[half:]
                il, ih = hidx[:half], hidx[half:]
                keep = lo <= hiv
                h = jnp.where(keep, lo, hiv)
                hidx = jnp.where(keep, il, ih)
            af_ref[...] = h
            ai_ref[...] = hidx
        else:
            h = dw_ref[...]
            for _f in range(n_folds):
                half = h.shape[0] // 2
                h = jnp.minimum(h[:half], h[half:])
            af_ref[...] = h
            if n_folds > 0:
                gm_b = jnp.concatenate([h] * reps, axis=0)
                lane_val = jnp.where(dw_ref[...] == gm_b, row_f, 3e38)
                for _f in range(n_folds):
                    half = lane_val.shape[0] // 2
                    lane_val = jnp.minimum(lane_val[:half], lane_val[half:])
                ai_ref[...] = lane_val
            else:
                ai_ref[...] = row_f
        if p2s in ("wm", "lite"):
            wm_ref[...] = jnp.full(wm_ref.shape, -_INF, jnp.float32)
            wml_ref[...] = jnp.full(wml_ref.shape, -1.0, jnp.float32)
        else:
            # "gm" scheme: phase 1 retires each group AT MOST once (af[g] is
            # masked to inf on extraction and never refilled), so the last-
            # extracted entry of a retired group IS the original group
            # minimum: record (h, lane) once and skip per-sweep updates.
            wm_ref[...] = h

        if stop == "fold":
            return
        if sweeps == "fori":
            # Single hardware loop with a dynamic trip count instead of K
            # unrolled pl.when regions: the sweep body is k-independent, and
            # each untaken pl.when still costs scalar-core branch work.
            def sweep_body(_k, carry):
                av = af_ref[...]
                mval = jnp.min(av, axis=0)
                sub_f = jnp.min(
                    jnp.where(av == mval[None, :], ai_ref[...], 3e38), axis=0
                )
                sub_sel = sub_f.astype(jnp.int32)
                insert(mval, j * tile_p2 + sub_sel, 0, T1)
                g_sel = sub_sel - (sub_sel // GF) * GF
                upd = (row_gf == g_sel[None, :]) & (mval[None, :] < _INF)
                af_ref[...] = jnp.where(upd, _INF, av)
                if p2s in ("wm", "lite"):
                    wm_ref[...] = jnp.where(upd, mval[None, :], wm_ref[...])
                    wml_ref[...] = jnp.where(upd, sub_f[None, :], wml_ref[...])
                return carry

            jax.lax.fori_loop(0, maxc_all, sweep_body, 0)
        elif sweeps == "uncond":
            # Branch-free extraction: always K sweeps (empty lanes extract
            # inf), collect the (value, idx) candidates — produced in
            # nondecreasing lex order — then ONE rank-based merge of the two
            # sorted (K, T1) lists.  No scalar branches inside the loop, so
            # Mosaic can software-pipeline across sweeps; the (K, K, T1)
            # rank compares are lane-dense in this transposed layout.
            cd_list = []
            ci_list = []
            for k in range(K):
                av = af_ref[...]
                mval = jnp.min(av, axis=0)
                sub_f = jnp.min(
                    jnp.where(av == mval[None, :], ai_ref[...], 3e38), axis=0
                )
                sub_sel = sub_f.astype(jnp.int32)
                cd_list.append(mval)
                ci_list.append(
                    jnp.where(mval < _INF, j * tile_p2 + sub_sel, 2**30)
                )
                g_sel = sub_sel - (sub_sel // GF) * GF
                upd = (row_gf == g_sel[None, :]) & (mval[None, :] < _INF)
                af_ref[...] = jnp.where(upd, _INF, av)
                if p2s in ("wm", "lite"):
                    wm_ref[...] = jnp.where(upd, mval[None, :], wm_ref[...])
                    wml_ref[...] = jnp.where(upd, sub_f[None, :], wml_ref[...])
            cand_d = jnp.stack(cd_list, axis=0)   # (K, T1) lex nondecreasing
            cand_i = jnp.stack(ci_list, axis=0)
            state = out_d_ref[0]
            sti = out_i_ref[0]
            # c_lt_s[c, s, lane] = lex(cand_c) < lex(state_s)
            c_lt_s = (cand_d[:, None, :] < state[None, :, :]) | (
                (cand_d[:, None, :] == state[None, :, :])
                & (cand_i[:, None, :] < sti[None, :, :])
            )
            nles = jnp.sum(c_lt_s.astype(jnp.int32), axis=0)   # (K_s, T1)
            rank_s = krow + nles
            rank_c = (
                jax.lax.broadcasted_iota(jnp.int32, (K, T1), 0)
                + K
                - jnp.sum(c_lt_s.astype(jnp.int32), axis=1)    # (K_c, T1)
            )
            oh_s = rank_s[None] == krow[:, None, :]
            oh_c = rank_c[None] == krow[:, None, :]
            # where-select, NOT multiply: inf pads in state/cand would turn
            # 0 * inf into NaN and poison the sums.
            out_d_ref[0] = jnp.sum(
                jnp.where(oh_s, state[None], 0.0), axis=1
            ) + jnp.sum(jnp.where(oh_c, cand_d[None], 0.0), axis=1)
            out_i_ref[0] = jnp.sum(
                jnp.where(oh_s, sti[None], 0), axis=1
            ) + jnp.sum(jnp.where(oh_c, cand_i[None], 0), axis=1)
        else:
            if gate == "done":
                done_ref[0] = 0
            bw = T1 // blocks
            for b in range(blocks):
                ls, le = b * bw, (b + 1) * bw
                if gate == "cnt":
                    maxc = (
                        maxc_all
                        if blocks == 1
                        else jnp.minimum(jnp.max(cnt[ls:le]), K)
                    )
                for k in range(K):

                    @pl.when((k < maxc) if gate == "cnt" else (done_ref[0] == 0))
                    def _(k=k, ls=ls, le=le):
                        av = af_ref[:, ls:le]
                        mval = jnp.min(av, axis=0)              # (bw,)
                        if gate == "done":
                            done_ref[0] = jnp.where(
                                jnp.min(mval) < _INF, 0, 1
                            )
                        sub_f = jnp.min(
                            jnp.where(av == mval[None, :], ai_ref[:, ls:le], 3e38),
                            axis=0,
                        )
                        sub_sel = sub_f.astype(jnp.int32)
                        insert(mval, j * tile_p2 + sub_sel, ls, le)
                        g_sel = sub_sel - (sub_sel // GF) * GF
                        upd = (row_gf[:, ls:le] == g_sel[None, :]) & (
                            mval[None, :] < _INF
                        )
                        af_ref[:, ls:le] = jnp.where(upd, _INF, av)
                        if p2s in ("wm", "lite"):
                            wm_ref[:, ls:le] = jnp.where(
                                upd, mval[None, :], wm_ref[:, ls:le]
                            )
                            wml_ref[:, ls:le] = jnp.where(
                                upd, sub_f[None, :], wml_ref[:, ls:le]
                            )

        if stop == "sweeps":
            return
        if n_folds > 0:
            t_new = out_d_ref[0][K - 1][None, :]
            dwv = dw_ref[...]
            if p2s == "lite":
                # Exact 7-pass screen: a tie candidate with a LOWER row than
                # the group watermark cannot exist (extraction retires
                # lowest-(value,row) first), so "lex > (wm, wml)" collapses
                # to "dwv >= wm and row != wml".
                wm_b = jnp.concatenate([wm_ref[...]] * reps, axis=0)
                wml_b = jnp.concatenate([wml_ref[...]] * reps, axis=0)
                surv = (
                    (dwv <= jnp.minimum(t_new, 3e38))
                    & (dwv >= wm_b)
                    & (row_f != wml_b)
                )
            elif p2s == "wm" and p2b == "reshape":
                dv3 = dwv.reshape(reps, GF, T1)
                row3 = row_f.reshape(reps, GF, T1)
                wm3 = wm_ref[...][None]
                wml3 = wml_ref[...][None]
                surv = (
                    (dv3 <= jnp.minimum(t_new, 3e38)[None])
                    & ((dv3 > wm3) | ((dv3 == wm3) & (row3 > wml3)))
                ).reshape(T2, T1)
            elif p2s == "wm":
                wm_b = jnp.concatenate([wm_ref[...]] * reps, axis=0)
                wml_b = jnp.concatenate([wml_ref[...]] * reps, axis=0)
                surv = (dwv <= jnp.minimum(t_new, 3e38)) & (
                    (dwv > wm_b) | ((dwv == wm_b) & (row_f > wml_b))
                )
            else:
                alive_b = jnp.concatenate(
                    [af_ref[...] < _INF] * reps, axis=0
                )
                gm_b2 = jnp.concatenate([wm_ref[...]] * reps, axis=0)
                gml_b = jnp.concatenate([ai_ref[...]] * reps, axis=0)
                surv = (dwv <= jnp.minimum(t_new, 3e38)) & (
                    alive_b
                    | (dwv > gm_b2)
                    | ((dwv == gm_b2) & (row_f > gml_b))
                )
            maxc2 = jnp.minimum(
                jnp.max(jnp.sum(surv.astype(jnp.int32), axis=0)), K
            )

            @pl.when(maxc2 > 0)
            def _():
                dw_ref[...] = jnp.where(surv, dwv, _INF)
                if sweeps == "fori":
                    def p2_body(_k, carry):
                        dw = dw_ref[...]
                        m = jnp.min(dw, axis=0)
                        am = jnp.argmin(dw, axis=0).astype(jnp.int32)
                        insert(m, j * tile_p2 + am, 0, T1)
                        dw_ref[...] = jnp.where(row == am[None, :], _INF, dw)
                        return carry

                    jax.lax.fori_loop(0, maxc2, p2_body, 0)
                else:
                    for k in range(K):

                        @pl.when(k < maxc2)
                        def _(k=k):
                            dw = dw_ref[...]
                            m = jnp.min(dw, axis=0)
                            am = jnp.argmin(dw, axis=0).astype(jnp.int32)
                            insert(m, j * tile_p2 + am, 0, T1)

                            @pl.when(k + 1 < maxc2)
                            def _():
                                dw_ref[...] = jnp.where(
                                    row == am[None, :], _INF, dw
                                )


@functools.partial(
    jax.jit,
    static_argnames=("K", "tile_p1", "tile_p2", "gf", "dist", "blocks",
                     "p2s", "rec", "p2b", "gate", "sweeps", "stop",
                     "interpret"),
)
def knn_transposed(
    p1, p2, lengths2, K, tile_p1=256, tile_p2=2048, gf=256, dist="ycols",
    blocks=1, p2s="wm", rec="onehot", p2b="concat", gate="cnt",
    sweeps="gated", stop="", interpret=False,
):
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    P1pad = -(-P1 // tile_p1) * tile_p1
    P2pad = -(-P2 // tile_p2) * tile_p2
    if P1pad != P1:
        p1 = jnp.pad(p1, ((0, 0), (0, P1pad - P1), (0, 0)))
    if P2pad != P2:
        p2 = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0)))
    p1_t = jnp.swapaxes(p1, 1, 2)    # (N, D, P1pad)
    p2_t = jnp.swapaxes(p2, 1, 2)    # (N, D, P2pad)
    l2 = lengths2.astype(jnp.int32)
    grid = (N, P1pad // tile_p1, P2pad // tile_p2)
    kernel = functools.partial(
        _kernel, K=K, tile_p2=tile_p2, gf=gf, dist=dist, blocks=blocks,
        p2s=p2s, rec=rec, p2b=p2b, gate=gate, sweeps=sweeps, stop=stop,
    )
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
        ],
        out_specs=[
            pl.BlockSpec((1, K, tile_p1), lambda n, i, j, _l: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, tile_p1), lambda n, i, j, _l: (n, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_p2, tile_p1), jnp.float32),
            pltpu.VMEM((gf, tile_p1), jnp.float32),
            pltpu.VMEM((gf, tile_p1), jnp.float32),
            pltpu.VMEM((gf, tile_p1), jnp.float32),
            pltpu.VMEM((gf, tile_p1), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, K, P1pad), jnp.float32),
            jax.ShapeDtypeStruct((N, K, P1pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(l2, p1_t, p2, p2_t)
    return jnp.swapaxes(out_d, 1, 2)[:, :P1], jnp.swapaxes(out_i, 1, 2)[:, :P1]


def _force(o):
    return float(jax.tree_util.tree_leaves(o)[0].sum())


def timeit(fn, iters=3):
    _force(fn())
    t0 = time.time()
    for _ in range(iters):
        _force(fn())
    return (time.time() - t0) / iters


def check(cfg, P=8192, K=16, interpret=False):
    from pytorch3d_pointops_tpu.ops.knn import _knn_forward_full

    import numpy as np

    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    l = jnp.asarray([P - 37], jnp.int32)
    l1 = jnp.asarray([P], jnp.int32)
    d_t, i_t = knn_transposed(p1, p2, l, K=K, interpret=interpret, **cfg)
    d_r, i_r = _knn_forward_full(p1, p2, l1, l, K, 2)
    np.testing.assert_allclose(
        np.asarray(d_t), np.asarray(d_r), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_r))
    print(f"  check OK {cfg}")


def compiled_with_vmem(p1, p2, lengths, K, vmem_kib, **cfg):
    """Compile knn_transposed with a raised scoped-VMEM limit."""
    fn = lambda a, b, l: knn_transposed(a, b, l, K=K, **cfg)  # noqa: E731
    lowered = jax.jit(fn).lower(p1, p2, lengths)
    return lowered.compile(
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": vmem_kib}
    )


if __name__ == "__main__":
    P, K = 100_000, 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)

    base = dict(tile_p1=256, tile_p2=2048, gf=64, dist="ycols", blocks=1,
                p2s="wm")
    cfgs = [
        dict(base, tile_p1=128),
        dict(base, tile_p2=1024),
        dict(base, tile_p1=128, tile_p2=1024, gf=32),
        dict(base, tile_p1=512),
    ]
    vm_cfgs = []
    for cfg in cfgs:
        try:
            if not cfg.get("stop"):
                check(cfg)
            t = timeit(lambda: knn_transposed(p1, p2, lengths, K=K, **cfg)[0])
            print(f"{cfg}: {t*1e3:8.1f} ms  {P/t:,.0f} q/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{cfg}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    for cfg in vm_cfgs:
        try:
            compiled = compiled_with_vmem(p1, p2, lengths, K, 65536, **cfg)
            t = timeit(lambda: compiled(p1, p2, lengths)[0])
            print(f"VM64 {cfg}: {t*1e3:8.1f} ms  {P/t:,.0f} q/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"VM64 {cfg}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
