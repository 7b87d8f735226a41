"""Round-3 KNN experiment harness — rounds A-G results of record.

Variant flags: nodw (no dw scratch; recompute from the live d_all),
cgate (exact phase-2 collision gate, or "perchain"), p2gate (maxc>=2),
light=L (direct lex-walk when maxc<=L), stop modes (dist/screen/nophase2
floors), chains/width/tile_p2/gf tiling.

Measured conclusions (N=M=100k K=16, one v5e; also see CLAUDE.md):
  A/B: the r2 "512-lane cliff" is a >1M-ELEMENT distance-tile cliff —
       (2048,1024), (1024,1536), (4096,512) collapse ~2x regardless of
       scratch; (1024,1024), (2048,512), (512,2048) are fine.  At constant
       tile area more chains do NOT win on their own.
  C/D: nodw +6%; cgate +1-2.5%; together with the 8x128@T2=1024 retile:
       809k -> 836-849k single-dispatch (SHIPPED to knn_pallas.py).
       cgate+gf256 adds buffers that re-trigger the cliff (460k).
  E:   T2=512 too small (674k); gf 32/128 neutral-to-worse; 12x128 cliffs.
  F:   cgate="perchain" REJECTED (278k) — divergent pl.when regions
       serialize catastrophically; keep conditionals joint across chains.
  G:   light path REJECTED — neutral at L=2 (100k AND 1M), worse at L>=3;
       the fold path beats full-width walks even at tiny maxc.
  Floors at the shipped config: dist 55.9 ms / +screen 58.6 / +phase-1
  sweeps 94.6 / full 117.7-120.9 — of which ~29 ms is tunnel dispatch RTT
  (see ROOFLINE.md's correction; true per-call is 94.9 ms = 1.05M q/s).

Run on the TPU:  python scripts/knn_r3.py [quick]
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
    l2_ref,
    p1t_ref,   # (1, D, C*W)
    p2_ref,    # (1, T2, D)
    *refs,     # C x (out_d, out_i) then scratch (see below)
    K: int,
    tile_p2: int,
    gf: int,
    chains: int,
    width: int,
    nodw: bool,
    p2gate: bool,
    cgate: bool,
    light: int,
    stop: str,
):
    j = pl.program_id(2)
    C, W, GF, T2 = chains, width, gf, tile_p2
    out_d = refs[0:2 * C:2]
    out_i = refs[1:2 * C:2]
    scratch = refs[2 * C:]
    if nodw:
        dw = None
        af = scratch[0::4]
        ai = scratch[1::4]
        wm = scratch[2::4]
        wml = scratch[3::4]
    else:
        dw = scratch[0::5]
        af = scratch[1::5]
        ai = scratch[2::5]
        wm = scratch[3::5]
        wml = scratch[4::5]

    @pl.when(j == 0)
    def _():
        for c in range(C):
            out_d[c][...] = jnp.full(out_d[c].shape, _INF, jnp.float32)
            out_i[c][...] = jnp.zeros(out_i[c].shape, jnp.int32)

    xt = p1t_ref[0]   # (D, C*W)
    y = p2_ref[0]     # (T2, D)
    D = xt.shape[0]

    d_all = jnp.zeros((T2, C * W), jnp.float32)
    for di in range(D):
        diff = y[:, di][:, None] - xt[di][None, :]
        d_all = d_all + diff * diff
    row = jax.lax.broadcasted_iota(jnp.int32, (T2, W), 0)
    len2 = l2_ref[pl.program_id(0)]
    rmask = j * T2 + row < len2

    if stop == "dist":
        for c in range(C):
            d_c = jnp.where(rmask, d_all[:, c * W:(c + 1) * W], _INF)
            m = jnp.min(d_c, axis=0)
            out_d[c][0, 0] = jnp.minimum(out_d[c][0, 0], m)
        return

    slices = []
    wins = []
    cnts = []
    threshs = []
    for c in range(C):
        d_c = d_all[:, c * W:(c + 1) * W]
        slices.append(d_c)
        thresh = out_d[c][0][K - 1][None, :]
        threshs.append(thresh)
        win = (d_c < thresh) & rmask
        wins.append(win)
        cnts.append(jnp.sum(win.astype(jnp.int32), axis=0))

    maxc = jnp.minimum(
        functools.reduce(jnp.maximum, [jnp.max(cn) for cn in cnts]), K
    )
    if stop == "screen":
        for c in range(C):
            out_d[c][0, 0] = jnp.minimum(
                out_d[c][0, 0], cnts[c].astype(jnp.float32)
            )
        return

    krow = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
    row_gf = jax.lax.broadcasted_iota(jnp.int32, (GF, W), 0)
    row_f = row.astype(jnp.float32)
    n_folds = (T2 // GF).bit_length() - 1
    reps = T2 // GF

    def insert(c, m, gidx):
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
        """Screened distances: the dw scratch read, or its recompute from
        the live distance tile (win implies the rmask)."""
        if nodw:
            return jnp.where(wins[c], slices[c], _INF)
        return dw[c][...]

    def light_walk():
        """Direct lex-(value, row) walk extraction: exact for any maxc but
        pays a full-width reduce pair per sweep — a win only when maxc is
        tiny (late-stream tiles), where it skips the whole fold build,
        recovery fold, watermarks and phase 2."""
        for c in range(C):
            wm[c][0:1] = jnp.full((1, W), -_INF, jnp.float32)
            wml[c][0:1] = jnp.full((1, W), -1.0, jnp.float32)
        for k in range(light):

            @pl.when(k < maxc)
            def _(k=k):
                for c in range(C):
                    dwv = dw_val(c)
                    lv = wm[c][0:1]
                    lr = wml[c][0:1]
                    live = (dwv > lv) | ((dwv == lv) & (row_f > lr))
                    dvx = jnp.where(live, dwv, _INF)
                    m = jnp.min(dvx, axis=0)
                    am_f = jnp.min(
                        jnp.where(dvx == m[None, :], row_f, 3e38), axis=0
                    )
                    insert(c, m, j * T2 + am_f.astype(jnp.int32))
                    wm[c][0:1] = m[None, :]
                    wml[c][0:1] = am_f[None, :]

    def heavy_path():
        fire_terms = []
        for c in range(C):
            if not nodw:
                dw[c][...] = jnp.where(wins[c], slices[c], _INF)
            h = dw_val(c)
            for _f in range(n_folds):
                half = h.shape[0] // 2
                h = jnp.minimum(h[:half], h[half:])
            af[c][...] = h
            if cgate:
                # Exact same-group collision detector: a lane needs MORE
                # admissions than distinct admitted groups for phase 1 to
                # leave anything behind.  Collision-free lanes with
                # cnt > K are also safe: extraction is globally ascending,
                # so the K smallest were taken and the rest sit at or
                # above the new kth.
                ng = jnp.sum((h < _INF).astype(jnp.int32), axis=0)
                fire_terms.append(jnp.max(cnts[c] - ng))
            gm_b = jnp.concatenate([h] * reps, axis=0)
            rv = jnp.where(dw_val(c) == gm_b, row_f, 3e38)
            for _f in range(n_folds):
                half = rv.shape[0] // 2
                rv = jnp.minimum(rv[:half], rv[half:])
            ai[c][...] = rv
            wm[c][...] = jnp.full(wm[c].shape, -_INF, jnp.float32)
            wml[c][...] = jnp.full(wml[c].shape, -1.0, jnp.float32)

        for k in range(K):

            @pl.when(k < maxc)
            def _(k=k):
                for c in range(C):
                    av = af[c][...]
                    mval = jnp.min(av, axis=0)
                    sub_f = jnp.min(
                        jnp.where(av == mval[None, :], ai[c][...], 3e38),
                        axis=0,
                    )
                    sub_sel = sub_f.astype(jnp.int32)
                    insert(c, mval, j * T2 + sub_sel)
                    g_sel = sub_sel - (sub_sel // GF) * GF
                    upd = (row_gf == g_sel[None, :]) & (mval[None, :] < _INF)
                    af[c][...] = jnp.where(upd, _INF, av)
                    wm[c][...] = jnp.where(upd, mval[None, :], wm[c][...])
                    wml[c][...] = jnp.where(upd, sub_f[None, :], wml[c][...])

        if stop == "nophase2":
            return

        if cgate == "perchain":
            # Per-chain firing: when a single lane collides only ITS chain
            # pays the survivor screen + extraction; regions for the other
            # chains are skipped entirely (each chain's ladder is short,
            # so losing cross-chain interleave costs little on the rare
            # multi-chain fires).
            assert nodw
            for c in range(C):

                @pl.when(fire_terms[c] > 0)
                def _(c=c):
                    t_new = out_d[c][0][K - 1][None, :]
                    f32max = float(jnp.finfo(jnp.float32).max)
                    thr = jnp.where(t_new == _INF, f32max, t_new)
                    wm_b = jnp.concatenate([wm[c][...]] * reps, axis=0)
                    wml_b = jnp.concatenate([wml[c][...]] * reps, axis=0)
                    dwv0 = dw_val(c)
                    surv = (dwv0 <= thr) & (dwv0 >= wm_b) & (row_f != wml_b)
                    maxc2 = jnp.minimum(
                        jnp.max(jnp.sum(surv.astype(jnp.int32), axis=0)), K
                    )
                    wm[c][0:1] = jnp.full((1, W), -_INF, jnp.float32)
                    wml[c][0:1] = jnp.full((1, W), -1.0, jnp.float32)
                    for k in range(K):

                        @pl.when(k < maxc2)
                        def _(k=k):
                            dwv = jnp.where(surv, dw_val(c), _INF)
                            lv = wm[c][0:1]
                            lr = wml[c][0:1]
                            live = (dwv > lv) | (
                                (dwv == lv) & (row_f > lr)
                            )
                            dvx = jnp.where(live, dwv, _INF)
                            m = jnp.min(dvx, axis=0)
                            rvx = jnp.where(
                                dvx == m[None, :], row_f, 3e38
                            )
                            am_f = jnp.min(rvx, axis=0)
                            am = am_f.astype(jnp.int32)
                            insert(c, m, j * T2 + am)
                            wm[c][0:1] = m[None, :]
                            wml[c][0:1] = am_f[None, :]
            return

        if cgate:
            p2_pred = functools.reduce(jnp.maximum, fire_terms) > 0
        elif p2gate:
            p2_pred = maxc >= 2
        else:
            p2_pred = maxc > 0

        @pl.when(p2_pred)
        def _():
            survs = []
            m2s = []
            f32max = float(jnp.finfo(jnp.float32).max)
            for c in range(C):
                t_new = out_d[c][0][K - 1][None, :]
                thr = jnp.where(t_new == _INF, f32max, t_new)
                wm_b = jnp.concatenate([wm[c][...]] * reps, axis=0)
                wml_b = jnp.concatenate([wml[c][...]] * reps, axis=0)
                dwv = dw_val(c)
                surv = (dwv <= thr) & (dwv >= wm_b) & (row_f != wml_b)
                survs.append(surv)
                m2s.append(jnp.max(jnp.sum(surv.astype(jnp.int32), axis=0)))
            maxc2 = jnp.minimum(functools.reduce(jnp.maximum, m2s), K)

            @pl.when(maxc2 > 0)
            def _():
                # Full-width extraction needs mutable per-sweep state;
                # without dw scratch, extract in (value, row) LEX ORDER
                # with a watermark instead of mutating a buffer: the next
                # winner is the lex-smallest survivor strictly above the
                # last extracted (value, row).  The (GF, W) wm/wml refs
                # are dead after the survivor screen — reuse their row 0
                # as the watermark (pl.when regions can't carry values).
                if nodw:
                    for c in range(C):
                        wm[c][0:1] = jnp.full((1, W), -_INF, jnp.float32)
                        wml[c][0:1] = jnp.full((1, W), -1.0, jnp.float32)
                    for k in range(K):

                        @pl.when(k < maxc2)
                        def _(k=k):
                            for c in range(C):
                                dwv = jnp.where(
                                    survs[c], dw_val(c), _INF
                                )
                                lv = wm[c][0:1]
                                lr = wml[c][0:1]
                                live = (dwv > lv) | (
                                    (dwv == lv) & (row_f > lr)
                                )
                                dvx = jnp.where(live, dwv, _INF)
                                m = jnp.min(dvx, axis=0)
                                rvx = jnp.where(
                                    dvx == m[None, :], row_f, 3e38
                                )
                                am_f = jnp.min(rvx, axis=0)
                                am = am_f.astype(jnp.int32)
                                insert(c, m, j * T2 + am)
                                wm[c][0:1] = m[None, :]
                                wml[c][0:1] = am_f[None, :]
                    return
                for c in range(C):
                    dw[c][...] = jnp.where(survs[c], dw[c][...], _INF)
                for k in range(K):

                    @pl.when(k < maxc2)
                    def _(k=k):
                        for c in range(C):
                            dwc = dw[c][...]
                            m = jnp.min(dwc, axis=0)
                            am = jnp.argmin(dwc, axis=0).astype(jnp.int32)
                            insert(c, m, j * T2 + am)
                            dw[c][...] = jnp.where(
                                row == am[None, :], _INF, dwc
                            )

    @pl.when(maxc > 0)
    def _():
        if light:
            assert nodw

            @pl.when(maxc <= light)
            def _():
                light_walk()

            @pl.when(maxc > light)
            def _():
                heavy_path()
        else:
            heavy_path()


@functools.partial(
    jax.jit,
    static_argnames=("K", "tile_p2", "gf", "chains", "width", "nodw",
                     "p2gate", "cgate", "light", "stop", "interpret"),
)
def knn_r3(
    p1, p2, lengths2, K, tile_p2=2048, gf=64, chains=4, width=128,
    nodw=False, p2gate=False, cgate=False, light=0, stop="full",
    interpret=False,
):
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    CW = chains * width
    P1pad = -(-P1 // CW) * CW
    P2pad = -(-P2 // tile_p2) * tile_p2
    if P1pad != P1:
        p1 = jnp.pad(p1, ((0, 0), (0, P1pad - P1), (0, 0)))
    if P2pad != P2:
        p2 = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0)))
    p1_t = jnp.swapaxes(p1, 1, 2)
    nb = P1pad // CW
    grid = (N, nb, P2pad // tile_p2)
    kernel = functools.partial(
        _kernel, K=K, tile_p2=tile_p2, gf=gf, chains=chains, width=width,
        nodw=nodw, p2gate=p2gate, cgate=cgate, light=light, stop=stop,
    )
    out_specs = []
    out_shapes = []
    for _c in range(chains):
        out_specs += [
            pl.BlockSpec((1, K, width), lambda n, i, j, _l: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, width), lambda n, i, j, _l: (n, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((N, K, nb * width), jnp.float32),
            jax.ShapeDtypeStruct((N, K, nb * width), jnp.int32),
        ]
    scratch = []
    for _c in range(chains):
        if not nodw:
            scratch.append(pltpu.VMEM((tile_p2, width), jnp.float32))
        scratch += [
            pltpu.VMEM((gf, width), jnp.float32),
            pltpu.VMEM((gf, width), jnp.float32),
            pltpu.VMEM((gf, width), jnp.float32),
            pltpu.VMEM((gf, width), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, CW), lambda n, i, j, _l: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p2, D), lambda n, i, j, _l: (n, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths2.astype(jnp.int32), p1_t, p2)

    def deinterleave(arrs):
        st = jnp.stack(arrs, axis=3).reshape(N, K, nb, width, chains)
        return jnp.moveaxis(st, 4, 3).reshape(N, K, P1pad)

    d_full = deinterleave(outs[0::2])
    i_full = deinterleave(outs[1::2])
    return (
        jnp.swapaxes(d_full, 1, 2)[:, :P1],
        jnp.swapaxes(i_full, 1, 2)[:, :P1],
    )


def _force(o):
    return float(jax.tree_util.tree_leaves(o)[0].sum())


def timeit(fn, iters=3):
    _force(fn())
    t0 = time.time()
    for _ in range(iters):
        _force(fn())
    return (time.time() - t0) / iters


def check(cfg, P=8192, K=16):
    import numpy as np

    from pytorch3d_pointops_tpu.ops.knn import _knn_forward_full

    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    l = jnp.asarray([P - 37], jnp.int32)
    d_t, i_t = knn_r3(p1, p2, l, K=K, **cfg)
    d_r, i_r = _knn_forward_full(p1, p2, jnp.asarray([P]), l, K, 2)
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_r), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_r))
    # duplicate-point tie stress
    p2d = jnp.concatenate([p2[:, :256], p2[:, :256], p2[:, 512:]], axis=1)
    d_t, i_t = knn_r3(p1, p2d, jnp.asarray([P - 37]), K=K, **cfg)
    d_r, i_r = _knn_forward_full(
        p1, p2d, jnp.asarray([P]), jnp.asarray([P - 37]), K, 2
    )
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_r), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_r))
    print(f"  check OK {cfg}", flush=True)


if __name__ == "__main__":
    quick = "quick" in sys.argv[1:]
    P, K = 100_000, 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)
    # Round A/B: the cliff tracks distance-tile ELEMENT COUNT (> 1M
    # elements collapse: (2048,1024) 2M bad, (1024,1536) bad; (1024,1024),
    # (512,2048), (2048,512) fine), and at constant tile area more chains
    # do NOT win (8x128@1024 741-745k, 16x128@512 725k, 4x128@2048 771k
    # same-session control).  Round C: the exact collision gate — skip the
    # always-on phase-2 survivor screen when no lane has two admissions in
    # one fold group (cnt > ng), detectable from already-computed counts.
    # Round C: cgate alone +0.5%; cgate+gf256 hits the footprint cliff
    # (460k — the extra (256,128) buffers cross ~8 MB); cgate+nodw 827.9k
    # (+7.5% over same-session control 770k).  Round D: tune the winner.
    # Round D: nodw is the main gain (+6% vs control), cgate adds +1-2.5%;
    # T2=4096 re-confirms the cliff is d_all > 1M ELEMENTS regardless of
    # scratch; T2=1024 now WINS with nodw+cgate (839k) — smaller tiles cost
    # less without the dw rewrite and collide less.  Round E: T2/gf/chain
    # interactions at the new optimum.
    # Round G: light path — direct lex-walk extraction when maxc <= L,
    # skipping the fold build + recovery + watermarks + phase 2 (late-
    # stream tiles have tiny maxc; at 1M scale selection is 56% of time).
    configs = [
        dict(chains=8, width=128, cgate=True, nodw=True, light=2, tile_p2=1024),
        dict(chains=8, width=128, cgate=True, nodw=True, light=4, tile_p2=1024),
        dict(chains=8, width=128, cgate=True, nodw=True, tile_p2=1024),  # ctl
    ]
    if quick:
        configs = configs[:3]
    for cfg in configs:
        try:
            check(cfg)
            t = timeit(lambda: knn_r3(p1, p2, lengths, K=K, **cfg)[0])
            print(f"{cfg}: {t*1e3:8.1f} ms  {P/t:,.0f} q/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{cfg}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
