"""Round-2 KNN experiment: MULTI-CHAIN interleaved extraction.

The production transposed kernel's sweeps are latency-bound: each sweep is
~100 vreg-ops of element work but ~0.3 us of serial dependency (reduce tree
-> row recovery -> insert chain -> masked updates), so the VPU idles.  This
experiment runs C independent query chains (C * W lanes per program) with
SEPARATE scratch buffers; sweeps are gated on the joint max admission count
and the C chain bodies are emitted back-to-back inside one region, giving
the VLIW scheduler independent chains to interleave.

Each chain owns a private output array (separate pallas outputs — no
lane-sliced shared refs, which SIGABRT Mosaic); the host de-interleaves.

Run on the TPU:  python scripts/knn_r2_dualchain.py
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
    *refs,     # C x (out_d, out_i) then scratch: C x (dw, af, ai, wm, wml)
    K: int,
    tile_p2: int,
    gf: int,
    chains: int,
    width: int,
    p2s: str,
):
    j = pl.program_id(2)
    C, W, GF, T2 = chains, width, gf, tile_p2
    out_d = refs[0:2 * C:2]
    out_i = refs[1:2 * C:2]
    scratch = refs[2 * C:]
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

    # Joint distance tile, sliced per chain afterwards (values, not refs).
    d_all = jnp.zeros((T2, C * W), jnp.float32)
    for di in range(D):
        diff = y[:, di][:, None] - xt[di][None, :]
        d_all = d_all + diff * diff
    row = jax.lax.broadcasted_iota(jnp.int32, (T2, W), 0)
    len2 = l2_ref[pl.program_id(0)]
    rmask = j * T2 + row < len2

    ds = []
    wins = []
    cnts = []
    for c in range(C):
        d_c = jnp.where(rmask, d_all[:, c * W:(c + 1) * W], _INF)
        ds.append(d_c)
        thresh = out_d[c][0][K - 1][None, :]
        win = d_c < thresh
        wins.append(win)
        cnts.append(jnp.sum(win.astype(jnp.int32), axis=0))

    maxc = jnp.minimum(
        functools.reduce(jnp.maximum, [jnp.max(cn) for cn in cnts]), K
    )

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

    @pl.when(maxc > 0)
    def _():
        for c in range(C):
            dw[c][...] = jnp.where(wins[c], ds[c], _INF)
            h = dw[c][...]
            for _f in range(n_folds):
                half = h.shape[0] // 2
                h = jnp.minimum(h[:half], h[half:])
            af[c][...] = h
            gm_b = jnp.concatenate([h] * reps, axis=0)
            rv = jnp.where(dw[c][...] == gm_b, row_f, 3e38)
            for _f in range(n_folds):
                half = rv.shape[0] // 2
                rv = jnp.minimum(rv[:half], rv[half:])
            ai[c][...] = rv
            wm[c][...] = jnp.full(wm[c].shape, -_INF, jnp.float32)
            wml[c][...] = jnp.full(wml[c].shape, -1.0, jnp.float32)

        for k in range(K):

            @pl.when(k < maxc)
            def _(k=k):
                # C independent sweep bodies, back to back: empty chains
                # extract inf (insert rejects at pos == K) but keep the
                # schedule branch-free within the region.
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

        survs = []
        m2s = []
        f32max = float(jnp.finfo(jnp.float32).max)
        for c in range(C):
            t_new = out_d[c][0][K - 1][None, :]
            thr = jnp.where(t_new == _INF, f32max, t_new)
            wm_b = jnp.concatenate([wm[c][...]] * reps, axis=0)
            wml_b = jnp.concatenate([wml[c][...]] * reps, axis=0)
            dwv = dw[c][...]
            if p2s == "lite":
                # exact: a tie with a LOWER row than the watermark can't
                # exist (extraction retires lowest-(value,row) first)
                surv = (dwv <= thr) & (dwv >= wm_b) & (row_f != wml_b)
            else:
                surv = (dwv <= thr) & (
                    (dwv > wm_b) | ((dwv == wm_b) & (row_f > wml_b))
                )
            survs.append(surv)
            m2s.append(jnp.max(jnp.sum(surv.astype(jnp.int32), axis=0)))
        maxc2 = jnp.minimum(functools.reduce(jnp.maximum, m2s), K)

        @pl.when(maxc2 > 0)
        def _():
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
                        dw[c][...] = jnp.where(row == am[None, :], _INF, dwc)


@functools.partial(
    jax.jit,
    static_argnames=("K", "tile_p2", "gf", "chains", "width", "p2s",
                     "interpret"),
)
def knn_multichain(
    p1, p2, lengths2, K, tile_p2=2048, gf=64, chains=2, width=256, p2s="wm",
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
        p2s=p2s,
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
        scratch += [
            pltpu.VMEM((tile_p2, width), jnp.float32),
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
    # De-interleave chains: chain c's block i covers queries
    # [i*CW + c*width, i*CW + (c+1)*width) — stack gives (..., i*W+w, c);
    # reorder to (i, c, w) before flattening.
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


def check(cfg, P=8192, K=16, interpret=False):
    import numpy as np

    from pytorch3d_pointops_tpu.ops.knn import _knn_forward_full

    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    l = jnp.asarray([P - 37], jnp.int32)
    d_t, i_t = knn_multichain(p1, p2, l, K=K, interpret=interpret, **cfg)
    d_r, i_r = _knn_forward_full(p1, p2, jnp.asarray([P]), l, K, 2)
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_r), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_r))
    print(f"  check OK {cfg}", flush=True)


if __name__ == "__main__":
    P, K = 100_000, 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    lengths = jnp.asarray([P], jnp.int32)
    for cfg in [
        dict(chains=4, width=128, gf=64, p2s="lite", tile_p2=4096),
        dict(chains=4, width=128, gf=128, p2s="lite"),
        dict(chains=4, width=128, gf=32, p2s="lite"),
    ]:
        try:
            check(cfg)
            t = timeit(lambda: knn_multichain(p1, p2, lengths, K=K, **cfg)[0])
            print(f"{cfg}: {t*1e3:8.1f} ms  {P/t:,.0f} q/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{cfg}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
