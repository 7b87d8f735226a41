"""Round-2 KNN experiment: SOFTWARE-PIPELINED selection.

The shipped kernel alternates a parallel-friendly distance phase with a
latency-bound extraction phase per tile; the VPU idles in the extraction's
serial dependency chains.  This experiment SHIFTS selection one grid step:
step j computes tile j's distances + screen + fold + row recovery and runs
tile j-1's extraction sweeps UNCONDITIONALLY (no scalar branches) in the
SAME basic block, so Mosaic can fill the sweep chains' latency bubbles with
distance element-work.

Exactness: stale thresholds only over-admit, and the phase-2 watermark
screen (which runs against the POST-sweep state) catches every admitted
candidate that the 16 unconditional sweeps did not extract — including
never-retired groups (wm = -inf) — so the result is exact regardless of
admission inflation or sweep exhaustion.

Double-buffering: fold/watermark/dw buffers alternate on j parity; the two
parities duplicate the merged body under pl.when so each steady-state step
is one schedulable region.  The grid runs one extra j step (epilogue) whose
distance work recomputes the last tile harmlessly (index map clamp).

Run on the TPU:  python scripts/knn_r2_pipe.py
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
    p2_ref,    # (1, T2, D) — index map clamps the epilogue step
    *refs,
    K: int,
    tile_p2: int,
    gf: int,
    chains: int,
    width: int,
    n_j: int,  # number of REAL p2 tiles; grid runs n_j + 1 steps
):
    j = pl.program_id(2)
    C, W, GF, T2 = chains, width, gf, tile_p2
    out_d = refs[0 : 2 * C : 2]
    out_i = refs[1 : 2 * C : 2]
    scratch = refs[2 * C :]
    # per chain: dw0 dw1 af0 af1 ai0 ai1 wm0 wm1 wml0 wml1
    nbuf = 10

    def B(c, name, p):
        off = {"dw": 0, "af": 2, "ai": 4, "wm": 6, "wml": 8}[name]
        return scratch[c * nbuf + off + p]

    @pl.when(j == 0)
    def _():
        for c in range(C):
            out_d[c][...] = jnp.full(out_d[c].shape, _INF, jnp.float32)
            out_i[c][...] = jnp.zeros(out_i[c].shape, jnp.int32)

    xt = p1t_ref[0]
    y = p2_ref[0]
    D = xt.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (T2, W), 0)
    row_f = row.astype(jnp.float32)
    krow = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
    row_gf = jax.lax.broadcasted_iota(jnp.int32, (GF, W), 0)
    n_folds = (T2 // GF).bit_length() - 1
    reps = T2 // GF
    len2 = l2_ref[pl.program_id(0)]

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

    def merged_body(p):
        """p = write-parity: produce tile j into buffers[p], extract tile
        j-1 from buffers[1-p]."""
        q = 1 - p
        # ---- produce: distance + screen + fold + recovery for tile j ----
        # (epilogue step j == n_j recomputes tile n_j-1 via the clamped
        # index map; its buffers are written but never consumed)
        d_all = jnp.zeros((T2, C * W), jnp.float32)
        for di in range(D):
            diff = y[:, di][:, None] - xt[di][None, :]
            d_all = d_all + diff * diff
        jj = jnp.minimum(j, n_j - 1)
        rmask = jj * T2 + row < len2
        for c in range(C):
            d_c = jnp.where(rmask, d_all[:, c * W : (c + 1) * W], _INF)
            thresh = out_d[c][0][K - 1][None, :]  # stale by design
            dwv = jnp.where(d_c < thresh, d_c, _INF)
            B(c, "dw", p)[...] = dwv
            h = dwv
            for _f in range(n_folds):
                half = h.shape[0] // 2
                h = jnp.minimum(h[:half], h[half:])
            B(c, "af", p)[...] = h
            gm_b = jnp.concatenate([h] * reps, axis=0)
            rv = jnp.where(dwv == gm_b, row_f, 3e38)
            for _f in range(n_folds):
                half = rv.shape[0] // 2
                rv = jnp.minimum(rv[:half], rv[half:])
            B(c, "ai", p)[...] = rv
            B(c, "wm", p)[...] = jnp.full((GF, W), -_INF, jnp.float32)
            B(c, "wml", p)[...] = jnp.full((GF, W), -1.0, jnp.float32)

        # ---- consume: K unconditional sweeps for tile j-1 ----
        @pl.when(j > 0)
        def _():
            off = (j - 1) * T2
            for _k in range(K):
                for c in range(C):
                    av = B(c, "af", q)[...]
                    mval = jnp.min(av, axis=0)
                    sub_f = jnp.min(
                        jnp.where(av == mval[None, :], B(c, "ai", q)[...],
                                  3e38),
                        axis=0,
                    )
                    sub_sel = sub_f.astype(jnp.int32)
                    insert(c, mval, off + sub_sel)
                    g_sel = sub_sel - (sub_sel // GF) * GF
                    upd = (row_gf == g_sel[None, :]) & (
                        mval[None, :] < _INF
                    )
                    B(c, "af", q)[...] = jnp.where(upd, _INF, av)
                    B(c, "wm", q)[...] = jnp.where(
                        upd, mval[None, :], B(c, "wm", q)[...]
                    )
                    B(c, "wml", q)[...] = jnp.where(
                        upd, sub_f[None, :], B(c, "wml", q)[...]
                    )

            # ---- phase 2 for tile j-1 (branchy; after the hot region) ----
            f32max = float(jnp.finfo(jnp.float32).max)
            survs = []
            m2s = []
            for c in range(C):
                t_new = out_d[c][0][K - 1][None, :]
                thr2 = jnp.where(t_new == _INF, f32max, t_new)
                wm_b = jnp.concatenate([B(c, "wm", q)[...]] * reps, axis=0)
                wml_b = jnp.concatenate([B(c, "wml", q)[...]] * reps, axis=0)
                dwq = B(c, "dw", q)[...]
                surv = (dwq <= thr2) & (dwq >= wm_b) & (row_f != wml_b)
                survs.append(surv)
                m2s.append(jnp.max(jnp.sum(surv.astype(jnp.int32), axis=0)))
            maxc2 = jnp.minimum(functools.reduce(jnp.maximum, m2s), K)

            @pl.when(maxc2 > 0)
            def _():
                for c in range(C):
                    B(c, "dw", q)[...] = jnp.where(
                        survs[c], B(c, "dw", q)[...], _INF
                    )
                for k in range(K):

                    @pl.when(k < maxc2)
                    def _(k=k):
                        for c in range(C):
                            dwc = B(c, "dw", q)[...]
                            m = jnp.min(dwc, axis=0)
                            am = jnp.argmin(dwc, axis=0).astype(jnp.int32)
                            insert(c, m, off + am)
                            B(c, "dw", q)[...] = jnp.where(
                                row == am[None, :], _INF, dwc
                            )

    @pl.when(j % 2 == 0)
    def _():
        merged_body(0)

    @pl.when(j % 2 == 1)
    def _():
        merged_body(1)


@functools.partial(
    jax.jit,
    static_argnames=("K", "tile_p2", "gf", "chains", "width", "interpret"),
)
def knn_pipe(
    p1, p2, lengths2, K, tile_p2=2048, gf=64, chains=4, width=128,
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
    n_j = P2pad // tile_p2
    grid = (N, nb, n_j + 1)  # +1 epilogue step drains the pipeline
    kernel = functools.partial(
        _kernel, K=K, tile_p2=tile_p2, gf=gf, chains=chains, width=width,
        n_j=n_j,
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
            pltpu.VMEM((tile_p2, width), jnp.float32),  # dw x2
            pltpu.VMEM((tile_p2, width), jnp.float32),
            pltpu.VMEM((gf, width), jnp.float32),       # af x2
            pltpu.VMEM((gf, width), jnp.float32),
            pltpu.VMEM((gf, width), jnp.float32),       # ai x2
            pltpu.VMEM((gf, width), jnp.float32),
            pltpu.VMEM((gf, width), jnp.float32),       # wm x2
            pltpu.VMEM((gf, width), jnp.float32),
            pltpu.VMEM((gf, width), jnp.float32),       # wml x2
            pltpu.VMEM((gf, width), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, CW), lambda n, i, j, _l: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_p2, D),
                lambda n, i, j, _l: (n, jnp.minimum(j, n_j - 1), 0),
                memory_space=pltpu.VMEM,
            ),
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


def check(cfg, P=8192, K=16, interpret=False):
    import numpy as np

    from pytorch3d_pointops_tpu.ops.knn import _knn_forward_full

    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    p1 = jax.random.normal(k1, (1, P, 3), jnp.float32)
    p2 = jax.random.normal(k2, (1, P, 3), jnp.float32)
    l = jnp.asarray([P - 37], jnp.int32)
    d_t, i_t = knn_pipe(p1, p2, l, K=K, interpret=interpret, **cfg)
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
        dict(chains=4, width=128, gf=64),
        dict(chains=2, width=128, gf=64),
    ]:
        try:
            check(cfg)
            t = timeit(lambda: knn_pipe(p1, p2, lengths, K=K, **cfg)[0])
            print(f"PIPE {cfg}: {t*1e3:8.1f} ms  {P/t:,.0f} q/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"PIPE {cfg}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
