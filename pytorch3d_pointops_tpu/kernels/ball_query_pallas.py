"""Pallas TPU kernel for ball query (first K in-radius points, scan order).

TPU-native replacement for the CUDA early-exit scan
(csrc/ball_query/ball_query.cu:25-70).  "First K in scan order within the
radius" is exactly the K *smallest column indices* among in-radius points,
so this is the streaming KNN kernel (kernels/knn_pallas.py) run on the key
matrix ``where(dist2 < r2, column, +inf)`` — with two big simplifications:

* keys ARE global column indices, so no index side-car, lane recovery, or
  tie handling is needed anywhere (keys are unique);
* the admission threshold is the kth-smallest key seen so far, and column
  indices only grow along the scan, so once a query's K slots fill, every
  later tile fails the screen — the kernel's analog of the CUDA scan's
  ``count < K`` early exit.

Large K (the reference's default is K=500, functions/ball_query.py:60-61)
is handled by **round chaining**: the kernel tracks at most ``_ROUND_K``
keys per pass, and each subsequent round re-runs the same compiled kernel
with a per-query *exclusive lower bound* — the last key found so far — so
round r returns in-radius columns (r*_ROUND_K, (r+1)*_ROUND_K] in scan
order.  ceil(K/_ROUND_K) passes over p2; one kernel compilation total.

Distances are NOT tracked in-kernel: the caller recomputes the K squared
distances from the returned indices (same per-axis f32 arithmetic, so
bit-identical), which is O(P1*K) against the kernel's O(P1*P2).

Returns keys as f32 (+inf pads); int conversion and the reference pad
conventions (idx -1, dist 0, lengths1 row masking) happen in the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn_pallas import _fold_width

Array = jnp.ndarray

_INF = float("inf")

# Tuned for THIS kernel on v5e (r2): its (T1, T2) distance tile and
# screened-key scratch differ from the KNN kernel's chained layout, so it
# does NOT track knn_pallas's defaults (which moved to 1024/1024 in r3).
DEFAULT_TILE_P1 = 512
DEFAULT_TILE_P2 = 2048

# Per-round top-K capacity: beyond this the statically-unrolled extraction
# sweeps stop paying for themselves; larger user K chains rounds instead.
_ROUND_K = 64


def _bq_kernel(
    lengths2_ref,  # scalar-prefetch SMEM (N,) int32
    p1_ref,  # VMEM (1, TILE_P1, D)
    p2_ref,  # VMEM (1, D, TILE_P2) — transposed
    lb_ref,  # VMEM (1, TILE_P1, 1) — exclusive per-query key lower bound
    out_k_ref,  # VMEM (1, TILE_P1, K) — running smallest keys (f32 cols)
    kw_ref,  # VMEM scratch (TILE_P1, TILE_P2) — screened keys
    af_ref,  # VMEM scratch (TILE_P1, GF) — folded per-group min keys
    wm_ref,  # VMEM scratch (TILE_P1, GF) — per-group extraction watermark
    *,
    K: int,
    r2: float,
    tile_p2: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_k_ref[...] = jnp.full(out_k_ref.shape, _INF, jnp.float32)

    x = p1_ref[0]
    y_t = p2_ref[0]
    D = x.shape[1]
    T1 = x.shape[0]
    T2 = y_t.shape[1]
    d = jnp.zeros((T1, T2), jnp.float32)
    for di in range(D):
        diff = x[:, di][:, None] - y_t[di][None, :]
        d = d + diff * diff

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    gcol = j * tile_p2 + col
    gcol_f = gcol.astype(jnp.float32)
    len2 = lengths2_ref[pl.program_id(0)]
    lb = lb_ref[0]  # (T1, 1): keys <= lb were found in prior rounds
    key = jnp.where(
        (d < r2) & (gcol < len2) & (gcol_f > lb), gcol_f, _INF
    )

    state = out_k_ref[0]  # (T1, K) ascending keys
    thresh = state[:, K - 1][:, None]
    win = key < thresh
    maxc = jnp.minimum(jnp.max(jnp.sum(win.astype(jnp.int32), axis=1)), K)

    kcol = jax.lax.broadcasted_iota(jnp.int32, out_k_ref.shape[1:], 1)

    def insert(m):
        st = out_k_ref[0]
        mb = m[:, None]
        pos = jnp.sum((st <= mb).astype(jnp.int32), axis=1)[:, None]
        shifted = jnp.concatenate([st[:, :1], st[:, :-1]], axis=1)
        out_k_ref[0] = jnp.where(
            kcol < pos, st, jnp.where(kcol == pos, mb, shifted)
        )

    GF = af_ref.shape[1]
    n_folds = (tile_p2 // GF).bit_length() - 1
    col_gf = jax.lax.broadcasted_iota(jnp.int32, (T1, GF), 1)

    @pl.when(maxc > 0)
    def _():
        kw_ref[...] = jnp.where(win, key, _INF)
        h = kw_ref[...]
        for _f in range(n_folds):
            half = h.shape[1] // 2
            h = jnp.minimum(h[:, :half], h[:, half:])
        af_ref[...] = h
        wm_ref[...] = jnp.full(wm_ref.shape, -_INF, jnp.float32)
        for k in range(K):

            @pl.when(k < maxc)
            def _(k=k):
                av = af_ref[...]
                mkey = jnp.min(av, axis=1)
                insert(mkey)
                lane = mkey.astype(jnp.int32) - j * tile_p2
                g_sel = lane - (lane // GF) * GF
                upd = (col_gf == g_sel[:, None]) & (mkey[:, None] < _INF)
                af_ref[...] = jnp.where(upd, _INF, av)
                wm_ref[...] = jnp.where(upd, mkey[:, None], wm_ref[...])

        if n_folds > 0:
            # Same-group second winners (keys are unique, so the watermark
            # alone separates extracted from remaining).
            t_new = out_k_ref[0][:, K - 1][:, None]
            reps = T2 // GF
            wm_b = jnp.concatenate([wm_ref[...]] * reps, axis=1)
            kw = kw_ref[...]
            surv = (kw < t_new) & (kw > wm_b)
            maxc2 = jnp.minimum(
                jnp.max(jnp.sum(surv.astype(jnp.int32), axis=1)), K
            )

            @pl.when(maxc2 > 0)
            def _():
                kw_ref[...] = jnp.where(surv, kw, _INF)
                for k in range(K):

                    @pl.when(k < maxc2)
                    def _(k=k):
                        kw2 = kw_ref[...]
                        m = jnp.min(kw2, axis=1)
                        insert(m)

                        @pl.when(k + 1 < maxc2)
                        def _():
                            kw_ref[...] = jnp.where(
                                col == (m.astype(jnp.int32) - j * tile_p2)[
                                    :, None
                                ],
                                _INF,
                                kw2,
                            )


def _bq_round(p1, p2_t, lengths2, lb, Kc, r2, tile_p1, tile_p2, interpret):
    """One chained round: the Kc smallest in-radius keys strictly above the
    per-query lower bound ``lb`` (N, P1pad).  Returns f32 keys, inf pads."""
    N, P1pad, D = p1.shape
    P2pad = p2_t.shape[2]
    kernel = functools.partial(_bq_kernel, K=Kc, r2=r2, tile_p2=tile_p2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, P1pad // tile_p1, P2pad // tile_p2),
        in_specs=[
            pl.BlockSpec(
                (1, tile_p1, D), lambda n, i, j, _l: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, D, tile_p2), lambda n, i, j, _l: (n, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_p1, 1), lambda n, i, j, _l: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_p1, Kc), lambda n, i, j, _l: (n, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_p1, tile_p2), jnp.float32),
            pltpu.VMEM((tile_p1, _fold_width(tile_p2)), jnp.float32),
            pltpu.VMEM((tile_p1, _fold_width(tile_p2)), jnp.float32),
        ],
    )
    (keys,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, P1pad, Kc), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * P1pad * P2pad * D,
            bytes_accessed=4 * N * (P1pad * D + P2pad * D + P1pad * Kc),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The default 16 MB scoped-VMEM compile limit sits right at this
            # kernel's stack usage; raise it per-kernel (v5e has 128 MB).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths2.astype(jnp.int32), p1, p2_t, lb[..., None])
    return keys


@functools.partial(
    jax.jit, static_argnames=("K", "radius", "tile_p1", "tile_p2", "interpret")
)
def ball_query_forward_pallas(
    p1: Array,
    p2: Array,
    lengths2: Array,
    K: int,
    radius: float,
    tile_p1: int = DEFAULT_TILE_P1,
    tile_p2: int = DEFAULT_TILE_P2,
    interpret: bool = False,
) -> Array:
    """Streaming ball query on TPU: returns (N, P1, K) int32 indices of the
    first K in-radius points per query, -1-padded, ascending (scan order).
    K > _ROUND_K chains rounds of the same compiled kernel (see module
    docstring).  lengths1 row masking and distances happen in the caller."""
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    if P2 >= 2**24:
        raise ValueError(
            "ball_query_forward_pallas tracks columns as f32 keys, exact "
            f"only below 2**24 reference points (got P2={P2}); use the XLA "
            "path (ops.ball_query with impl='xla')."
        )
    tile_p1 = min(tile_p1, max(8, P1))
    tile_p2 = min(tile_p2, max(8, P2))
    P1pad = -(-P1 // tile_p1) * tile_p1
    P2pad = -(-P2 // tile_p2) * tile_p2
    if P1pad != P1:
        p1 = jnp.pad(p1, ((0, 0), (0, P1pad - P1), (0, 0)))
    if P2pad != P2:
        p2 = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0)))
    p2_t = jnp.swapaxes(p2, 1, 2)
    r2 = float(radius) * float(radius)

    # Per-round capacity is always capped at _ROUND_K: the kernel statically
    # unrolls 2*Kc insertion sweeps, so an uncapped Kc = K (e.g. the
    # reference default K=500 against a small cloud) would blow up the
    # remote TPU compile.  No query can have more than min(K, P2) in-radius
    # neighbors, so rounds past ceil(min(K, P2) / Kc) are guaranteed no-op
    # streams over p2 and are skipped; when that leaves rounds*Kc < K the
    # concatenated keys are inf-padded back to width K (pads become -1
    # downstream).
    Kc = min(K, _ROUND_K)
    rounds = max(1, -(-min(K, P2) // Kc))
    lb = jnp.full((N, P1pad), -1.0, jnp.float32)
    outs = []
    for _r in range(rounds):
        keys = _bq_round(
            p1, p2_t, lengths2, lb, Kc, r2, tile_p1, tile_p2, interpret
        )
        outs.append(keys)
        # Next round admits only keys strictly above the largest found; an
        # exhausted query carries lb=inf so later rounds admit nothing.
        lb = keys[:, :, -1]
    keys = outs[0] if rounds == 1 else jnp.concatenate(outs, axis=2)
    if keys.shape[2] < K:
        keys = jnp.pad(
            keys,
            ((0, 0), (0, 0), (0, K - keys.shape[2])),
            constant_values=_INF,
        )
    keys = keys[:, :, :K]

    keys = keys[:, :P1]
    return jnp.where(keys < _INF, keys.astype(jnp.int32), -1)
