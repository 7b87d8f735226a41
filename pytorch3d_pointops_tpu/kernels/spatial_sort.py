"""Morton (Z-order) query sorting for the streaming selection kernels.

The KNN kernel's phase-1 insertion sweeps are gated JOINTLY across a
program's query lanes (per-chain gating was measured catastrophically
slower — divergent regions serialize, CLAUDE.md r3), so the executed
sweep count per tile is the MAX over up to 1024 lanes of per-lane
admission needs.  With queries in random order those needs are
independent across lanes and the max is ~4.6x the ~1.0/tile per-lane
mean (measured, COUNTERS_r05.json).  Sorting the queries along a Morton
curve makes the lanes of a program spatially coherent, so admission
events are positively correlated and the joint max shrinks; the same
coherence makes same-group value collisions rarer, roughly halving the
phase-2 firing rate (59.5% -> 30.5% measured at the 100k config).

Measured on one v5e (scripts/knn_r5_sorted.py, 100k x 100k, K=16,
shipped tiles): 114.8 -> 104.2 ms single-dispatch INCLUDING the sort
(+10%; ~14% net of the ~28 ms tunnel RTT), p1 sweeps/tile 4.62 -> 3.98,
phase-2 firing 0.595 -> 0.305, admissions unchanged (they are per-query
and order-independent).

Exactness: the permutation is applied to QUERY ROWS only — each query's
result is independent of its block neighbors and the p2 scan order is
untouched, so after un-permuting the output rows dists are bit-identical
and indices exactly equal (verified on chip).  Tie semantics cannot
change.  The reference has no analog (CUDA warps don't gate jointly);
this is a TPU-shape-specific optimization.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def _part1by2(u: Array) -> Array:
    """Spread the low 10 bits of u so consecutive bits land 3 apart."""
    u = (u | (u << 16)) & 0x030000FF
    u = (u | (u << 8)) & 0x0300F00F
    u = (u | (u << 4)) & 0x030C30C3
    u = (u | (u << 2)) & 0x09249249
    return u


def morton_code(p: Array, lo: Array = None, hi: Array = None) -> Array:
    """(N, P, D<=3) f32 -> (N, P) int32 Morton codes, 10 bits per axis on
    the per-cloud bounding box (or the explicit (N, 1, D) box ``lo``/``hi``
    — pass a JOINT box when codes from two clouds must be comparable on
    one curve).  Degenerate boxes (or garbage pad rows) only degrade
    locality, never correctness — the codes order work, not results.
    D > 3 uses the first three axes (locality in a 3D slice still
    correlates admissions; correctness is unaffected)."""
    p = p[..., :3]
    lo = p.min(axis=1, keepdims=True) if lo is None else lo[..., :3]
    hi = p.max(axis=1, keepdims=True) if hi is None else hi[..., :3]
    q = (p - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.int32)
    code = _part1by2(q[..., 0])
    if p.shape[2] > 1:
        code = code | (_part1by2(q[..., 1]) << 1)
    if p.shape[2] > 2:
        code = code | (_part1by2(q[..., 2]) << 2)
    return code


def morton_argsort(p: Array) -> tuple[Array, Array]:
    """Returns (order, inverse): ``p[n, order[n]]`` is Morton-sorted and
    ``out[n, inverse[n]]`` restores original row order.  Stable sort —
    deterministic for duplicate codes."""
    order = jnp.argsort(morton_code(p), axis=1).astype(jnp.int32)
    P = p.shape[1]
    inverse = (
        jnp.zeros_like(order)
        .at[
            jnp.arange(p.shape[0], dtype=jnp.int32)[:, None],
            order,
        ]
        .set(jnp.arange(P, dtype=jnp.int32)[None, :])
    )
    return order, inverse
