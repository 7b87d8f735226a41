"""Ball query: first-K neighbors within a radius, TPU-native.

Reimplements reference ``functions/ball_query.py:20-142`` and the CUDA kernel
``csrc/ball_query/ball_query.cu:25-70``.  Semantics to note (and reproduced
exactly): the returned neighbors are the **first K points in scan order** with
``dist2 < radius^2`` — *not* the nearest K (ball_query.py:69-71).  idx is
padded with -1 and dists with 0 (ball_query.cu:102-103).

The sequential CUDA scan (`for j ... count < K`) becomes a data-parallel
cumulative-count: rank[j] = (number of in-radius points with index < j); a
point is kept iff in-radius and rank < K, and its output slot *is* its rank —
a deterministic scatter with unique target slots (no atomics needed).

Backward reuses the KNN backward with norm=2 on the (-1)-padded idx, exactly
like the reference (functions/ball_query.py:47-51).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .knn import _KNN, knn_backward
from .utils import masked_gather

Array = jnp.ndarray

# Above this many (N*P1*P2) elements, stream over P2 tiles.
_FULL_MATRIX_MAX_ELEMS = 32 * 1024 * 1024
_TILE_P2 = 4096


def _scatter_slots(d2, in_radius, base_count, j_offset, K, out_d, out_i):
    """Scatter in-radius points of a (N, P1, T) tile into their rank slots."""
    N, P1, T = d2.shape
    # rank within the output, accounting for earlier tiles
    local_rank = jnp.cumsum(in_radius.astype(jnp.int32), axis=-1) - 1
    rank = base_count[..., None] + local_rank
    slot = jnp.where(in_radius & (rank < K), rank, K)  # K -> dropped
    j_idx = jnp.broadcast_to(
        j_offset + jnp.arange(T, dtype=jnp.int32), (N, P1, T)
    )

    def one(out_d_n, out_i_n, slot_n, d2_n, j_n):
        i_idx = jnp.broadcast_to(
            jnp.arange(P1, dtype=jnp.int32)[:, None], (P1, T)
        )
        out_d_n = out_d_n.at[i_idx, slot_n].set(d2_n, mode="drop")
        out_i_n = out_i_n.at[i_idx, slot_n].set(j_n, mode="drop")
        return out_d_n, out_i_n

    out_d, out_i = jax.vmap(one)(out_d, out_i, slot, d2, j_idx)
    new_count = base_count + in_radius.astype(jnp.int32).sum(-1)
    return out_d, out_i, new_count


def _ball_query_forward(p1, p2, lengths1, lengths2, K, radius):
    from .knn import _pairwise_dist

    N, P1, D = p1.shape
    P2 = p2.shape[1]
    r2 = jnp.float32(radius * radius)
    i_valid = (
        jnp.arange(P1, dtype=jnp.int32)[None, :] < lengths1[:, None]
    )  # (N, P1)

    out_d = jnp.zeros((N, P1, K), jnp.float32)
    out_i = jnp.full((N, P1, K), -1, jnp.int32)

    if N * P1 * P2 <= _FULL_MATRIX_MAX_ELEMS:
        d2 = _pairwise_dist(p1, p2, 2)  # (N, P1, P2)
        j_valid = jnp.arange(P2, dtype=jnp.int32)[None, :] < lengths2[:, None]
        in_radius = (d2 < r2) & j_valid[:, None, :] & i_valid[..., None]
        out_d, out_i, _ = _scatter_slots(
            d2,
            in_radius,
            jnp.zeros((N, P1), jnp.int32),
            jnp.int32(0),
            K,
            out_d,
            out_i,
        )
        return out_d, out_i

    # Streaming path: scan P2 tiles carrying the per-query hit count.
    T = min(_TILE_P2, P2)
    P2pad = -(-P2 // T) * T
    p2p = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0)))
    tiles = jnp.moveaxis(p2p.reshape(N, P2pad // T, T, D), 1, 0)  # (nt,N,T,D)
    offsets = jnp.arange(P2pad // T, dtype=jnp.int32) * T

    def step(carry, inp):
        out_d, out_i, count = carry
        yt, off = inp
        d2 = _pairwise_dist(p1, yt, 2)  # (N, P1, T)
        j_valid = (off + jnp.arange(T, dtype=jnp.int32))[None, :] < lengths2[
            :, None
        ]
        in_radius = (d2 < r2) & j_valid[:, None, :] & i_valid[..., None]
        out_d, out_i, count = _scatter_slots(
            d2, in_radius, count, off, K, out_d, out_i
        )
        return (out_d, out_i, count), None

    (out_d, out_i, _), _ = lax.scan(
        step, (out_d, out_i, jnp.zeros((N, P1), jnp.int32)), (tiles, offsets)
    )
    return out_d, out_i


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ball_query_core(p1, p2, lengths1, lengths2, K, radius):
    return _ball_query_forward(p1, p2, lengths1, lengths2, K, radius)


def _bq_fwd(p1, p2, lengths1, lengths2, K, radius):
    dists, idx = _ball_query_core(p1, p2, lengths1, lengths2, K, radius)
    return (dists, idx), (p1, p2, lengths1, lengths2, idx)


def _bq_bwd(K, radius, res, grads):
    p1, p2, lengths1, lengths2, idx = res
    grad_dists, _ = grads
    # Reference reuses the KNN backward with norm=2
    # (functions/ball_query.py:47-51); -1 pads contribute zero gradient.
    grad_p1, grad_p2 = knn_backward(
        p1, p2, lengths1, lengths2, idx, 2, grad_dists.astype(jnp.float32)
    )
    return grad_p1, grad_p2, None, None


_ball_query_core.defvjp(_bq_fwd, _bq_bwd)


def ball_query(
    p1: Array,
    p2: Array,
    lengths1: Optional[Array] = None,
    lengths2: Optional[Array] = None,
    K: int = 500,
    radius: float = 0.2,
    return_nn: bool = True,
) -> _KNN:
    """First K points of ``p2`` within ``radius`` of each ``p1`` point.

    Mirrors reference ``functions/ball_query.py:55-142``; see module
    docstring for the exact padding / ordering conventions.

    Returns ``KNN(dists, idx, knn)``: dists (N, P1, K) squared distances
    (0-padded), idx (N, P1, K) int32 (-1-padded), knn (N, P1, K, D) or None
    (zero rows at pads, via ``masked_gather``).
    """
    if p1.shape[0] != p2.shape[0]:
        raise ValueError("pts1 and pts2 must have the same batch dimension.")
    if p1.shape[2] != p2.shape[2]:
        raise ValueError("pts1 and pts2 must have the same point dimension.")

    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    N, P1, _ = p1.shape
    P2 = p2.shape[1]
    if lengths1 is None:
        lengths1 = jnp.full((N,), P1, jnp.int32)
    if lengths2 is None:
        lengths2 = jnp.full((N,), P2, jnp.int32)
    lengths1 = jnp.asarray(lengths1, jnp.int32)
    lengths2 = jnp.asarray(lengths2, jnp.int32)

    dists, idx = _ball_query_core(p1, p2, lengths1, lengths2, K, float(radius))
    nn = masked_gather(p2, idx) if return_nn else None
    return _KNN(dists=dists, idx=idx, knn=nn)
