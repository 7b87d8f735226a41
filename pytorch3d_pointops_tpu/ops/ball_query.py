"""Ball query: first-K neighbors within a radius, TPU-native.

Reimplements reference ``functions/ball_query.py:20-142`` and the CUDA kernel
``csrc/ball_query/ball_query.cu:25-70``.  Semantics to note (and reproduced
exactly): the returned neighbors are the **first K points in scan order** with
``dist2 < radius^2`` — *not* the nearest K (ball_query.py:69-71).  idx is
padded with -1 and dists with 0 (ball_query.cu:102-103).

The sequential CUDA scan (`for j ... count < K`) becomes a data-parallel
selection: "the first K in-radius points in scan order" are exactly the K
*smallest column indices* among in-radius points, so the op is a
``lax.top_k`` over the key ``where(in_radius, j, +BIG)`` — no scatter (TPU
scatters serialize), and the returned order is ascending-index = scan order
by construction.  Distances are gathered back from the tile afterwards.

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


_BIG = 2**30  # plain int: no backend init at import time


def _first_k_in_radius(d2, in_radius, j_offset, K):
    """First-K-by-scan-order of a (N, P1, T) tile: the K smallest global
    column indices among in-radius entries, as (keys (N,P1,K) ascending with
    _BIG pads, dists (N,P1,K))."""
    T = d2.shape[2]
    col = j_offset + jnp.arange(T, dtype=jnp.int32)
    key = jnp.where(in_radius, col[None, None, :], _BIG)
    Kp = min(K, T)
    neg, sel = lax.top_k(-key, Kp)  # K smallest keys, ascending
    kk = -neg
    dv = jnp.take_along_axis(d2, sel, axis=-1)
    if Kp < K:
        kk = jnp.pad(kk, ((0, 0), (0, 0), (0, K - Kp)), constant_values=_BIG)
        dv = jnp.pad(dv, ((0, 0), (0, 0), (0, K - Kp)))
    return kk, dv


def _finalize_ball(kk, dv):
    valid = kk < _BIG
    return jnp.where(valid, dv, 0.0), jnp.where(valid, kk, -1)


def _ball_query_forward(p1, p2, lengths1, lengths2, K, radius, impl="auto"):
    from .knn import _pairwise_dist

    N, P1, D = p1.shape
    P2 = p2.shape[1]
    if impl == "auto":
        # The Pallas kernel handles any K: it statically unrolls at most 64
        # insertion steps per round and chains rounds with a per-query key
        # lower bound for larger K (the reference's default K=500 -> 8
        # passes over p2, one compilation).  Its keys are column indices in
        # f32, exact only below 2^24 columns — larger P2 falls back to XLA.
        impl = (
            "pallas"
            if jax.default_backend() == "tpu" and P2 < 2**24
            else "xla"
        )
    elif impl == "pallas" and jax.default_backend() != "tpu":
        raise ValueError(
            "impl='pallas' requires a TPU backend (the ball-query Pallas "
            f"kernel is a Mosaic TPU program; current backend: "
            f"{jax.default_backend()!r}). Use impl='auto' or impl='xla'."
        )
    if impl == "pallas":
        from ..kernels.ball_query_pallas import ball_query_forward_pallas

        idx = ball_query_forward_pallas(p1, p2, lengths2, K, float(radius))
        iv = jnp.arange(P1, dtype=jnp.int32)[None, :] < lengths1[:, None]
        idx = jnp.where(iv[..., None], idx, -1)
        # Recompute the K squared distances from the indices (same per-axis
        # f32 arithmetic as the in-kernel radius check): O(P1*K) vs the
        # kernel's O(P1*P2), so tracking them in-kernel isn't worth a
        # payload side-car.
        safe = jnp.clip(idx, 0, P2 - 1)
        nn = jnp.take_along_axis(
            p2[:, :, None, :], safe.reshape(N, -1, 1, 1), axis=1
        ).reshape(N, P1, K, D)
        dv = ((p1[:, :, None, :] - nn) ** 2).sum(-1)
        return jnp.where(idx >= 0, dv, 0.0), idx

    r2 = jnp.float32(radius * radius)
    i_valid = (
        jnp.arange(P1, dtype=jnp.int32)[None, :] < lengths1[:, None]
    )  # (N, P1)

    if N * P1 * P2 <= _FULL_MATRIX_MAX_ELEMS:
        d2 = _pairwise_dist(p1, p2, 2)  # (N, P1, P2)
        j_valid = jnp.arange(P2, dtype=jnp.int32)[None, :] < lengths2[:, None]
        in_radius = (d2 < r2) & j_valid[:, None, :] & i_valid[..., None]
        kk, dv = _first_k_in_radius(d2, in_radius, jnp.int32(0), K)
        return _finalize_ball(kk, dv)

    # Streaming path: scan P2 tiles, merging "K smallest keys" states — the
    # merge is a concat + top_k like the KNN streaming merge, associative
    # because keys are globally unique column indices.
    T = min(_TILE_P2, P2)
    P2pad = -(-P2 // T) * T
    p2p = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0)))
    tiles = jnp.moveaxis(p2p.reshape(N, P2pad // T, T, D), 1, 0)  # (nt,N,T,D)
    offsets = jnp.arange(P2pad // T, dtype=jnp.int32) * T

    init = (
        jnp.full((N, P1, K), _BIG, jnp.int32),
        jnp.zeros((N, P1, K), jnp.float32),
    )

    def step(carry, inp):
        sk, sd = carry
        yt, off = inp
        d2 = _pairwise_dist(p1, yt, 2)  # (N, P1, T)
        j_valid = (off + jnp.arange(T, dtype=jnp.int32))[None, :] < lengths2[
            :, None
        ]
        in_radius = (d2 < r2) & j_valid[:, None, :] & i_valid[..., None]
        kk, dv = _first_k_in_radius(d2, in_radius, off, K)
        cand_k = jnp.concatenate([sk, kk], axis=2)
        cand_d = jnp.concatenate([sd, dv], axis=2)
        neg, sel = lax.top_k(-cand_k, K)
        return (-neg, jnp.take_along_axis(cand_d, sel, axis=2)), None

    (sk, sd), _ = lax.scan(step, init, (tiles, offsets))
    return _finalize_ball(sk, sd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ball_query_core(p1, p2, lengths1, lengths2, K, radius, impl):
    return _ball_query_forward(p1, p2, lengths1, lengths2, K, radius, impl)


def _bq_fwd(p1, p2, lengths1, lengths2, K, radius, impl):
    dists, idx = _ball_query_core(p1, p2, lengths1, lengths2, K, radius, impl)
    return (dists, idx), (p1, p2, lengths1, lengths2, idx)


def _bq_bwd(K, radius, impl, res, grads):
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
    impl: str = "auto",
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

    dists, idx = _ball_query_core(
        p1, p2, lengths1, lengths2, K, float(radius), impl
    )
    nn = masked_gather(p2, idx) if return_nn else None
    return _KNN(dists=dists, idx=idx, knn=nn)
