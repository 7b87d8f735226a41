"""Ring-parallel KNN and chamfer over a device mesh.

This is the scale-out layer the reference never had (SURVEY §2.3): for clouds
too large for one chip's HBM — or to parallelize the O(P1*P2) distance work —
query points p1 shard over a mesh axis while reference clouds p2 **rotate
around the ring** via ``jax.lax.ppermute`` over ICI, each device merging every
visiting shard into a running top-K (the point-cloud analog of ring
attention; the merge is an associative concat + two-key lexicographic sort
on (distance, global index), so the result — including exact-tie order — is
independent of hop order).

Returned indices are **global** p2 indices (shard offset added per hop), so
the ring produces bit-identical semantics to the single-chip op.

The backward is a second ring pass: each (p2_shard, grad_p2_shard) pair
travels the full cycle, every device adding the gradient contributions of its
own queries whose neighbors fall in the visiting shard (the CUDA atomicAdd
scatter of knn.cu:514-515 becomes a local deterministic scatter-add whose
accumulator rides the ring home) — communication overlapped with compute by
XLA, no all-gather of either points or gradients ever materializes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.knn import (
    _KNN,
    _apply_pad_conventions,
    _pairwise_dist,
    _topk_small,
    knn_gather,
)

Array = jnp.ndarray
_INF = float("inf")  # plain float: no backend init at import time


def _local_knn(x, y, len2_local, K, norm):
    """Local brute-force KNN of x (N, P1l, D) against a visiting shard
    y (N, P2l, D); returns (dists, local idx) inf-padded to K."""
    P2l = y.shape[1]
    if jax.default_backend() == "tpu":
        # Per-device hot loop on a pod: run the Pallas streaming kernel per
        # visiting shard (same in-kernel lengths masking and inf-pad
        # conventions as the XLA path below, ~35x faster per hop).  Any K:
        # K > 64 chains 64-key rounds with lexicographic lower bounds
        # inside the kernel wrapper (round 4), so the ring no longer drops
        # large K to XLA.
        from ..kernels.knn_pallas import knn_forward_pallas

        return knn_forward_pallas(x, y, len2_local, K, norm)
    d = _pairwise_dist(x, y, norm)  # (N, P1l, P2l)
    j_valid = (
        jnp.arange(P2l, dtype=jnp.int32)[None, :] < len2_local[:, None]
    )
    d = jnp.where(j_valid[:, None, :], d, _INF)
    Kp = min(K, P2l)
    vals, idx = _topk_small(d, Kp)
    if Kp < K:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, K - Kp)), constant_values=_INF)
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, K - Kp)))
    return vals, idx.astype(jnp.int32)


def _ring_fwd_local(p1_loc, p2_loc, lengths2, K, norm, axis_name):
    """Runs on each device under shard_map: stream all p2 shards through."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    N, P1l, _ = p1_loc.shape
    P2l = p2_loc.shape[1]

    state_d = jnp.full((N, P1l, K), _INF, jnp.float32)
    state_i = jnp.zeros((N, P1l, K), jnp.int32)

    def hop(carry, t):
        y, sd, si = carry
        owner = (my - t) % n_dev
        offset = owner * P2l
        len2_local = jnp.clip(lengths2 - offset, 0, P2l)
        vals, idx = _local_knn(p1_loc, y, len2_local, K, norm)
        idx = idx + offset
        # Merge = concat + two-key lexicographic sort on (dist, global idx):
        # associative AND tie-exact — shards visit in ring order (not
        # ascending index), so a value-only top_k would keep the earlier-
        # VISITED shard on exact cross-shard ties instead of the lower
        # global index; sorting with the index as the second key reproduces
        # the single-chip first-seen-wins order bit-exactly.
        cand_d = jnp.concatenate([sd, vals], axis=2)
        cand_i = jnp.concatenate([si, idx], axis=2)
        md, mi = lax.sort((cand_d, cand_i), dimension=2, num_keys=2)
        md, mi = md[..., :K], mi[..., :K]
        y_next = lax.ppermute(
            y, axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        return (y_next, md, mi), None

    (_, state_d, state_i), _ = lax.scan(
        hop,
        (p2_loc, state_d, state_i),
        jnp.arange(n_dev, dtype=jnp.int32),
    )
    return state_d, state_i


def _ring_bwd_local(
    p1_loc, p2_loc, lengths1, lengths2, idx_loc, grad_d_loc, K, norm, axis_name
):
    """Backward ring pass; see module docstring."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    N, P1l, D = p1_loc.shape
    P2l = p2_loc.shape[1]
    row_offset = my * P1l

    rows = row_offset + jnp.arange(P1l, dtype=jnp.int32)
    valid = (
        (rows[None, :, None] < lengths1[:, None, None])
        & (
            jnp.arange(K, dtype=jnp.int32)[None, None, :]
            < lengths2[:, None, None]
        )
        & (idx_loc >= 0)
    )
    g = jnp.where(valid, grad_d_loc, 0.0)

    def hop(carry, t):
        y, gy, gp1 = carry
        owner = (my - t) % n_dev
        offset = owner * P2l
        in_shard = (idx_loc >= offset) & (idx_loc < offset + P2l) & valid
        local_idx = jnp.clip(idx_loc - offset, 0, P2l - 1)
        p2_g = jnp.take_along_axis(
            y[:, :, None, :], local_idx.reshape(N, -1, 1, 1), axis=1
        ).reshape(N, P1l, K, D)
        if norm == 1:
            diff = g[..., None] * jnp.where(p1_loc[:, :, None, :] > p2_g, 1.0, -1.0)
        else:
            diff = 2.0 * g[..., None] * (p1_loc[:, :, None, :] - p2_g)
        diff = jnp.where(in_shard[..., None], diff, 0.0)
        gp1 = gp1 + diff.sum(axis=2)

        def scatter_one(gy_n, i_n, v_n):
            return gy_n.at[i_n.reshape(-1)].add(v_n.reshape(-1, D))

        gy = jax.vmap(scatter_one)(gy, local_idx, -diff)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        y_next = lax.ppermute(y, axis_name, perm)
        gy_next = lax.ppermute(gy, axis_name, perm)
        return (y_next, gy_next, gp1), None

    init = (p2_loc, jnp.zeros_like(p2_loc), jnp.zeros_like(p1_loc))
    (_, gp2, gp1), _ = lax.scan(
        hop, init, jnp.arange(n_dev, dtype=jnp.int32)
    )
    return gp1, gp2


@functools.lru_cache(maxsize=None)
def _make_ring_knn(mesh, point_axis, batch_axis, K, norm):
    spec_pts = P(batch_axis, point_axis, None)
    spec_len = P(batch_axis)
    spec_out = P(batch_axis, point_axis, None)

    fwd_local = functools.partial(
        _ring_fwd_local, K=K, norm=norm, axis_name=point_axis
    )
    bwd_local = functools.partial(
        _ring_bwd_local, K=K, norm=norm, axis_name=point_axis
    )

    fwd_sharded = shard_map(
        fwd_local,
        mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_len),
        out_specs=(spec_out, spec_out),
        check_vma=False,
    )
    bwd_sharded = shard_map(
        bwd_local,
        mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_len, spec_len, spec_out, spec_out),
        out_specs=(spec_pts, spec_pts),
        check_vma=False,
    )

    @jax.custom_vjp
    def ring_knn(p1, p2, lengths1, lengths2):
        dists, idx = fwd_sharded(p1, p2, lengths2)
        return _apply_pad_conventions(
            dists, idx, lengths1, lengths2, K, p1.shape[1]
        )

    def ring_knn_fwd(p1, p2, lengths1, lengths2):
        dists, idx = ring_knn(p1, p2, lengths1, lengths2)
        return (dists, idx), (p1, p2, lengths1, lengths2, idx)

    def ring_knn_bwd(res, grads):
        p1, p2, lengths1, lengths2, idx = res
        grad_dists, _ = grads
        gp1, gp2 = bwd_sharded(
            p1, p2, lengths1, lengths2, idx, grad_dists.astype(jnp.float32)
        )
        return gp1, gp2, None, None

    ring_knn.defvjp(ring_knn_fwd, ring_knn_bwd)
    return ring_knn


def ring_knn_points(
    p1: Array,
    p2: Array,
    lengths1: Optional[Array] = None,
    lengths2: Optional[Array] = None,
    norm: int = 2,
    K: int = 1,
    *,
    mesh: Mesh,
    point_axis: str = "sp",
    batch_axis: Optional[str] = None,
    return_nn: bool = False,
) -> _KNN:
    """KNN with p1 sharded over ``point_axis`` and p2 rotated around the ring.

    Semantics identical to ``ops.knn.knn_points`` (global indices, reference
    padding conventions).  P1/P2 that don't divide the ring size are padded
    internally (the pad rows/columns are excluded via the lengths masks and
    trimmed from the outputs), so any shape runs unmodified.
    Differentiable w.r.t. p1 and p2 via the backward ring pass.
    """
    if p1.shape[0] != p2.shape[0]:
        raise ValueError("pts1 and pts2 must have the same batch dimension.")
    if p1.shape[2] != p2.shape[2]:
        raise ValueError("pts1 and pts2 must have the same point dimension.")
    if not (norm == 1 or norm == 2):
        raise ValueError("Support for 1 or 2 norm.")
    n_ring = mesh.shape[point_axis]

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

    # Auto-pad to ring-size multiples: pad queries are zeroed by the
    # lengths1 row mask and trimmed below; pad candidates sit past every
    # lengths2 so the in-ring masking never admits them.
    P1pad = -(-P1 // n_ring) * n_ring
    P2pad = -(-P2 // n_ring) * n_ring
    p1p = jnp.pad(p1, ((0, 0), (0, P1pad - P1), (0, 0))) if P1pad != P1 else p1
    p2p = jnp.pad(p2, ((0, 0), (0, P2pad - P2), (0, 0))) if P2pad != P2 else p2

    ring = _make_ring_knn(mesh, point_axis, batch_axis, K, norm)
    dists, idx = ring(p1p, p2p, lengths1, lengths2)
    dists, idx = dists[:, :P1], idx[:, :P1]
    nn = knn_gather(p2, idx, lengths2) if return_nn else None
    return _KNN(dists=dists, idx=idx, knn=nn)


def _ring_gather_local(y_loc, idx_loc, K, axis_name):
    """Per-device body of the ring feature gather: rotate value shards and
    accumulate the rows whose global index falls in the visiting shard."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    N, P2l, C = y_loc.shape
    P1l = idx_loc.shape[1]

    def hop(carry, t):
        y, acc = carry
        owner = (my - t) % n_dev
        off = owner * P2l
        in_shard = (idx_loc >= off) & (idx_loc < off + P2l)
        li = jnp.clip(idx_loc - off, 0, P2l - 1)
        g = jnp.take_along_axis(
            y[:, :, None, :], li.reshape(N, -1, 1, 1), axis=1
        ).reshape(N, P1l, K, C)
        acc = acc + jnp.where(in_shard[..., None], g, 0.0)
        y = lax.ppermute(
            y, axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        return (y, acc), None

    init = (y_loc, jnp.zeros((N, P1l, K, C), y_loc.dtype))
    (_, acc), _ = lax.scan(hop, init, jnp.arange(n_dev, dtype=jnp.int32))
    return acc


def _ring_gather_bwd_local(idx_loc, grad_acc, P2l_total, K, axis_name):
    """Backward of the ring gather: each device's contributions to a value
    shard are scattered into an accumulator that rides the ring back to the
    owning device (same structure as the KNN backward ring pass)."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    N, P1l, _, C = grad_acc.shape
    P2l = P2l_total // n_dev

    def hop(carry, t):
        gy = carry
        owner = (my - t) % n_dev
        off = owner * P2l
        in_shard = (idx_loc >= off) & (idx_loc < off + P2l)
        li = jnp.clip(idx_loc - off, 0, P2l - 1)
        contrib = jnp.where(in_shard[..., None], grad_acc, 0.0)

        def scatter_one(gy_n, i_n, v_n):
            return gy_n.at[i_n.reshape(-1)].add(v_n.reshape(-1, C))

        gy = jax.vmap(scatter_one)(gy, li, contrib)
        gy = lax.ppermute(
            gy, axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        return gy, None

    init = jnp.zeros((N, P2l, C), grad_acc.dtype)
    gy, _ = lax.scan(hop, init, jnp.arange(n_dev, dtype=jnp.int32))
    return gy


@functools.lru_cache(maxsize=None)
def _make_ring_gather(mesh, point_axis, batch_axis, K):
    spec_val = P(batch_axis, point_axis, None)
    spec_idx = P(batch_axis, point_axis, None)
    spec_out = P(batch_axis, point_axis, None, None)

    fwd_sharded = shard_map(
        functools.partial(_ring_gather_local, K=K, axis_name=point_axis),
        mesh=mesh,
        in_specs=(spec_val, spec_idx),
        out_specs=spec_out,
        check_vma=False,
    )

    @jax.custom_vjp
    def ring_gather(y_values, idx):
        return fwd_sharded(y_values, idx)

    def ring_gather_fwd(y_values, idx):
        return ring_gather(y_values, idx), (idx, y_values.shape[1])

    def ring_gather_bwd(res, grad_acc):
        idx, P2 = res
        bwd_sharded = shard_map(
            functools.partial(
                _ring_gather_bwd_local,
                P2l_total=P2,
                K=K,
                axis_name=point_axis,
            ),
            mesh=mesh,
            in_specs=(spec_idx, spec_out),
            out_specs=spec_val,
            check_vma=False,
        )
        return bwd_sharded(idx, grad_acc), None

    ring_gather.defvjp(ring_gather_fwd, ring_gather_bwd)
    return ring_gather


def ring_knn_gather(
    x: Array,
    idx: Array,
    lengths: Optional[Array] = None,
    *,
    mesh: Mesh,
    point_axis: str = "sp",
    batch_axis: Optional[str] = None,
) -> Array:
    """``knn_gather`` with values ``x`` (N, M, U) and indices (N, L, K) both
    sharded over ``point_axis``: value shards rotate around the ring instead
    of all-gathering.  Differentiable w.r.t. ``x``; zero-fills entries where
    ``k >= lengths[n]`` exactly like ``ops.knn.knn_gather``."""
    N, M, _ = x.shape
    K = idx.shape[2]
    if lengths is None:
        lengths = jnp.full((N,), M, jnp.int32)
    gathered = _make_ring_gather(mesh, point_axis, batch_axis, K)(x, idx)
    mask = (
        jnp.arange(K, dtype=jnp.int32)[None, None, :] < lengths[:, None, None]
    )
    return jnp.where(mask[..., None], gathered, 0.0)


def _cosine_similarity(a, b, eps=1e-6):
    dot = (a * b).sum(-1)
    na = jnp.sqrt((a * a).sum(-1))
    nb = jnp.sqrt((b * b).sum(-1))
    return dot / jnp.clip(na * nb, min=eps)


def ring_chamfer_distance(
    x: Array,
    y: Array,
    x_lengths: Optional[Array] = None,
    y_lengths: Optional[Array] = None,
    x_features: Optional[dict] = None,
    y_features: Optional[dict] = None,
    weights: Optional[Array] = None,
    batch_reduction: Optional[str] = "mean",
    point_reduction: Optional[str] = "mean",
    norm: int = 2,
    single_directional: bool = False,
    abs_cosine: bool = True,
    feature_names: Optional[list] = None,
    *,
    mesh: Mesh,
    point_axis: str = "sp",
    batch_axis: Optional[str] = None,
):
    """Chamfer distance with both clouds sharded over the ring axis.

    Composes two ring-KNN(K=1) passes with the standard masked reductions of
    ``ops.chamfer``; reductions over sharded axes compile to psums over ICI.
    Named feature channels are scored exactly like ``ops.chamfer`` (cosine
    distance to the nearest neighbor's feature), with the neighbor features
    fetched by a differentiable ring gather instead of an all-gather.

    Returns ``loss`` alone when no features are requested (backward
    compatible), else ``(loss, loss_features)``.
    """
    from ..ops.chamfer import _validate_chamfer_reduction_inputs

    _validate_chamfer_reduction_inputs(batch_reduction, point_reduction)
    if weights is not None and not isinstance(weights, jax.core.Tracer):
        import numpy as _np

        if (_np.asarray(weights) < 0).any():
            raise ValueError("weights cannot be negative.")
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    N, P1, _ = x.shape
    P2 = y.shape[1]
    if x_lengths is None:
        x_lengths = jnp.full((N,), P1, jnp.int32)
    if y_lengths is None:
        y_lengths = jnp.full((N,), P2, jnp.int32)
    return_features = (
        x_features is not None
        and y_features is not None
        and feature_names is not None
        and len(feature_names) > 0
    )
    if return_features and point_reduction == "max":
        raise ValueError('Features must be None if point_reduction is "max"')

    def one_direction(a, b, la, lb, a_feats, b_feats):
        nn = ring_knn_points(
            a, b, la, lb, norm=norm, K=1,
            mesh=mesh, point_axis=point_axis, batch_axis=batch_axis,
        )
        cham = nn.dists[..., 0]  # (N, Pa)
        mask = jnp.arange(a.shape[1], dtype=jnp.int32)[None] >= la[:, None]
        cham = jnp.where(mask, 0.0, cham)
        if weights is not None:
            cham = cham * jnp.asarray(weights)[:, None]

        feats = None
        if return_features:
            feats = {}
            for name in feature_names:
                near = ring_knn_gather(
                    b_feats[name], nn.idx, lb,
                    mesh=mesh, point_axis=point_axis, batch_axis=batch_axis,
                )[..., 0, :]
                cos = _cosine_similarity(a_feats[name], near)
                cos = jnp.abs(cos) if abs_cosine else cos
                fd = jnp.where(mask, 0.0, 1.0 - cos)
                if weights is not None:
                    fd = fd * jnp.asarray(weights)[:, None]
                feats[name] = fd

        if point_reduction == "max":
            return cham.max(axis=1), feats
        if point_reduction is not None:
            cham = cham.sum(axis=1)
            if feats is not None:
                feats = {k: v.sum(axis=1) for k, v in feats.items()}
            if point_reduction == "mean":
                la_c = jnp.clip(la, min=1)
                cham = cham / la_c
                if feats is not None:
                    feats = {k: v / la_c for k, v in feats.items()}
        return cham, feats

    cham_x, feats_x = one_direction(
        x, y, x_lengths, y_lengths, x_features, y_features
    )
    if single_directional:
        loss = cham_x
        loss_features = feats_x
    else:
        cham_y, feats_y = one_direction(
            y, x, y_lengths, x_lengths, y_features, x_features
        )
        if point_reduction == "max":
            loss = jnp.maximum(cham_x, cham_y)
            loss_features = None
        elif point_reduction is not None:
            loss = cham_x + cham_y
            loss_features = (
                {k: feats_x[k] + feats_y[k] for k in feats_x}
                if feats_x is not None
                else None
            )
        else:
            loss = (cham_x, cham_y)
            loss_features = (
                {k: (feats_x[k], feats_y[k]) for k in feats_x}
                if feats_x is not None
                else None
            )

    if batch_reduction is not None and point_reduction is not None:
        loss = loss.sum()
        if loss_features is not None:
            loss_features = {k: v.sum() for k, v in loss_features.items()}
        if batch_reduction == "mean":
            if weights is None:
                div = max(N, 1)
            else:
                wsum = jnp.asarray(weights).sum()
                div = jnp.where(wsum == 0.0, 1.0, wsum)
            loss = loss / div
            if loss_features is not None:
                loss_features = {
                    k: v / div for k, v in loss_features.items()
                }
    if return_features:
        return loss, loss_features
    return loss
