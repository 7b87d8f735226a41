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


def _scatter_rows_local(acc, idx, vals):
    """Deterministic per-hop scatter-add for the ring backward passes:
    ``acc[n, idx[n, e]] += vals[n, e]`` with ``idx == -1`` skipped.  The
    Pallas-vs-XLA policy (incl. the C-scaled VMEM capacity cap) lives in
    kernels/scatter_pallas.scatter_add_rows."""
    from ..kernels.scatter_pallas import scatter_add_rows

    P2l = acc.shape[1]
    return acc + scatter_add_rows(idx, vals, P2l)


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
        gy = _scatter_rows_local(
            gy,
            jnp.where(in_shard, local_idx, -1).reshape(N, P1l * K),
            (-diff).reshape(N, P1l * K, D),
        )
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
        gy = _scatter_rows_local(
            gy,
            jnp.where(in_shard, li, -1).reshape(N, P1l * K),
            contrib.reshape(N, P1l * K, C),
        )
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


def _local_nn_bidir(x, y, len1, len2, norm):
    """Both K=1 NN directions between local x and a visiting y shard from ONE
    distance evaluation: the fused chamfer kernel on TPU
    (kernels/chamfer_pallas.py), a jointly-masked distance matrix with
    row+column minima elsewhere.  Returns raw (d_xy, i_xy, d_yx, i_yx) minima
    (inf where a side is fully masked); local indices, ties keep the LOWEST
    index (first-seen-wins, csrc/utils/mink.cuh:62-83)."""
    if jax.default_backend() == "tpu":
        from ..kernels.chamfer_pallas import chamfer_nn_bidirectional_pallas

        return chamfer_nn_bidirectional_pallas(x, y, len1, len2, norm)
    P1l, P2l = x.shape[1], y.shape[1]
    d = _pairwise_dist(x, y, norm)  # (N, P1l, P2l)
    rvalid = (
        jnp.arange(P1l, dtype=jnp.int32)[None, :, None] < len1[:, None, None]
    )
    cvalid = (
        jnp.arange(P2l, dtype=jnp.int32)[None, None, :] < len2[:, None, None]
    )
    dm = jnp.where(rvalid & cvalid, d, _INF)
    d_xy = jnp.min(dm, axis=2)
    i_xy = jnp.argmin(dm, axis=2).astype(jnp.int32)  # first min = lowest idx
    d_yx = jnp.min(dm, axis=1)
    i_yx = jnp.argmin(dm, axis=1).astype(jnp.int32)
    return d_xy, i_xy, d_yx, i_yx


def _ring_nn_bidir_fwd_local(x_loc, y_loc, x_lengths, y_lengths, norm, axis_name):
    """ONE ring rotation serving BOTH chamfer NN directions (round 5): each
    y shard travels with its own running (min, argmin) state, so every
    (x shard, y shard) pair meets exactly once and the per-hop distance tile
    feeds the x->y row minima AND the visiting shard's y->x column minima —
    halving distance work and ppermute hops vs two ring-KNN passes (the
    distributed analog of the fused single-chip kernel)."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    N, P1l, _ = x_loc.shape
    P2l = y_loc.shape[1]
    off1 = my * P1l
    len1_loc = jnp.clip(x_lengths - off1, 0, P1l)

    def hop(carry, t):
        y, yd, yi, xd, xi = carry
        owner = (my - t) % n_dev
        off2 = owner * P2l
        len2_vis = jnp.clip(y_lengths - off2, 0, P2l)
        d1, i1, d2, i2 = _local_nn_bidir(x_loc, y, len1_loc, len2_vis, norm)
        # Lexicographic (value, global index) merges: shards visit in ring
        # order, not ascending index, so a value-only merge would keep the
        # earlier-VISITED shard on exact cross-shard ties; the index key
        # reproduces the single-chip first-seen-wins order bit-exactly.
        g1 = i1 + off2
        b1 = (d1 < xd) | ((d1 == xd) & (g1 < xi))
        xd = jnp.where(b1, d1, xd)
        xi = jnp.where(b1, g1, xi)
        g2 = i2 + off1
        b2 = (d2 < yd) | ((d2 == yd) & (g2 < yi))
        yd = jnp.where(b2, d2, yd)
        yi = jnp.where(b2, g2, yi)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        y = lax.ppermute(y, axis_name, perm)
        yd = lax.ppermute(yd, axis_name, perm)
        yi = lax.ppermute(yi, axis_name, perm)
        return (y, yd, yi, xd, xi), None

    init = (
        y_loc,
        jnp.full((N, P2l), _INF, jnp.float32),
        jnp.zeros((N, P2l), jnp.int32),
        jnp.full((N, P1l), _INF, jnp.float32),
        jnp.zeros((N, P1l), jnp.int32),
    )
    # n_dev rotations = a full cycle: the y shard AND its state end at home.
    (_, yd, yi, xd, xi), _ = lax.scan(
        hop, init, jnp.arange(n_dev, dtype=jnp.int32)
    )
    return xd, xi, yd, yi


def _ring_nn_bidir_bwd_local(
    x_loc, y_loc, x_lengths, y_lengths, i_xy, gd_xy, i_yx, gd_yx, norm,
    axis_name,
):
    """ONE backward rotation for both directions: the visiting tuple carries
    (y shard, its y->x idx/grad, its grad accumulator); each hop adds the
    x->y contributions of local queries whose NN falls in the visiting shard
    AND the y->x contributions of visiting queries whose NN falls in the
    local x shard (gradient formulas of knn.cu:503-515)."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    N, P1l, D = x_loc.shape
    P2l = y_loc.shape[1]
    off1 = my * P1l
    rows1 = off1 + jnp.arange(P1l, dtype=jnp.int32)
    valid_x = (
        (rows1[None, :] < x_lengths[:, None])
        & (y_lengths[:, None] > 0)
        & (i_xy >= 0)
    )
    g1 = jnp.where(valid_x, gd_xy, 0.0)

    def hop(carry, t):
        y, iy, gy, gy_acc, gx = carry
        owner = (my - t) % n_dev
        off2 = owner * P2l
        # x->y: local queries hitting the visiting shard.
        in2 = (i_xy >= off2) & (i_xy < off2 + P2l) & valid_x
        li2 = jnp.clip(i_xy - off2, 0, P2l - 1)
        p2g = jnp.take_along_axis(y, li2[..., None], axis=1)
        if norm == 1:
            diff = g1[..., None] * jnp.where(x_loc > p2g, 1.0, -1.0)
        else:
            diff = 2.0 * g1[..., None] * (x_loc - p2g)
        diff = jnp.where(in2[..., None], diff, 0.0)
        gx = gx + diff
        gy_acc = _scatter_rows_local(gy_acc, jnp.where(in2, li2, -1), -diff)

        # y->x: visiting queries hitting the local x shard.
        rows2 = off2 + jnp.arange(P2l, dtype=jnp.int32)
        valid_y = (
            (rows2[None, :] < y_lengths[:, None])
            & (x_lengths[:, None] > 0)
            & (iy >= 0)
        )
        g2 = jnp.where(valid_y, gy, 0.0)
        in1 = (iy >= off1) & (iy < off1 + P1l) & valid_y
        li1 = jnp.clip(iy - off1, 0, P1l - 1)
        p1g = jnp.take_along_axis(x_loc, li1[..., None], axis=1)
        if norm == 1:
            diff2 = g2[..., None] * jnp.where(y > p1g, 1.0, -1.0)
        else:
            diff2 = 2.0 * g2[..., None] * (y - p1g)
        diff2 = jnp.where(in1[..., None], diff2, 0.0)
        gy_acc = gy_acc + diff2
        gx = _scatter_rows_local(gx, jnp.where(in1, li1, -1), -diff2)

        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        y = lax.ppermute(y, axis_name, perm)
        iy = lax.ppermute(iy, axis_name, perm)
        gy = lax.ppermute(gy, axis_name, perm)
        gy_acc = lax.ppermute(gy_acc, axis_name, perm)
        return (y, iy, gy, gy_acc, gx), None

    init = (y_loc, i_yx, gd_yx, jnp.zeros_like(y_loc), jnp.zeros_like(x_loc))
    (_, _, _, gy_home, gx), _ = lax.scan(
        hop, init, jnp.arange(n_dev, dtype=jnp.int32)
    )
    return gx, gy_home


@functools.lru_cache(maxsize=None)
def _make_ring_nn_bidir(mesh, point_axis, batch_axis, norm):
    spec_pts = P(batch_axis, point_axis, None)
    spec_len = P(batch_axis)
    spec_vec = P(batch_axis, point_axis)

    fwd_sharded = shard_map(
        functools.partial(
            _ring_nn_bidir_fwd_local, norm=norm, axis_name=point_axis
        ),
        mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_len, spec_len),
        out_specs=(spec_vec, spec_vec, spec_vec, spec_vec),
        check_vma=False,
    )
    bwd_sharded = shard_map(
        functools.partial(
            _ring_nn_bidir_bwd_local, norm=norm, axis_name=point_axis
        ),
        mesh=mesh,
        in_specs=(
            spec_pts, spec_pts, spec_len, spec_len,
            spec_vec, spec_vec, spec_vec, spec_vec,
        ),
        out_specs=(spec_pts, spec_pts),
        check_vma=False,
    )

    @jax.custom_vjp
    def nn_bidir(x, y, lx, ly):
        d1, i1, d2, i2 = fwd_sharded(x, y, lx, ly)
        d1, i1 = _apply_pad_conventions(
            d1[..., None], i1[..., None], lx, ly, 1, x.shape[1]
        )
        d2, i2 = _apply_pad_conventions(
            d2[..., None], i2[..., None], ly, lx, 1, y.shape[1]
        )
        return d1[..., 0], i1[..., 0], d2[..., 0], i2[..., 0]

    def nn_fwd(x, y, lx, ly):
        out = nn_bidir(x, y, lx, ly)
        return out, (x, y, lx, ly, out[1], out[3])

    def nn_bwd(res, grads):
        x, y, lx, ly, i1, i2 = res
        gd1, _, gd2, _ = grads
        gx, gy = bwd_sharded(
            x, y, lx, ly,
            i1, gd1.astype(jnp.float32), i2, gd2.astype(jnp.float32),
        )
        return gx, gy, None, None

    nn_bidir.defvjp(nn_fwd, nn_bwd)
    return nn_bidir


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

    Round 5: ONE fused ring rotation serves both NN directions (the y shards
    travel with their running minima — see ``_ring_nn_bidir_fwd_local``), and
    the reduction/feature/weights semantics are ``ops.chamfer``'s own code
    (``_chamfer_distance_single_direction`` with a ring ``gather_fn``), so
    the distributed path can never drift from the single-chip option matrix.
    Named feature channels fetch neighbor features with a differentiable
    ring gather instead of an all-gather.

    Returns ``loss`` alone when no features are requested (backward
    compatible), else ``(loss, loss_features)``.
    """
    from ..ops.chamfer import (
        _apply_batch_reduction,
        _chamfer_distance_single_direction,
        _combine_directions,
        _validate_chamfer_reduction_inputs,
    )

    _validate_chamfer_reduction_inputs(batch_reduction, point_reduction)
    if not (norm == 1 or norm == 2):
        raise ValueError("Support for 1 or 2 norm.")
    return_features = (
        x_features is not None
        and y_features is not None
        and feature_names is not None
        and len(feature_names) > 0
    )
    if return_features and point_reduction == "max":
        raise ValueError('Features must be None if point_reduction is "max"')

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    N, P1, _ = x.shape
    P2 = y.shape[1]
    if x_lengths is None:
        x_lengths = jnp.full((N,), P1, jnp.int32)
    if y_lengths is None:
        y_lengths = jnp.full((N,), P2, jnp.int32)
    x_lengths = jnp.asarray(x_lengths, jnp.int32)
    y_lengths = jnp.asarray(y_lengths, jnp.int32)

    # Pad points AND features to ring-size multiples up front; the lengths
    # masks exclude every pad row from losses, gathers, and gradients.
    n_ring = mesh.shape[point_axis]
    P1pad = -(-P1 // n_ring) * n_ring
    P2pad = -(-P2 // n_ring) * n_ring

    def pad_pts(a, tgt):
        return (
            jnp.pad(a, ((0, 0), (0, tgt - a.shape[1]), (0, 0)))
            if a.shape[1] != tgt
            else a
        )

    xp, yp = pad_pts(x, P1pad), pad_pts(y, P2pad)
    xf = yf = None
    if x_features is not None:
        xf = {k: pad_pts(jnp.asarray(v), P1pad) for k, v in x_features.items()}
    if y_features is not None:
        yf = {k: pad_pts(jnp.asarray(v), P2pad) for k, v in y_features.items()}

    if single_directional:
        # One-direction losses need no y->x minima: the plain ring-KNN
        # (K=1) pass skips the bidirectional kernel's y-state ppermutes in
        # the forward and the per-hop y->x gather/scatter in the backward.
        d1k, i1k = _make_ring_knn(mesh, point_axis, batch_axis, 1, norm)(
            xp, yp, x_lengths, y_lengths
        )
        d1, i1 = d1k[..., 0], i1k[..., 0]
        d2 = i2 = None
    else:
        d1, i1, d2, i2 = _make_ring_nn_bidir(
            mesh, point_axis, batch_axis, norm
        )(xp, yp, x_lengths, y_lengths)

    def ring_gather(v, idx, lens):
        return ring_knn_gather(
            v, idx, lens, mesh=mesh, point_axis=point_axis,
            batch_axis=batch_axis,
        )

    cham_x, feats_x = _chamfer_distance_single_direction(
        xp, yp, x_lengths, y_lengths, xf, yf, weights, point_reduction,
        norm, abs_cosine, feature_names, nn=(d1, i1), gather_fn=ring_gather,
    )
    if single_directional:
        loss, loss_features = cham_x, feats_x
    else:
        cham_y, feats_y = _chamfer_distance_single_direction(
            yp, xp, y_lengths, x_lengths, yf, xf, weights, point_reduction,
            norm, abs_cosine, feature_names, nn=(d2, i2),
            gather_fn=ring_gather,
        )
        loss, loss_features = _combine_directions(
            cham_x, feats_x, cham_y, feats_y, point_reduction
        )

    if point_reduction is None:
        # Un-reduced terms keep the caller's original point counts.
        def trim(v, p):
            return v[:, :p]

        if single_directional:
            loss = trim(loss, P1)
            if loss_features is not None:
                loss_features = {k: trim(v, P1) for k, v in loss_features.items()}
        else:
            loss = (trim(loss[0], P1), trim(loss[1], P2))
            if loss_features is not None:
                loss_features = {
                    k: (trim(v[0], P1), trim(v[1], P2))
                    for k, v in loss_features.items()
                }

    loss, loss_features = _apply_batch_reduction(
        loss, loss_features, weights, batch_reduction
    )
    if return_features:
        return loss, loss_features
    return loss
