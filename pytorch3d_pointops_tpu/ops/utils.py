"""Op-level helpers: masked_gather, wmean, get_point_covariances.

TPU-native equivalents of reference functions/utils.py:20-153.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp

Array = jnp.ndarray


def masked_gather(points: Array, idx: Array) -> Array:
    """Gather rows of ``points`` at ``idx``, where ``idx == -1`` marks padding:
    padded outputs are zero-filled (reference functions/utils.py:20-65).

    Args:
        points: (N, P, D) float array.
        idx: (N, K) or (N, P', K) integer array of indices into dim 1 of
            ``points``; -1 entries produce zero rows.

    Returns:
        (N, K, D) or (N, P', K, D) gathered values, 0.0 where idx == -1.
    """
    if idx.shape[0] != points.shape[0]:
        raise ValueError("points and idx must have the same batch dimension")
    N, P, D = points.shape

    mask = idx == -1
    safe_idx = jnp.where(mask, 0, idx)

    if idx.ndim == 3:
        # (N, P', K) -> (N, P', K, D)
        gathered = jnp.take_along_axis(
            points[:, :, None, :],  # (N, P, 1, D)
            safe_idx[..., None, None].reshape(N, -1, 1, 1),  # (N, P'*K, 1, 1)
            axis=1,
        )
        gathered = gathered.reshape(*idx.shape, D)
    elif idx.ndim == 2:
        gathered = jnp.take_along_axis(points, safe_idx[..., None], axis=1)
    else:
        raise ValueError("idx format is not supported %s" % repr(idx.shape))
    return jnp.where(mask[..., None], 0.0, gathered)


def wmean(
    x: Array,
    weight: Optional[Array] = None,
    axis: Union[int, Tuple[int]] = -2,
    keepdims: bool = True,
    eps: float = 1e-9,
) -> Array:
    """(Weighted) mean over ``axis`` with the last dim treated as spatial
    (reference functions/utils.py:68-108): ``sum(x*w) / max(sum(w), eps)``.
    """
    if weight is None:
        return x.mean(axis=axis, keepdims=keepdims)
    if any(
        xd != wd and xd != 1 and wd != 1
        for xd, wd in zip(x.shape[-2::-1], weight.shape[::-1])
    ):
        raise ValueError("wmean: weights are not compatible with the tensor")
    num = (x * weight[..., None]).sum(axis=axis, keepdims=keepdims)
    den = weight[..., None].sum(axis=axis, keepdims=keepdims)
    return num / jnp.clip(den, min=eps)


def get_point_covariances(
    points_padded: Array,
    num_points_per_cloud: Array,
    neighborhood_size: int,
) -> Tuple[Array, Array]:
    """Per-point covariance of the K-neighborhood of each point
    (reference functions/utils.py:111-153).

    Returns ``(covariances (N, P, D, D), k_nearest_neighbors (N, P, K, D))``.
    """
    from .knn import knn_points

    knn = knn_points(
        points_padded,
        points_padded,
        lengths1=num_points_per_cloud,
        lengths2=num_points_per_cloud,
        K=neighborhood_size,
        return_nn=True,
    ).knn
    pt_mean = knn.mean(axis=2, keepdims=True)
    central_diff = knn - pt_mean
    per_pt_cov = central_diff[..., None] * central_diff[..., None, :]
    covariances = per_pt_cov.mean(axis=2)
    return covariances, knn
