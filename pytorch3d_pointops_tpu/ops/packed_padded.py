"""Packed <-> padded conversions as differentiable device ops.

Reimplements reference ``functions/packed_to_padded.py:15-198`` and the CUDA
scatter/gather kernels ``csrc/packed_to_padded_tensor/packed_to_padded_tensor.cu``.

On TPU both directions are pure gathers with index vectors computed in-graph
from ``first_idxs`` (the reference's one-block-per-cloud copy kernels,
packed_to_padded_tensor.cu:15-119, are just a ragged gather/scatter).  Each
direction's gradient is the other direction, wired explicitly with
``jax.custom_vjp`` exactly like the reference's autograd Function pairing
(packed_to_padded.py:55-62, :144-151).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _packed_to_padded_2d(inputs: Array, first_idxs: Array, max_size: int) -> Array:
    """(F, D) packed -> (N, max_size, D) padded; rows past each cloud's size
    are zero."""
    F, D = inputs.shape
    N = first_idxs.shape[0]
    sizes = jnp.diff(first_idxs, append=jnp.int32(F))
    p = jnp.arange(max_size, dtype=jnp.int32)
    gather_idx = first_idxs[:, None] + p[None, :]  # (N, max_size)
    valid = p[None, :] < sizes[:, None]
    out = inputs[jnp.clip(gather_idx, 0, max(F - 1, 0))]
    return jnp.where(valid[..., None], out, 0.0)


def _padded_to_packed_2d(inputs: Array, first_idxs: Array, num_inputs: int) -> Array:
    """(N, max_size, D) padded -> (F, D) packed."""
    N, M, D = inputs.shape
    f = jnp.arange(num_inputs, dtype=jnp.int32)
    n_of_f = (
        jnp.searchsorted(first_idxs, f, side="right").astype(jnp.int32) - 1
    )
    p_of_f = f - first_idxs[n_of_f]
    return inputs[n_of_f, p_of_f]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _packed_to_padded_op(inputs, first_idxs, max_size):
    return _packed_to_padded_2d(inputs, first_idxs, max_size)


def _p2p_fwd(inputs, first_idxs, max_size):
    return _packed_to_padded_2d(inputs, first_idxs, max_size), (
        first_idxs,
        inputs.shape[0],
    )


def _p2p_bwd(max_size, res, grad_out):
    first_idxs, num_inputs = res
    return _padded_to_packed_2d(grad_out, first_idxs, num_inputs), None


_packed_to_padded_op.defvjp(_p2p_fwd, _p2p_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _padded_to_packed_op(inputs, first_idxs, num_inputs):
    return _padded_to_packed_2d(inputs, first_idxs, num_inputs)


def _pd2pk_fwd(inputs, first_idxs, num_inputs):
    return _padded_to_packed_2d(inputs, first_idxs, num_inputs), (
        first_idxs,
        inputs.shape[1],
    )


def _pd2pk_bwd(num_inputs, res, grad_out):
    first_idxs, max_size = res
    return _packed_to_padded_2d(grad_out, first_idxs, max_size), None


_padded_to_packed_op.defvjp(_pd2pk_fwd, _pd2pk_bwd)


def packed_to_padded(inputs: Array, first_idxs: Array, max_size: int) -> Array:
    """Convert a packed (F,) or (F, ...) tensor to padded (N, max_size, ...).

    Mirrors reference ``functions/packed_to_padded.py:65-103`` including the
    flat-input reshaping; ``first_idxs[i]`` is the packed row where batch
    element i starts.  Differentiable; the gradient is ``padded_to_packed``.
    """
    input_shape = inputs.shape
    n_dims = inputs.ndim
    if n_dims == 1:
        inputs = inputs[:, None]
    else:
        inputs = inputs.reshape(input_shape[0], -1)
    first_idxs = jnp.asarray(first_idxs, jnp.int32)
    if not isinstance(max_size, int):
        raise ValueError("max_size has to be int.")
    out = _packed_to_padded_op(inputs, first_idxs, max_size)
    if n_dims == 1:
        return out[..., 0]
    if n_dims == 2:
        return out
    return out.reshape(*out.shape[:2], *input_shape[1:])


def padded_to_packed(
    inputs: Array,
    first_idxs: Array,
    num_inputs: int,
    max_size_dim: int = 1,
) -> Array:
    """Convert a padded (N, ..., max_size, ...) tensor to packed (F, ...).

    Mirrors reference ``functions/packed_to_padded.py:154-198`` including the
    ``max_size_dim`` moveaxis handling.  Differentiable; the gradient is
    ``packed_to_padded``.
    """
    n_dims = inputs.ndim
    inputs = jnp.moveaxis(inputs, max_size_dim, 1)
    input_shape = inputs.shape
    if n_dims == 2:
        inputs = inputs[..., None]
    else:
        inputs = inputs.reshape(*input_shape[:2], -1)
    first_idxs = jnp.asarray(first_idxs, jnp.int32)
    if not isinstance(num_inputs, int):
        raise ValueError("num_inputs has to be int.")
    out = _padded_to_packed_op(inputs, first_idxs, num_inputs)
    if n_dims == 2:
        return out[..., 0]
    return out.reshape(-1, *input_shape[2:])
