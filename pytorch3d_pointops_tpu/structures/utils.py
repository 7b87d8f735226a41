"""Representation conversion utilities for ragged batches of tensors.

TPU-native reimplementation of the list/padded/packed conversion helpers of the
reference library (see /root/reference/pytorch3d_pointops/structures/utils.py:19-242
for the semantics being reproduced).  These helpers are *host-side* construction
conveniences: they take Python lists and concrete lengths and build device arrays.
On device (inside jit) everything computes on padded arrays + lengths; the
jit-compatible packed<->padded device ops live in
``pytorch3d_pointops_tpu.ops.packed_padded``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _is_array(x) -> bool:
    return isinstance(x, (jnp.ndarray, np.ndarray)) or hasattr(x, "shape")


def list_to_padded(
    x: Union[List[Array], Tuple[Array, ...]],
    pad_size: Union[Sequence[int], None] = None,
    pad_value: float = 0.0,
    equisized: bool = False,
) -> Array:
    """Stack a list of N arrays of shape ``(Si_0, ..., Si_D)`` into a padded
    array of shape ``(N, pad_size[0], ..., pad_size[D])``.

    If ``pad_size`` is None the max size along each dim is used.  Mirrors
    reference ``structures/utils.py:19-79``.
    """
    if equisized:
        return jnp.stack([jnp.asarray(y) for y in x], axis=0)

    if not all(_is_array(y) for y in x):
        raise ValueError("All items have to be arrays.")

    x = [jnp.asarray(y) for y in x]
    element_ndim = max(y.ndim for y in x)
    # Replace empty 1D arrays with correctly-shaped empty arrays.
    x = [
        jnp.zeros([0] * element_ndim, dtype=y.dtype)
        if (y.ndim == 1 and y.size == 0)
        else y
        for y in x
    ]
    if any(y.ndim != x[0].ndim for y in x):
        raise ValueError("All items have to have the same number of dimensions!")

    if pad_size is None:
        pad_dims = [
            max(y.shape[dim] for y in x if len(y) > 0) for dim in range(x[0].ndim)
        ]
    else:
        if any(len(pad_size) != y.ndim for y in x):
            raise ValueError("Pad size must contain target size for all dimensions.")
        pad_dims = list(pad_size)

    N = len(x)
    out = np.full((N, *pad_dims), pad_value, dtype=np.asarray(x[0]).dtype)
    for i, y in enumerate(x):
        if len(y) > 0:
            slices = (i, *(slice(0, y.shape[dim]) for dim in range(y.ndim)))
            out[slices] = np.asarray(y)
    return jnp.asarray(out)


def padded_to_list(
    x: Array,
    split_size: Union[Sequence[int], Sequence[Sequence[int]], None] = None,
) -> List[Array]:
    """Split a padded array ``(N, S_1, ..., S_D)`` into a list of N arrays,
    each trimmed to ``split_size[i]`` along the leading (or all) dims.

    Mirrors reference ``structures/utils.py:82-116``.
    """
    x = jnp.asarray(x)
    x_list = [x[i] for i in range(x.shape[0])]

    if split_size is None:
        return x_list

    N = len(split_size)
    if x.shape[0] != N:
        raise ValueError("Split size must be of same length as inputs first dimension")

    for i in range(N):
        if isinstance(split_size[i], (int, np.integer)):
            x_list[i] = x_list[i][: int(split_size[i])]
        else:
            slices = tuple(slice(0, int(s)) for s in split_size[i])
            x_list[i] = x_list[i][slices]
    return x_list


def list_to_packed(x: List[Array]):
    """Concatenate a list of N arrays of shape (Mi, ...) into (sum(Mi), ...).

    Returns a 4-tuple ``(x_packed, num_items, item_packed_first_idx,
    item_packed_to_list_idx)`` mirroring reference
    ``structures/utils.py:119-154``.
    """
    if not x:
        raise ValueError("Input list is empty")
    sizes = [int(xi.shape[0]) for xi in x]
    num_items = jnp.asarray(sizes, dtype=jnp.int32)
    first = np.zeros(len(sizes), dtype=np.int32)
    first[1:] = np.cumsum(sizes[:-1])
    item_packed_first_idx = jnp.asarray(first)
    to_list = np.repeat(np.arange(len(sizes), dtype=np.int32), sizes)
    item_packed_to_list_idx = jnp.asarray(to_list)
    x_packed = jnp.concatenate([jnp.asarray(xi) for xi in x], axis=0)
    return x_packed, num_items, item_packed_first_idx, item_packed_to_list_idx


def packed_to_list(x: Array, split_size: Union[list, int]):
    """Split a packed array (sum(Mi), ...) into a list of arrays of shape
    (Mi, ...).  Mirrors reference ``structures/utils.py:157-170``."""
    if isinstance(split_size, int):
        n = x.shape[0] // split_size
        split_size = [split_size] * n
    out = []
    start = 0
    for s in split_size:
        out.append(x[start : start + int(s)])
        start += int(s)
    return out


def padded_to_packed(
    x: Array,
    split_size: Union[list, tuple, None] = None,
    pad_value: Union[float, int, None] = None,
):
    """Flatten a padded (N, M, K) array into a packed array.

    Exactly one of split_size / pad_value may be given; with neither, returns
    the full (N*M, K) flattening.  Mirrors reference
    ``structures/utils.py:173-242``.
    """
    x = jnp.asarray(x)
    if x.ndim != 3:
        raise ValueError("Supports only 3-dimensional input tensors")
    N, M, D = x.shape

    if split_size is not None and pad_value is not None:
        raise ValueError("Only one of split_size or pad_value should be provided.")

    x_packed = x.reshape(-1, D)

    if pad_value is None and split_size is None:
        return x_packed

    if pad_value is not None:
        mask = np.asarray((x_packed != pad_value).any(-1))
        return x_packed[jnp.asarray(np.nonzero(mask)[0])]

    if len(split_size) != N:
        raise ValueError("Split size must be of same length as inputs first dimension")
    if not all(isinstance(i, (int, np.integer)) for i in split_size):
        raise ValueError(
            "Support only 1-dimensional unbinded tensor. "
            "Split size for more dimensions provided"
        )
    idx = np.concatenate(
        [np.arange(int(v), dtype=np.int64) + i * M for i, v in enumerate(split_size)]
    )
    return x_packed[jnp.asarray(idx)]
