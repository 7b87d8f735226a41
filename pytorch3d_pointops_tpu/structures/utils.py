"""Representation conversion utilities for ragged batches of tensors.

TPU-native reimplementation of the list/padded/packed conversion helpers of the
reference library (see /root/reference/pytorch3d_pointops/structures/utils.py:19-242
for the semantics being reproduced).  These helpers are *host-side* construction
conveniences: they take Python lists and concrete lengths and build device arrays.
On device (inside jit) everything computes on padded arrays + lengths; the
jit-compatible packed<->padded device ops live in
``pytorch3d_pointops_tpu.ops.packed_padded``.

Implementation note: the heavy lifting runs in numpy on the host (a single
device upload at the end) — ragged Python lists never reach the device.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _arraylike(x) -> bool:
    return isinstance(x, (jnp.ndarray, np.ndarray)) or hasattr(x, "shape")


def list_to_padded(
    x: Union[List[Array], Tuple[Array, ...]],
    pad_size: Union[Sequence[int], None] = None,
    pad_value: float = 0.0,
    equisized: bool = False,
) -> Array:
    """Stack a list of N arrays of shape ``(Si_0, ..., Si_D)`` into a padded
    array of shape ``(N, pad_size[0], ..., pad_size[D])``.

    With ``pad_size=None``, each output dim takes the max size over the list.
    Semantics mirror reference ``structures/utils.py:19-79``.
    """
    if equisized:
        return jnp.stack([jnp.asarray(y) for y in x], axis=0)

    if not all(_arraylike(y) for y in x):
        raise ValueError("list_to_padded: every list entry must be an array.")

    items = [np.asarray(y) for y in x]
    rank = max(y.ndim for y in items)
    # A zero-size 1D placeholder stands in for "empty element of any rank".
    items = [
        np.zeros((0,) * rank, dtype=y.dtype) if (y.ndim == 1 and y.size == 0) else y
        for y in items
    ]
    if any(y.ndim != items[0].ndim for y in items):
        raise ValueError(
            "list_to_padded: list entries differ in rank; all non-empty "
            "entries must have the same number of dimensions."
        )

    if pad_size is None:
        # Entries with a nonzero LEADING dim participate in size inference
        # even if a trailing dim is zero (reference semantics: `len(y) > 0`,
        # structures/utils.py:65-66) — (5, 0) still contributes 5 to dim 0.
        target = [
            max(y.shape[dim] for y in items if y.shape[0] > 0)
            for dim in range(items[0].ndim)
        ]
    else:
        if any(len(pad_size) != y.ndim for y in items):
            raise ValueError(
                "list_to_padded: pad_size must give a target size for every "
                "dimension of the list entries."
            )
        target = list(pad_size)

    out = np.full((len(items), *target), pad_value, dtype=items[0].dtype)
    for i, y in enumerate(items):
        if y.shape[0] > 0:
            region = (i, *(slice(0, s) for s in y.shape))
            out[region] = y
    return jnp.asarray(out)


def padded_to_list(
    x: Array,
    split_size: Union[Sequence[int], Sequence[Sequence[int]], None] = None,
) -> List[Array]:
    """Split a padded ``(N, S_1, ..., S_D)`` array back into a list of N
    arrays, trimming entry ``i`` to ``split_size[i]`` (an int trims the
    leading dim; a tuple trims every dim).  Mirrors reference
    ``structures/utils.py:82-116``."""
    x = jnp.asarray(x)
    out = [x[i] for i in range(x.shape[0])]

    if split_size is None:
        return out

    if x.shape[0] != len(split_size):
        raise ValueError(
            "padded_to_list: split_size needs one entry per batch element "
            f"(got {len(split_size)} for batch {x.shape[0]})."
        )

    for i, s in enumerate(split_size):
        if isinstance(s, (int, np.integer)):
            out[i] = out[i][: int(s)]
        else:
            out[i] = out[i][tuple(slice(0, int(d)) for d in s)]
    return out


def list_to_packed(x: List[Array]):
    """Concatenate a list of N arrays of shape (Mi, ...) into (sum(Mi), ...).

    Returns ``(packed, num_items, first_idx, to_list_idx)``: the packed
    array, per-entry sizes (N,), the packed offset where each entry starts
    (N,), and for every packed row the list index it came from (sum(Mi),).
    Mirrors reference ``structures/utils.py:119-154``.
    """
    if not x:
        raise ValueError("list_to_packed: received an empty list.")
    sizes = np.asarray([int(xi.shape[0]) for xi in x], dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int32)
    owners = np.repeat(np.arange(len(sizes), dtype=np.int32), sizes)
    packed = jnp.concatenate([jnp.asarray(xi) for xi in x], axis=0)
    return packed, jnp.asarray(sizes), jnp.asarray(starts), jnp.asarray(owners)


def packed_to_list(x: Array, split_size: Union[list, int]):
    """Slice a packed (sum(Mi), ...) array back into a list of (Mi, ...)
    arrays.  An int ``split_size`` means equal chunks.  Mirrors reference
    ``structures/utils.py:157-170``."""
    if isinstance(split_size, int):
        split_size = [split_size] * (x.shape[0] // split_size)
    out = []
    offset = 0
    for s in split_size:
        out.append(x[offset : offset + int(s)])
        offset += int(s)
    return out


def padded_to_packed(
    x: Array,
    split_size: Union[list, tuple, None] = None,
    pad_value: Union[float, int, None] = None,
):
    """Flatten a padded (N, M, K) array into a packed (F, K) array.

    Exactly one of ``split_size`` / ``pad_value`` may be given: split_size
    keeps the first ``split_size[i]`` rows of entry i; pad_value drops rows
    equal to it everywhere.  With neither, returns the dense (N*M, K)
    flattening.  Mirrors reference ``structures/utils.py:173-242``.
    """
    x = jnp.asarray(x)
    if x.ndim != 3:
        raise ValueError("padded_to_packed: input must be a (N, M, K) array.")
    N, M, D = x.shape

    if split_size is not None and pad_value is not None:
        raise ValueError(
            "padded_to_packed: split_size and pad_value are mutually "
            "exclusive; give at most one."
        )

    flat = x.reshape(-1, D)

    if pad_value is None and split_size is None:
        return flat

    if pad_value is not None:
        keep = np.nonzero(np.asarray((flat != pad_value).any(-1)))[0]
        return flat[jnp.asarray(keep)]

    if len(split_size) != N:
        raise ValueError(
            "padded_to_packed: split_size needs one entry per batch element "
            f"(got {len(split_size)} for batch {N})."
        )
    if not all(isinstance(s, (int, np.integer)) for s in split_size):
        raise ValueError(
            "padded_to_packed: only scalar (leading-dim) split sizes are "
            "supported."
        )
    rows = np.concatenate(
        [np.arange(int(s), dtype=np.int64) + i * M for i, s in enumerate(split_size)]
    )
    return flat[jnp.asarray(rows)]
