"""Iterative farthest point sampling (FPS), TPU-native.

Reimplements reference ``functions/sample_farthest_points.py:18-197`` and the
CUDA kernel ``csrc/sample_farthest_points/sample_farthest_points.cu:19-104``.

The algorithm is inherently sequential over the K selection rounds; each round
is data-parallel over the points.  The CUDA one-block-per-cloud + cub
BlockReduce ArgMax structure becomes a ``lax.fori_loop`` carrying the running
min-distance buffer, vmapped over the batch; ties in the argmax resolve to the
*first* maximal index (``jnp.argmax`` semantics), matching the CPU/naive
reference convention (``std::max_element``,
sample_farthest_points_cpu.cpp:91-92).

Conventions reproduced: idx padded with -1 past ``min(K[n], lengths[n])``
(sample_farthest_points.cu:135), gathered points zero-filled at pads
(functions/utils.py:57-64), start index 0 unless ``random_start_point``
(sample_farthest_points.py:85-89), not differentiable through the selection —
gradients flow to ``points`` only through the final gather
(sample_farthest_points.py:91-94).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .utils import masked_gather

Array = jnp.ndarray


def _normalize_K(K, N: int) -> np.ndarray:
    """K may be an int, list, or array; must be concrete (static shapes)."""
    if isinstance(K, (int, np.integer)):
        K = np.full((N,), int(K), np.int64)
    elif isinstance(K, (list, tuple)):
        K = np.asarray(K, np.int64)
    elif isinstance(K, jax.core.Tracer):
        raise ValueError(
            "K must be concrete (int/list/numpy array): output shape (N, max(K)) "
            "is static under XLA."
        )
    else:
        K = np.asarray(K, np.int64)
    if K.shape[0] != N:
        raise ValueError("K and points must have the same batch dimension")
    return K


def _fps_single(points: Array, length: Array, k: Array, start_idx: Array, max_K: int):
    """FPS for one padded cloud. points (P, D); returns idx (max_K,) int32."""
    P = points.shape[0]
    j = jnp.arange(P, dtype=jnp.int32)
    valid = j < length
    k_n = jnp.minimum(length, k)  # number of real samples for this cloud

    idx0 = jnp.where(k_n > 0, start_idx.astype(jnp.int32), -1)
    init_idx = jnp.full((max_K,), -1, jnp.int32).at[0].set(idx0)
    # Running distance-to-selected-set; invalid slots never win the argmax.
    init_mind = jnp.where(valid, jnp.inf, -1.0).astype(jnp.float32)

    def round_fn(i, carry):
        min_d, last, idx_arr = carry
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, jnp.where(valid, d, -1.0))
        nxt = jnp.argmax(min_d).astype(jnp.int32)  # first-max tie-break
        active = i < k_n
        idx_arr = idx_arr.at[i].set(jnp.where(active, nxt, -1))
        last = jnp.where(active, nxt, last)
        return min_d, last, idx_arr

    _, _, idx_arr = lax.fori_loop(
        1, max_K, round_fn, (init_mind, jnp.maximum(idx0, 0), init_idx)
    )
    return idx_arr


def _fps_indices(points, lengths, K_dev, start_idxs, max_K, impl):
    """Dispatch between the Pallas TPU kernels and the XLA fori_loop path.

    On TPU: batches of clouds go to the batched kernel (every cloud advances
    through each selection round together — FPS rounds are tiny, so
    amortizing per-op dispatch across the batch dominates); single/few huge
    clouds go to the per-cloud sublane-dense kernel (VMEM-resident up to
    2M points); anything larger falls back to the XLA fori_loop.
    """
    N, P, D = points.shape
    if impl == "auto":
        impl = "xla"
        if jax.default_backend() == "tpu":
            from ..kernels.fps_pallas import (
                MAX_BATCHED_ELEMS,
                MAX_CHUNKED_POINTS,
                MAX_VMEM_POINTS,
            )

            # Measured (scripts/tune_fps.py): batched wins for many small
            # clouds; past ~8k points/cloud the dense8 per-cloud kernel's
            # packed layout wins even at batch 8.  The VMEM caps were
            # measured at D=3 — both kernels hold ~(D+1)*4 B/point — so
            # scale them by (D+1)/4 so higher-D clouds near the limits fall
            # back to XLA instead of failing TPU compilation opaquely.
            # Past the dense8 cap the chunked kernel streams point slabs
            # from HBM per round, keeping only 4 B/point (D-independent)
            # resident — the XLA fori_loop fallback at that scale re-streams
            # AND re-dispatches per round (7.6 s/1M pts vs 59 ms).
            d_scale = (D + 1) / 4.0
            if N >= 4 and P <= 8192 and N * P * d_scale <= MAX_BATCHED_ELEMS:
                impl = "pallas_batched"
            elif P * d_scale <= MAX_VMEM_POINTS:
                impl = "pallas"
            elif P <= MAX_CHUNKED_POINTS and D <= 6:
                # The chunked kernel publishes per-chunk (max, argmax,
                # D coords) partials on the 8 sublane rows of one buffer, so
                # it only holds D <= 6 coordinates; higher-D giants take the
                # (slow but correct) XLA fori_loop.
                impl = "pallas_chunked"
    elif impl in (
        "pallas", "pallas_batched", "pallas_chunked"
    ) and jax.default_backend() != "tpu":
        raise ValueError(
            f"impl={impl!r} requires a TPU backend (the FPS Pallas kernels "
            f"are Mosaic TPU programs; current backend: "
            f"{jax.default_backend()!r}). Use impl='auto' or impl='xla'."
        )
    if impl == "pallas_batched":
        from ..kernels.fps_pallas import fps_pallas_batched

        return fps_pallas_batched(points, lengths, K_dev, start_idxs, max_K)
    if impl == "pallas":
        from ..kernels.fps_pallas import fps_pallas

        return fps_pallas(points, lengths, K_dev, start_idxs, max_K)
    if impl == "pallas_chunked":
        from ..kernels.fps_pallas import fps_pallas_chunked

        return fps_pallas_chunked(points, lengths, K_dev, start_idxs, max_K)
    return jax.vmap(lambda p, l, k, s: _fps_single(p, l, k, s, max_K))(
        points, lengths, K_dev, start_idxs
    )


def sample_farthest_points(
    points: Array,
    lengths: Optional[Array] = None,
    K: Union[int, List, Array] = 50,
    random_start_point: bool = False,
    key: Optional[jax.Array] = None,
    impl: str = "auto",
) -> Tuple[Array, Array]:
    """Subsample ``K`` maximally spread points per cloud.

    Mirrors reference ``functions/sample_farthest_points.py:18-96``.

    Args:
        points: (N, P, D) clouds.
        lengths: (N,) valid lengths (default all P).
        K: int, list, or concrete (N,) array of per-cloud sample counts.
        random_start_point: start from a random valid index per cloud.
        key: PRNG key for random starts (replaces the reference's host-side
            ``torch.randint`` loop, sample_farthest_points.py:85-89).
            Required iff ``random_start_point``.

    Returns:
        (selected_points (N, max_K, D) zero-padded,
         selected_indices (N, max_K) int32, -1-padded).
    """
    points = jnp.asarray(points, jnp.float32)
    N, P, D = points.shape
    if lengths is None:
        lengths = jnp.full((N,), P, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    if lengths.shape != (N,):
        raise ValueError("points and lengths must have same batch dimension.")

    K_arr = _normalize_K(K, N)
    max_K = int(K_arr.max()) if K_arr.size else 0
    K_dev = jnp.asarray(K_arr, jnp.int32)

    if random_start_point:
        if key is None:
            raise ValueError("random_start_point=True requires a PRNG `key`.")
        u = jax.random.uniform(key, (N,))
        start_idxs = jnp.floor(u * jnp.maximum(lengths, 1)).astype(jnp.int32)
        start_idxs = jnp.minimum(start_idxs, jnp.maximum(lengths - 1, 0))
    else:
        start_idxs = jnp.zeros((N,), jnp.int32)

    idx = lax.stop_gradient(
        _fps_indices(points, lengths, K_dev, start_idxs, max_K, impl)
    )
    sampled_points = masked_gather(points, idx)
    return sampled_points, idx


def sample_farthest_points_naive(
    points: Array,
    lengths: Optional[Array] = None,
    K: Union[int, List, Array] = 50,
    random_start_point: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[Array, Array]:
    """Pure-numpy oracle mirroring reference
    ``sample_farthest_points_naive`` (functions/sample_farthest_points.py:99-197);
    used in tests to assert exact index parity with the device implementation.
    """
    pts = np.asarray(points, np.float32)
    N, P, D = pts.shape
    if lengths is None:
        lengths_np = np.full((N,), P, np.int64)
    else:
        lengths_np = np.asarray(lengths, np.int64)
    K_arr = _normalize_K(K, N)
    max_K = int(K_arr.max()) if K_arr.size else 0

    if random_start_point:
        if key is None:
            raise ValueError("random_start_point=True requires a PRNG `key`.")
        u = np.asarray(jax.random.uniform(key, (N,)))
        starts = np.minimum(
            np.floor(u * np.maximum(lengths_np, 1)).astype(np.int64),
            np.maximum(lengths_np - 1, 0),
        )
    else:
        starts = np.zeros((N,), np.int64)

    all_idx = np.full((N, max_K), -1, np.int64)
    for n in range(N):
        L = int(lengths_np[n])
        k_n = min(L, int(K_arr[n]))
        if k_n <= 0:
            continue
        closest = np.full((L,), np.inf, np.float32)
        selected = int(starts[n])
        all_idx[n, 0] = selected
        for i in range(1, k_n):
            dist = pts[n, selected, :] - pts[n, :L, :]
            d2 = (dist**2).sum(-1)
            closest = np.minimum(closest, d2)
            selected = int(np.argmax(closest))
            all_idx[n, i] = selected

    idx = jnp.asarray(all_idx.astype(np.int32))
    return masked_gather(jnp.asarray(pts), idx), idx
