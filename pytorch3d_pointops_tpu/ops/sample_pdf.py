"""Inverse-CDF (NeRF-style) PDF sampling, TPU-native.

Reimplements both reference entry points:

* ``sample_pdf`` — semantics of the native kernel
  (``csrc/sample_pdf/sample_pdf_cpu.cpp:24-99`` / ``sample_pdf.cu:45-112``):
  un-normalized partial sums, total weight + eps, per-bin linear
  interpolation with the bin_weight>eps / overflow-to-bin-end special cases.
  The reference mutates its uniform-quantile buffer in place
  (sample_pdf.h:34-37); here quantiles are generated functionally (linspace
  when ``det`` else ``jax.random.uniform``) and the samples returned.
  The CPU binary search (``std::lower_bound``) becomes a vectorized
  ``jnp.searchsorted``.
* ``sample_pdf_python`` — the pure cumsum+searchsorted+lerp variant
  (``functions/sample_pdf.py:69-148``), kept as the cross-checking oracle.

Neither is differentiable (reference raises NotImplementedError,
sample_pdf.py:41-42); gradients are stopped explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _uniform_quantiles(
    batch_shape, n_samples: int, det: bool, key: Optional[jax.Array], dtype
) -> Array:
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
        return jnp.broadcast_to(u, (*batch_shape, n_samples))
    if key is None:
        raise ValueError("det=False requires a PRNG `key`.")
    return jax.random.uniform(key, (*batch_shape, n_samples), dtype=dtype)


def _validate(bins: Array, weights: Array):
    batch_shape = bins.shape[:-1]
    n_bins = weights.shape[-1]
    if n_bins + 1 != bins.shape[-1] or weights.shape[:-1] != batch_shape:
        raise ValueError(
            "Inconsistent shapes of bins and weights: "
            f"{bins.shape}{weights.shape}"
        )
    return batch_shape, n_bins


def sample_pdf(
    bins: Array,
    weights: Array,
    n_samples: int,
    det: bool = False,
    eps: float = 1e-5,
    key: Optional[jax.Array] = None,
) -> Array:
    """Draw ``n_samples`` per distribution from PDFs given by bin ``weights``
    over edges ``bins``.

    Mirrors reference ``functions/sample_pdf.py:14-66`` + the native kernel
    math (sample_pdf_cpu.cpp:50-98).

    Args:
        bins: (..., n_bins+1) bin edges.
        weights: (..., n_bins) non-negative bin weights.
        n_samples: samples per distribution.
        det: deterministic (uniformly spaced quantiles) vs random.
        eps: guard for empty bins.
        key: PRNG key (required iff ``det=False``).

    Returns:
        (..., n_samples) samples.  Not differentiable.
    """
    bins = jax.lax.stop_gradient(jnp.asarray(bins, jnp.float32))
    weights = jax.lax.stop_gradient(jnp.asarray(weights, jnp.float32))
    batch_shape, n_bins = _validate(bins, weights)

    u = _uniform_quantiles(batch_shape, n_samples, det, key, jnp.float32)

    partial = jnp.cumsum(weights, axis=-1)  # (..., n_bins)
    total = partial[..., -1:] + eps
    uniform = u * total  # (..., n_samples)

    # lower_bound over partial[..., :n_bins-1] -> bin in [0, n_bins-1]
    def search(ps, un):
        return jnp.searchsorted(ps, un, side="left").astype(jnp.int32)

    flat_ps = partial.reshape(-1, n_bins)[:, : n_bins - 1]
    flat_u = uniform.reshape(-1, n_samples)
    i_bin = jax.vmap(search)(flat_ps, flat_u).reshape(*batch_shape, n_samples)

    prev_sum = jnp.where(
        i_bin > 0,
        jnp.take_along_axis(partial, jnp.maximum(i_bin - 1, 0), axis=-1),
        0.0,
    )
    u_rem = uniform - prev_sum
    bin_start = jnp.take_along_axis(bins, i_bin, axis=-1)
    bin_end = jnp.take_along_axis(bins, i_bin + 1, axis=-1)
    bin_weight = jnp.take_along_axis(weights, i_bin, axis=-1)

    lerped = bin_start + (u_rem / jnp.where(bin_weight > eps, bin_weight, 1.0)) * (
        bin_end - bin_start
    )
    out = jnp.where(
        u_rem > bin_weight,
        bin_end,
        jnp.where(bin_weight > eps, lerped, bin_start),
    )
    return out


def sample_pdf_python(
    bins: Array,
    weights: Array,
    N_samples: int,
    det: bool = False,
    eps: float = 1e-5,
    key: Optional[jax.Array] = None,
) -> Array:
    """Cumsum + searchsorted + lerp variant; oracle counterpart of reference
    ``functions/sample_pdf.py:69-148`` (itself a port of the original NeRF
    TensorFlow sampler)."""
    bins = jax.lax.stop_gradient(jnp.asarray(bins, jnp.float32))
    weights = jax.lax.stop_gradient(jnp.asarray(weights, jnp.float32))
    batch_shape, n_bins = _validate(bins, weights)

    weights = weights + eps
    pdf = weights / weights.sum(axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    u = _uniform_quantiles(batch_shape, N_samples, det, key, cdf.dtype)

    def search(c, un):
        return jnp.searchsorted(c, un, side="right").astype(jnp.int32)

    inds = jax.vmap(search)(
        cdf.reshape(-1, n_bins + 1), u.reshape(-1, N_samples)
    ).reshape(*batch_shape, N_samples)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
