"""Pallas TPU kernel for iterative farthest point sampling.

TPU-native counterpart of the CUDA one-block-per-cloud kernel
(csrc/sample_farthest_points/sample_farthest_points.cu:19-104).  Key design:

* Grid ``(N,)`` — one program per cloud, mirroring the CUDA block-per-cloud
  launch (:146).
* Points are laid out **transposed** as (D, P): the long point axis rides the
  128-wide lane dimension, so a cloud costs ~32 B/point of VMEM instead of
  the ~512 B/point a (P, 3) layout would waste on lane padding.
* The running ``min_point_dist`` buffer (the CUDA kernel's global-memory
  ``min_point_dist``, :63-81) and the points both stay **VMEM-resident across
  all K rounds** — the XLA fori_loop version re-streams P*12 bytes from HBM
  per round; this kernel reads HBM once per cloud.
* Selected coordinates are extracted with a one-hot reduction (no dynamic
  lane gather); the per-round argmax resolves ties to the first maximal
  index, matching ``std::max_element`` in the CPU reference
  (sample_farthest_points_cpu.cpp:91-92) and our XLA/naive twins.

The kernel returns indices only; the differentiable point gather happens in
the caller exactly like the reference (functions/sample_farthest_points.py:94).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_INF = float("inf")

# Above this point count the VMEM budget (points + min-dist buffers at
# ~64 B/point) is exceeded; callers fall back to the XLA implementation.
MAX_VMEM_POINTS = 131072


def _fps_kernel(
    lengths_ref,  # scalar-prefetch SMEM (N,) int32
    k_ref,  # scalar-prefetch SMEM (N,) int32
    start_ref,  # scalar-prefetch SMEM (N,) int32
    pts_ref,  # VMEM (1, D, P) f32 (transposed layout)
    out_i_ref,  # VMEM (1, 1, max_K) int32
    min_d_ref,  # VMEM scratch (1, P) f32
    *,
    max_K: int,
):
    n = pl.program_id(0)
    P = pts_ref.shape[2]
    length = lengths_ref[n]
    k_n = jnp.minimum(length, k_ref[n])
    start = start_ref[n]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    valid = lane < length
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, max_K), 1)

    # Slot 0: the start index (or -1 for an empty cloud).
    idx0 = jnp.where(k_n > 0, start, -1)
    out_i_ref[0] = jnp.where(out_lane == 0, idx0, -1)

    min_d_ref[...] = jnp.where(valid, _INF, -1.0)

    pts = pts_ref[0]  # (D, P)

    def round_fn(i, last):
        # Extract the last selected point's coords via a one-hot reduction.
        onehot = (lane == last).astype(jnp.float32)  # (1, P)
        coords = jnp.sum(pts * onehot, axis=1, keepdims=True)  # (D, 1)
        diff = pts - coords
        d2 = jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, P)
        min_d_ref[...] = jnp.minimum(min_d_ref[...], jnp.where(valid, d2, -1.0))
        nxt = jnp.argmax(min_d_ref[...], axis=1)[0].astype(jnp.int32)
        active = i < k_n
        sel = jnp.where(active, nxt, -1)
        out_i_ref[0] = jnp.where(out_lane == i, sel, out_i_ref[0])
        return jnp.where(active, nxt, last)

    jax.lax.fori_loop(1, max_K, round_fn, jnp.maximum(idx0, 0))


@functools.partial(jax.jit, static_argnames=("max_K", "interpret"))
def fps_pallas(
    points_t: Array,
    lengths: Array,
    K: Array,
    start_idxs: Array,
    max_K: int,
    interpret: bool = False,
) -> Array:
    """Farthest point sampling indices on TPU.

    Args:
        points_t: (N, D, P) f32 — *transposed* clouds.
        lengths: (N,) int32 valid lengths.
        K: (N,) int32 per-cloud sample counts.
        start_idxs: (N,) int32 starting indices.
        max_K: static max of K (output width).

    Returns:
        idx: (N, max_K) int32, -1-padded past min(K[n], lengths[n]).
    """
    N, D, P = points_t.shape
    if max_K == 0:
        return jnp.zeros((N, 0), jnp.int32)

    kernel = functools.partial(_fps_kernel, max_K=max_K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(
                (1, D, P), lambda n, *_: (n, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, max_K), lambda n, *_: (n, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
    )
    out3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 1, max_K), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * max_K * P * D,
            bytes_accessed=4 * N * (D * P + max_K),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        K.astype(jnp.int32),
        start_idxs.astype(jnp.int32),
        points_t,
    )
    return out3[:, 0]
