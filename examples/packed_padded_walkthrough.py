"""Packed <-> padded representation walkthrough.

TPU-native mirror of the reference's conversion demo
(examples/packed_to_padded_on_pointclouds.py:70-137): build variable-size
clouds with a named feature channel, pull their packed representation from
the ``Pointclouds`` container, round-trip through the differentiable device
ops ``packed_to_padded`` / ``padded_to_packed``, verify exactness, and
report padding efficiency.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu import (
    Pointclouds,
    packed_to_padded,
    padded_to_packed,
)


def main():
    key = jax.random.PRNGKey(0)
    sizes = [120, 75, 200, 33]
    pts = [
        jax.random.normal(jax.random.fold_in(key, i), (s, 3))
        for i, s in enumerate(sizes)
    ]
    inten = [
        jax.random.uniform(jax.random.fold_in(key, 100 + i), (s, 1))
        for i, s in enumerate(sizes)
    ]
    pc = Pointclouds(pts, features={"intensities": inten})

    points_packed = pc.points_packed()
    inten_packed = pc.get_features_packed("intensities")
    lengths = pc.num_points_per_cloud()
    first_idxs = pc.cloud_to_packed_first_idx()
    total = int(lengths.sum())
    max_size = int(lengths.max())

    print(f"clouds: {len(pc)}, points per cloud: {[int(s) for s in lengths]}")
    print(f"packed points: {points_packed.shape}, "
          f"packed intensities: {inten_packed.shape}")

    # packed -> padded on device (jit-compatible gathers, not host loops)
    points_padded = packed_to_padded(points_packed, first_idxs, max_size)
    inten_padded = packed_to_padded(inten_packed, first_idxs, max_size)
    print(f"padded points: {points_padded.shape}, "
          f"padded intensities: {inten_padded.shape}")

    # ... and back
    points_repacked = padded_to_packed(points_padded, first_idxs, total)
    inten_repacked = padded_to_packed(inten_padded, first_idxs, total)

    np.testing.assert_allclose(
        np.asarray(points_packed), np.asarray(points_repacked), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(inten_packed), np.asarray(inten_repacked), atol=1e-6
    )
    # The container's own padded view must agree with the device op's.
    np.testing.assert_allclose(
        np.asarray(pc.points_padded()), np.asarray(points_padded), atol=1e-6
    )
    print("round-trip exact ✓ (and matches Pointclouds.points_padded)")

    # Conversions are differentiable: grads flow through the gather.
    def loss(packed):
        return packed_to_padded(packed, first_idxs, max_size).sum()

    g = jax.grad(loss)(points_packed)
    assert np.allclose(np.asarray(g), 1.0), "gradient should be all-ones"
    print("packed_to_padded gradient = ones ✓ (transposed-op pairing)")

    total_elements = points_padded.size
    valid_elements = points_packed.size
    print(f"padding ratio: {(total_elements - valid_elements) / total_elements:.2%} "
          f"({total_elements} padded vs {valid_elements} valid elements)")


if __name__ == "__main__":
    main()
