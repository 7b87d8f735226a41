"""Pointclouds container tour — the TPU-native analog of the reference's
examples/pointclouds.py: construction from ragged lists, the three views,
indexing, update_padded, and feature handling."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu import Pointclouds, all_close, get_bounding_boxes


def main():
    key = jax.random.PRNGKey(0)
    sizes = [128, 256, 64]
    points = [
        jax.random.normal(jax.random.fold_in(key, i), (s, 3))
        for i, s in enumerate(sizes)
    ]
    normals = [
        jax.random.normal(jax.random.fold_in(key, 10 + i), (s, 3))
        for i, s in enumerate(sizes)
    ]
    colors = [
        jax.random.uniform(jax.random.fold_in(key, 20 + i), (s, 3))
        for i, s in enumerate(sizes)
    ]

    pc = Pointclouds(points, features={"normals": normals, "colors": colors})
    print("batch size:", len(pc))
    print("num points per cloud:", pc.num_points_per_cloud())
    print("padded:", pc.points_padded().shape)
    print("packed:", pc.points_packed().shape)
    print("features:", {k: v.shape for k, v in pc.features_padded().items()})
    print("first idx:", pc.cloud_to_packed_first_idx())

    # Indexing & slicing
    sub = pc[[0, 2]]
    print("subset sizes:", sub.num_points_per_cloud())

    # Functional padded update (e.g. after an optimization step)
    moved = pc.update_padded(pc.points_padded() + 1.0)
    assert "normals" in moved.features_padded()  # features carried over
    assert not all_close(pc, moved)

    # Geometry helpers
    print("bounding boxes:", get_bounding_boxes(pc).shape)

    # The container is a pytree: jit straight through it
    @jax.jit
    def centroid_norms(p: Pointclouds):
        mask = (
            jnp.arange(p.points_padded().shape[1])[None]
            < p.num_points_per_cloud()[:, None]
        )
        com = (p.points_padded() * mask[..., None]).sum(1) / p.num_points_per_cloud()[
            :, None
        ]
        return jnp.linalg.norm(com, axis=-1)

    print("centroid norms:", centroid_norms(pc))


if __name__ == "__main__":
    main()
