"""KNN + chamfer-loss workflow — the TPU-native analog of the reference's
examples/knn_on_pointclouds.py and examples/chamfer_loss.py: neighbor
queries with ragged lengths, normal interpolation via knn_gather, and a
chamfer-with-features optimization loop."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

from pytorch3d_pointops_tpu import (
    Pointclouds,
    chamfer_distance,
    knn_gather,
    knn_points,
)


def main():
    key = jax.random.PRNGKey(0)
    pts1 = [
        jax.random.normal(jax.random.fold_in(key, 0), (1000, 3)),
        jax.random.normal(jax.random.fold_in(key, 1), (800, 3)),
    ]
    normals1 = [jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1000, 1)),
                jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (800, 1))]
    pc1 = Pointclouds(pts1, features={"normals": normals1})
    pc2 = Pointclouds(
        [p + 0.05 for p in pts1], features={"normals": normals1}
    )

    # --- KNN with ragged lengths (reference knn_on_pointclouds.py) ---
    out = knn_points(
        pc1.points_padded(),
        pc2.points_padded(),
        pc1.num_points_per_cloud(),
        pc2.num_points_per_cloud(),
        K=8,
    )
    print("knn dists:", out.dists.shape, "idx:", out.idx.shape)
    # self-KNN sanity: nearest neighbor of each point in itself is itself
    self_nn = knn_points(pc1.points_padded(), pc1.points_padded(), K=1)
    assert float(self_nn.dists.max()) < 1e-5

    # interpolate neighbor normals (unit length in, unit length out here)
    nn_normals = knn_gather(
        pc2.get_features_padded("normals"), out.idx, pc2.num_points_per_cloud()
    )
    interp = nn_normals.mean(axis=2)
    print("interpolated normals:", interp.shape)

    # --- chamfer fit (reference chamfer_loss.py) ---
    target = pc1.points_padded()
    src = target + 0.3 * jax.random.normal(jax.random.fold_in(key, 7), target.shape)

    @jax.jit
    def step(p):
        def loss_fn(p_):
            loss, feats = chamfer_distance(
                p_,
                target,
                pc1.num_points_per_cloud(),
                pc1.num_points_per_cloud(),
                x_features={"normals": pc1.get_features_padded("normals")},
                y_features={"normals": pc1.get_features_padded("normals")},
                feature_names=["normals"],
            )
            return loss + feats["normals"]

        loss, g = jax.value_and_grad(loss_fn)(p)
        return p - 0.5 * g, loss

    p = src
    for i in range(100):
        p, loss = step(p)
        if i % 20 == 0:
            print(f"iter {i:3d}  chamfer+normals loss {float(loss):.5f}")
    print("final loss:", float(loss))


if __name__ == "__main__":
    main()
