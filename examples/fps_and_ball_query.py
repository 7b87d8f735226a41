"""PointNet++-style set abstraction: FPS centroids + ball-query grouping —
the TPU-native analog of the reference's examples/fps_on_pointclouds.py and
examples/ball_query_on_pointclouds.py (BASELINE.json config 2 workload)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu import (
    ball_query,
    masked_gather,
    sample_farthest_points,
    sample_farthest_points_naive,
)


def main():
    key = jax.random.PRNGKey(0)
    N, P = 4, 4096
    points = jax.random.normal(jax.random.PRNGKey(1), (N, P, 3))
    lengths = jnp.asarray([P, P // 2, P, 3 * P // 4], jnp.int32)

    # --- FPS: 512 centroids per cloud ---
    centroids, idx = sample_farthest_points(points, lengths, K=512)
    print("centroids:", centroids.shape, "idx pad count:", int((idx == -1).sum()))

    # exact parity with the naive oracle (the reference asserts torch.equal,
    # examples/fps_on_pointclouds.py:152-154)
    _, idx_naive = sample_farthest_points_naive(points, lengths, K=512)
    assert (np.asarray(idx) == np.asarray(idx_naive)).all()

    # matched feature selection via masked_gather (fps_on_pointclouds.py:178)
    colors = jax.random.uniform(jax.random.PRNGKey(2), (N, P, 3))
    centroid_colors = masked_gather(colors, idx)
    print("centroid colors:", centroid_colors.shape)

    # --- ball query around the centroids: r=0.2, K=32 ---
    grouped = ball_query(points, centroids, lengths1=lengths, K=32, radius=0.2)
    in_radius = np.asarray(grouped.dists)[np.asarray(grouped.idx) >= 0]
    print(
        "grouped:", grouped.knn.shape,
        "max dist^2:", float(in_radius.max()) if in_radius.size else None,
    )
    assert (in_radius < 0.2**2).all()

    # random start points use an explicit PRNG key (vs the reference's host
    # RNG loop)
    _, idx_rand = sample_farthest_points(
        points, lengths, K=16, random_start_point=True, key=jax.random.PRNGKey(3)
    )
    print("random-start firsts:", np.asarray(idx_rand[:, 0]))


if __name__ == "__main__":
    main()
