"""Local covariance / eigen-structure analysis on point clouds.

TPU-native mirror of the reference's covariance demo
(examples/utils_on_pointclouds.py:83-133): estimate per-point covariance
matrices over KNN neighborhoods with ``get_point_covariances``, then show
that the eigenvalue structure recovers the generating geometry — a sphere
surface is locally planar-isotropic in-plane, an ellipsoid squashed along z
shows anisotropy, and a line shows pure linearity.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu import Pointclouds
from pytorch3d_pointops_tpu.ops.utils import get_point_covariances


def make_clouds(n=800, key=jax.random.PRNGKey(0)):
    k1, k2, k3 = jax.random.split(key, 3)
    # Sphere surface (radius 1)
    v = jax.random.normal(k1, (n, 3))
    sphere = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    # Ellipsoid squashed along z: tightly curled at the equator, so its
    # local neighborhoods span 3D (higher sphericity than the sphere's)
    ellipsoid = sphere * jnp.asarray([1.0, 1.0, 0.1])
    # Noisy 3D line segment
    t = jax.random.uniform(k2, (n, 1))
    line = t * jnp.asarray([2.0, 1.0, 0.5]) + 0.001 * jax.random.normal(k3, (n, 3))
    return Pointclouds([sphere, ellipsoid, line])


def shape_descriptors(cov):
    """Linearity / planarity / sphericity from sorted eigenvalues
    (descending), the classic local-geometry descriptors."""
    eigvals = np.linalg.eigvalsh(np.asarray(cov))  # ascending
    l3, l2, l1 = eigvals[:, 0], eigvals[:, 1], eigvals[:, 2]
    eps = 1e-8
    return {
        "linearity": (l1 - l2) / (l1 + eps),
        "planarity": (l2 - l3) / (l1 + eps),
        "sphericity": l3 / (l1 + eps),
        "eigvals": (l1, l2, l3),
    }


def main():
    pc = make_clouds()
    points = pc.points_padded()
    lengths = pc.num_points_per_cloud()
    K = 16

    cov, knn = get_point_covariances(points, lengths, K)
    print(f"covariances: {cov.shape}  (neighborhoods of K={K})")

    names = ["sphere", "ellipsoid(z*0.1)", "line"]
    stats = {}
    for i, name in enumerate(names):
        n = int(lengths[i])
        d = shape_descriptors(cov[i, :n])
        l1, l2, l3 = d["eigvals"]
        print(f"\n{name} ({n} pts):")
        print(
            f"  mean eigenvalues λ1:λ2:λ3 = "
            f"{l1.mean():.5f}:{l2.mean():.5f}:{l3.mean():.5f}"
        )
        for k in ("linearity", "planarity", "sphericity"):
            print(f"  {k:10s}: {d[k].mean():.3f} ± {d[k].std():.3f}")
        stats[name] = d

    # The invariants the reference demo asserts by inspection; checked here
    # so the smoke test is a real property test (SURVEY §4 item 3):
    # a sphere's surface neighborhoods are planar patches with isotropic
    # in-plane spread; the squashed ellipsoid is MORE planar (flatter) on
    # its equator but here we compare the line, which must be maximally
    # linear, and the sphere, which must be the least linear of the three.
    assert stats["line"]["linearity"].mean() > 0.9
    assert stats["line"]["linearity"].mean() > stats["sphere"]["linearity"].mean()
    assert stats["sphere"]["planarity"].mean() > stats["line"]["planarity"].mean()
    # Sphere neighborhoods are near-2D patches (sphericity ~ 0); squashing
    # the ellipsoid curls its equator tightly, so its K-neighborhoods span
    # all three dimensions — measurably higher sphericity (anisotropy of
    # the generating shape shows up in the local eigenstructure).
    assert (
        stats["ellipsoid(z*0.1)"]["sphericity"].mean()
        > 5 * stats["sphere"]["sphericity"].mean()
    )
    print("\neigen-structure invariants hold ✓")


if __name__ == "__main__":
    main()
