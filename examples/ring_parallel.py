"""Ring-parallel point ops over a device mesh — the scale-out layer.

The reference library is single-process (SURVEY §2.3: no torch.distributed
anywhere); this framework adds a ring layer (parallel/ring.py) that shards
query points over a mesh axis and rotates reference-cloud shards around the
ring via ``jax.lax.ppermute`` over ICI — the point-cloud analog of ring
attention.  This example demonstrates:

1. building a (dp, sp) mesh (8 virtual CPU devices here; the same code
   runs unchanged on a TPU pod slice),
2. ring KNN with global indices bit-identical to the single-chip op,
3. a ring-chamfer training step — gradients flow through both ring
   passes and reduce across the mesh,
4. the feature-channel path (ring gather instead of an all-gather).

Run:  python examples/ring_parallel.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# 8 virtual devices so the mesh logic runs on any host (SURVEY §4 item 6).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pytorch3d_pointops_tpu import chamfer_distance, knn_points  # noqa: E402
from pytorch3d_pointops_tpu.parallel import (  # noqa: E402
    make_mesh,
    ring_chamfer_distance,
    ring_knn_points,
)


def main():
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")

    # ---- 1. a 2D mesh: data parallel x ring (sequence/point) parallel ----
    mesh = make_mesh((2, 4), ("dp", "sp"))
    print(f"mesh: {dict(mesh.shape)}")

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    N, P1, P2 = 2, 256, 384
    p1 = jax.random.normal(k1, (N, P1, 3), jnp.float32)
    p2 = jax.random.normal(k2, (N, P2, 3), jnp.float32)

    # Shard batch over dp, points over the sp ring.
    sh = NamedSharding(mesh, P("dp", "sp", None))
    p1s = jax.device_put(p1, sh)
    p2s = jax.device_put(p2, sh)

    # ---- 2. ring KNN == single-chip KNN, global indices and all ----
    ring = ring_knn_points(p1s, p2s, K=8, mesh=mesh, batch_axis="dp")
    single = knn_points(p1, p2, K=8)
    assert np.array_equal(np.asarray(ring.idx), np.asarray(single.idx))
    assert np.allclose(
        np.asarray(ring.dists), np.asarray(single.dists), atol=1e-5
    )
    print("ring KNN matches single-chip exactly (incl. tie order)")

    # ---- 3. ring-chamfer training: fit a noisy cloud to a target ----
    target = jax.device_put(p2, sh)
    src = jax.device_put(
        p2 + 0.5 * jax.random.normal(jax.random.PRNGKey(7), p2.shape), sh
    )

    # Mean reductions scale gradients by 1/(N*P) — plain SGD needs lr on
    # the order of the point count (same behavior as the reference).
    @jax.jit
    def step(pts):
        loss, g = jax.value_and_grad(
            lambda q: ring_chamfer_distance(
                q, target, mesh=mesh, point_axis="sp", batch_axis="dp"
            )
        )(pts)
        return pts - 30.0 * g, loss

    pts = src
    losses = []
    for _ in range(50):
        pts, loss = step(pts)
        losses.append(float(loss))
    print(f"ring-chamfer SGD: loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    assert losses[-1] < 0.3 * losses[0]

    # single-chip cross-check of the final loss
    loss_single, _ = chamfer_distance(np.asarray(pts), np.asarray(target))
    assert abs(float(loss_single) - losses[-1]) < 1e-3

    # ---- 4. feature channels ride the ring too (no all-gather) ----
    feats1 = {"normals": jax.device_put(
        jax.random.normal(jax.random.PRNGKey(3), (N, P1, 3)), sh)}
    feats2 = {"normals": jax.device_put(
        jax.random.normal(jax.random.PRNGKey(4), (N, P2, 3)), sh)}
    loss_f, lf = ring_chamfer_distance(
        p1s, p2s, x_features=feats1, y_features=feats2,
        feature_names=["normals"], mesh=mesh,
        point_axis="sp", batch_axis="dp",
    )
    ref_loss, ref_lf = chamfer_distance(
        p1, p2,
        x_features={"normals": np.asarray(feats1["normals"])},
        y_features={"normals": np.asarray(feats2["normals"])},
        feature_names=["normals"],
    )
    assert abs(float(loss_f) - float(ref_loss)) < 1e-4
    assert abs(float(lf["normals"]) - float(ref_lf["normals"])) < 1e-4
    print(f"feature chamfer over the ring: loss={float(loss_f):.4f}, "
          f"normals={float(lf['normals']):.4f} (== single-chip)")

    print("OK")


if __name__ == "__main__":
    main()
