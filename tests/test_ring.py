"""Multi-device ring KNN / chamfer tests on the 8-device virtual CPU mesh
(SURVEY §4 item 6: mesh/collective logic exercised without a TPU pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import chamfer_distance, knn_points
from pytorch3d_pointops_tpu.parallel import (
    make_mesh,
    ring_chamfer_distance,
    ring_knn_points,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((8,), ("sp",))


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh((2, 4), ("dp", "sp"))


def _clouds(key, N=2, P1=64, P2=96):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p1 = jax.random.normal(k1, (N, P1, 3))
    p2 = jax.random.normal(k2, (N, P2, 3))
    l1 = jax.random.randint(k3, (N,), 1, P1 + 1)
    l2 = jax.random.randint(k4, (N,), 1, P2 + 1)
    return p1, p2, l1, l2


@pytest.mark.parametrize("norm", [1, 2])
def test_ring_knn_matches_single_chip(mesh, norm):
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(norm))
    out_ring = ring_knn_points(p1, p2, l1, l2, K=8, norm=norm, mesh=mesh)
    out_ref = knn_points(p1, p2, l1, l2, K=8, norm=norm)
    np.testing.assert_allclose(
        np.asarray(out_ring.dists), np.asarray(out_ref.dists), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_ring.idx), np.asarray(out_ref.idx)
    )


def test_ring_knn_k_exceeds_shard(mesh):
    """K larger than each shard's point count: merge must pull across hops."""
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(5), P1=32, P2=32)
    out_ring = ring_knn_points(p1, p2, l1, l2, K=6, mesh=mesh)  # shard=4 < K
    out_ref = knn_points(p1, p2, l1, l2, K=6)
    np.testing.assert_allclose(
        np.asarray(out_ring.dists), np.asarray(out_ref.dists), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_ring.idx), np.asarray(out_ref.idx)
    )


def test_ring_knn_gradients_match(mesh):
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(2))

    def loss_ring(a, b):
        o = ring_knn_points(a, b, l1, l2, K=4, mesh=mesh)
        w = jnp.arange(o.dists.size, dtype=jnp.float32).reshape(o.dists.shape)
        return (o.dists * w).sum()

    def loss_ref(a, b):
        o = knn_points(a, b, l1, l2, K=4)
        w = jnp.arange(o.dists.size, dtype=jnp.float32).reshape(o.dists.shape)
        return (o.dists * w).sum()

    g_ring = jax.grad(loss_ring, (0, 1))(p1, p2)
    g_ref = jax.grad(loss_ref, (0, 1))(p1, p2)
    np.testing.assert_allclose(
        np.asarray(g_ring[0]), np.asarray(g_ref[0]), atol=1e-3, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_ring[1]), np.asarray(g_ref[1]), atol=1e-3, rtol=1e-4
    )


def test_ring_knn_under_jit_with_sharded_inputs(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(3))
    sh = NamedSharding(mesh, P(None, "sp", None))
    p1s = jax.device_put(p1, sh)
    p2s = jax.device_put(p2, sh)

    f = jax.jit(lambda a, b: ring_knn_points(a, b, l1, l2, K=4, mesh=mesh).dists)
    np.testing.assert_allclose(
        np.asarray(f(p1s, p2s)),
        np.asarray(knn_points(p1, p2, l1, l2, K=4).dists),
        atol=1e-5,
    )


def test_ring_chamfer_matches_single_chip(mesh):
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(4))
    loss_ring = ring_chamfer_distance(p1, p2, l1, l2, mesh=mesh)
    loss_ref, _ = chamfer_distance(p1, p2, l1, l2)
    np.testing.assert_allclose(
        np.asarray(loss_ring), np.asarray(loss_ref), atol=1e-4, rtol=1e-4
    )


def test_ring_chamfer_gradient_descent():
    """A sharded chamfer training step reduces the loss — the end-to-end
    multi-device slice.  Uses a small ring and few steps: on a low-core CI
    host, XLA CPU's in-process collectives rendezvous can starve (hard 40 s
    termination timeout) under many-device many-dispatch pressure."""
    mesh = make_mesh((2,), ("sp",), devices=jax.devices()[:2])
    target = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 3))
    src = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 3)) * 2.0

    @jax.jit
    def step(p):
        loss, g = jax.value_and_grad(
            lambda p_: ring_chamfer_distance(p_, target, mesh=mesh)
        )(p)
        return p - 1.0 * g, loss

    p = src
    first = None
    for it in range(20):
        p, l = step(p)
        if first is None:
            first = float(l)
    assert float(l) < 0.5 * first


def test_ring_chamfer_single_directional_gradients(mesh):
    """single_directional routes through the one-direction ring-KNN pass
    (round-5 review: the bidirectional kernel paid y->x work the caller
    discards); value AND gradients must still match the single-chip op."""
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(17))

    def ring_loss(a, b):
        return ring_chamfer_distance(
            a, b, l1, l2, single_directional=True, mesh=mesh
        )

    def chip_loss(a, b):
        return chamfer_distance(a, b, l1, l2, single_directional=True)[0]

    v_r, (g1_r, g2_r) = jax.value_and_grad(ring_loss, argnums=(0, 1))(p1, p2)
    v_s, (g1_s, g2_s) = jax.value_and_grad(chip_loss, argnums=(0, 1))(p1, p2)
    np.testing.assert_allclose(float(v_r), float(v_s), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1_r), np.asarray(g1_s), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g2_r), np.asarray(g2_s), atol=1e-5, rtol=1e-5
    )


def test_ring_2d_mesh_dp_plus_sp(mesh2d):
    """Batch sharded over dp while points ring over sp."""
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(6), N=4, P1=32, P2=64)
    out_ring = ring_knn_points(
        p1, p2, l1, l2, K=4, mesh=mesh2d, point_axis="sp", batch_axis="dp"
    )
    out_ref = knn_points(p1, p2, l1, l2, K=4)
    np.testing.assert_allclose(
        np.asarray(out_ring.dists), np.asarray(out_ref.dists), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_ring.idx), np.asarray(out_ref.idx)
    )


def test_ring_validation(mesh):
    p1 = jnp.zeros((2, 64, 3))
    with pytest.raises(ValueError):  # batch mismatch
        ring_knn_points(p1, jnp.zeros((3, 64, 3)), K=4, mesh=mesh)
    with pytest.raises(ValueError):  # dim mismatch
        ring_knn_points(p1, jnp.zeros((2, 64, 2)), K=4, mesh=mesh)
    with pytest.raises(ValueError):  # bad norm
        ring_knn_points(p1, p1, norm=3, K=4, mesh=mesh)


def test_ring_chamfer_with_features_matches_single_chip(mesh):
    """Feature cosine terms on the ring path (differentiable ring gather)
    match the single-chip chamfer, forward and backward."""
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(11))
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    f1 = {"normals": jax.random.normal(k1, (p1.shape[0], p1.shape[1], 3))}
    f2 = {"normals": jax.random.normal(k2, (p2.shape[0], p2.shape[1], 3))}

    def loss_ring(a, b, fa, fb):
        loss, lf = ring_chamfer_distance(
            a, b, l1, l2, x_features=fa, y_features=fb,
            feature_names=["normals"], mesh=mesh,
        )
        return loss + lf["normals"]

    def loss_ref(a, b, fa, fb):
        loss, lf = chamfer_distance(
            a, b, l1, l2, x_features=fa, y_features=fb,
            feature_names=["normals"],
        )
        return loss + lf["normals"]

    v_ring = loss_ring(p1, p2, f1, f2)
    v_ref = loss_ref(p1, p2, f1, f2)
    np.testing.assert_allclose(
        np.asarray(v_ring), np.asarray(v_ref), atol=1e-5, rtol=1e-5
    )

    g_ring = jax.grad(loss_ring, (0, 1, 2, 3))(p1, p2, f1, f2)
    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(p1, p2, f1, f2)
    for gr, gf in zip(g_ring[:2], g_ref[:2]):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gf), atol=1e-4, rtol=1e-4
        )
    for key in ("normals",):
        np.testing.assert_allclose(
            np.asarray(g_ring[2][key]), np.asarray(g_ref[2][key]),
            atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(g_ring[3][key]), np.asarray(g_ref[3][key]),
            atol=1e-4, rtol=1e-4,
        )


def test_ring_knn_auto_pads_non_divisible_shapes():
    """BASELINE config-5 shapes that don't divide the ring size must run
    unmodified and match the single-device op exactly (VERDICT r1 weak #7)."""
    from pytorch3d_pointops_tpu.ops.knn import knn_points

    mesh = make_mesh((8,), ("sp",))
    key = jax.random.PRNGKey(3)
    # 100 and 77 are not divisible by 8
    p1 = jax.random.normal(jax.random.fold_in(key, 0), (2, 100, 3))
    p2 = jax.random.normal(jax.random.fold_in(key, 1), (2, 77, 3))
    l1 = jnp.asarray([100, 60], jnp.int32)
    l2 = jnp.asarray([77, 50], jnp.int32)
    out_r = ring_knn_points(p1, p2, l1, l2, K=4, mesh=mesh)
    out_s = knn_points(p1, p2, l1, l2, K=4)
    np.testing.assert_array_equal(np.asarray(out_r.idx), np.asarray(out_s.idx))
    np.testing.assert_allclose(
        np.asarray(out_r.dists), np.asarray(out_s.dists), atol=1e-5
    )


def test_ring_chamfer_validates_reductions():
    mesh = make_mesh((8,), ("sp",))
    x = jnp.zeros((2, 16, 3))
    with pytest.raises(ValueError):
        ring_chamfer_distance(
            x, x, batch_reduction="bogus", point_reduction="mean", mesh=mesh
        )
    with pytest.raises(ValueError):
        ring_chamfer_distance(
            x, x, batch_reduction="mean", point_reduction="bogus", mesh=mesh
        )


def test_ring_knn_cross_shard_exact_ties(mesh):
    """Duplicate points straddling shard boundaries: the lex (dist, index)
    merge must keep the LOWEST global index on exact cross-shard ties,
    bit-identical to single-chip.  Regression for the value-only top_k
    merge, which kept the earlier-VISITED shard (e.g. for a device at ring
    position my, duplicates in shards a < b <= my were visited b-first)."""
    key = jax.random.PRNGKey(77)
    P1, P2 = 64, 96  # 8 shards of 12 p2 points / 8 p1 rows per device
    base = jax.random.normal(key, (1, P2, 3))
    # duplicates across shard pairs covering a<b<=my and a<=my<b layouts:
    # global idx 5 (shard 0) == 29 (shard 2) == 50 (shard 4); 17 == 89
    p2 = base.at[:, 29].set(base[:, 5]).at[:, 50].set(base[:, 5])
    p2 = p2.at[:, 89].set(p2[:, 17])
    # queries AT the duplicated points so the tie is exact, spread over all
    # devices (rows 0..63 shard 8 ways)
    p1 = jnp.tile(p2[:, jnp.asarray([5, 29, 50, 17, 89, 5, 17, 50])], (1, 8, 1))
    l1 = jnp.full((1,), P1, jnp.int32)
    l2 = jnp.full((1,), P2, jnp.int32)
    out_ring = ring_knn_points(p1, p2, l1, l2, K=8, mesh=mesh)
    out_ref = knn_points(p1, p2, l1, l2, K=8)
    np.testing.assert_array_equal(
        np.asarray(out_ring.idx), np.asarray(out_ref.idx)
    )
    np.testing.assert_allclose(
        np.asarray(out_ring.dists), np.asarray(out_ref.dists), atol=1e-6
    )


def test_ring_knn_quantized_tie_fuzz(mesh):
    """Clouds drawn from a tiny discrete grid so exact distance ties abound
    everywhere (within and across shards); index parity must stay exact."""
    key = jax.random.PRNGKey(88)
    k1, k2 = jax.random.split(key)
    p1 = jax.random.randint(k1, (2, 32, 3), 0, 3).astype(jnp.float32)
    p2 = jax.random.randint(k2, (2, 64, 3), 0, 3).astype(jnp.float32)
    l1 = jnp.asarray([32, 20], jnp.int32)
    l2 = jnp.asarray([64, 41], jnp.int32)
    out_ring = ring_knn_points(p1, p2, l1, l2, K=10, mesh=mesh)
    out_ref = knn_points(p1, p2, l1, l2, K=10)
    np.testing.assert_array_equal(
        np.asarray(out_ring.idx), np.asarray(out_ref.idx)
    )
    np.testing.assert_allclose(
        np.asarray(out_ring.dists), np.asarray(out_ref.dists), atol=1e-6
    )


def test_ring_chamfer_max_and_weights_match_single_chip(mesh):
    """Hausdorff (max) reduction and per-batch weights through the ring
    must match the single-chip op; negative weights raise like ops-level."""
    p1, p2, l1, l2 = _clouds(jax.random.PRNGKey(91))
    w = jnp.asarray([0.5, 2.0], jnp.float32)
    for kwargs in (
        dict(point_reduction="max", batch_reduction="mean"),
        dict(weights=w),
        dict(weights=w, single_directional=True, batch_reduction="sum"),
    ):
        loss_r = ring_chamfer_distance(p1, p2, l1, l2, mesh=mesh, **kwargs)
        loss_s, _ = chamfer_distance(p1, p2, l1, l2, **kwargs)
        np.testing.assert_allclose(
            np.asarray(loss_r), np.asarray(loss_s), atol=1e-5, rtol=1e-5,
            err_msg=str(kwargs),
        )
    with pytest.raises(ValueError, match="weights cannot be negative."):
        ring_chamfer_distance(
            p1, p2, l1, l2, weights=jnp.asarray([-1.0, 1.0]), mesh=mesh
        )
