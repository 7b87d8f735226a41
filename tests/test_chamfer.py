import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import Pointclouds, chamfer_distance

from oracles import chamfer_np


def _clouds(key, N=3, P1=20, P2=30):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (N, P1, 3))
    y = jax.random.normal(k2, (N, P2, 3))
    l1 = jax.random.randint(k3, (N,), 1, P1 + 1)
    l2 = jax.random.randint(k4, (N,), 1, P2 + 1)
    return x, y, l1, l2


@pytest.mark.parametrize("point_reduction", ["mean", "sum", "max"])
@pytest.mark.parametrize("batch_reduction", ["mean", "sum", None])
def test_chamfer_reductions_vs_oracle(point_reduction, batch_reduction):
    if point_reduction is None and batch_reduction is not None:
        return
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(0))
    loss, _ = chamfer_distance(
        x, y, l1, l2,
        point_reduction=point_reduction, batch_reduction=batch_reduction,
    )
    ref = chamfer_np(
        np.asarray(x), np.asarray(y), np.asarray(l1), np.asarray(l2),
        point_reduction, batch_reduction,
    )
    np.testing.assert_allclose(np.asarray(loss), ref, atol=1e-4, rtol=1e-4)


def test_chamfer_point_reduction_none():
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(1))
    (cx, cy), _ = chamfer_distance(
        x, y, l1, l2, point_reduction=None, batch_reduction=None
    )
    ref_cx, ref_cy = chamfer_np(
        np.asarray(x), np.asarray(y), np.asarray(l1), np.asarray(l2), None, None
    )
    np.testing.assert_allclose(np.asarray(cx), ref_cx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cy), ref_cy, atol=1e-4)


def test_chamfer_single_directional_and_norm1():
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(2))
    loss_uni, _ = chamfer_distance(
        x, y, l1, l2, single_directional=True, batch_reduction="sum", norm=1
    )
    from oracles import knn_np

    dx, _ = knn_np(np.asarray(x), np.asarray(y), np.asarray(l1), np.asarray(l2), 1, 1)
    cx = dx[..., 0].sum(1) / np.maximum(np.asarray(l1), 1)
    np.testing.assert_allclose(np.asarray(loss_uni), cx.sum(), atol=1e-4, rtol=1e-4)


def test_chamfer_weights():
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(3))
    w = jnp.asarray([0.5, 2.0, 0.0])
    loss, _ = chamfer_distance(x, y, l1, l2, weights=w, batch_reduction="mean")
    ref = chamfer_np(
        np.asarray(x), np.asarray(y), np.asarray(l1), np.asarray(l2),
        "mean", "mean", weights=np.asarray(w),
    )
    np.testing.assert_allclose(np.asarray(loss), ref, atol=1e-4, rtol=1e-4)


def test_chamfer_negative_weights_raise():
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(30))
    w = jnp.asarray([1.0, -0.5, 1.0])
    with pytest.raises(ValueError, match="weights cannot be negative."):
        chamfer_distance(x, y, l1, l2, weights=w)


def test_chamfer_zero_sum_weights_early_out():
    """weights summing to zero short-circuit to zero losses (reference
    chamfer.py:128-130) with zero gradients; batch 'mean' divides by 1."""
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(31))
    w = jnp.zeros((3,), jnp.float32)
    loss, loss_f = chamfer_distance(x, y, l1, l2, weights=w)
    assert float(loss) == 0.0
    assert loss_f is None
    # with features requested, the zero early-out still keys the dict
    f1 = {"n": x}
    f2 = {"n": y}
    loss, loss_f = chamfer_distance(
        x, y, l1, l2, x_features=f1, y_features=f2, weights=w,
        feature_names=["n"],
    )
    assert float(loss) == 0.0
    assert set(loss_f) == {"n"} and float(loss_f["n"]) == 0.0
    g = jax.grad(lambda a: chamfer_distance(a, y, l1, l2, weights=w)[0])(x)
    assert not np.asarray(g).any()


def test_chamfer_identical_clouds_zero():
    x, _, l1, _ = _clouds(jax.random.PRNGKey(4))
    loss, _ = chamfer_distance(x, x, l1, l1)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)


def test_chamfer_features_cosine():
    """Feature channels: identical clouds+features -> zero feature loss;
    orthogonal features -> loss 1 per point."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 10, 3))
    fx = {"normals": jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (2, 10, 1))}
    fy_same = {"normals": jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (2, 10, 1))}
    fy_orth = {"normals": jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (2, 10, 1))}
    _, lf = chamfer_distance(
        x, x, x_features=fx, y_features=fy_same, feature_names=["normals"]
    )
    np.testing.assert_allclose(np.asarray(lf["normals"]), 0.0, atol=1e-5)
    _, lf = chamfer_distance(
        x, x, x_features=fx, y_features=fy_orth, feature_names=["normals"]
    )
    np.testing.assert_allclose(np.asarray(lf["normals"]), 2.0, atol=1e-5)
    # abs_cosine: opposite features count as matching
    fy_neg = {"normals": jnp.tile(jnp.asarray([-1.0, 0.0, 0.0]), (2, 10, 1))}
    _, lf = chamfer_distance(
        x, x, x_features=fx, y_features=fy_neg, feature_names=["normals"]
    )
    np.testing.assert_allclose(np.asarray(lf["normals"]), 0.0, atol=1e-5)
    _, lf = chamfer_distance(
        x, x, x_features=fx, y_features=fy_neg,
        feature_names=["normals"], abs_cosine=False,
    )
    np.testing.assert_allclose(np.asarray(lf["normals"]), 4.0, atol=1e-5)


def test_chamfer_pointclouds_input():
    key = jax.random.PRNGKey(6)
    pts1 = [jax.random.normal(key, (12, 3)), jax.random.normal(key, (8, 3))]
    pts2 = [jax.random.normal(key, (9, 3)), jax.random.normal(key, (15, 3))]
    n1 = [jax.random.normal(key, (12, 3)), jax.random.normal(key, (8, 3))]
    n2 = [jax.random.normal(key, (9, 3)), jax.random.normal(key, (15, 3))]
    pc1 = Pointclouds(pts1, features={"normals": n1})
    pc2 = Pointclouds(pts2, features={"normals": n2})
    loss_pc, lf_pc = chamfer_distance(pc1, pc2, feature_names=["normals"])
    loss_t, lf_t = chamfer_distance(
        pc1.points_padded(), pc2.points_padded(),
        pc1.num_points_per_cloud(), pc2.num_points_per_cloud(),
        x_features=pc1.features_padded(), y_features=pc2.features_padded(),
        feature_names=["normals"],
    )
    np.testing.assert_allclose(np.asarray(loss_pc), np.asarray(loss_t), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lf_pc["normals"]), np.asarray(lf_t["normals"]), atol=1e-6
    )


def test_chamfer_grad_descent_converges():
    """End-to-end slice: fitting a cloud to a target with chamfer gradients
    reduces the loss (the reference's examples/chamfer_loss.py workflow)."""
    key = jax.random.PRNGKey(7)
    target = jax.random.normal(key, (1, 64, 3))
    src = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 3)) * 2.0

    @jax.jit
    def step(p):
        def loss_fn(p_):
            loss, _ = chamfer_distance(p_, target)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(p)
        return p - 0.5 * g, loss

    losses = []
    p = src
    for _ in range(50):
        p, l = step(p)
        losses.append(float(l))
    assert losses[-1] < 0.25 * losses[0]


def test_chamfer_grad_matches_finite_difference():
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(9), N=2, P1=8, P2=10)

    def f(x_):
        return chamfer_distance(x_, y, l1, l2)[0]

    g = jax.grad(f)(x)
    eps = 1e-3
    for (n, i, d) in [(0, 0, 0), (1, 3, 2), (0, 5, 1)]:
        e = jnp.zeros_like(x).at[n, i, d].set(eps)
        fd = (f(x + e) - f(x - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[n, i, d]), np.asarray(fd), atol=5e-3)


def test_chamfer_validation():
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(10))
    with pytest.raises(ValueError):
        chamfer_distance(x, y, batch_reduction="bogus")
    with pytest.raises(ValueError):
        chamfer_distance(x, y, point_reduction=None, batch_reduction="mean")
    with pytest.raises(ValueError):
        chamfer_distance(x, y, norm=3)
    with pytest.raises(ValueError):
        chamfer_distance(
            x, y, point_reduction="max",
            x_features={"a": x}, y_features={"a": y}, feature_names=["a"],
        )


def test_chamfer_zero_sum_weights_unreduced_shape():
    """The zero-sum early-out must keep the un-reduced (N, P1)/(N, P2)
    shapes when point_reduction=None (no shape discontinuity between
    weights=0 and weights=eps)."""
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(32))
    w = jnp.zeros((3,), jnp.float32)
    (zx, zy), _ = chamfer_distance(
        x, y, l1, l2, weights=w, point_reduction=None, batch_reduction=None
    )
    assert zx.shape == (3, x.shape[1]) and zy.shape == (3, y.shape[1])
    assert not np.asarray(zx).any() and not np.asarray(zy).any()


def test_fused_bidir_vjp_matches_composed_grads():
    """The fused bidirectional op's custom VJP (two knn_backward scatter
    passes summed) must reproduce jax.grad through the composed two-pass
    path for an arbitrary cotangent on both direction dists."""
    from pytorch3d_pointops_tpu.kernels.chamfer_pallas import (
        chamfer_nn_bidirectional_pallas,
    )
    from pytorch3d_pointops_tpu.ops.chamfer import _nn_bidir_bwd
    from pytorch3d_pointops_tpu.ops.knn import (
        _apply_pad_conventions,
        knn_points,
    )

    x, y, l1, l2 = _clouds(jax.random.PRNGKey(31), N=2, P1=24, P2=36)
    kw = jax.random.split(jax.random.PRNGKey(32), 2)
    w1 = jax.random.normal(kw[0], (2, 24))
    w2 = jax.random.normal(kw[1], (2, 36))

    def composed(x, y):
        nn1 = knn_points(x, y, l1, l2, K=1, impl="xla")
        nn2 = knn_points(y, x, l2, l1, K=1, impl="xla")
        return jnp.sum(w1 * nn1.dists[..., 0]) + jnp.sum(
            w2 * nn2.dists[..., 0]
        )

    gx_ref, gy_ref = jax.grad(composed, argnums=(0, 1))(x, y)

    d1, i1, d2, i2 = chamfer_nn_bidirectional_pallas(
        x, y, l1, l2, 2, tile_p1=16, tile_p2=128, interpret=True
    )
    d1p, i1p = _apply_pad_conventions(
        d1[..., None], i1[..., None], l1, l2, 1, 24
    )
    d2p, i2p = _apply_pad_conventions(
        d2[..., None], i2[..., None], l2, l1, 1, 36
    )
    res = (x, y, l1, l2, i1p[..., 0], i2p[..., 0])
    gx, gy, _, _ = _nn_bidir_bwd(2, res, (w1, None, w2, None))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), atol=1e-5)


def test_k1_backward_matches_knn_backward(monkeypatch):
    """The MXU one-hot K=1 backward must reproduce knn_backward's grads
    (both norms, ragged lengths, -1 pads)."""
    from pytorch3d_pointops_tpu.kernels import chamfer_pallas as cp
    from pytorch3d_pointops_tpu.ops import chamfer as cham_mod
    from pytorch3d_pointops_tpu.ops.knn import knn_backward

    orig = cp.scatter_add_k1_pallas
    monkeypatch.setattr(
        cp, "scatter_add_k1_pallas",
        lambda idx, c, P2: orig(idx, c, P2, tile_p1=64, tile_p2=128,
                                interpret=True),
    )
    x, y, l1, l2 = _clouds(jax.random.PRNGKey(77), N=2, P1=40, P2=30)
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, 30, size=(2, 40)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(2, 40)).astype(np.float32))
    for norm in (1, 2):
        gx, gy = cham_mod._k1_backward(x, y, l1, l2, idx, norm, g)
        rx, ry = knn_backward(x, y, l1, l2, idx[..., None], norm, g[..., None])
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(ry), atol=1e-5)
