"""DIRECT parity against the actual reference implementation.

The BASELINE north star demands outputs "allclose to the reference
CUDA/PyTorch3D implementations".  This module builds the reference's own
CPU extension (torch.utils.cpp_extension over /root/reference/.../csrc —
nothing is copied; the binaries are compiled from the read-only source),
injects it as ``pytorch3d_pointops._C``, and compares this framework's ops
against the reference's actual Python layer on the same inputs — the gold
standard above our independent oracles.

Skips cleanly when the toolchain or a cached build is unavailable (the
first build takes a few minutes and is cached in /tmp across runs).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_REF_ROOT = "/root/reference"
_CSRC = os.path.join(_REF_ROOT, "pytorch3d_pointops", "csrc")
_BUILD_DIR = "/tmp/ref_pointops_build"


def _load_reference():
    import torch  # noqa: F401
    from torch.utils import cpp_extension

    os.makedirs(_BUILD_DIR, exist_ok=True)
    mod = cpp_extension.load(
        name="ref_pointops_C",
        sources=[
            f"{_CSRC}/ext.cpp",
            f"{_CSRC}/knn/knn_cpu.cpp",
            f"{_CSRC}/ball_query/ball_query_cpu.cpp",
            f"{_CSRC}/sample_farthest_points/sample_farthest_points_cpu.cpp",
            f"{_CSRC}/packed_to_padded_tensor/packed_to_padded_tensor_cpu.cpp",
            f"{_CSRC}/sample_pdf/sample_pdf_cpu.cpp",
        ],
        extra_include_paths=[_CSRC],
        build_directory=_BUILD_DIR,
        verbose=False,
    )
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    import pytorch3d_pointops

    pytorch3d_pointops._C = mod
    sys.modules["pytorch3d_pointops._C"] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """The reference's Python op layer, running on its own compiled CPU
    kernels.  Returns a namespace of the reference functions."""
    try:
        _load_reference()
    except Exception as e:  # noqa: BLE001 — toolchain/build issues -> skip
        pytest.skip(f"reference CPU extension unavailable: {e}")
    # importlib returns the MODULES from sys.modules — the package's
    # functions/__init__ re-exports same-named FUNCTIONS that shadow the
    # submodules under both `from ... import` and `import ... as` syntax.
    import importlib

    ref_bq = importlib.import_module("pytorch3d_pointops.functions.ball_query")
    ref_chamfer = importlib.import_module("pytorch3d_pointops.functions.chamfer")
    ref_knn = importlib.import_module("pytorch3d_pointops.functions.knn")
    ref_pp = importlib.import_module(
        "pytorch3d_pointops.functions.packed_to_padded"
    )
    ref_fps = importlib.import_module(
        "pytorch3d_pointops.functions.sample_farthest_points"
    )
    ref_pdf = importlib.import_module("pytorch3d_pointops.functions.sample_pdf")

    class NS:
        knn = ref_knn
        bq = ref_bq
        fps = ref_fps
        pp = ref_pp
        pdf = ref_pdf
        chamfer = ref_chamfer

    return NS


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x).copy())


def _clouds(seed=0, N=2, P1=40, P2=70, D=3):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    p1 = jax.random.normal(k1, (N, P1, D), jnp.float32)
    p2 = jax.random.normal(k2, (N, P2, D), jnp.float32)
    l1 = jnp.asarray([P1, P1 - 7][:N], jnp.int32)
    l2 = jnp.asarray([P2, P2 - 13][:N], jnp.int32)
    return p1, p2, l1, l2


@pytest.mark.parametrize("norm", [1, 2])
@pytest.mark.parametrize("K", [1, 5])
def test_knn_parity(ref, norm, K):
    from pytorch3d_pointops_tpu import knn_points

    p1, p2, l1, l2 = _clouds(seed=norm * 10 + K)
    ours = knn_points(p1, p2, l1, l2, norm=norm, K=K)
    theirs = ref.knn.knn_points(
        _t(p1), _t(p2), lengths1=_t(l1).long(), lengths2=_t(l2).long(),
        norm=norm, K=K,
    )
    np.testing.assert_array_equal(
        np.asarray(ours.idx), theirs.idx.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours.dists), theirs.dists.numpy(), atol=1e-5, rtol=1e-5
    )


def test_knn_parity_k_exceeds_lengths(ref):
    from pytorch3d_pointops_tpu import knn_points

    p1, p2, l1, _ = _clouds(seed=3, P2=10)
    l2 = jnp.asarray([4, 10], jnp.int32)
    ours = knn_points(p1, p2, l1, l2, K=7)
    theirs = ref.knn.knn_points(
        _t(p1), _t(p2), lengths1=_t(l1).long(), lengths2=_t(l2).long(), K=7
    )
    np.testing.assert_array_equal(np.asarray(ours.idx), theirs.idx.numpy())
    np.testing.assert_allclose(
        np.asarray(ours.dists), theirs.dists.numpy(), atol=1e-5
    )


def test_ball_query_parity(ref):
    from pytorch3d_pointops_tpu import ball_query

    p1, p2, l1, l2 = _clouds(seed=5)
    ours = ball_query(p1, p2, l1, l2, K=8, radius=0.9, return_nn=False)
    theirs = ref.bq.ball_query(
        _t(p1), _t(p2), lengths1=_t(l1).long(), lengths2=_t(l2).long(),
        K=8, radius=0.9, return_nn=False,
    )
    np.testing.assert_array_equal(np.asarray(ours.idx), theirs.idx.numpy())
    np.testing.assert_allclose(
        np.asarray(ours.dists), theirs.dists.numpy(), atol=1e-5
    )


def test_fps_parity(ref):
    from pytorch3d_pointops_tpu import sample_farthest_points

    p1, _, l1, _ = _clouds(seed=7, P1=60)
    _, ours_idx = sample_farthest_points(p1, l1, K=12)
    _, theirs_idx = ref.fps.sample_farthest_points(
        _t(p1), lengths=_t(l1).long(), K=12
    )
    np.testing.assert_array_equal(
        np.asarray(ours_idx), theirs_idx.numpy()
    )


def test_packed_padded_parity(ref):
    from pytorch3d_pointops_tpu import packed_to_padded, padded_to_packed

    rng = np.random.default_rng(0)
    sizes = [5, 9, 3]
    packed = rng.standard_normal((sum(sizes), 4)).astype(np.float32)
    first = np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int64)
    ours_pad = packed_to_padded(
        jnp.asarray(packed), jnp.asarray(first), max(sizes)
    )
    theirs_pad = ref.pp.packed_to_padded(
        _t(packed), _t(first), max(sizes)
    )
    np.testing.assert_allclose(
        np.asarray(ours_pad), theirs_pad.numpy(), atol=1e-6
    )
    ours_packed = padded_to_packed(
        ours_pad, jnp.asarray(first), sum(sizes)
    )
    theirs_packed = ref.pp.padded_to_packed(
        theirs_pad, _t(first), sum(sizes)
    )
    np.testing.assert_allclose(
        np.asarray(ours_packed), theirs_packed.numpy(), atol=1e-6
    )


def test_sample_pdf_parity_deterministic(ref):
    from pytorch3d_pointops_tpu import sample_pdf

    rng = np.random.default_rng(1)
    bins = np.sort(rng.standard_normal((3, 9)).astype(np.float32), axis=-1)
    weights = rng.random((3, 8)).astype(np.float32)
    ours = sample_pdf(
        jnp.asarray(bins), jnp.asarray(weights), 16, det=True
    )
    theirs = ref.pdf.sample_pdf(_t(bins), _t(weights), 16, det=True)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "point_reduction,batch_reduction",
    [("mean", "mean"), ("sum", "sum"), ("mean", None), ("max", "mean")],
)
def test_chamfer_parity_forward(ref, point_reduction, batch_reduction):
    from pytorch3d_pointops_tpu import chamfer_distance

    p1, p2, l1, l2 = _clouds(seed=9)
    ours, _ = chamfer_distance(
        p1, p2, l1, l2,
        point_reduction=point_reduction, batch_reduction=batch_reduction,
    )
    theirs, _ = ref.chamfer.chamfer_distance(
        _t(p1), _t(p2), x_lengths=_t(l1).long(), y_lengths=_t(l2).long(),
        point_reduction=point_reduction, batch_reduction=batch_reduction,
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5
    )


def test_chamfer_parity_features_and_weights(ref):
    from pytorch3d_pointops_tpu import chamfer_distance

    p1, p2, l1, l2 = _clouds(seed=11)
    key = jax.random.PRNGKey(12)
    ka, kb = jax.random.split(key)
    f1 = {"normals": jax.random.normal(ka, p1.shape, jnp.float32)}
    f2 = {"normals": jax.random.normal(kb, p2.shape, jnp.float32)}
    w = jnp.asarray([0.5, 2.0], jnp.float32)
    ours, ours_f = chamfer_distance(
        p1, p2, l1, l2, x_features=f1, y_features=f2, weights=w,
        feature_names=["normals"],
    )
    import torch

    theirs, theirs_f = ref.chamfer.chamfer_distance(
        _t(p1), _t(p2), x_lengths=_t(l1).long(), y_lengths=_t(l2).long(),
        x_features={"normals": _t(f1["normals"])},
        y_features={"normals": _t(f2["normals"])},
        weights=_t(w), feature_names=["normals"],
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_f["normals"]), theirs_f["normals"].numpy(),
        atol=1e-5, rtol=1e-5,
    )


def test_chamfer_parity_negative_weights_raise(ref):
    """Reference chamfer.py:126-127 raises on any negative weight; the error
    message is part of the user-visible contract."""
    import torch

    from pytorch3d_pointops_tpu import chamfer_distance

    p1, p2, l1, l2 = _clouds(seed=15)
    w = jnp.asarray([-1.0, 1.0], jnp.float32)
    with pytest.raises(ValueError, match="weights cannot be negative."):
        chamfer_distance(p1, p2, l1, l2, weights=w)
    with pytest.raises(ValueError, match="weights cannot be negative."):
        ref.chamfer.chamfer_distance(
            _t(p1), _t(p2), x_lengths=_t(l1).long(), y_lengths=_t(l2).long(),
            weights=_t(w),
        )


def test_chamfer_parity_zero_sum_weights(ref):
    """Reference chamfer.py:128-130 early-returns zero losses when
    weights.sum() == 0.  The reference's early-out returns zero tensors
    with a degenerate (N, N) broadcast shape and a raw tensor in the
    features slot — the bidirectional / batch-reduced paths then CRASH on
    it (dict ops over a tensor), so the only executable reference config is
    single_directional + batch_reduction=None.  We return normal
    point-reduced shapes instead; parity bar: both sides all-zero losses
    and exactly-zero gradients."""
    import torch

    from pytorch3d_pointops_tpu import chamfer_distance

    p1, p2, l1, l2 = _clouds(seed=16)
    w = jnp.zeros((2,), jnp.float32)
    ours, ours_f = chamfer_distance(
        p1, p2, l1, l2, weights=w,
        single_directional=True, batch_reduction=None,
    )
    theirs, _ = ref.chamfer.chamfer_distance(
        _t(p1), _t(p2), x_lengths=_t(l1).long(), y_lengths=_t(l2).long(),
        weights=_t(w), single_directional=True, batch_reduction=None,
    )
    assert not np.asarray(ours).any() and ours.shape == (2,)
    assert not theirs.numpy().any()
    assert ours_f is None
    # bidirectional mean works on OUR side (the sane contract) and is zero
    ours_bi, _ = chamfer_distance(p1, p2, l1, l2, weights=w)
    assert float(ours_bi) == 0.0

    g = jax.grad(
        lambda a: chamfer_distance(a, p2, l1, l2, weights=w)[0]
    )(p1)
    assert not np.asarray(g).any()
    tp1 = _t(p1).requires_grad_(True)
    loss, _ = ref.chamfer.chamfer_distance(
        tp1, _t(p2), x_lengths=_t(l1).long(), y_lengths=_t(l2).long(),
        weights=_t(w), single_directional=True, batch_reduction=None,
    )
    loss.sum().backward()
    assert not tp1.grad.numpy().any()


def test_chamfer_parity_weighted_point_reduction_none(ref):
    """Un-reduced weighted terms: point_reduction=None returns the raw
    per-point (N, P1)/(N, P2) losses scaled by the per-batch weights."""
    from pytorch3d_pointops_tpu import chamfer_distance

    p1, p2, l1, l2 = _clouds(seed=17)
    w = jnp.asarray([0.25, 3.0], jnp.float32)
    (ours_x, ours_y), _ = chamfer_distance(
        p1, p2, l1, l2, weights=w,
        point_reduction=None, batch_reduction=None,
    )
    (theirs_x, theirs_y), _ = ref.chamfer.chamfer_distance(
        _t(p1), _t(p2), x_lengths=_t(l1).long(), y_lengths=_t(l2).long(),
        weights=_t(w), point_reduction=None, batch_reduction=None,
    )
    np.testing.assert_allclose(
        np.asarray(ours_x), theirs_x.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_y), theirs_y.numpy(), atol=1e-5, rtol=1e-5
    )


def test_chamfer_parity_gradients(ref):
    """The BASELINE bar: chamfer GRADIENTS allclose to the reference."""
    import torch

    from pytorch3d_pointops_tpu import chamfer_distance

    p1, p2, l1, l2 = _clouds(seed=13)

    g_ours = jax.grad(
        lambda a, b: chamfer_distance(a, b, l1, l2)[0], argnums=(0, 1)
    )(p1, p2)

    tp1 = _t(p1).requires_grad_(True)
    tp2 = _t(p2).requires_grad_(True)
    loss, _ = ref.chamfer.chamfer_distance(
        tp1, tp2, x_lengths=_t(l1).long(), y_lengths=_t(l2).long()
    )
    loss.backward()
    np.testing.assert_allclose(
        np.asarray(g_ours[0]), tp1.grad.numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_ours[1]), tp2.grad.numpy(), atol=1e-4, rtol=1e-4
    )


@pytest.fixture(scope="module")
def ref_pc(ref):
    """The reference Pointclouds container (pure torch, same injected _C)."""
    import importlib

    return importlib.import_module(
        "pytorch3d_pointops.structures.point_structure"
    )


def test_pointclouds_container_parity(ref_pc):
    """Construction, lazy rep conversion, indexing, and update_padded
    feature semantics match the reference container."""
    import torch

    from pytorch3d_pointops_tpu import Pointclouds

    rng = np.random.default_rng(4)
    pts = [rng.standard_normal((s, 3)).astype(np.float32) for s in (7, 3, 5)]
    feats = [rng.random((s, 2)).astype(np.float32) for s in (7, 3, 5)]

    ours = Pointclouds(
        [jnp.asarray(p) for p in pts],
        features={"intensity": [jnp.asarray(f) for f in feats]},
    )
    theirs = ref_pc.Pointclouds(
        points=[torch.from_numpy(p) for p in pts],
        features={"intensity": [torch.from_numpy(f) for f in feats]},
    )

    np.testing.assert_allclose(
        np.asarray(ours.points_padded()), theirs.points_padded().numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.points_packed()), theirs.points_packed().numpy(),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(ours.num_points_per_cloud()),
        theirs.num_points_per_cloud().numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(ours.cloud_to_packed_first_idx()),
        theirs.cloud_to_packed_first_idx().numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(ours.packed_to_cloud_idx()),
        theirs.packed_to_cloud_idx().numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(ours.get_features_padded("intensity")),
        theirs.get_features_padded("intensity").numpy(),
        atol=1e-6,
    )

    # indexing produces the same sub-batch
    np.testing.assert_allclose(
        np.asarray(ours[[0, 2]].points_padded()),
        theirs[[0, 2]].points_padded().numpy(),
        atol=1e-6,
    )

    # update_padded: same-shaped new points keep aux tensors; features not
    # re-supplied are DROPPED (reference point_structure.py:1070-1098)
    new_pad = np.asarray(ours.points_padded()) * 2.0
    ours_u = ours.update_padded(jnp.asarray(new_pad))
    theirs_u = theirs.update_padded(torch.from_numpy(new_pad))
    np.testing.assert_allclose(
        np.asarray(ours_u.points_padded()), theirs_u.points_padded().numpy(),
        atol=1e-6,
    )
    assert (ours_u.get_features_padded("intensity") is None) == (
        theirs_u.get_features_padded("intensity") is None
    )


def test_bounding_boxes_parity(ref_pc):
    import torch

    from pytorch3d_pointops_tpu import Pointclouds, get_bounding_boxes

    rng = np.random.default_rng(6)
    pts = [rng.standard_normal((s, 3)).astype(np.float32) for s in (9, 4)]
    ours = get_bounding_boxes(Pointclouds([jnp.asarray(p) for p in pts]))
    theirs = ref_pc.get_bounding_boxes(
        ref_pc.Pointclouds(points=[torch.from_numpy(p) for p in pts])
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_knn_return_sorted_false_same_neighbor_set(ref):
    """return_sorted=False guarantees the NEIGHBOR SET, not an order (the
    reference's kernel order is backend-dependent: its CPU heap emits
    ascending distance, its CUDA V0-V3 vary; ours is ascending index).
    Compare as sets against the reference's sorted output."""
    from pytorch3d_pointops_tpu import knn_points

    p1, p2, l1, l2 = _clouds(seed=19)
    ours = knn_points(p1, p2, l1, l2, K=5, return_sorted=False)
    theirs = ref.knn.knn_points(
        _t(p1), _t(p2), lengths1=_t(l1).long(), lengths2=_t(l2).long(),
        K=5, return_sorted=True,
    )
    oi, ti = np.asarray(ours.idx), theirs.idx.numpy()
    od, td = np.asarray(ours.dists), theirs.dists.numpy()
    for n in range(oi.shape[0]):
        for i in range(oi.shape[1]):
            kv = min(5, int(l2[n]))
            assert set(oi[n, i, :kv]) == set(ti[n, i, :kv]), (n, i)
            np.testing.assert_allclose(
                np.sort(od[n, i, :kv]), np.sort(td[n, i, :kv]), atol=1e-5
            )


def test_knn_check_version_table():
    """The introspection shim must reproduce the reference's CUDA version
    validity table (knn.cu:292-303): V0 always, V1 D<=32, V2 D<=8 & K<=32,
    V3 D<=8 & K<=4."""
    from pytorch3d_pointops_tpu import knn_check_version

    assert knn_check_version(0, 100, 100)
    assert knn_check_version(1, 32, 99) and not knn_check_version(1, 33, 1)
    assert knn_check_version(2, 8, 32)
    assert not knn_check_version(2, 9, 32)
    assert not knn_check_version(2, 8, 33)
    assert knn_check_version(3, 8, 4)
    assert not knn_check_version(3, 8, 5)
    assert not knn_check_version(-1, 3, 3) and not knn_check_version(4, 3, 3)


def test_point_covariances_parity(ref):
    """get_point_covariances composes knn + wmean + outer products; compare
    the full composition against the reference's (functions/utils.py:111)."""
    import importlib

    ref_utils = importlib.import_module("pytorch3d_pointops.functions.utils")
    from pytorch3d_pointops_tpu import get_point_covariances

    p1, _, l1, _ = _clouds(seed=21, P1=50)
    ours_cov, ours_knn = get_point_covariances(p1, l1, 8)
    theirs_cov, theirs_knn = ref_utils.get_point_covariances(
        _t(p1), _t(l1).long(), 8
    )
    np.testing.assert_allclose(
        np.asarray(ours_cov), theirs_cov.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours_knn), theirs_knn.numpy(), atol=1e-5, rtol=1e-5
    )
