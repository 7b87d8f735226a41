import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import (
    Pointclouds,
    all_close,
    get_bounding_boxes,
    join_pointclouds_as_batch,
    join_pointclouds_as_scene,
    offset,
    scale,
    subsample,
)


def _ragged_clouds(key=0, sizes=(3, 4, 5), C=2):
    rng = np.random.default_rng(key)
    pts = [jnp.asarray(rng.normal(size=(s, 3)).astype(np.float32)) for s in sizes]
    feats = {
        "colors": [
            jnp.asarray(rng.normal(size=(s, C)).astype(np.float32)) for s in sizes
        ]
    }
    return pts, feats


def test_construction_and_views():
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    assert len(pc) == 3
    np.testing.assert_array_equal(np.asarray(pc.num_points_per_cloud()), [3, 4, 5])
    assert pc.points_padded().shape == (3, 5, 3)
    assert pc.points_packed().shape == (12, 3)
    np.testing.assert_array_equal(
        np.asarray(pc.packed_to_cloud_idx()), [0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 2]
    )
    np.testing.assert_array_equal(
        np.asarray(pc.cloud_to_packed_first_idx()), [0, 3, 7]
    )
    np.testing.assert_array_equal(
        np.asarray(pc.padded_to_packed_idx()),
        [0, 1, 2, 5, 6, 7, 8, 10, 11, 12, 13, 14],
    )
    # list roundtrip
    for orig, got in zip(pts, pc.points_list()):
        np.testing.assert_array_equal(np.asarray(orig), np.asarray(got))
    for orig, got in zip(feats["colors"], pc.get_features_list("colors")):
        np.testing.assert_array_equal(np.asarray(orig), np.asarray(got))
    # padded zero-pads
    padded = np.asarray(pc.points_padded())
    assert (padded[0, 3:] == 0).all()
    # packed features
    np.testing.assert_array_equal(
        np.asarray(pc.get_features_packed("colors")),
        np.concatenate([np.asarray(f) for f in feats["colors"]]),
    )
    assert pc.get_features_padded("missing") is None
    assert pc.get_features_list("missing") is None


def test_padded_construction_with_lengths():
    pts = jnp.ones((2, 6, 3))
    pc = Pointclouds(pts, lengths=jnp.asarray([4, 6]))
    assert pc.points_padded().shape == (2, 6, 3)
    assert pc.points_packed().shape == (10, 3)
    assert not pc.isempty()
    np.testing.assert_array_equal(np.asarray(pc.valid), [True, True])


def test_getitem_and_indexing():
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    sub = pc[1]
    assert len(sub) == 1
    np.testing.assert_array_equal(
        np.asarray(sub.points_list()[0]), np.asarray(pts[1])
    )
    sub2 = pc[[0, 2]]
    assert len(sub2) == 2
    sub3 = pc[np.asarray([True, False, True])]
    assert len(sub3) == 2
    np.testing.assert_array_equal(
        np.asarray(sub3.points_padded()), np.asarray(sub2.points_padded())
    )
    sub4 = pc[0:2]
    assert len(sub4) == 2
    with pytest.raises(IndexError):
        pc[np.asarray([0.5, 1.0])]


def test_pytree_roundtrip_and_jit():
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    leaves, treedef = jax.tree_util.tree_flatten(pc)
    pc2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert all_close(pc, pc2)

    @jax.jit
    def center_of_mass(pc_in: Pointclouds):
        mask = (
            jnp.arange(pc_in.points_padded().shape[1])[None]
            < pc_in.num_points_per_cloud()[:, None]
        )
        pts_sum = (pc_in.points_padded() * mask[..., None]).sum(1)
        return pts_sum / pc_in.num_points_per_cloud()[:, None]

    com = center_of_mass(pc)
    ref = np.stack([np.asarray(p).mean(0) for p in pts])
    np.testing.assert_allclose(np.asarray(com), ref, atol=1e-6)


def test_clone_detach_extend_split_getcloud():
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    cl = pc.clone()
    assert all_close(pc, cl)
    dt = pc.detach()
    assert all_close(pc, dt)
    ext = pc.extend(2)
    assert len(ext) == 6
    np.testing.assert_array_equal(
        np.asarray(ext.num_points_per_cloud()), [3, 3, 4, 4, 5, 5]
    )
    parts = pc.split([1, 2])
    assert [len(p) for p in parts] == [1, 2]
    p, f = pc.get_cloud(2)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(pts[2]))
    np.testing.assert_array_equal(np.asarray(f["colors"]), np.asarray(feats["colors"][2]))


def test_to_copy_flag():
    """Reference point_structure.py:828-875: copy=False + same device
    returns self; copy=True always builds a new (equal) object."""
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    dev = jax.devices()[0]
    on_dev = pc.to(dev)  # commit to a concrete device first
    assert all_close(pc, on_dev)
    assert on_dev.to(dev) is on_dev
    copied = on_dev.to(dev, copy=True)
    assert copied is not on_dev
    assert all_close(on_dev, copied)
    assert copied.equisized == on_dev.equisized


def test_cpu_cuda_accelerator_shortcuts():
    """Reference point_structure.py:877-880: cpu()/cuda() device shortcuts.
    cuda() is a drop-in alias for accelerator() (default device here)."""
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    on_cpu = pc.cpu()
    assert all_close(pc, on_cpu)
    via_cuda = pc.cuda()
    via_acc = pc.accelerator()
    assert all_close(via_cuda, via_acc)
    dev = jax.devices()[0]
    assert via_cuda.points_padded().devices() == {dev}


def test_make_device_and_string_to():
    """Reference point_structure.py:20-38: device may be given as a string
    (platform[:index]) or a device object; to() accepts both forms."""
    from pytorch3d_pointops_tpu import make_device

    dev0 = jax.devices("cpu")[0]
    assert make_device("cpu") == dev0
    assert make_device("cpu:0") == dev0
    assert make_device(dev0) == dev0  # device objects pass through
    # bare platform name == index 0, matching the reference's
    # current-device assignment for an index-less "cuda"
    assert make_device("cpu") == make_device("cpu:0")
    with pytest.raises(ValueError, match="out of range"):
        make_device(f"cpu:{len(jax.devices('cpu'))}")
    with pytest.raises(RuntimeError):
        make_device("no_such_platform")

    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    on_dev = pc.to("cpu")
    assert all_close(pc, on_dev)
    assert on_dev.to("cpu:0") is on_dev  # string form hits the same-device fast path


def test_get_cloud_bounds():
    """Reference contract (point_structure.py:938-943): index must be an
    int in [0, N); both out-of-range ends raise ValueError, not IndexError."""
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    N = len(pc)
    for bad in (-1, N, N + 3):
        with pytest.raises(ValueError, match="range"):
            pc.get_cloud(bad)
    with pytest.raises(ValueError):
        pc.get_cloud(1.5)
    pc.get_cloud(N - 1)  # last valid index is in-contract


def test_offset_scale():
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    off = offset(pc, jnp.asarray([1.0, 2.0, 3.0]))
    ref = [np.asarray(p) + np.asarray([1, 2, 3]) for p in pts]
    for r, got in zip(ref, off.points_list()):
        np.testing.assert_allclose(np.asarray(got), r, atol=1e-6)
    # original untouched
    for orig, got in zip(pts, pc.points_list()):
        np.testing.assert_array_equal(np.asarray(orig), np.asarray(got))
    sc = scale(pc, 2.0)
    for orig, got in zip(pts, sc.points_list()):
        np.testing.assert_allclose(np.asarray(got), 2 * np.asarray(orig), atol=1e-6)
    sc2 = scale(pc, jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(
        np.asarray(sc2.points_list()[2]), 3 * np.asarray(pts[2]), atol=1e-5
    )
    # packed offsets
    off2 = offset(pc, jnp.ones((12, 3)))
    for orig, got in zip(pts, off2.points_list()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(orig) + 1, atol=1e-6)


def test_update_padded_preserves_and_drops_features():
    pts, feats = _ragged_clouds()
    pc = Pointclouds(pts, features=feats)
    new_padded = pc.points_padded() + 1.0
    up = pc.update_padded(new_padded)
    # features preserved when not re-supplied (reference :1070-1074)
    assert "colors" in up.features_padded()
    np.testing.assert_array_equal(
        np.asarray(up.get_features_packed("colors")),
        np.asarray(pc.get_features_packed("colors")),
    )
    # lengths preserved -> padding rows of new_padded are ignored in packed
    assert up.points_packed().shape == (12, 3)
    # new features replace the dict entirely
    up2 = pc.update_padded(
        new_padded, {"intensity": jnp.ones((3, 5, 1))}
    )
    assert set(up2.features_padded().keys()) == {"intensity"}


def test_inside_box():
    pts, _ = _ragged_clouds()
    pc = Pointclouds(pts)
    box = jnp.asarray([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]])
    inside = np.asarray(pc.inside_box(box))
    packed = np.asarray(pc.points_packed())
    ref = ((packed >= -0.5) & (packed <= 0.5)).all(-1)
    np.testing.assert_array_equal(inside, ref)
    with pytest.raises(ValueError):
        pc.inside_box(jnp.asarray([[1.0, 1, 1], [0, 0, 0]]))


def test_bounding_boxes():
    pts, _ = _ragged_clouds()
    pc = Pointclouds(pts)
    bb = np.asarray(get_bounding_boxes(pc))
    assert bb.shape == (3, 3, 2)
    for n, p in enumerate(pts):
        np.testing.assert_allclose(bb[n, :, 0], np.asarray(p).min(0), atol=1e-6)
        np.testing.assert_allclose(bb[n, :, 1], np.asarray(p).max(0), atol=1e-6)


def test_join_as_batch_and_scene():
    pts1, feats1 = _ragged_clouds(1, sizes=(2, 3))
    pts2, feats2 = _ragged_clouds(2, sizes=(4,))
    pc1 = Pointclouds(pts1, features=feats1)
    pc2 = Pointclouds(pts2, features=feats2)
    joined = join_pointclouds_as_batch([pc1, pc2])
    assert len(joined) == 3
    np.testing.assert_array_equal(np.asarray(joined.num_points_per_cloud()), [2, 3, 4])
    assert "colors" in joined.features_padded()
    # feature dropped if missing in one member
    pc3 = Pointclouds(pts2)
    joined2 = join_pointclouds_as_batch([pc1, pc3])
    assert "colors" not in joined2.features_padded()

    scene = join_pointclouds_as_scene([pc1, pc2])
    assert len(scene) == 1
    assert scene.points_packed().shape == (9, 3)


def test_subsample():
    pts, feats = _ragged_clouds(3, sizes=(10, 20, 5))
    pc = Pointclouds(pts, features=feats)
    sub = subsample(pc, 8)
    np.testing.assert_array_equal(np.asarray(sub.num_points_per_cloud()), [8, 8, 5])
    assert "colors" in sub.features_padded()
    # no-op when under the cap returns the same object
    assert subsample(pc, 100) is pc


def test_all_close():
    pts, feats = _ragged_clouds()
    pc1 = Pointclouds(pts, features=feats)
    pc2 = Pointclouds(pts, features=feats)
    assert all_close(pc1, pc2)
    pc3 = offset(pc1, jnp.asarray([1.0, 0, 0]))
    assert not all_close(pc1, pc3)
    pc4 = Pointclouds(pts)
    assert not all_close(pc1, pc4)


def test_empty_and_validation():
    pc = Pointclouds([])
    assert pc.isempty()
    assert len(pc) == 0
    with pytest.raises(ValueError):
        Pointclouds(jnp.zeros((2, 3, 4)))
    with pytest.raises(ValueError):
        Pointclouds([jnp.zeros((3, 4))])
    with pytest.raises(ValueError):
        Pointclouds([jnp.zeros((3, 3))], features=[1, 2, 3])


def test_list_to_padded_zero_trailing_dim_contributes_leading_size():
    """Reference parity (structures/utils.py:65-66): an entry shaped (5, 0)
    still contributes 5 to the inferred leading pad size."""
    from pytorch3d_pointops_tpu.structures.utils import list_to_padded

    out = list_to_padded([jnp.zeros((5, 0)), jnp.ones((2, 3))])
    assert out.shape == (2, 5, 3), out.shape
