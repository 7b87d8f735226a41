"""Auxiliary-subsystem coverage (SURVEY §5): checkpoint/resume of the
Pointclouds pytree via orbax, backward determinism (the reference explicitly
flags its CUDA KNN backward as nondeterministic, knn.cu:537-538 — ours must
be bit-deterministic), and profiler-trace smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import (
    Pointclouds,
    all_close,
    chamfer_distance,
    knn_points,
)


def _pc(seed=0):
    k = jax.random.PRNGKey(seed)
    pts = [
        jax.random.normal(jax.random.fold_in(k, 0), (40, 3)),
        jax.random.normal(jax.random.fold_in(k, 1), (25, 3)),
    ]
    feats = {
        "normals": [
            jax.random.normal(jax.random.fold_in(k, 2), (40, 3)),
            jax.random.normal(jax.random.fold_in(k, 3), (25, 3)),
        ]
    }
    return Pointclouds(pts, features=feats)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Pointclouds is a pytree, so orbax can checkpoint/restore it directly
    (the reference is stateless; SURVEY §5 'nothing to build beyond making
    Pointclouds a serializable pytree')."""
    ocp = pytest.importorskip("orbax.checkpoint")
    pc = _pc()
    path = os.path.join(str(tmp_path), "ckpt")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, pc)
    restored = ckptr.restore(path)
    # restore may come back as the registered pytree (Pointclouds) or as the
    # flattened children; both must carry identical arrays.
    if isinstance(restored, Pointclouds):
        assert all_close(pc, restored)
    else:
        leaves_a = jax.tree_util.tree_leaves(pc)
        leaves_b = jax.tree_util.tree_leaves(restored)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_knn_backward_bit_deterministic():
    """Two identical backward runs must produce bit-identical gradients —
    the deterministic-scatter replacement for the reference's atomicAdd."""
    k = jax.random.PRNGKey(3)
    p1 = jax.random.normal(jax.random.fold_in(k, 0), (2, 64, 3))
    p2 = jax.random.normal(jax.random.fold_in(k, 1), (2, 96, 3))

    f = jax.jit(
        jax.grad(
            lambda a, b: (knn_points(a, b, K=8).dists * 3.0).sum(),
            argnums=(0, 1),
        )
    )
    g1 = f(p1, p2)
    g2 = f(p1, p2)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chamfer_backward_bit_deterministic():
    k = jax.random.PRNGKey(4)
    x = jax.random.normal(jax.random.fold_in(k, 0), (2, 64, 3))
    y = jax.random.normal(jax.random.fold_in(k, 1), (2, 80, 3))
    f = jax.jit(jax.grad(lambda a, b: chamfer_distance(a, b)[0], argnums=(0, 1)))
    g1 = f(x, y)
    g2 = f(x, y)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profiler_trace_smoke(tmp_path):
    """jax.profiler traces wrap our ops without error (SURVEY §5 tracing)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
    with jax.profiler.trace(str(tmp_path)):
        out = jax.jit(lambda a, b: knn_points(a, b, K=4).dists)(x, y)
        out.block_until_ready()
    assert os.listdir(str(tmp_path))
