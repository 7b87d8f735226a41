import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import packed_to_padded, padded_to_packed

from oracles import packed_to_padded_np


def _setup(key, sizes=(3, 5, 2), D=4):
    F = sum(sizes)
    inputs = jax.random.normal(key, (F, D))
    first = np.zeros(len(sizes), np.int32)
    first[1:] = np.cumsum(sizes[:-1])
    return inputs, jnp.asarray(first), max(sizes), F


def test_packed_to_padded_vs_oracle():
    inputs, first, max_size, F = _setup(jax.random.PRNGKey(0))
    out = packed_to_padded(inputs, first, max_size)
    ref = packed_to_padded_np(np.asarray(inputs), np.asarray(first), max_size)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_roundtrip():
    inputs, first, max_size, F = _setup(jax.random.PRNGKey(1))
    padded = packed_to_padded(inputs, first, max_size)
    packed = padded_to_packed(padded, first, F)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(inputs))


def test_flat_and_nd_shapes():
    # (F,) flat input
    inputs, first, max_size, F = _setup(jax.random.PRNGKey(2), D=1)
    flat = inputs[:, 0]
    out = packed_to_padded(flat, first, max_size)
    assert out.shape == (3, max_size)
    back = padded_to_packed(out, first, F)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(flat))
    # (F, 2, 3) nd input
    key = jax.random.PRNGKey(3)
    nd = jax.random.normal(key, (10, 2, 3))
    first2 = jnp.asarray([0, 4], jnp.int32)
    out = packed_to_padded(nd, first2, 6)
    assert out.shape == (2, 6, 2, 3)
    back = padded_to_packed(out, first2, 10)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(nd))


def test_max_size_dim():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 5))  # max dim at 2
    first = jnp.asarray([0, 4], jnp.int32)
    out = padded_to_packed(x, first, 9, max_size_dim=2)
    assert out.shape == (9, 3)
    ref = np.moveaxis(np.asarray(x), 2, 1)
    np.testing.assert_array_equal(np.asarray(out[:4]), ref[0, :4])
    np.testing.assert_array_equal(np.asarray(out[4:]), ref[1, :5])


def test_gradients_are_transposes():
    inputs, first, max_size, F = _setup(jax.random.PRNGKey(5))
    w_padded = jax.random.normal(jax.random.PRNGKey(6), (3, max_size, 4))

    def f(x):
        return (packed_to_padded(x, first, max_size) * w_padded).sum()

    g = jax.grad(f)(inputs)
    # gradient of packed_to_padded == padded_to_packed of the cotangent
    ref = padded_to_packed(w_padded, first, F)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=1e-6)

    w_packed = jax.random.normal(jax.random.PRNGKey(7), (F, 4))
    padded = packed_to_padded(inputs, first, max_size)

    def h(x):
        return (padded_to_packed(x, first, F) * w_packed).sum()

    g2 = jax.grad(h)(padded)
    ref2 = packed_to_padded(w_packed, first, max_size)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(ref2), atol=1e-6)


def test_jittable():
    inputs, first, max_size, F = _setup(jax.random.PRNGKey(8))
    f = jax.jit(lambda x: packed_to_padded(x, first, max_size))
    np.testing.assert_array_equal(
        np.asarray(f(inputs)), np.asarray(packed_to_padded(inputs, first, max_size))
    )


def test_validation():
    inputs, first, max_size, F = _setup(jax.random.PRNGKey(9))
    with pytest.raises(ValueError):
        packed_to_padded(inputs, first, jnp.int32(5))  # non-int max_size
