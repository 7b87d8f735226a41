import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3d_pointops_tpu import sample_pdf, sample_pdf_python

from oracles import sample_pdf_np


def _setup(key, B=4, n_bins=16):
    k1, k2 = jax.random.split(key)
    edges = jnp.sort(jax.random.uniform(k1, (B, n_bins + 1)), axis=-1)
    weights = jax.random.uniform(k2, (B, n_bins))
    return edges, weights


def test_sample_pdf_det_vs_oracle():
    bins, weights = _setup(jax.random.PRNGKey(0))
    n_samples = 32
    out = sample_pdf(bins, weights, n_samples, det=True)
    u = np.broadcast_to(
        np.linspace(0.0, 1.0, n_samples, dtype=np.float32), (4, n_samples)
    )
    ref = sample_pdf_np(np.asarray(bins), np.asarray(weights), u, 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_sample_pdf_python_det_close_to_native():
    """The two implementations agree in det mode (reference
    examples/sample_pdf_on_pointclouds.py:256-321 compares allclose)."""
    bins, weights = _setup(jax.random.PRNGKey(1), B=8, n_bins=64)
    a = sample_pdf(bins, weights, 64, det=True)
    b = sample_pdf_python(bins, weights, 64, det=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_samples_within_support():
    bins, weights = _setup(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    out = np.asarray(sample_pdf(bins, weights, 100, det=False, key=key))
    lo = np.asarray(bins[:, :1])
    hi = np.asarray(bins[:, -1:])
    assert (out >= lo - 1e-6).all() and (out <= hi + 1e-6).all()


def test_sample_distribution_follows_weights():
    """Histogram of many samples approximates the pdf."""
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (1, 5))
    weights = jnp.asarray([[0.1, 0.2, 0.3, 0.4]])
    out = np.asarray(
        sample_pdf(bins, weights, 20000, det=False, key=jax.random.PRNGKey(4))
    )[0]
    hist, _ = np.histogram(out, bins=np.linspace(0, 1, 5))
    frac = hist / hist.sum()
    np.testing.assert_allclose(frac, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_batch_shapes_preserved():
    bins, weights = _setup(jax.random.PRNGKey(5), B=6)
    bins3 = bins.reshape(2, 3, -1)
    weights3 = weights.reshape(2, 3, -1)
    out = sample_pdf(bins3, weights3, 10, det=True)
    assert out.shape == (2, 3, 10)
    flat = sample_pdf(bins, weights, 10, det=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(6, 10), np.asarray(flat), atol=1e-6
    )


def test_validation_and_rng():
    bins, weights = _setup(jax.random.PRNGKey(6))
    with pytest.raises(ValueError):
        sample_pdf(bins, weights[:, :-1], 4, det=True)
    with pytest.raises(ValueError):
        sample_pdf(bins, weights, 4, det=False)  # missing key


def test_empty_bins_edge_case():
    """All-zero weights: samples still land inside the support."""
    bins = jnp.broadcast_to(jnp.linspace(0.0, 2.0, 9), (1, 9))
    weights = jnp.zeros((1, 8))
    out = np.asarray(sample_pdf(bins, weights, 16, det=True))
    assert (out >= 0.0).all() and (out <= 2.0).all()


def test_sample_pdf_nondet_ks_vs_analytic_cdf():
    """KS test: the empirical CDF of ``det=False`` samples must match the
    piecewise-linear analytic CDF implied by (bins, weights).  Direct
    reference parity is untestable by construction for the random path
    (torch RNG != JAX RNG); this pins the distribution itself instead."""
    bins = jnp.asarray([[0.0, 0.5, 2.0, 2.5, 4.0]])
    weights = jnp.asarray([[0.15, 0.45, 0.1, 0.3]])
    n = 50_000
    out = np.sort(
        np.asarray(
            sample_pdf(bins, weights, n, det=False, key=jax.random.PRNGKey(11))
        )[0]
    )
    b = np.asarray(bins, np.float64)[0]
    w = np.asarray(weights, np.float64)[0]
    w = w / w.sum()
    cum = np.concatenate([[0.0], np.cumsum(w)])
    idx = np.clip(np.searchsorted(b, out, side="right") - 1, 0, len(w) - 1)
    cdf = cum[idx] + w[idx] * (out - b[idx]) / (b[idx + 1] - b[idx])
    emp = (np.arange(n) + 0.5) / n
    ks = np.abs(cdf - emp).max()
    # KS critical value at alpha ~= 1e-3 is ~1.95/sqrt(n); allow slack for
    # the kernel's eps-regularized total weight.
    assert ks < 2.2 / np.sqrt(n), ks
