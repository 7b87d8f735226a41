"""Inverse-CDF sampling — the TPU-native analog of the reference's
examples/sample_pdf_on_pointclouds.py: density-proportional resampling of a
point cloud along an axis, plus the native-vs-python implementation
cross-check."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from pytorch3d_pointops_tpu import sample_pdf, sample_pdf_python


def main():
    # A 1D density: two bumps
    n_bins = 64
    edges = jnp.linspace(-3.0, 3.0, n_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    weights = jnp.exp(-((centers - 1.5) ** 2)) + 0.5 * jnp.exp(
        -((centers + 1.5) ** 2) / 0.25
    )
    bins = jnp.broadcast_to(edges, (1, n_bins + 1))
    w = jnp.broadcast_to(weights, (1, n_bins))

    # deterministic stratified samples
    det = sample_pdf(bins, w, 16, det=True)
    print("det samples:", np.asarray(det[0]).round(2))

    # random samples follow the density
    samples = sample_pdf(bins, w, 20000, det=False, key=jax.random.PRNGKey(0))
    hist, _ = np.histogram(np.asarray(samples[0]), bins=np.asarray(edges))
    top_bin = float(np.asarray(centers)[hist.argmax()])
    print("histogram mode near 1.5:", top_bin)
    assert abs(top_bin - 1.5) < 0.3

    # implementation cross-check (reference
    # examples/sample_pdf_on_pointclouds.py:256-321)
    a = sample_pdf(bins, w, 64, det=True)
    b = sample_pdf_python(bins, w, 64, det=True)
    print("max |native - python|:", float(jnp.abs(a - b).max()))


if __name__ == "__main__":
    main()
