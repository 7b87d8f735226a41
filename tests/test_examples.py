"""Smoke-run the example scripts (the reference's examples/ are its de-facto
test suite, SURVEY §4 — ours must at least execute end to end)."""

import runpy
import sys
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize(
    "name",
    ["pointclouds_basics", "knn_and_chamfer", "sample_pdf_demo",
     "fps_and_ball_query", "covariances_demo", "packed_padded_walkthrough",
     "performance", "ring_parallel"],
)
def test_example_runs(name):
    path = os.path.join(EXAMPLES, f"{name}.py")
    sys.path.insert(0, EXAMPLES)
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.path.remove(EXAMPLES)
