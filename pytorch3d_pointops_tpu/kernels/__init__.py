"""Pallas TPU kernels — the performance core of the framework.

Each kernel has an XLA-program twin in ``ops/`` used as its correctness
oracle (the reference library's dual-implementation test pattern, SURVEY §4).
"""
