"""ctypes bindings for the native C++ host-side op library.

The TPU framework's counterpart of the reference's CPU kernel layer +
pybind11 module (csrc/ext.cpp:15-28): ``csrc/pointops_cpu.cpp`` implements
every op with plain-C entry points; this module compiles it on first use
(g++ -O3, cached next to the source keyed by a source hash) and exposes
numpy-in/numpy-out wrappers.

These are host-side tools: fast fallbacks when no accelerator is attached,
data-loader-side preprocessing (FPS subsampling, packing), and a second
JAX-independent oracle for the dual-implementation tests (SURVEY §4 item 1).
The device path is always the JAX/Pallas ops in ``ops/``.

If no C++ toolchain is available, ``load()`` raises ImportError and callers
fall back to the pure-JAX path (mirroring the reference's
PYTORCH3D_POINTOPS_NO_EXTENSION degradation, setup.py:38-43).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("pytorch3d_pointops_tpu.native")

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "pointops_cpu.cpp")
_LIB: Optional[ctypes.CDLL] = None
_LOAD_ERROR: Optional[Exception] = None

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "POINTOPS_TPU_CACHE",
        os.path.join(tempfile.gettempdir(), "pointops_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libpointops_cpu_{tag}.so")
    if os.path.exists(lib_path):
        logger.debug("native pointops: using cached build %s", lib_path)
        return lib_path
    logger.info("native pointops: compiling %s (one-time, cached)", _SRC)
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-march=native",
        "-pthread",
        _SRC,
        "-o",
        tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, lib_path)
    return lib_path


def load() -> ctypes.CDLL:
    """Compile (once) and load the native library; raises ImportError when no
    toolchain is available."""
    global _LIB, _LOAD_ERROR
    if _LIB is not None:
        return _LIB
    if _LOAD_ERROR is not None:
        raise ImportError(f"native pointops unavailable: {_LOAD_ERROR}")
    try:
        lib = ctypes.CDLL(_build())
    except (OSError, subprocess.SubprocessError, FileNotFoundError) as e:
        _LOAD_ERROR = e
        logger.warning(
            "native pointops unavailable (falling back to pure-JAX paths): %s",
            e,
        )
        raise ImportError(f"native pointops unavailable: {e}") from e

    lib.pointops_knn.argtypes = [
        _f32p, _f32p, _i64p, _i64p, _i64, _i64, _i64, _i64, _i64,
        ctypes.c_int, _f32p, _i32p,
    ]
    lib.pointops_knn_backward.argtypes = [
        _f32p, _f32p, _i64p, _i64p, _i32p, _f32p, _i64, _i64, _i64, _i64,
        _i64, ctypes.c_int, _f32p, _f32p,
    ]
    lib.pointops_ball_query.argtypes = [
        _f32p, _f32p, _i64p, _i64p, _i64, _i64, _i64, _i64, _i64,
        ctypes.c_float, _f32p, _i32p,
    ]
    lib.pointops_fps.argtypes = [
        _f32p, _i64p, _i64p, _i64p, _i64, _i64, _i64, _i64, _i32p,
    ]
    lib.pointops_packed_to_padded.argtypes = [
        _f32p, _i64p, _i64, _i64, _i64, _i64, _f32p,
    ]
    lib.pointops_padded_to_packed.argtypes = [
        _f32p, _i64p, _i64, _i64, _i64, _i64, _f32p,
    ]
    lib.pointops_sample_pdf.argtypes = [
        _f32p, _f32p, _f32p, _i64, _i64, _i64, ctypes.c_float, _f32p,
    ]
    for fn in (
        lib.pointops_knn, lib.pointops_knn_backward, lib.pointops_ball_query,
        lib.pointops_fps, lib.pointops_packed_to_padded,
        lib.pointops_padded_to_packed, lib.pointops_sample_pdf,
    ):
        fn.restype = None
    _LIB = lib
    return lib


def is_available() -> bool:
    try:
        load()
        return True
    except ImportError:
        return False


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), np.float32)


def _as_i64(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), np.int64)


def knn_points(
    p1, p2, lengths1=None, lengths2=None, K: int = 1, norm: int = 2
) -> Tuple[np.ndarray, np.ndarray]:
    """Native host KNN; same output conventions as ``ops.knn.knn_points``."""
    lib = load()
    p1 = _as_f32(p1)
    p2 = _as_f32(p2)
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    lengths1 = _as_i64(lengths1 if lengths1 is not None else np.full(N, P1))
    lengths2 = _as_i64(lengths2 if lengths2 is not None else np.full(N, P2))
    dists = np.empty((N, P1, K), np.float32)
    idx = np.empty((N, P1, K), np.int32)
    lib.pointops_knn(p1, p2, lengths1, lengths2, N, P1, P2, D, K, norm,
                     dists, idx)
    return dists, idx


def knn_backward(
    p1, p2, idx, grad_dists, lengths1=None, lengths2=None, norm: int = 2
) -> Tuple[np.ndarray, np.ndarray]:
    lib = load()
    p1 = _as_f32(p1)
    p2 = _as_f32(p2)
    idx = np.ascontiguousarray(np.asarray(idx), np.int32)
    grad_dists = _as_f32(grad_dists)
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    K = idx.shape[2]
    lengths1 = _as_i64(lengths1 if lengths1 is not None else np.full(N, P1))
    lengths2 = _as_i64(lengths2 if lengths2 is not None else np.full(N, P2))
    grad_p1 = np.empty((N, P1, D), np.float32)
    grad_p2 = np.empty((N, P2, D), np.float32)
    lib.pointops_knn_backward(p1, p2, lengths1, lengths2, idx, grad_dists,
                              N, P1, P2, D, K, norm, grad_p1, grad_p2)
    return grad_p1, grad_p2


def ball_query(
    p1, p2, lengths1=None, lengths2=None, K: int = 500, radius: float = 0.2
) -> Tuple[np.ndarray, np.ndarray]:
    lib = load()
    p1 = _as_f32(p1)
    p2 = _as_f32(p2)
    N, P1, D = p1.shape
    P2 = p2.shape[1]
    lengths1 = _as_i64(lengths1 if lengths1 is not None else np.full(N, P1))
    lengths2 = _as_i64(lengths2 if lengths2 is not None else np.full(N, P2))
    dists = np.empty((N, P1, K), np.float32)
    idx = np.empty((N, P1, K), np.int32)
    lib.pointops_ball_query(p1, p2, lengths1, lengths2, N, P1, P2, D, K,
                            radius, dists, idx)
    return dists, idx


def sample_farthest_points(
    points, lengths=None, K=50, start_idxs=None
) -> np.ndarray:
    """Native host FPS; returns (N, max_K) int32 indices, -1-padded."""
    lib = load()
    points = _as_f32(points)
    N, P, D = points.shape
    lengths = _as_i64(lengths if lengths is not None else np.full(N, P))
    if np.isscalar(K) or getattr(K, "ndim", 1) == 0:
        K = np.full(N, int(K))
    K = _as_i64(K)
    max_K = int(K.max()) if K.size else 0
    start_idxs = _as_i64(
        start_idxs if start_idxs is not None else np.zeros(N)
    )
    idx = np.empty((N, max_K), np.int32)
    lib.pointops_fps(points, lengths, K, start_idxs, N, P, D, max_K, idx)
    return idx


def packed_to_padded(inputs, first_idxs, max_size: int) -> np.ndarray:
    lib = load()
    inputs = _as_f32(inputs)
    squeeze = inputs.ndim == 1
    if squeeze:
        inputs = inputs[:, None]
    lead = inputs.shape
    inputs2d = inputs.reshape(lead[0], -1)
    first_idxs = _as_i64(first_idxs)
    F, D = inputs2d.shape
    N = first_idxs.shape[0]
    out = np.empty((N, max_size, D), np.float32)
    lib.pointops_packed_to_padded(inputs2d, first_idxs, F, D, N, max_size, out)
    out = out.reshape(N, max_size, *lead[1:])
    return out[..., 0] if squeeze else out


def padded_to_packed(inputs, first_idxs, num_inputs: int) -> np.ndarray:
    lib = load()
    inputs = _as_f32(inputs)
    squeeze = inputs.ndim == 2
    if squeeze:
        inputs = inputs[..., None]
    lead = inputs.shape
    inputs3d = inputs.reshape(lead[0], lead[1], -1)
    first_idxs = _as_i64(first_idxs)
    N, M, D = inputs3d.shape
    out = np.empty((num_inputs, D), np.float32)
    lib.pointops_padded_to_packed(inputs3d, first_idxs, N, M, D, num_inputs,
                                  out)
    out = out.reshape(num_inputs, *lead[2:])
    return out[..., 0] if squeeze else out


def sample_pdf(
    bins, weights, uniforms, eps: float = 1e-5
) -> np.ndarray:
    """Native inverse-CDF sampling; ``uniforms`` are the quantiles in [0, 1]
    (generated caller-side, like the reference's Python layer,
    functions/sample_pdf.py:52-56)."""
    lib = load()
    bins = _as_f32(bins)
    weights = _as_f32(weights)
    uniforms = _as_f32(uniforms)
    batch_shape = weights.shape[:-1]
    n_bins = weights.shape[-1]
    S = uniforms.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    out = np.empty((B, S), np.float32)
    lib.pointops_sample_pdf(
        bins.reshape(B, n_bins + 1), weights.reshape(B, n_bins),
        uniforms.reshape(B, S), B, n_bins, S, eps, out,
    )
    return out.reshape(*batch_shape, S)
