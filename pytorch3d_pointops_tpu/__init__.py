"""pytorch3d_pointops_tpu — TPU-native differentiable point-cloud operators.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``pytorch3d_pointops`` CUDA library (version parity target 0.7.8,
/root/reference/pytorch3d_pointops/__init__.py:7): KNN, ball query, farthest
point sampling, packed<->padded conversions, inverse-CDF sampling, chamfer
distance with named feature channels, and the ragged ``Pointclouds``
container — plus a multi-device sharding layer the reference never had.
"""

__version__ = "0.1.0"

from .ops import (
    ball_query,
    chamfer_distance,
    get_point_covariances,
    knn_check_version,
    knn_gather,
    knn_points,
    masked_gather,
    packed_to_padded,
    padded_to_packed,
    sample_farthest_points,
    sample_farthest_points_naive,
    sample_pdf,
    sample_pdf_python,
    wmean,
)
from .structures import (
    Pointclouds,
    all_close,
    get_bounding_boxes,
    join_pointclouds_as_batch,
    make_device,
    join_pointclouds_as_scene,
    offset,
    scale,
    subsample,
)

__all__ = [
    "__version__",
    "ball_query",
    "chamfer_distance",
    "get_point_covariances",
    "knn_check_version",
    "knn_gather",
    "knn_points",
    "masked_gather",
    "packed_to_padded",
    "padded_to_packed",
    "sample_farthest_points",
    "sample_farthest_points_naive",
    "sample_pdf",
    "sample_pdf_python",
    "wmean",
    "Pointclouds",
    "all_close",
    "get_bounding_boxes",
    "join_pointclouds_as_batch",
    "make_device",
    "join_pointclouds_as_scene",
    "offset",
    "scale",
    "subsample",
]
