"""On-device ops: preprocessing, stain normalization, instance post-processing."""

from .preprocess import TransformSpec, make_preprocess_fn, pil_resize_batch
from .stain import (
    deconvolution_based_normalization,
    default_target_stains,
    estimate_stains_from_batch,
    macenko_stain_matrix,
)
from .watershed import remove_small_labels, watershed

__all__ = [
    "TransformSpec",
    "make_preprocess_fn",
    "pil_resize_batch",
    "deconvolution_based_normalization",
    "default_target_stains",
    "estimate_stains_from_batch",
    "macenko_stain_matrix",
    "watershed",
    "remove_small_labels",
]
