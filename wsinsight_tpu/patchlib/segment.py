"""Tissue segmentation on slide thumbnails.

Behavioral re-creation of the reference segmentation (reference:
wsinsight/patchlib/segment.py:13-97): RGB -> HSV, keep the saturation channel,
median blur, fixed binary threshold, morphological closing, small-object removal,
small-hole filling. Runs on the 2048^2 thumbnail on host CPU — this stage is not
a TPU bottleneck; the TPU work starts at the patch forward pass.
"""

from __future__ import annotations

import cv2 as cv
import numpy as np
import numpy.typing as npt

from .morphology import binary_closing, remove_small_holes, remove_small_objects


def segment_tissue(
    im_arr: npt.NDArray,
    median_filter_size: int = 7,
    binary_threshold: int = 7,
    closing_kernel_size: int = 6,
    min_object_size_px: int = 512,
    min_hole_size_px: int = 1024,
) -> npt.NDArray[np.bool_]:
    """Create a boolean tissue mask from an RGB thumbnail array."""
    im_arr = np.asarray(im_arr)
    assert im_arr.ndim == 3
    assert im_arr.shape[2] == 3

    if median_filter_size <= 1 or median_filter_size % 2 == 0:
        raise ValueError(
            "median_filter_size must be greater than 1 and odd, but got"
            f" {median_filter_size}"
        )

    hsv = cv.cvtColor(im_arr, cv.COLOR_RGB2HSV)
    sat = hsv[:, :, 1]
    sat = cv.medianBlur(sat, median_filter_size)
    _, binary = cv.threshold(sat, thresh=binary_threshold, maxval=255, type=cv.THRESH_BINARY)
    mask: npt.NDArray[np.bool_] = binary > 0

    mask = binary_closing(mask, np.ones((closing_kernel_size, closing_kernel_size), bool))
    mask = remove_small_objects(mask, min_size=min_object_size_px)
    mask = remove_small_holes(mask, area_threshold=min_hole_size_px)
    return mask
