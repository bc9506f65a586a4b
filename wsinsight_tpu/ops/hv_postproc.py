"""HoVer-Net-style nucleus instance extraction from NP/HV maps (host CPU).

Behavioral re-creation of the reference post-processing (reference:
wsinsight/modellib/tilefuse.py:39-174): threshold np>=0.5, small-object
removal, Sobel(ksize=21) ridge map on min-max-normalized HV, distance =
-GaussianBlur(1-ridge), markers = fill_holes + morphological open + label,
marker watershed, then per-instance bbox / per-class mean prob / external
contour polygon. scikit-image calls are replaced by scipy/cv2 plus the
in-house (native C++) watershed.
"""

from __future__ import annotations

from typing import List

import cv2
import numpy as np
from scipy import ndimage as ndi

from .watershed import remove_small_labels, watershed

try:
    cv2.setNumThreads(1)  # the stitcher threads across tiles already
except Exception:
    pass


def proc_np_hv(np_map: np.ndarray, hv_map: np.ndarray, min_object_size: int) -> np.ndarray:
    """Instance map (H, W) int32 from an NP prob map and HV offset maps."""
    h, w = np_map.shape[:2]

    blb_bin = (np_map >= 0.5).astype(np.uint8)
    if blb_bin.sum() == 0:
        return np.zeros((h, w), dtype=np.int32)

    labeled, num = ndi.label(blb_bin)
    if num > 1:
        labeled = remove_small_labels(labeled.astype(np.int32), int(min_object_size))
    blb = (labeled > 0).astype(np.uint8)
    if blb.sum() == 0:
        return np.zeros((h, w), dtype=np.int32)

    h_dir = cv2.normalize(
        hv_map[:, :, 0], None, alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F
    )
    v_dir = cv2.normalize(
        hv_map[:, :, 1], None, alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F
    )

    sobelh = cv2.Sobel(h_dir, cv2.CV_64F, 1, 0, ksize=21)
    sobelv = cv2.Sobel(v_dir, cv2.CV_64F, 0, 1, ksize=21)
    sobelh = 1.0 - cv2.normalize(
        sobelh, None, alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F
    )
    sobelv = 1.0 - cv2.normalize(
        sobelv, None, alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F
    )

    overall = np.maximum(sobelh, sobelv)
    overall = overall - (1.0 - blb)
    overall[overall < 0] = 0

    dist = (1.0 - overall) * blb
    dist = -cv2.GaussianBlur(dist, (3, 3), 0)

    ridge = (overall >= 0.4).astype(np.uint8)
    marker = blb.astype(np.int16) - ridge.astype(np.int16)
    marker = np.clip(marker, 0, 1).astype(np.uint8)
    if marker.any():
        marker = ndi.binary_fill_holes(marker).astype("uint8")
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        marker = cv2.morphologyEx(marker, cv2.MORPH_OPEN, kernel)
        marker, mnum = ndi.label(marker)
        marker = marker.astype(np.int32)
        if mnum > 1:
            marker = remove_small_labels(marker, int(min_object_size))
    else:
        marker, _ = ndi.label(blb)
        marker = marker.astype(np.int32)

    return watershed(dist.astype(np.float32), marker, mask=blb.astype(bool)).astype(np.int32)


def extract_instances(
    np_tile: np.ndarray,
    hv_tile: np.ndarray,
    tp_tile: np.ndarray,
    interior_y0: int,
    interior_x0: int,
    interior_slice: tuple[slice, slice],
    min_object_size: int,
) -> tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
    """Per-tile instance measurement (reference: tilefuse.py:109-174).

    Returns lists of (1,4) bbox rows [x,y,w,h], (1,K) class-prob rows, and
    (M,2) contour polygons — all in global slide coordinates.
    """
    pred_inst_padded = proc_np_hv(np_tile, hv_tile, min_object_size)
    ys, xs = interior_slice
    pred_inst = pred_inst_padded[ys, xs]

    max_id = int(pred_inst.max())
    if max_id <= 0:
        return [], [], []

    labels = pred_inst
    lbl = labels.ravel()
    counts = np.bincount(lbl, minlength=max_id + 1).astype(np.int32)
    counts[0] = 0
    valid_ids = np.nonzero(counts)[0]
    if valid_ids.size == 0:
        return [], [], []

    slices = ndi.find_objects(labels, max_label=max_id)

    n_classes = int(tp_tile.shape[2])
    tp_interior = tp_tile[ys, xs, :]
    tp_flat = tp_interior.reshape(-1, n_classes).astype(np.float64)

    cls_sums = np.zeros((max_id + 1, n_classes), dtype=np.float64)
    np.add.at(cls_sums, lbl, tp_flat)
    cls_sums[0, :] = 0
    denom = counts.astype(np.float64)
    denom[denom == 0] = 1.0
    cls_means = (cls_sums.T / denom).T.astype(np.float32)

    inst_list: List[np.ndarray] = []
    prob_list: List[np.ndarray] = []
    poly_list: List[np.ndarray] = []

    for inst_id in valid_ids.tolist():
        sl = slices[inst_id - 1]
        if sl is None:
            continue
        r_sl, c_sl = sl
        rmin, rmax = r_sl.start, r_sl.stop
        cmin, cmax = c_sl.start, c_sl.stop

        x = cmin + interior_x0
        y = rmin + interior_y0
        w = cmax - cmin
        h = rmax - rmin

        inst_list.append(np.array([x, y, w, h], dtype=np.int32).reshape(1, -1))
        prob_list.append(cls_means[inst_id].copy().reshape(1, -1))

        local = (labels[rmin:rmax, cmin:cmax] == inst_id).astype(np.uint8)
        cnts, _ = cv2.findContours(local, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if not cnts:
            continue
        cnt = max(cnts, key=cv2.contourArea)
        poly = cnt.squeeze(1).astype(np.int32)
        if poly.ndim != 2 or poly.shape[0] < 3:
            continue
        poly[:, 0] += x
        poly[:, 1] += y
        poly_list.append(poly)

    return inst_list, prob_list, poly_list
