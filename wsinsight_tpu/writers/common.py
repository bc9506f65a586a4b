"""Geometry and traversal helpers shared by the exporters.

The shrink-box formula is an output-compatibility contract (reference:
wsinsight/write_geojson.py:85-106 and write_omecsv.py:128-142 use the same
math): GeoJSON and OME-CSV must describe IDENTICAL box geometry for the same
CSV row, so the formula lives in exactly one place.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from ..uri_path import URIPath


def shrunk_boxes(
    df: pd.DataFrame, overlap: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Patch boxes shrunk by `overlap`, centered: (minx, miny, maxx, maxy).

    pw = rint(w * (1 - overlap)) with the remainder split evenly (rint), so a
    0-overlap grid round-trips exactly.
    """
    xywh = df[["minx", "miny", "width", "height"]].to_numpy(dtype=np.int64, copy=False)
    minx, miny, w, h = xywh.T

    pw = np.rint(w * (1.0 - overlap)).astype(np.int64)
    ph = np.rint(h * (1.0 - overlap)).astype(np.int64)
    pmx = np.rint((w - pw) * 0.5).astype(np.int64)
    pmy = np.rint((h - ph) * 0.5).astype(np.int64)

    minx2 = minx + pmx
    miny2 = miny + pmy
    return minx2, miny2, minx2 + pw, miny2 + ph


def iter_files(path, *, suffix: Optional[str] = None):
    """Yield the files directly inside `path` (URIPath- and Path-compatible),
    optionally filtered by suffix."""
    if isinstance(path, URIPath):
        iterator = path.iterdir(files_only=True)
    else:
        iterator = (child for child in path.iterdir() if child.is_file())
    for child in iterator:
        if suffix is None or child.suffix == suffix:
            yield child
