"""Model-output CSV -> gzipped OME-CSV exporter.

Byte-level re-creation of the reference exporter (reference:
wsinsight/write_omecsv.py:52-309): header
``object,secondary_object,polygon,objectType,classification,<prob cols>``, one
WKT polygon per row from the shrink-box math, class = argmax name with the
prefix stripped, `.ome.csv.gz` outputs, resume-skip, process-pool fan-out. The
``h5s`` argument is kept for API compatibility and unused.
"""

from __future__ import annotations

import gzip
import multiprocessing
from concurrent.futures import ProcessPoolExecutor, as_completed
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd
from tqdm.auto import tqdm

from ..uri_path import URIPath

PathLike = Union[Path, URIPath]


def _dataframe_to_omecsv(
    df: pd.DataFrame,
    prob_cols: List[str],
    minx2: np.ndarray,
    miny2: np.ndarray,
    maxx2: np.ndarray,
    maxy2: np.ndarray,
    class_prefix: str = "prob_",
) -> str:
    """Build the full OME-CSV content string (reference: write_omecsv.py:52-94)."""
    num_rows = df.shape[0]
    assert (
        len(minx2) == len(miny2) == len(maxx2) == len(maxy2) == num_rows
    ), "Coordinate arrays must match DataFrame length"

    head_str = ",".join(
        ["object", "secondary_object", "polygon", "objectType", "classification", *prob_cols]
    )

    prob_arr = df[prob_cols].to_numpy(copy=False)
    class_names = np.array([c[len(class_prefix):] for c in prob_cols])
    best_idx = prob_arr.argmax(axis=1)
    cls_arr = class_names[best_idx]

    lines = [head_str]
    for i in range(num_rows):
        x1, y1 = int(maxx2[i]), int(miny2[i])
        x2, y2 = int(maxx2[i]), int(maxy2[i])
        x3, y3 = int(minx2[i]), int(maxy2[i])
        x4, y4 = int(minx2[i]), int(miny2[i])
        coords = [
            f"{x1} {y1}",
            f"{x2} {y2}",
            f"{x3} {y3}",
            f"{x4} {y4}",
            f"{x1} {y1}",
        ]
        poly_str = '"POLYGON ((' + ",".join(coords) + '))"'
        mvals = ",".join(map(str, prob_arr[i]))
        lines.append(f"{i},{i},{poly_str},tile,{cls_arr[i]},{mvals}")
    return "\n".join(lines)


def make_omecsv(
    csv: PathLike,
    results_dir: PathLike,
    output_dir: PathLike,
    overlap: float,
    prefix: str,
    usecols: Optional[List[str]] = None,
    dtype: Optional[Dict] = None,
) -> None:
    """Read one model-output CSV and write `<stem>.ome.csv.gz`."""
    filename = csv.stem
    local = csv.materialize() if isinstance(csv, URIPath) else csv
    df = pd.read_csv(local, usecols=usecols, dtype=dtype, engine="c", low_memory=False)

    full_prefix = f"{prefix}_"
    prob_cols = [c for c in df.columns if c.startswith(full_prefix)]
    if not prob_cols:
        raise KeyError(f"Did not find any columns with '{full_prefix}' prefix.")
    df = df.dropna(subset=prob_cols)

    xywh = df[["minx", "miny", "width", "height"]].to_numpy(dtype=np.int64, copy=False)
    minx, miny, w, h = xywh.T

    pw = np.rint(w * (1.0 - overlap)).astype(np.int64)
    ph = np.rint(h * (1.0 - overlap)).astype(np.int64)
    pmx = np.rint((w - pw) * 0.5).astype(np.int64)
    pmy = np.rint((h - ph) * 0.5).astype(np.int64)

    minx2 = minx + pmx
    miny2 = miny + pmy
    maxx2 = minx2 + pw
    maxy2 = miny2 + ph

    omecsv = _dataframe_to_omecsv(
        df, prob_cols, minx2, miny2, maxx2, maxy2, class_prefix=full_prefix
    )

    out_path = results_dir / output_dir / f"{filename}.ome.csv.gz"
    _write_gzip_bytes(out_path, omecsv.encode("utf-8"))


def _iter_files(path: PathLike, *, suffix: Optional[str] = None):
    if isinstance(path, URIPath):
        iterator = path.iterdir(files_only=True)
    else:
        iterator = (child for child in path.iterdir() if child.is_file())
    for child in iterator:
        if suffix is None or child.suffix == suffix:
            yield child


def _write_gzip_bytes(out_path: PathLike, payload: bytes) -> None:
    parent = out_path.parent
    parent.mkdir(parents=True, exist_ok=True)
    if isinstance(out_path, URIPath) and out_path.scheme is not None:
        with out_path.open("wb") as fh:
            with gzip.GzipFile(fileobj=fh, mode="wb") as gz:
                gz.write(payload)
        return
    with gzip.open(str(out_path), "wb") as gz:
        gz.write(payload)


def write_omecsvs(
    csvs: List[PathLike],
    h5s: List[PathLike],  # kept for API compatibility; not used
    overlap: float,
    results_dir: PathLike,
    output_dir: PathLike,
    prefix: str,
    num_workers: int,
    usecols: Optional[List[str]] = None,
    dtype: Optional[Dict] = None,
    show_progress: bool = True,
) -> None:
    """Convert model-output CSVs into gzipped OME-CSVs via a process pool."""
    del h5s
    out_root = results_dir / output_dir
    out_root.mkdir(parents=True, exist_ok=True)

    # Skip stems already exported ('.ome.csv.gz' strips to '<stem>.ome.csv').
    already = {
        str(p.name)[: -len(".ome.csv.gz")]
        for p in _iter_files(out_root)
        if str(p.name).endswith(".ome.csv.gz")
    }
    csvs = [p for p in csvs if p.stem not in already]
    if not csvs:
        return

    pbar = tqdm(total=len(csvs), desc="OME-CSVs", dynamic_ncols=True) if show_progress else None
    with ProcessPoolExecutor(max_workers=num_workers, mp_context=multiprocessing.get_context("spawn")) as ex:
        futures = [
            ex.submit(make_omecsv, csv, results_dir, output_dir, overlap, prefix, usecols, dtype)
            for csv in csvs
        ]
        for f in as_completed(futures):
            f.result()
            if pbar:
                pbar.update(1)
    if pbar:
        pbar.close()
