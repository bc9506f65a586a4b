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
from .common import iter_files, shrunk_boxes

PathLike = Union[Path, URIPath]


def _concat_columns(parts: List[np.ndarray], sep: str) -> np.ndarray:
    """Element-wise join of equal-length string arrays with a separator."""
    joined = parts[0]
    for part in parts[1:]:
        joined = np.char.add(np.char.add(joined, sep), part)
    return joined


def _dataframe_to_omecsv(
    df: pd.DataFrame,
    prob_cols: List[str],
    minx2: np.ndarray,
    miny2: np.ndarray,
    maxx2: np.ndarray,
    maxy2: np.ndarray,
    class_prefix: str = "prob_",
) -> str:
    """Render the OME-CSV payload (byte layout: reference write_omecsv.py).

    Columns are ``object,secondary_object,polygon,objectType,classification,
    <prob cols>`` with one quoted WKT box ring per row. The whole table is
    assembled column-wise with vectorised string concatenation — no per-row
    Python loop.
    """
    n = df.shape[0]
    if not (len(minx2) == len(miny2) == len(maxx2) == len(maxy2) == n):
        raise ValueError("coordinate arrays and dataframe disagree on row count")

    header = ",".join(
        ["object", "secondary_object", "polygon", "objectType", "classification", *prob_cols]
    )
    if n == 0:
        return header

    # Ring runs top-right -> bottom-right -> bottom-left -> top-left -> close.
    left = np.asarray(minx2, dtype=np.int64).astype(str)
    top = np.asarray(miny2, dtype=np.int64).astype(str)
    right = np.asarray(maxx2, dtype=np.int64).astype(str)
    bottom = np.asarray(maxy2, dtype=np.int64).astype(str)
    tr = _concat_columns([right, top], " ")
    br = _concat_columns([right, bottom], " ")
    bl = _concat_columns([left, bottom], " ")
    tl = _concat_columns([left, top], " ")
    ring = _concat_columns([tr, br, bl, tl, tr], ",")
    wkt = np.char.add(np.char.add('"POLYGON ((', ring), '))"')

    probs = df[prob_cols].to_numpy(copy=False)
    winner = np.asarray([c[len(class_prefix):] for c in prob_cols])[probs.argmax(axis=1)]
    measurements = _concat_columns([probs[:, k].astype(str) for k in range(probs.shape[1])], ",")

    row_id = np.arange(n).astype(str)
    kind = np.full(n, "tile")
    rows = _concat_columns([row_id, row_id, wkt, kind, winner, measurements], ",")
    return "\n".join([header, *rows.tolist()])


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

    minx2, miny2, maxx2, maxy2 = shrunk_boxes(df, overlap)

    omecsv = _dataframe_to_omecsv(
        df, prob_cols, minx2, miny2, maxx2, maxy2, class_prefix=full_prefix
    )

    out_path = results_dir / output_dir / f"{filename}.ome.csv.gz"
    _write_gzip_bytes(out_path, omecsv.encode("utf-8"))


_iter_files = iter_files


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
    # Governor clamp, mirroring the reference's governed export pool
    # (num_worker_optimizer.py:74-165 via write_omecsv.py).
    from ..utils.workers import governed_workers

    num_workers = governed_workers(num_workers)
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
