"""Model-output CSV -> GeoJSON FeatureCollection overlays.

Behavioral re-creation of the reference exporter (reference:
wsinsight/write_geojson.py:38-482) without geopandas/shapely/orjson:

* box path fully vectorized: shrink boxes by `overlap`
  (pw = rint(w*(1-overlap)), centered), closed 5-point rings in the exact
  vertex order of the reference (reference: write_geojson.py:85-106),
* per-feature properties {isLocked, measurements{prob_*}, objectType} and
  optional classification {name: prob_<argmax>, color} (reference: :120-143),
* polygon path reads a `polygon_wkt` column,
* distinct colors via interleaved HSV hues (reference: :38-65),
* atomic `.PART` + rename local writes, URIPath sync for remotes (:360-378),
* resume: stems already exported are skipped (:448-449),
* per-CSV process fan-out.
"""

from __future__ import annotations

import json
import multiprocessing
import uuid
from colorsys import hsv_to_rgb
from concurrent.futures import ProcessPoolExecutor, as_completed
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd
from tqdm.auto import tqdm

from ..uri_path import URIPath
from .common import iter_files, shrunk_boxes
from .wkt import wkt_to_geojson_geometry

PathLike = Union[Path, URIPath]


def _dumps(obj: dict) -> bytes:
    """Compact JSON bytes (same wire format orjson produces)."""
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False).encode("utf-8")


def _make_distinct_colors(
    n: int,
    s: float = 0.70,
    v: float = 0.90,
    shuffle: bool = True,
    seed: Optional[int] = None,
):
    """`n` well-spaced HSV-derived colors (reference: write_geojson.py:38-65)."""
    if n <= 0:
        raise ValueError("n must be > 0")
    hues = [i / n for i in range(n)]
    if shuffle and n > 2:
        order, L, R = [], 0, n - 1
        while L <= R:
            order.append(L)
            if L != R:
                order.append(R)
            L += 1
            R -= 1
        hues = [hues[i] for i in order]
    out = []
    for h in hues:
        r, g, b = hsv_to_rgb(h, s, v)
        R, G, B = int(round(r * 255)), int(round(g * 255)), int(round(b * 255))
        out.append({"hex": f"#{R:02X}{G:02X}{B:02X}", "rgb": (R, G, B), "hsv": (h, s, v)})
    return out


def _class_names(prob_cols: List[str], prefix: str) -> List[str]:
    return [
        f"{prefix}_{c[len(prefix) + 1 :]}" if c.startswith(f"{prefix}_") else f"{prefix}_{c}"
        for c in prob_cols
    ]


def _dataframe_to_geojson_box_fast(
    df: pd.DataFrame,
    prob_cols: List[str],
    overlap: float,
    *,
    prefix: str = "prob",
    object_type: str = "tile",
    set_classification: bool = False,
    color_list: Optional[List[dict]] = None,
) -> dict:
    """Vectorize CSV tile boxes into a GeoJSON FeatureCollection."""
    df = df.dropna(subset=[c for c in prob_cols if c.startswith(prefix)])

    minx2, miny2, maxx2, maxy2 = shrunk_boxes(df, overlap)

    # Closed ring (N, 5, 2), vertex order matching the reference exactly.
    coords = np.stack(
        [
            np.stack([maxx2, miny2], axis=1),
            np.stack([maxx2, maxy2], axis=1),
            np.stack([minx2, maxy2], axis=1),
            np.stack([minx2, miny2], axis=1),
            np.stack([maxx2, miny2], axis=1),
        ],
        axis=1,
    )

    probs = df[prob_cols].to_numpy(dtype=np.float32, copy=False)
    arg = probs.argmax(axis=1)

    if color_list is None:
        color_list = _make_distinct_colors(len(prob_cols))
    class_names = _class_names(prob_cols, prefix)

    features = []
    for i in range(len(df)):
        measurements = {prob_cols[j]: float(probs[i, j]) for j in range(len(prob_cols))}
        feat = {
            "type": "Feature",
            "id": str(uuid.uuid4()),
            "geometry": {"type": "Polygon", "coordinates": [coords[i].tolist()]},
            "properties": {
                "isLocked": True,
                "measurements": measurements,
                "objectType": object_type,
            },
        }
        if set_classification:
            ci = int(arg[i])
            feat["properties"]["classification"] = {
                "name": class_names[ci],
                "color": list(color_list[ci]["rgb"]),
            }
        features.append(feat)
    return {"type": "FeatureCollection", "features": features}


def _dataframe_to_geojson_polygon_fast(
    df: pd.DataFrame,
    prob_cols: List[str],
    *,
    prefix: str = "prob",
    object_type: str = "tile",
    set_classification: bool = False,
    color_list: Optional[List[dict]] = None,
    crs: Optional[str] = None,
) -> dict:
    """Convert WKT-polygon annotations into GeoJSON (reference: :148-190)."""
    del crs
    probs = df[prob_cols].to_numpy(dtype=np.float32, copy=False)
    idx = probs.argmax(axis=1)
    names = _class_names(prob_cols, prefix)
    if color_list is None:
        color_list = _make_distinct_colors(len(prob_cols))

    other_cols = [c for c in df.columns if c != "polygon_wkt"]
    features = []
    wkts = df["polygon_wkt"].tolist()
    for i in range(len(df)):
        props: dict = {}
        for c in other_cols:
            v = df.iloc[i][c]
            props[c] = v.item() if hasattr(v, "item") else v
        props["objectType"] = object_type
        if set_classification:
            props["classification"] = {
                "name": names[int(idx[i])],
                "color": list(color_list[int(idx[i])]["rgb"]),
            }
        props["measurements"] = dict(zip(prob_cols, map(float, probs[i])))
        props["isLocked"] = True
        features.append(
            {
                "type": "Feature",
                "geometry": wkt_to_geojson_geometry(wkts[i]),
                "properties": props,
            }
        )
    return {"type": "FeatureCollection", "features": features}


def _build_geojson_dict_from_csv(
    csv: PathLike,
    *,
    overlap: float,
    results_dir: PathLike,
    output_dir: PathLike,
    prefix: str = "prob",
    object_type: str = "tile",
    set_classification: bool = False,
    annotation_shape: str = "box",
    usecols: Optional[List[str]] = None,
    dtype: Optional[Dict] = None,
) -> Tuple[PathLike, dict]:
    """Load a model-output CSV and build the GeoJSON dict plus destination."""
    local = csv.materialize() if isinstance(csv, URIPath) else csv
    df = pd.read_csv(local, usecols=usecols, dtype=dtype, engine="c", low_memory=False)

    prob_cols = [c for c in df.columns if c.startswith(f"{prefix}_")]
    if not prob_cols:
        raise KeyError(f"No {prefix}_* columns in {csv}")

    color_list = _make_distinct_colors(len(prob_cols))

    if annotation_shape == "box":
        geojson = _dataframe_to_geojson_box_fast(
            df,
            prob_cols,
            overlap,
            prefix=prefix,
            object_type=object_type,
            set_classification=set_classification,
            color_list=color_list,
        )
    else:
        if "polygon_wkt" not in df.columns:
            raise KeyError("polygon_wkt column is required for annotation_shape='polygon'")
        geojson = _dataframe_to_geojson_polygon_fast(
            df,
            prob_cols,
            prefix=prefix,
            object_type=object_type,
            set_classification=set_classification,
            color_list=color_list,
        )

    out_path = results_dir / output_dir / f"{csv.stem}.geojson"
    return out_path, geojson


_iter_files = iter_files


def _write_geojson_bytes(out_path: PathLike, payload: bytes, atomic: bool = True) -> None:
    """Write GeoJSON bytes, atomically for local paths."""
    parent = out_path.parent
    parent.mkdir(parents=True, exist_ok=True)

    if isinstance(out_path, URIPath) and out_path.scheme is not None:
        with out_path.open("wb") as f:
            f.write(payload)
        return
    out_local = Path(str(out_path))
    if atomic:
        tmp = out_local.with_suffix(out_local.suffix + ".PART")
        with open(tmp, "wb", buffering=1 << 20) as f:
            f.write(payload)
        tmp.replace(out_local)
    else:
        with open(out_local, "wb", buffering=1 << 20) as f:
            f.write(payload)


def _worker(
    csv,
    overlap,
    results_dir,
    output_dir,
    prefix,
    object_type,
    set_classification,
    annotation_shape,
    usecols,
    dtype,
    atomic_writes,
):
    """Process one CSV and persist its GeoJSON."""
    out_path, geojson = _build_geojson_dict_from_csv(
        csv,
        overlap=overlap,
        results_dir=results_dir,
        output_dir=output_dir,
        prefix=prefix,
        object_type=object_type,
        set_classification=set_classification,
        annotation_shape=annotation_shape,
        usecols=usecols,
        dtype=dtype,
    )
    payload = _dumps(geojson)
    _write_geojson_bytes(out_path, payload, atomic=atomic_writes)


def write_geojsons(
    csvs: List[PathLike],
    *,
    results_dir: PathLike,
    overlap: float,
    output_dir: Path = Path("."),
    prefix: str = "prob",
    num_workers=8,
    object_type: str = "tile",
    set_classification: bool = False,
    annotation_shape: str = "box",
    atomic_writes: bool = True,
    usecols: Optional[List[str]] = None,
    dtype: Optional[Dict] = None,
    show_progress: bool = True,
    print_timings: bool = False,
) -> None:
    """Convert CSV outputs to GeoJSON concurrently."""
    if not results_dir.exists():
        raise FileExistsError(f"results_dir does not exist: {results_dir}")

    missing_dirs = sorted(
        {p.parent for p in csvs if not p.parent.exists()}, key=lambda x: str(x)
    )
    if missing_dirs:
        missing_str = ", ".join(str(d) for d in missing_dirs)
        raise FileExistsError(f"GeoJSON input CSV directory not found: {missing_str}")

    out_root = results_dir / output_dir
    out_root.mkdir(parents=True, exist_ok=True)

    already = {p.stem for p in _iter_files(out_root, suffix=".geojson")}
    csvs = [p for p in csvs if p.stem not in already]
    total = len(csvs)
    if total == 0:
        if print_timings:
            print("No new CSVs to process.")
        return

    pbar = tqdm(total=total, desc="Files completed", dynamic_ncols=True) if show_progress else None
    # Governor: clamp the static request by host headroom (the reference
    # governs this pool too, write_geojson.py:459).
    from ..utils.workers import governed_workers

    num_workers = governed_workers(num_workers)
    # spawn: forking after JAX initialization can deadlock worker processes
    with ProcessPoolExecutor(max_workers=num_workers, mp_context=multiprocessing.get_context("spawn")) as ex:
        futures = [
            ex.submit(
                _worker,
                args,
                overlap,
                results_dir,
                output_dir,
                prefix,
                object_type,
                set_classification,
                annotation_shape,
                usecols,
                dtype,
                atomic_writes,
            )
            for args in csvs
        ]
        for f in as_completed(futures):
            f.result()
            if pbar:
                pbar.update(1)
    if pbar:
        pbar.close()
