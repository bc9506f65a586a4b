"""H-Plot tumor-border analytics: per-slide layers + cohort metrics.

Re-creation of the reference pipeline (reference:
wsinsight/insightlib/hplot_generation.py:29-331) with SURVEY.md §2.11 fixes:

* is_base_type / is_target_type OR across the type lists (the reference's loop
  overwrote per iteration, so only the last type counted),
* works with an explicit slide list (the reference required wsi_dir and
  crashed when infer passed None).
"""

from __future__ import annotations

import json
import logging
import multiprocessing
from concurrent.futures import ProcessPoolExecutor, as_completed
from pathlib import Path
from typing import List

import numpy as np
import pandas as pd
from tqdm import tqdm

from .. import errors

logger = logging.getLogger(__name__)
from ..uri_path import URIPath
from ..wsi import _validate_wsi_directory, get_avg_mpp
from .helpers import (
    calculate_distance_to_border,
    compute_cell_center_points,
    compute_enrichment_index,
    compute_hmetrics,
    compute_hplot,
    delaunay_triangulation,
    edges_to_csr,
    identify_border_cells,
    identify_region_by_cell_function_enrichment,
    k_hop_reachability,
)

HMETRIC_COLUMNS = [
    "id",
    "valid",
    "convergence_distance (intra)",
    "abundance_score (intra)",
    "penetration_score (intra)",
    "layerwise_enrichment_index (intra)",
    "global_enrichment_index (intra)",
    "weighted_global_enrichment_index (intra)",
    "convergence_distance (peri)",
    "abundance_score (peri)",
    "proximity_score (peri)",
    "layerwise_enrichment_index (peri)",
    "global_enrichment_index (peri)",
    "weighted_global_enrichment_index (peri)",
    "exclusion_index",
    "desert_index",
    "inflammation_index",
    "layerwise_enrichment_index",
    "global_enrichment_index",
    "weighted_global_enrichment_index",
]


def _worker(
    wsi_path_str: str,
    model_output_csv_str: str,
    insight_dir_str: str,
    max_neighbor_distance_um: float,
    base_type_list: List[str],
    target_type_list: List[str],
    hplot_k: int,
    hplot_N: int,
    hplot_R: float,
    range_min: int | None,
    range_max: int | None,
    samples_with_valid_range_only: bool,
):
    """Per-slide worker: graph build -> layers -> H-plot -> metrics."""
    wsi_path = URIPath(wsi_path_str)
    insight_dir = Path(insight_dir_str)
    stem = wsi_path.stem
    hplot_csv = insight_dir / "hplots" / f"{stem}.csv"
    hmetric_json = insight_dir / "hmetrics" / f"{stem}.json"
    cells_csv = insight_dir / "cells" / f"{stem}.csv"

    # Resume: reuse per-slide artifacts (reference: hplot_generation.py:40-46).
    if cells_csv.exists() and hplot_csv.exists() and hmetric_json.exists():
        hplot_df = pd.read_csv(hplot_csv)
        with open(hmetric_json, "r", encoding="utf-8") as f:
            hmetric_dict = json.load(f)
        return stem, hplot_df, hmetric_dict

    try:
        mpp = get_avg_mpp(wsi_path)
    except Exception:
        return stem, None, None
    max_neighbor_distance_px = max_neighbor_distance_um / mpp

    try:
        nodes_df = pd.read_csv(model_output_csv_str)
    except Exception:
        return stem, None, None

    prob_columns = [c for c in nodes_df.columns if c.startswith("prob_")]
    argmax_col = nodes_df[prob_columns].idxmax(axis=1)
    nodes_df["is_base_type"] = argmax_col.isin([f"prob_{bt}" for bt in base_type_list])
    nodes_df["is_target_type"] = argmax_col.isin([f"prob_{tt}" for tt in target_type_list])

    nodes_df = compute_cell_center_points(nodes_df)
    if len(nodes_df) < 4:
        return stem, None, None
    edges_df = delaunay_triangulation(
        nodes_df[["center_x", "center_y"]].values, max_neighbor_distance_px
    )
    if "source" not in edges_df.columns or "target" not in edges_df.columns:
        return stem, None, None

    adj = edges_to_csr(edges_df, len(nodes_df))
    reach = k_hop_reachability(adj, hplot_k)

    nodes_df = compute_enrichment_index(nodes_df, reach)
    nodes_df = identify_region_by_cell_function_enrichment(reach, nodes_df, hplot_N, hplot_R)
    nodes_df = identify_border_cells(nodes_df, adj)
    nodes_df = calculate_distance_to_border(nodes_df, adj)

    cells_csv.parent.mkdir(parents=True, exist_ok=True)
    nodes_df.to_csv(cells_csv, index=False)

    hplot_df = compute_hplot(nodes_df, edges_df)
    hplot_csv.parent.mkdir(parents=True, exist_ok=True)
    hplot_df.to_csv(hplot_csv, index=False)

    hmetric_dict = compute_hmetrics(
        hplot_df=hplot_df,
        range_min=range_min,
        range_max=range_max,
        hplot_samples_with_valid_range_only=samples_with_valid_range_only,
    )
    hmetric_json.parent.mkdir(parents=True, exist_ok=True)
    with open(hmetric_json, "w") as f:
        json.dump(hmetric_dict, f, indent=2)

    return stem, hplot_df, hmetric_dict


def upsert_by_key(df_old: pd.DataFrame, df_new: pd.DataFrame, key: str) -> pd.DataFrame:
    """Update/insert rows by unique key; new wins (reference:
    hplot_generation.py:101-138)."""
    if key not in df_old.columns or key not in df_new.columns:
        raise KeyError(f"Key column '{key}' must exist in both DataFrames.")
    cols = list(df_old.columns)
    new_aligned = df_new.reindex(columns=cols)
    new_dedup = new_aligned.drop_duplicates(subset=[key], keep="last")
    old_idx = df_old.set_index(key).copy()
    new_idx = new_dedup.set_index(key)
    common = old_idx.index.intersection(new_idx.index)
    if len(common):
        old_idx.loc[common] = new_idx.loc[common]
    new_only = new_idx.index.difference(old_idx.index)
    if len(new_only):
        old_idx = pd.concat([old_idx, new_idx.loc[new_only]], axis=0)
    return old_idx.reset_index()


def hplot_generation(
    wsi_dir=None,
    wsi_paths=None,
    results_dir=None,
    base_type_list: List[str] | None = None,
    target_type_list: List[str] | None = None,
    max_neighbor_distance_um: float = 25.0,
    hplot_k: int = 2,
    hplot_N: int = 8,
    hplot_R: float = 0.5,
    hplot_range_max: int | None = None,
    hplot_range_min: int | None = None,
    hplot_samples_with_valid_range_only: bool = False,
    num_workers: int = 8,
) -> list[str]:
    """Compute per-slide H-Plot layers/metrics and the cohort aggregates."""
    if wsi_paths is None:
        if wsi_dir is None:
            raise errors.WholeSlideImageDirectoryNotFound(
                "hplot_generation needs wsi_dir or wsi_paths"
            )
        wsi_dir = URIPath(wsi_dir)
        if not wsi_dir.exists():
            raise errors.WholeSlideImageDirectoryNotFound(f"directory not found: {wsi_dir}")
        _validate_wsi_directory(wsi_dir)
        wsi_paths = [p for p in wsi_dir.iterdir() if p.is_file()]
    wsi_paths = [URIPath(p) for p in wsi_paths]
    if not wsi_paths:
        raise errors.WholeSlideImagesNotFound(str(wsi_dir))

    results_dir = URIPath(results_dir)
    if not results_dir.exists():
        raise errors.ResultsDirectoryNotFound(str(results_dir))
    model_output_dir = results_dir / "model-outputs-csv"
    if not model_output_dir.exists():
        raise errors.ResultsDirectoryNotFound(
            "The 'model-outputs-csv' directory was not found in results directory."
        )

    hplot_dir = results_dir / "hplot-outputs-csv"
    for sub in ("", "hplots", "hmetrics", "cells"):
        (hplot_dir / sub if sub else hplot_dir).mkdir(exist_ok=True, parents=True)

    hplot_hplots_csv = results_dir / "hplot-outputs.csv"
    hplot_hmetrics_csv = results_dir / "hmetrics-outputs.csv"

    failed_generation: list[str] = []
    hplot_rows: list[list] = []
    hmetric_rows: list[list] = []

    jobs = []
    for wsi_path in wsi_paths:
        model_output_csv = model_output_dir / f"{wsi_path.stem}.csv"
        if not model_output_csv.exists():
            print(f"Skipping because model output not found: {model_output_csv}")
            continue
        jobs.append(
            (
                str(wsi_path),
                str(model_output_csv.materialize()),
                str(hplot_dir),
                max_neighbor_distance_um,
                list(base_type_list or []),
                list(target_type_list or []),
                hplot_k,
                hplot_N,
                hplot_R,
                hplot_range_min,
                hplot_range_max,
                hplot_samples_with_valid_range_only,
            )
        )

    ctx = multiprocessing.get_context("spawn")
    # Governor clamp, mirroring the reference's governed hplot pool
    # (num_worker_optimizer.py:74-165 via hplot_generation.py:257).
    from ..utils.workers import governed_workers

    num_workers = governed_workers(max(1, num_workers))
    with ProcessPoolExecutor(max_workers=num_workers, mp_context=ctx) as ex:
        futures = {ex.submit(_worker, *args): args[0] for args in jobs}
        pbar = tqdm(total=len(futures), desc="H-Plot")
        for f in as_completed(futures):
            try:
                image_id, df, hm = f.result()
            except Exception as err:
                # A degenerate slide (e.g. QhullError on collinear centers,
                # missing prob_* columns) must not abort the cohort — record
                # it and keep aggregating the slides that succeeded.
                image_id = Path(futures[f]).stem
                logger.error(f"H-plot worker failed for {image_id}: {err!r}")
                failed_generation.append(image_id)
                pbar.update(1)
                continue
            if df is None or hm is None:
                failed_generation.append(image_id)
                pbar.update(1)
                continue
            layers = pd.to_numeric(df["layer"], errors="coerce")
            layers = layers[np.isfinite(layers)]
            if not layers.empty:
                mn = int(np.floor(layers.min()))
                mx = int(np.ceil(layers.max()))
                layer_list = df["layer"].tolist()
                for layer in range(mn, mx + 1):
                    if layer in layer_list:
                        value = df[df["layer"] == layer]["target_type_prop"].values[0]
                        distance = df[df["layer"] == layer]["distance"].values[0]
                    else:
                        value = distance = np.nan
                    hplot_rows.append([image_id, layer, value, distance])
                hmetric_rows.append(
                    [
                        image_id,
                        hm["valid"],
                        hm["intra"]["convergence_distance"],
                        hm["intra"]["abundance_score"],
                        hm["intra"]["penetration_score"],
                        hm["intra"]["layerwise_enrichment_index"],
                        hm["intra"]["global_enrichment_index"],
                        hm["intra"]["weighted_global_enrichment_index"],
                        hm["peri"]["convergence_distance"],
                        hm["peri"]["abundance_score"],
                        hm["peri"]["proximity_score"],
                        hm["peri"]["layerwise_enrichment_index"],
                        hm["peri"]["global_enrichment_index"],
                        hm["peri"]["weighted_global_enrichment_index"],
                        hm["peri"]["abundance_score"]
                        / (1e-6 + hm["peri"]["abundance_score"] + hm["intra"]["abundance_score"]),
                        1 - 0.5 * (hm["intra"]["abundance_score"] + hm["peri"]["abundance_score"]),
                        0.5 * (hm["intra"]["abundance_score"] + hm["peri"]["abundance_score"]),
                        0.5
                        * (
                            hm["peri"]["layerwise_enrichment_index"]
                            + hm["intra"]["layerwise_enrichment_index"]
                        ),
                        0.5
                        * (
                            hm["intra"]["global_enrichment_index"]
                            + hm["peri"]["global_enrichment_index"]
                        ),
                        0.5
                        * (
                            hm["intra"]["weighted_global_enrichment_index"]
                            + hm["peri"]["weighted_global_enrichment_index"]
                        ),
                    ]
                )
            pbar.update(1)
        pbar.close()

    hplot_df = pd.DataFrame(hplot_rows, columns=["id", "layer", "value", "distance"])
    hmetrics_df = pd.DataFrame(hmetric_rows, columns=HMETRIC_COLUMNS)

    if hplot_hplots_csv.exists():
        # Multi-row-per-id table: replace all rows of re-processed ids (the
        # reference's single-key upsert silently dropped layers here).
        old = pd.read_csv(hplot_hplots_csv.materialize())
        old = old[~old["id"].isin(set(hplot_df["id"]))]
        hplot_df = pd.concat([old, hplot_df], ignore_index=True)
    with hplot_hplots_csv.open("w") as fh:
        hplot_df.to_csv(fh, index=False)

    if hplot_hmetrics_csv.exists():
        hmetrics_df = upsert_by_key(
            pd.read_csv(hplot_hmetrics_csv.materialize()), hmetrics_df, key="id"
        )
    with hplot_hmetrics_csv.open("w") as fh:
        hmetrics_df.to_csv(fh, index=False)

    return failed_generation
