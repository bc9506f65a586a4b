"""Geometry/graph/statistics helpers for spatial analytics.

Re-creation of the reference toolkit (reference:
wsinsight/insightlib/insight_helpers.py:13-1020) with the per-cell BFS hot
loops replaced by sparse-matrix algebra:

* k-hop reachability = boolean sparse power of (A + I) — one matmul per hop
  instead of one BFS per cell (reference: insight_helpers.py:180-233),
* enrichment index / region enrichment / border detection / distance-to-border
  all become sparse matvecs and frontier sweeps.

Outputs (column names, semantics, H-plot/metric math) match the reference.
The reference's per-iteration overwrite of is_base_type/is_target_type — which
made only the LAST listed type count (SURVEY.md §2.11) — is fixed by OR-ing
across the list.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List

import numpy as np
import pandas as pd
from scipy import sparse
from scipy.spatial import Delaunay


def compute_cell_center_points(model_output_df: pd.DataFrame) -> pd.DataFrame:
    """Add integer center_x/center_y columns (reference: insight_helpers.py:13-29)."""
    if "center_x" not in model_output_df.columns or "center_y" not in model_output_df.columns:
        model_output_df["center_x"] = np.rint(
            model_output_df["minx"] + (model_output_df["width"] / 2)
        ).astype(np.int32)
        model_output_df["center_y"] = np.rint(
            model_output_df["miny"] + (model_output_df["height"] / 2)
        ).astype(np.int32)
    return model_output_df


def delaunay_triangulation(point2d_ary: np.ndarray, max_edge_length: float) -> pd.DataFrame:
    """Delaunay edges filtered by length -> DataFrame[source, target, length]
    (reference: insight_helpers.py:32-70), vectorized over simplices."""
    tri = Delaunay(point2d_ary)
    simplices = tri.simplices
    edges = np.concatenate(
        [simplices[:, [0, 1]], simplices[:, [0, 2]], simplices[:, [1, 2]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    edges = np.unique(edges, axis=0)
    p1 = point2d_ary[edges[:, 0]]
    p2 = point2d_ary[edges[:, 1]]
    lengths = np.linalg.norm(p1 - p2, axis=1)
    keep = lengths < max_edge_length
    return pd.DataFrame(
        {"source": edges[keep, 0], "target": edges[keep, 1], "length": lengths[keep]}
    )


def edges_to_csr(edges_df: pd.DataFrame, n_nodes: int) -> sparse.csr_matrix:
    """Symmetric boolean adjacency (no self loops)."""
    if len(edges_df) == 0:
        return sparse.csr_matrix((n_nodes, n_nodes), dtype=bool)
    src = edges_df["source"].to_numpy(np.int64)
    dst = edges_df["target"].to_numpy(np.int64)
    data = np.ones(2 * len(src), dtype=bool)
    a = sparse.coo_matrix(
        (data, (np.concatenate([src, dst]), np.concatenate([dst, src]))),
        shape=(n_nodes, n_nodes),
    ).tocsr()
    a.data[:] = True
    return a


def create_adjacency_list_fast(edges_df: pd.DataFrame, **_kwargs) -> Dict[int, List[int]]:
    """{node: [neighbors...]} (reference: insight_helpers.py:126-177)."""
    if len(edges_df) == 0:
        return {}
    u = edges_df["source"].to_numpy(np.int64)
    v = edges_df["target"].to_numpy(np.int64)
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    order = np.argsort(src, kind="mergesort")
    src_sorted, dst_sorted = src[order], dst[order]
    split_points = np.flatnonzero(np.diff(src_sorted)) + 1
    groups = np.split(dst_sorted, split_points)
    keys = src_sorted[np.r_[0, split_points]]
    return {int(k): g.tolist() for k, g in zip(keys, groups)}


def k_hop_reachability(adj: sparse.csr_matrix, k: int) -> sparse.csr_matrix:
    """Boolean (A + I)^k: rows = k-hop closed neighborhoods (incl. self)."""
    n = adj.shape[0]
    reach = (adj + sparse.identity(n, dtype=bool, format="csr")).astype(bool)
    base = reach.copy()
    for _ in range(k - 1):
        reach = (reach @ base).astype(bool)
    return reach.tocsr()


def k_hop_neighbors(nodes_df: pd.DataFrame, adjacency_list: Dict[int, List[int]], k: int):
    """Sorted k-hop closed neighborhoods per node (API-compat; sparse inside)."""
    n = len(nodes_df)
    rows, cols = [], []
    for node, neigh in adjacency_list.items():
        rows.extend([node] * len(neigh))
        cols.extend(neigh)
    a = sparse.coo_matrix(
        (np.ones(len(rows), bool), (rows, cols)), shape=(n, n)
    ).tocsr()
    reach = k_hop_reachability(a, k)
    out = []
    indptr, indices = reach.indptr, reach.indices
    for i in range(n):
        out.append(sorted(indices[indptr[i] : indptr[i + 1]].tolist()))
    return out


def compute_enrichment_index(
    nodes_df: pd.DataFrame,
    reach: sparse.csr_matrix | list,
    target_col: str = "is_target_type",
    base_col: str = "is_base_type",
    eps: float = 1e-6,
    max_workers: int | None = None,
) -> pd.DataFrame:
    """Per-cell enrichment T^2/(T+B+eps) over the k-hop neighborhood
    (reference: insight_helpers.py:321-408), as three sparse matvecs."""
    del max_workers
    reach = _as_reach(reach, len(nodes_df))
    n = np.asarray(reach.sum(axis=1)).ravel().astype(np.float64)
    t_cnt = reach @ nodes_df[target_col].to_numpy(bool).astype(np.float64)
    b_cnt = reach @ nodes_df[base_col].to_numpy(bool).astype(np.float64)
    safe_n = np.where(n > 0, n, 1.0)
    t = t_cnt / safe_n
    b = b_cnt / safe_n
    value = t * t / (t + b + eps)
    value[n == 0] = 0.0
    nodes_df["hplot_enrichment_index"] = value
    return nodes_df


def _as_reach(reach, n_nodes: int) -> sparse.csr_matrix:
    if sparse.issparse(reach):
        return reach
    rows, cols = [], []
    for i, neigh in enumerate(reach):
        rows.extend([i] * len(neigh))
        cols.extend(neigh)
    return sparse.coo_matrix(
        (np.ones(len(rows), bool), (rows, cols)), shape=(n_nodes, n_nodes)
    ).tocsr()


def identify_region_by_cell_function_enrichment(
    reach: sparse.csr_matrix | list,
    model_output_df: pd.DataFrame,
    N: int,
    R: float,
    max_workers: int | None = None,
) -> pd.DataFrame:
    """is_base_region: >=N k-hop neighbors and base ratio >= R
    (reference: insight_helpers.py:467-531)."""
    del max_workers
    reach = _as_reach(reach, len(model_output_df))
    n = np.asarray(reach.sum(axis=1)).ravel().astype(np.float64)
    b_cnt = reach @ model_output_df["is_base_type"].to_numpy(bool).astype(np.float64)
    ratio = np.divide(b_cnt, n, out=np.zeros_like(b_cnt), where=n > 0)
    model_output_df["is_base_region"] = (n >= N) & (ratio >= R)
    return model_output_df


def identify_border_cells(
    model_output_df: pd.DataFrame,
    adj: sparse.csr_matrix | Dict[int, List[int]],
    max_workers: int | None = None,
) -> pd.DataFrame:
    """is_base_border: base-region cell with a 1-hop non-base-region neighbor
    (reference: insight_helpers.py:571-643)."""
    del max_workers
    if not sparse.issparse(adj):
        adj = _adj_dict_to_csr(adj, len(model_output_df))
    base = model_output_df["is_base_region"].to_numpy(bool)
    non_base_neighbors = adj @ (~base).astype(np.float64)
    model_output_df["is_base_border"] = base & (non_base_neighbors > 0)
    return model_output_df


def _adj_dict_to_csr(adj: Dict[int, List[int]], n: int) -> sparse.csr_matrix:
    rows, cols = [], []
    for node, neigh in adj.items():
        rows.extend([node] * len(neigh))
        cols.extend(neigh)
    return sparse.coo_matrix((np.ones(len(rows), bool), (rows, cols)), shape=(n, n)).tocsr()


def calculate_distance_to_border(
    model_output_df: pd.DataFrame, adj: sparse.csr_matrix | Dict[int, List[int]]
) -> pd.DataFrame:
    """Multi-source BFS hop distance from border cells; negative inside the
    base region (reference: insight_helpers.py:670-709). Frontier sweep over
    the sparse adjacency instead of a Python deque."""
    n = len(model_output_df)
    if not sparse.issparse(adj):
        adj = _adj_dict_to_csr(adj, n)
    dist = np.full(n, np.inf)
    frontier = model_output_df["is_base_border"].to_numpy(bool).copy()
    d = 0
    while frontier.any():
        dist[frontier] = d
        reached = (adj @ frontier.astype(np.float64)) > 0
        frontier = reached & np.isinf(dist)
        d += 1
    model_output_df["distance_to_border"] = dist
    signed = dist.copy()
    signed[model_output_df["is_base_region"].to_numpy(bool)] *= -1
    signed[~np.isfinite(signed)] = np.nan
    model_output_df["hplot_signed_distance_to_border"] = signed
    return model_output_df


def compute_hplot(df_with_distances: pd.DataFrame, filtered_edges_df: pd.DataFrame) -> pd.DataFrame:
    """Per-layer base/target proportions + cumulative physical distance
    (reference: insight_helpers.py:712-812). The O(layers x edges) loop is
    replaced by one groupby over edge layer pairs."""
    d = df_with_distances.dropna(subset=["hplot_signed_distance_to_border"])
    base_prop = d.groupby("hplot_signed_distance_to_border")["is_base_type"].mean()
    target_prop = d.groupby("hplot_signed_distance_to_border")["is_target_type"].mean()

    unique_distances = sorted(d["hplot_signed_distance_to_border"].unique())
    layer_of = df_with_distances["hplot_signed_distance_to_border"]

    # Average edge length between adjacent layers, keyed by the lower layer.
    if len(filtered_edges_df):
        src_layer = layer_of.reindex(filtered_edges_df["source"]).to_numpy()
        dst_layer = layer_of.reindex(filtered_edges_df["target"]).to_numpy()
        lo = np.minimum(src_layer, dst_layer)
        hi = np.maximum(src_layer, dst_layer)
        lengths = filtered_edges_df["length"].to_numpy()
        rank = {v: i for i, v in enumerate(unique_distances)}
        mask = np.isfinite(lo) & np.isfinite(hi)
        adjacent = np.zeros(len(lo), bool)
        for i in np.flatnonzero(mask):
            ri, rj = rank.get(lo[i]), rank.get(hi[i])
            if ri is not None and rj is not None and rj == ri + 1:
                adjacent[i] = True
        pairs = pd.DataFrame({"lo": lo[adjacent], "length": lengths[adjacent]})
        avg_between = pairs.groupby("lo")["length"].mean().to_dict()
    else:
        avg_between = {}
    average_edge_length_between_layers = {
        unique_distances[i]: avg_between.get(unique_distances[i], np.nan)
        for i in range(len(unique_distances) - 1)
    }

    cumulative = {0.0: 0.0}
    current = 0.0
    for sd in sorted(unique_distances):
        if sd > 0:
            prev = unique_distances[unique_distances.index(sd) - 1]
            if prev in average_edge_length_between_layers and np.isfinite(
                average_edge_length_between_layers[prev]
            ):
                current += average_edge_length_between_layers[prev]
                cumulative[sd] = current
            else:
                cumulative[sd] = np.nan
    current = 0.0
    for sd in sorted(unique_distances, reverse=True):
        if sd < 0:
            if sd in average_edge_length_between_layers and np.isfinite(
                average_edge_length_between_layers[sd]
            ):
                current -= average_edge_length_between_layers[sd]
                cumulative[sd] = current
            else:
                cumulative[sd] = np.nan

    plot_df = pd.DataFrame(
        {
            "layer": target_prop.index,
            "base_type_prop": base_prop.values,
            "target_type_prop": target_prop.values,
        }
    )
    plot_df["distance"] = plot_df["layer"].map(pd.Series(cumulative))
    plot_df = plot_df.dropna(subset=["distance"])
    return plot_df.sort_values("layer")


# ----------------------------------------------------------------------------
# H-metrics (faithful port of reference: insight_helpers.py:815-1020)
# ----------------------------------------------------------------------------


def _reindex_nearest(series: pd.Series, target_levels: Iterable[int]) -> pd.Series:
    target_levels = list(target_levels)
    if series.empty:
        return pd.Series([np.nan] * len(target_levels), index=target_levels, dtype=float)
    s = series.sort_index()
    return s.reindex(target_levels, method="nearest").astype(float)


def _depth_weights(levels, mode, s, range_min, range_max, side) -> pd.Series:
    levels = list(levels)
    if not levels:
        return pd.Series(dtype=float)
    mode = (mode or "linear").lower()
    lv = np.asarray(levels, dtype=float)
    if mode == "sigmoid":
        w = 1.0 - 1.0 / (1.0 + np.exp(-s * lv))
        return pd.Series(np.clip(w, 0.0, 1.0), index=levels, dtype=float)
    if side == "inside":
        denom = max(abs(int(range_min)), 1)
        w = np.clip(np.abs(lv) / denom, 0.0, 1.0)
    else:
        denom = float(max(int(range_max), 1))
        w = np.clip(1.0 - (lv / denom), 0.0, 1.0)
    return pd.Series(w, index=levels, dtype=float)


def _center_of_mass(values: pd.Series, coords: pd.Series) -> float:
    v = np.asarray(values.values, dtype=float)
    x = np.asarray(coords.values, dtype=float)
    m = np.isfinite(v) & np.isfinite(x) & (v > 0)
    if not np.any(m):
        return np.nan
    v, x = v[m], x[m]
    return float(np.sum(v * x) / np.sum(v))


def _safe_mean(series: pd.Series) -> float:
    if series is None or len(series) == 0:
        return 0.0
    return float(np.nanmean(series.values))


def _weighted_mean(numer: pd.Series, denom: pd.Series) -> float:
    nv = np.asarray(numer.values, dtype=float)
    dv = np.asarray(denom.values, dtype=float)
    m = np.isfinite(nv) & np.isfinite(dv) & (dv > 0)
    if not np.any(m):
        return 0.0
    return float(np.sum(nv[m]) / np.sum(dv[m]))


def compute_hmetrics(
    hplot_df: pd.DataFrame,
    range_min: int | None,
    range_max: int | None,
    hplot_samples_with_valid_range_only: bool = False,
    depth_weight_mode: str = "linear",
    s: float = 6.0,
) -> Dict[str, Any]:
    """Intra/peri convergence, abundance, penetration/proximity, and
    enrichment indices across border layers."""
    df_work = hplot_df
    if hplot_samples_with_valid_range_only and ("id" in hplot_df.columns):
        layer_clean = pd.to_numeric(hplot_df["layer"], errors="coerce")
        img_layer = pd.concat(
            [hplot_df["id"], layer_clean.rename("layer")], axis=1
        ).dropna(subset=["id", "layer"])
        img_layer["layer"] = img_layer["layer"].astype(int)
        if not img_layer.empty:
            per_img = img_layer.groupby("id")["layer"].agg(["min", "max"]).astype(int)
            valid_mask = (per_img["min"] <= range_min) & (per_img["max"] >= range_max)
            df_work = hplot_df[hplot_df["id"].isin(per_img.index[valid_mask])].copy()
        else:
            df_work = hplot_df.iloc[0:0].copy()

    for col in ("layer", "target_type_prop", "base_type_prop", "distance"):
        if col not in df_work.columns:
            raise KeyError(f"missing required column '{col}'")

    layer = pd.to_numeric(df_work["layer"], errors="coerce").astype("Int64")
    target_prop = pd.to_numeric(df_work["target_type_prop"], errors="coerce").clip(0.0, 1.0)
    tumor_prop = pd.to_numeric(df_work["base_type_prop"], errors="coerce").clip(0.0, 1.0)
    distance = pd.to_numeric(df_work["distance"], errors="coerce")

    m = layer.notna() & target_prop.notna() & tumor_prop.notna() & distance.notna()
    layer, target_prop, tumor_prop, distance = (
        layer[m].astype(int), target_prop[m], tumor_prop[m], distance[m],
    )

    if len(layer) == 0 or range_max is None or range_min is None:
        empty_side = {
            "convergence_distance": 0.0,
            "abundance_score": 0.0,
            "layerwise_enrichment_index": 0.0,
            "global_enrichment_index": np.nan,
            "weighted_global_enrichment_index": 0.0,
        }
        return {
            "valid": False,
            "intra": {**empty_side, "penetration_score": 0.0},
            "peri": {**empty_side, "proximity_score": 0.0},
        }

    obs_min, obs_max = int(layer.min()), int(layer.max())
    valid = (range_min >= obs_min) and (range_max <= obs_max)

    target_by_layer = target_prop.groupby(layer).mean()
    tumor_by_layer = tumor_prop.groupby(layer).mean()
    dist_by_layer = distance.groupby(layer).mean()

    inside_levels = list(range(0, range_min - 1, -1))
    outside_levels = list(range(1, range_max + 1))

    target_intra = _reindex_nearest(target_by_layer[target_by_layer.index <= 0], inside_levels).clip(0.0, 1.0)
    target_peri = _reindex_nearest(target_by_layer[target_by_layer.index >= 1], outside_levels).clip(0.0, 1.0)
    tumor_intra = _reindex_nearest(tumor_by_layer[tumor_by_layer.index <= 0], inside_levels).clip(0.0, 1.0)
    tumor_peri = _reindex_nearest(tumor_by_layer[tumor_by_layer.index >= 1], outside_levels).clip(0.0, 1.0)
    dist_intra = _reindex_nearest(dist_by_layer[dist_by_layer.index <= 0], inside_levels)
    dist_peri = _reindex_nearest(dist_by_layer[dist_by_layer.index >= 1], outside_levels)

    p_intra, p_peri = target_intra, target_peri
    abundance_intra = _safe_mean(p_intra)
    abundance_peri = _safe_mean(p_peri)

    total_p_out = float(np.nansum(p_peri.values))
    if total_p_out > 0 and len(dist_peri) > 0:
        com_out = _center_of_mass(p_peri, dist_peri)
        d_out_max = float(np.nanmax(dist_peri.values)) or 0.0
        proximity_peri = (
            float(np.clip(1.0 - (com_out / d_out_max), 0.0, 1.0)) if d_out_max > 0 else 1.0
        )
        convergence_distance_out = float(com_out)
    else:
        proximity_peri = 0.0
        convergence_distance_out = float(np.nanmax(dist_peri.values)) if len(dist_peri) else 0.0

    depth_intra_mag = (-dist_intra).clip(lower=0.0)
    p_intra_neg = p_intra[p_intra.index < 0]
    depth_intra_neg = depth_intra_mag.reindex(p_intra_neg.index)
    if len(p_intra_neg) and float(np.nansum(p_intra_neg.values)) > 0.0:
        com_in_mag = _center_of_mass(p_intra_neg, depth_intra_neg)
        convergence_distance_intra = -float(com_in_mag)
    else:
        convergence_distance_intra = 0.0

    max_depth = max(abs(int(range_min)), 1)
    if len(p_intra) and float(np.nansum(p_intra.values)) > 0.0:
        all_depths = pd.Series([abs(lv) for lv in inside_levels], index=inside_levels, dtype=float)
        mean_depth = float(np.nansum((all_depths * p_intra).values) / np.nansum(p_intra.values))
        penetration_intra = float(np.clip(mean_depth / max_depth, 0.0, 1.0))
    else:
        penetration_intra = 0.0

    eps = 1e-6
    r_intra = (target_intra / (target_intra + tumor_intra + eps)).clip(0.0, 1.0)
    r_peri = (target_peri / (target_peri + tumor_peri + eps)).clip(0.0, 1.0)
    valid_intra = (target_intra + tumor_intra) > 0
    valid_peri = (target_peri + tumor_peri) > 0

    w_depth_intra = _depth_weights(inside_levels, depth_weight_mode, s, range_min, range_max, "inside")
    w_depth_peri = _depth_weights(outside_levels, depth_weight_mode, s, range_min, range_max, "outside")

    w_intra = (p_intra * w_depth_intra).where(valid_intra, np.nan)
    w_peri = (p_peri * w_depth_peri).where(valid_peri, np.nan)
    num_intra = (r_intra * w_intra).where(valid_intra, np.nan)
    num_peri = (r_peri * w_peri).where(valid_peri, np.nan)

    layerwise_enrichment_intra = _weighted_mean(num_intra, w_intra)
    layerwise_enrichment_peri = _weighted_mean(num_peri, w_peri)

    target_intra_mean = _safe_mean(target_intra)
    tumor_intra_mean = _safe_mean(tumor_intra)
    target_peri_mean = _safe_mean(target_peri)
    tumor_peri_mean = _safe_mean(tumor_peri)

    global_enrichment_intra = float(target_intra_mean / (target_intra_mean + tumor_intra_mean + eps))
    global_enrichment_peri = float(target_peri_mean / (target_peri_mean + tumor_peri_mean + eps))

    return {
        "valid": valid,
        "intra": {
            "convergence_distance": convergence_distance_intra,
            "abundance_score": abundance_intra,
            "penetration_score": penetration_intra,
            "layerwise_enrichment_index": layerwise_enrichment_intra,
            "global_enrichment_index": global_enrichment_intra,
            "weighted_global_enrichment_index": penetration_intra * global_enrichment_intra,
        },
        "peri": {
            "convergence_distance": convergence_distance_out,
            "abundance_score": abundance_peri,
            "proximity_score": proximity_peri,
            "layerwise_enrichment_index": layerwise_enrichment_peri,
            "global_enrichment_index": global_enrichment_peri,
            "weighted_global_enrichment_index": proximity_peri * global_enrichment_peri,
        },
    }
