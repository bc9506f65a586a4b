"""Segmentation + patch-planning pipeline for directories of slides.

Behavioral re-creation of the reference orchestrator (reference:
wsinsight/patchlib/pipeline.py:45-508) with its five coordinate-planning modes:

1. QuPath TSV detections -> centroid boxes (reference: pipeline.py:170-205)
2. QuPath GeoJSON detections -> centroids + polygons (reference: pipeline.py:207-259)
3. end2end cell models -> halo-overlapped grid (reference: pipeline.py:261-297)
4. StarDist pre-detection (reference: pipeline.py:299-355) — served by the flax
   StarDist port when available, else raises a clear error
5. default tissue grid with per-tile polygons + tile_dim (reference:
   pipeline.py:357-402)

Also fixes a latent reference defect: the patch stage now writes
``results_dir/wsi_list.csv`` which downstream QuPath pseudo-model branches read
but nothing in the reference produces (SURVEY.md §2.11).
"""

from __future__ import annotations

import json
import logging
from typing import List

import numpy as np
import numpy.typing as npt
import pandas as pd
from PIL import Image

from ..geometry import polygon_centroid
from ..uri_path import URIPath
from ..wsi import _validate_wsi_directory, get_avg_mpp, get_wsi_cls
from .io import draw_contours_on_thumbnail, extract_patches_from_slide, save_hdf5
from .patch import (
    get_multipolygon_from_binary_arr,
    get_object_coordinates_within_polygon,
    get_patch_coordinates_within_polygon,
)
from .segment import segment_tissue

logger = logging.getLogger(__name__)

MASKS_DIR = "masks"
PATCHES_DIR = "patches"


def _tile_dim_for_grid(
    slide_width: int, slide_height: int, half_patch_size: int, step_size: int
) -> npt.NDArray[np.int32]:
    """Grid dimensions implied by the centroid lattice (reference: pipeline.py:283-294)."""
    nx = len(range(half_patch_size, slide_width, step_size))
    ny = len(range(half_patch_size, slide_height, step_size))
    # Reference computes max((centroid - half)/step) + 1 over the full lattice,
    # which equals the lattice lengths.
    return np.array([nx - 1, ny - 1], dtype=np.int64).astype(np.int32) + 1


def _geojson_features(path: URIPath) -> list[dict]:
    data = json.loads(URIPath(path).read_text())
    if data.get("type") == "FeatureCollection":
        return data.get("features", [])
    if data.get("type") == "Feature":
        return [data]
    return []


def _feature_rings(geom: dict) -> list[np.ndarray]:
    """Exterior rings of a GeoJSON Polygon/MultiPolygon as float32 arrays."""
    gtype = geom.get("type")
    rings: list[np.ndarray] = []
    if gtype == "Polygon":
        coords = geom.get("coordinates") or []
        if coords:
            rings.append(np.asarray(coords[0], dtype=np.float32))
    elif gtype == "MultiPolygon":
        for poly in geom.get("coordinates") or []:
            if poly:
                rings.append(np.asarray(poly[0], dtype=np.float32))
    return rings


def segment_and_patch_one_slide(
    slide_path: URIPath,
    save_dir: URIPath,
    qupath_detection_dir: URIPath | None,
    qupath_geojson_detection_dir: URIPath | None,
    qupath_geojson_annotation_dir: URIPath | None,
    patch_size_px: int,
    patch_spacing_um_px: float,
    halo_size_px: int = 0,
    histoqc_dir: str | URIPath | None = None,
    thumbsize: tuple[int, int] = (2048, 2048),
    median_filter_size: int = 7,
    binary_threshold: int = 7,
    closing_kernel_size: int = 6,
    min_object_size_um2: float = 200**2,
    min_hole_size_um2: float = 190**2,
    overlap: float = 0.0,
    object_based: bool = False,
    object_detection: str | None = None,
    stardist_normalization_pmin: float = 1.0,
    stardist_normalization_pmax: float = 99.8,
    cache_image_patches: bool = False,
) -> None:
    """Plan patch coordinates in tissue for one slide and persist them."""
    slide_prefix = slide_path.stem
    logger.info(f"Segmenting and patching slide {slide_path}")

    patch_path = save_dir / PATCHES_DIR / f"{slide_prefix}.h5"
    mask_path = save_dir / MASKS_DIR / f"{slide_prefix}.jpg"

    if patch_path.exists() and mask_path.exists():
        logger.info("Patch output and mask output files already exist; skipping")
        return None

    slide = get_wsi_cls()(slide_path)
    mpp = get_avg_mpp(slide_path)
    logger.info(f"Slide has WxH {slide.dimensions} and MPP={mpp}")

    # patch_size = round(px * spacing / mpp) (reference: pipeline.py:96)
    patch_size = int(round(patch_size_px * patch_spacing_um_px / mpp))
    logger.info(f"Final patch size is {patch_size}")

    if len(thumbsize) != 2:
        raise ValueError(f"Length of 'thumbsize' must be 2 but got {len(thumbsize)}")
    thumb: Image.Image = slide.get_thumbnail(thumbsize)
    if thumb.mode != "RGB":
        thumb = thumb.convert("RGB")

    thumb_mpp = (mpp * (np.array(slide.dimensions) / thumb.size)).mean()
    thumb_mpp_squared: float = thumb_mpp**2
    min_object_size_px: int = round(min_object_size_um2 / thumb_mpp_squared)
    min_hole_size_px: int = round(min_hole_size_um2 / thumb_mpp_squared)

    if histoqc_dir:
        histoqc_dir = URIPath(histoqc_dir)
        histoqc_mask_use_file_path = (
            histoqc_dir / slide_path.name / f"{slide_path.name}_mask_use.png"
        )
        histoqc_mask_use = Image.open(histoqc_mask_use_file_path.materialize())
        thumb_ratio = min(
            thumbsize[0] / histoqc_mask_use.size[0],
            thumbsize[1] / histoqc_mask_use.size[1],
        )
        histoqc_thumb_size = (
            int(np.round(thumb_ratio * histoqc_mask_use.size[0])),
            int(np.round(thumb_ratio * histoqc_mask_use.size[1])),
        )
        histoqc_thumb = histoqc_mask_use.resize(histoqc_thumb_size, Image.Resampling.NEAREST)
        arr = np.array(np.asarray(histoqc_thumb), dtype=bool)
    else:
        arr = segment_tissue(
            np.asarray(thumb),
            median_filter_size=median_filter_size,
            binary_threshold=binary_threshold,
            closing_kernel_size=closing_kernel_size,
            min_object_size_px=min_object_size_px,
            min_hole_size_px=min_hole_size_px,
        )

    if not np.issubdtype(arr.dtype, np.bool_):
        raise TypeError(f"expected boolean segmentation array but got {arr.dtype}")

    scale: tuple[float, float] = (
        slide.dimensions[0] / thumb.size[0],
        slide.dimensions[1] / thumb.size[1],
    )
    _res = get_multipolygon_from_binary_arr(arr.astype("uint8") * 255, scale=scale)
    if _res is None:
        logger.warning(f"No tissue was found in slide {slide_path}")
        return None
    polygon, contours, hierarchy = _res

    polygons: List[np.ndarray] | None
    tile_dim: npt.NDArray[np.int32] | None

    if (
        object_based
        and qupath_detection_dir is not None
        and qupath_geojson_detection_dir is None
        and qupath_geojson_annotation_dir is None
    ):
        # Mode 1: QuPath TSV detections (reference: pipeline.py:170-205).
        patch_size = patch_size_px
        half_patch_size = round(patch_size / 2)
        slide_det = URIPath(qupath_detection_dir) / f"{slide_prefix}.txt"
        if not slide_det.exists():
            logger.info(f"Skipping because detection file not found: {slide_det}")
            coords = np.zeros((0, 2), dtype=np.int32)
            polygons = None
            tile_dim = None
        else:
            qpdet_df = pd.read_csv(slide_det.materialize(), delimiter="\t")
            xs = np.rint(qpdet_df["Centroid X µm"] / mpp - half_patch_size).astype(np.int32)
            ys = np.rint(qpdet_df["Centroid Y µm"] / mpp - half_patch_size).astype(np.int32)
            coords = np.column_stack([xs, ys])
            # Ring = the patch extent [x, x+2h) around the centroid. The
            # reference re-subtracts half from the already-top-left x/y
            # (pipeline.py:195-203), shifting every polygon half a patch off
            # its own box — a self-inconsistent-output defect we deliberately
            # do not reproduce (SURVEY.md §2.11 spirit).
            polygons = [
                np.asarray(
                    [
                        [x, y],
                        [x, y + 2 * half_patch_size],
                        [x + 2 * half_patch_size, y + 2 * half_patch_size],
                        [x + 2 * half_patch_size, y],
                        [x, y],
                    ],
                    dtype=np.float32,
                )
                for x, y in zip(xs, ys)
            ]
            tile_dim = None

    elif (
        object_based
        and qupath_detection_dir is None
        and qupath_geojson_detection_dir is not None
        and qupath_geojson_annotation_dir is None
    ):
        # Mode 2: QuPath GeoJSON detections (reference: pipeline.py:207-259).
        patch_size = patch_size_px
        half_patch_size = round(patch_size / 2)
        slide_geojson = URIPath(qupath_geojson_detection_dir) / f"{slide_prefix}.geojson"
        if not slide_geojson.exists():
            logger.info(f"Skipping because geojson file not found: {slide_geojson}")
            coords = np.zeros((0, 2), dtype=np.int32)
            polygons = None
            tile_dim = None
        else:
            feats = _geojson_features(slide_geojson)
            # Reference parity (pipeline.py:227-259): centroids are converted
            # to pixels but rings stay in the GeoJSON's native units, and
            # multi-part geometries are exploded — so /polygons rows do NOT
            # pair 1:1 with /coords rows in this mode. Consumers of this mode
            # (references-dir overlay) only use the coords.
            cxs, cys = [], []
            polygons = []
            for feat in feats:
                rings = _feature_rings(feat.get("geometry") or {})
                if not rings:
                    continue
                # centroid of the first exterior ring (geopandas centroid of the
                # geometry; multi-part geometries are exploded like the reference)
                cx, cy = polygon_centroid(rings[0].astype(np.float64))
                cxs.append(cx)
                cys.append(cy)
                polygons.extend(rings)
            if not polygons:
                return None
            x = np.asarray([c / mpp - half_patch_size for c in cxs]).round().astype(np.int32)
            y = np.asarray([c / mpp - half_patch_size for c in cys]).round().astype(np.int32)
            coords = np.column_stack([x, y])
            tile_dim = None

    elif (
        object_based
        and qupath_detection_dir is None
        and qupath_geojson_detection_dir is None
        and qupath_geojson_annotation_dir is None
        and object_detection == "end2end"
    ):
        # Mode 3: end2end cell models, halo-overlapped grid (reference: pipeline.py:261-297).
        slide_width, slide_height = slide.dimensions
        half_patch_size = round(patch_size / 2)
        overlap = 2 * halo_size_px / patch_size_px
        coords = get_patch_coordinates_within_polygon(
            slide_width=slide_width,
            slide_height=slide_height,
            patch_size=patch_size,
            half_patch_size=half_patch_size,
            polygon=polygon,
            overlap=overlap,
        )
        step_size = round((1 - overlap) * patch_size)
        tile_dim = _tile_dim_for_grid(slide_width, slide_height, half_patch_size, step_size)
        polygons = None
        logger.info(f"Found {len(coords)} patches within tissue")

    elif (
        object_based
        and qupath_detection_dir is None
        and qupath_geojson_detection_dir is None
        and qupath_geojson_annotation_dir is None
        and object_detection != "end2end"
    ):
        # Mode 4: StarDist pre-detection (reference: pipeline.py:299-355).
        from ..models.stardist import predict_nuclei_big

        # read_region_array is TpuSlide-only; tiffslide/openslide backends
        # return PIL (same guard as patchlib/io.py and engine/data.py)
        reader = getattr(slide, "read_region_array", None)
        if reader is not None:
            img = reader((0, 0), 0, slide.dimensions)
        else:
            img = np.asarray(slide.read_region((0, 0), 0, slide.dimensions))[:, :, :3]
        polys = predict_nuclei_big(
            img,
            pmin=stardist_normalization_pmin,
            pmax=stardist_normalization_pmax,
        )
        N = len(polys)
        object_centroids_arr = np.zeros((N, 2), dtype=np.int32)
        polygons = []
        for n, xy in enumerate(polys):
            if xy.shape[0] > 0 and not np.allclose(xy[0], xy[-1]):
                xy = np.vstack([xy, xy[0]])
            polygons.append(xy.astype(np.float32))
            cx, cy = polygon_centroid(xy.astype(np.float64))
            object_centroids_arr[n] = np.rint([cx, cy]).astype(np.int32)

        slide_width, slide_height = slide.dimensions
        half_patch_size = int(round(patch_size / 2))
        coords = get_object_coordinates_within_polygon(
            object_centroids_arr=object_centroids_arr,
            half_patch_size=half_patch_size,
            polygon=polygon,
        )
        tile_dim = None

    else:
        # Mode 5: default tissue grid (reference: pipeline.py:357-402).
        slide_width, slide_height = slide.dimensions
        half_patch_size = round(patch_size / 2)
        coords = get_patch_coordinates_within_polygon(
            slide_width=slide_width,
            slide_height=slide_height,
            patch_size=patch_size,
            half_patch_size=half_patch_size,
            polygon=polygon,
            overlap=overlap,
        )
        step_size = round((1 - overlap) * patch_size)
        tile_dim = _tile_dim_for_grid(slide_width, slide_height, half_patch_size, step_size)
        polygons = []
        for c in range(len(coords)):
            tile_minx, tile_miny = coords[c][0], coords[c][1]
            tile_maxx = tile_minx + patch_size - 1
            tile_maxy = tile_miny + patch_size - 1
            polygons.append(
                np.asarray(
                    [
                        [tile_minx, tile_miny],
                        [tile_maxx, tile_miny],
                        [tile_maxx, tile_maxy],
                        [tile_minx, tile_maxy],
                        [tile_minx, tile_miny],
                    ],
                    dtype=np.float32,
                )
            )
        logger.info(f"Found {len(coords)} patches within tissue")

    patch_path.parent.mkdir(exist_ok=True, parents=True)
    if coords.size > 0:
        images = (
            extract_patches_from_slide(slide, coords, patch_size)
            if cache_image_patches
            else None
        )
        slide_width, slide_height = slide.dimensions
        save_hdf5(
            path=patch_path,
            coords=coords,
            polygons=polygons,
            tile_dim=tile_dim,
            patch_size=patch_size,
            patch_spacing_um_px=patch_spacing_um_px,
            compression="gzip",
            images=images,
            slide_path=str(slide_path),
            slide_mpp=mpp,
            slide_width=slide_width,
            slide_height=slide_height,
        )
    else:
        logger.warning(f"No patches found for slide {slide_path}")

    logger.info(f"Writing tissue thumbnail with contours to disk: {mask_path}")
    mask_path.parent.mkdir(exist_ok=True, parents=True)
    img = draw_contours_on_thumbnail(thumb, contours=contours, hierarchy=hierarchy)
    img.thumbnail((1024, 1024), resample=Image.Resampling.LANCZOS)
    with mask_path.open("wb") as fh:
        img.save(fh, format="JPEG")
    return None


def segment_and_patch_directory_of_slides(
    wsi_dir: URIPath,
    slide_paths: List[URIPath],
    save_dir: URIPath,
    qupath_detection_dir: str | URIPath | None,
    qupath_geojson_detection_dir: str | URIPath | None,
    qupath_geojson_annotation_dir: str | URIPath | None,
    patch_size_px: int,
    patch_spacing_um_px: float,
    halo_size_px: int = 0,
    histoqc_dir: str | URIPath | None = None,
    thumbsize: tuple[int, int] = (2048, 2048),
    median_filter_size: int = 7,
    binary_threshold: int = 7,
    closing_kernel_size: int = 6,
    min_object_size_um2: float = 200**2,
    min_hole_size_um2: float = 190**2,
    overlap: float = 0.0,
    object_based: bool = False,
    object_detection: str | None = None,
    stardist_normalization_pmin: float = 1.0,
    stardist_normalization_pmax: float = 99.8,
    cache_image_patches: bool = False,
) -> None:
    """Batch segment and patch a directory of slides; per-slide failures logged
    and skipped (reference: pipeline.py:479-506)."""
    wsi_dir = URIPath(wsi_dir)
    _validate_wsi_directory(wsi_dir)

    # wsi_list.csv is the contract downstream QuPath pseudo-model branches read
    # (fixes SURVEY.md §2.11: the reference reads but never writes it).
    try:
        listing = pd.DataFrame({"wsi_path": [str(p) for p in slide_paths]})
        with (URIPath(save_dir) / "wsi_list.csv").open("w") as fh:
            listing.to_csv(fh, index=False)
    except Exception as err:  # non-fatal bookkeeping
        logger.warning(f"Could not write wsi_list.csv: {err}")

    for i, slide_path in enumerate(slide_paths):
        logger.info(f"Slide {i + 1} of {len(slide_paths)} ({(i + 1) / len(slide_paths):.2%})")
        try:
            segment_and_patch_one_slide(
                slide_path=slide_path,
                save_dir=save_dir,
                qupath_detection_dir=qupath_detection_dir,
                qupath_geojson_detection_dir=qupath_geojson_detection_dir,
                qupath_geojson_annotation_dir=qupath_geojson_annotation_dir,
                patch_size_px=patch_size_px,
                patch_spacing_um_px=patch_spacing_um_px,
                halo_size_px=halo_size_px,
                histoqc_dir=histoqc_dir,
                thumbsize=thumbsize,
                median_filter_size=median_filter_size,
                binary_threshold=binary_threshold,
                closing_kernel_size=closing_kernel_size,
                min_object_size_um2=min_object_size_um2,
                min_hole_size_um2=min_hole_size_um2,
                overlap=overlap,
                object_based=object_based,
                object_detection=object_detection,
                stardist_normalization_pmin=stardist_normalization_pmin,
                stardist_normalization_pmax=stardist_normalization_pmax,
                cache_image_patches=cache_image_patches,
            )
        except Exception as e:
            logger.error(f"Failed to segment and patch slide\n{slide_path}", exc_info=e)
    return None
