"""Patch-grid math and end-to-end patch-stage tests against reference anchors.

Grid-count anchors come from the reference golden CSVs
(/root/reference/tests/reference/*/purple.csv row counts, BASELINE.md): on the
4096^2 purple slide at 0.25 um/px the zoo geometries yield 144/36/400/4 patches.
"""

import h5py
import numpy as np
import pytest

from wsinsight_tpu.geometry import MultiPolygon
from wsinsight_tpu.patchlib import (
    get_multipolygon_from_binary_arr,
    get_patch_coordinates_within_polygon,
    segment_and_patch_one_slide,
    segment_tissue,
)
from wsinsight_tpu.uri_path import URIPath


def full_square_polygon(w, h):
    ring = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], dtype=np.float64)
    return MultiPolygon([ring])


# (patch_size_px, spacing_um_px) -> expected patch count on 4096^2 @ 0.25 um/px.
# Matches the reference parametrization (reference: tests/test_all.py:538-611).
GRID_CASES = [
    (350, 0.25, 144),  # breast resnet34 / inceptionv4 / vgg16mod / prostate
    (700, 0.25, 36),  # lung
    (100, 0.5, 400),  # TIL inceptionv4 (100 px @ 0.5 -> 200 px @ 0.25)
    (350, 1.5, 4),  # paad (350 px @ 1.5 -> 2100 px @ 0.25)
    (224, 0.25, 324),  # generic 224 grid: floor((4096-112)/224)=17 -> 18x18
]


@pytest.mark.parametrize("patch_size_px,spacing,expected", GRID_CASES)
def test_grid_counts(patch_size_px, spacing, expected):
    mpp = 0.25
    patch_size = int(round(patch_size_px * spacing / mpp))
    half = round(patch_size / 2)
    # Contour of a fully-tissue 2048^2 thumbnail scaled by 2 spans [0, 4094].
    ring = np.array([[0, 0], [4094, 0], [4094, 4094], [0, 4094]], dtype=np.float64)
    poly = MultiPolygon([ring])
    coords = get_patch_coordinates_within_polygon(
        slide_width=4096,
        slide_height=4096,
        patch_size=patch_size,
        half_patch_size=half,
        polygon=poly,
        overlap=0.0,
    )
    assert len(coords) == expected
    # Ordering: x ascending, y most-rapidly-changing (reference: patch.py:235-240)
    order = np.lexsort((coords[:, 1], coords[:, 0]))
    np.testing.assert_array_equal(coords, coords[order])


# Model geometry: (golden dir, patch_size_px, spacing_um_px); slide mpp = 0.25.
GOLDEN_MODELS = [
    ("breast-tumor-resnet34.tcga-brca", 350, 0.25),
    ("breast-tumor-inception_v4.tcga-brca", 350, 0.25),
    ("breast-tumor-vgg16mod.tcga-brca", 350, 0.25),
    ("lung-tumor-resnet34.tcga-luad", 350, 0.5),
    ("pancancer-lymphocytes-inceptionv4.tcga", 100, 0.5),
    ("pancreas-tumor-preactresnet34.tcga-paad", 350, 1.5),
    ("prostate-tumor-resnet34.tcga-prad", 175, 0.5),
]


@pytest.mark.parametrize("model_dir,patch_px,spacing", GOLDEN_MODELS)
def test_grid_coords_match_reference_csv(model_dir, patch_px, spacing):
    """Patch coordinates for every zoo geometry equal the reference goldens
    (reference: tests/reference/*/purple.csv)."""
    import csv
    from pathlib import Path

    golden = Path(f"tests/reference/{model_dir}/purple.csv")
    if not golden.exists():
        pytest.skip("golden csv not present")
    with open(golden) as fh:
        rows = list(csv.DictReader(fh))
    ref = np.array(
        sorted((int(float(r["minx"])), int(float(r["miny"]))) for r in rows)
    )

    mpp = 0.25
    patch_size = int(round(patch_px * spacing / mpp))
    half = round(patch_size / 2)
    ring = np.array([[0, 0], [4094, 0], [4094, 4094], [0, 4094]], dtype=np.float64)
    poly = MultiPolygon([ring])
    coords = get_patch_coordinates_within_polygon(4096, 4096, patch_size, half, poly, 0.0)
    got = np.array(sorted(map(tuple, coords)))
    np.testing.assert_array_equal(got, ref)
    # Width column in the golden equals our derived slide-scale patch size.
    assert int(float(rows[0]["width"])) == patch_size


def test_segment_tissue_solid_color():
    img = np.zeros((256, 256, 3), np.uint8)
    img[..., 0] = 128
    img[..., 2] = 128
    mask = segment_tissue(img)
    assert mask.all()


def test_segment_tissue_rejects_white():
    img = np.full((256, 256, 3), 255, np.uint8)
    mask = segment_tissue(img)
    assert not mask.any()


def test_multipolygon_from_binary_arr():
    arr = np.zeros((100, 100), np.uint8)
    arr[10:90, 10:90] = 255
    arr[40:60, 40:60] = 0  # hole
    res = get_multipolygon_from_binary_arr(arr)
    assert res is not None
    poly, contours, hierarchy = res
    assert hierarchy.ndim == 3
    pts = np.array([[20.0, 20.0], [50.0, 50.0], [5.0, 5.0]])
    assert poly.contains_points(pts).tolist() == [True, False, False]


def test_patch_stage_end_to_end(purple_slide, tmp_path):
    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=None,
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=350,
        patch_spacing_um_px=0.25,
    )
    h5path = results / "patches" / "purple.h5"
    assert h5path.exists()
    assert (results / "masks" / "purple.jpg").exists()
    with h5py.File(h5path, "r") as f:
        coords = f["/coords"][()]
        attrs = dict(f["/coords"].attrs)
        slide_attrs = dict(f["/slide"].attrs)
        assert "/polygons" in f
        n_polys = len(f["/polygons/offsets"]) - 1
    assert coords.shape == (144, 2)
    assert coords.dtype == np.int32
    assert attrs["patch_size"] == 350
    assert attrs["patch_level"] == 0
    assert attrs["patch_spacing_um_px"] == 0.25
    assert tuple(attrs["tile_dim"]) == (12, 12)
    assert n_polys == 144
    assert slide_attrs["slide_width"] == 4096
    assert slide_attrs["slide_mpp"] == pytest.approx(0.25)
    # resume: second call is a no-op (file timestamps unchanged)
    mtime = h5path.stat().st_mtime_ns
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=None,
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=350,
        patch_spacing_um_px=0.25,
    )
    assert h5path.stat().st_mtime_ns == mtime


def test_histoqc_mask_ingestion(purple_slide, tmp_path):
    """--histoqc-dir replaces segmentation with the provided mask
    (reference: pipeline.py:122-144)."""
    from PIL import Image

    hq = tmp_path / "histoqc" / "purple.tif"
    hq.mkdir(parents=True)
    # Mask covering only the left half of the slide.
    mask = np.zeros((512, 512), np.uint8)
    mask[:, :256] = 255
    Image.fromarray(mask).save(hq / "purple.tif_mask_use.png")

    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=None,
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=350,
        patch_spacing_um_px=0.25,
        histoqc_dir=URIPath(str(tmp_path / "histoqc")),
    )
    with h5py.File(results / "patches" / "purple.h5") as f:
        coords = f["/coords"][()]
    # Only patches whose centroids fall in the left half survive.
    assert len(coords) > 0
    assert (coords[:, 0] + 175 < 4096 // 2).all()


def test_patch_stage_cached_images(purple_slide, tmp_path):
    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=None,
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=350,
        patch_spacing_um_px=1.5,  # 2100 px -> 4 patches, keeps test fast
        cache_image_patches=True,
    )
    with h5py.File(results / "patches" / "purple.h5", "r") as f:
        imgs = f["/images"][()]
    assert imgs.shape == (4, 2100, 2100, 3)
    # First patch is fully in-bounds; later patches run past the slide edge and
    # are zero-padded (same as the backends' read_region padding).
    assert (imgs[0, :, :, 0] == 128).all()
    assert (imgs[0, :, :, 1] == 0).all()
    assert (imgs[3, :1996, :1996, 0] == 128).all()  # patch at (2100,2100): 4096-2100
    assert (imgs[3, 1996:, :, :] == 0).all()
