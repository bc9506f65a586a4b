"""QuPath pseudo-model modes: patch planning from detections and inference
one-hot synthesis (reference: pipeline.py:170-259, run_inference.py:318-416)."""

import json

import h5py
import numpy as np
import pandas as pd
import pytest

from wsinsight_tpu.engine import run_inference
from wsinsight_tpu.patchlib import segment_and_patch_one_slide
from wsinsight_tpu.uri_path import URIPath
from wsinsight_tpu.zoo import ModelConfiguration, ModelHandle


def _write_detection_tsv(path, mpp=0.25):
    df = pd.DataFrame(
        {
            "Object type": ["Detection", "Cell", "Detection"],
            "Name": ["Tumor cell", "Immune cell", "Tumor cell"],
            "Classification": ["Tumor", "Immune", "Tumor"],
            "Centroid X µm": [100.0 * mpp, 500.0 * mpp, 900.0 * mpp],
            "Centroid Y µm": [120.0 * mpp, 540.0 * mpp, 960.0 * mpp],
            "Parent": ["ROI", "ROI", "ROI"],
        }
    )
    df.to_csv(path, sep="\t", index=False)


def _write_detection_geojson(path):
    def box(cx, cy, r, name):
        ring = [[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r], [cx - r, cy + r], [cx - r, cy - r]]
        return {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [ring]},
            "properties": {
                "objectType": "detection",
                "name": name,
                "classification": {"name": name},
            },
        }

    fc = {
        "type": "FeatureCollection",
        "features": [box(25.0, 30.0, 3, "Tumor"), box(125.0, 135.0, 3, "Immune")],
    }
    path.write_text(json.dumps(fc))


def test_qupath_tsv_patch_mode(purple_slide, tmp_path):
    qdir = tmp_path / "qp"
    qdir.mkdir()
    _write_detection_tsv(qdir / "purple.txt")
    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=56,
        patch_spacing_um_px=0.25,
        object_based=True,
    )
    with h5py.File(results / "patches" / "purple.h5") as f:
        coords = f["/coords"][()]
        polys = len(f["/polygons/offsets"]) - 1
    # centroid um / mpp - half  ->  (100,120)-28 etc.
    np.testing.assert_array_equal(coords, [[72, 92], [472, 512], [872, 932]])
    assert polys == 3


def test_qupath_tsv_infer_one_hot(purple_slide, tmp_path):
    qdir = tmp_path / "qp"
    qdir.mkdir()
    _write_detection_tsv(qdir / "purple.txt")
    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=56,
        patch_spacing_um_px=0.25,
        object_based=True,
    )
    cfg = ModelConfiguration(
        architecture="qupath.detection",
        num_classes=2,
        class_names=["tumor", "immune"],
        patch_size_pixels=56,
        spacing_um_px=0.25,
        transform=[],
    )
    model = ModelHandle(name="qupath.detection", config=cfg)
    failed_patching, failed_inference = run_inference(
        wsi_dir=None,
        slide_paths=None,
        results_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        model_info=model,
        object_based=True,
    )
    assert failed_inference == []
    df = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    assert list(df.columns) == [
        "minx", "miny", "width", "height", "prob_tumor", "prob_immune",
        "qupath_detection_parent",
    ]
    np.testing.assert_array_equal(df["prob_tumor"], [1.0, 0.0, 1.0])
    np.testing.assert_array_equal(df["prob_immune"], [0.0, 1.0, 0.0])
    assert (df["qupath_detection_parent"] == "ROI").all()


def test_qupath_geojson_infer_one_hot(purple_slide, tmp_path):
    qdir = tmp_path / "qpg"
    qdir.mkdir()
    _write_detection_geojson(qdir / "purple.geojson")
    results = tmp_path / "results"
    (results / "patches").mkdir(parents=True)
    # Minimal patch h5 so the engine loop finds the slide.
    from wsinsight_tpu.patchlib.io import save_hdf5

    save_hdf5(
        path=results / "patches" / "purple.h5",
        coords=np.array([[0, 0]], np.int32),
        polygons=None,
        tile_dim=None,
        patch_size=56,
        patch_spacing_um_px=0.25,
        slide_path=str(purple_slide),
        slide_mpp=0.25,
        slide_width=4096,
        slide_height=4096,
    )
    cfg = ModelConfiguration(
        architecture="qupath.geojson",
        num_classes=2,
        class_names=["tumor", "immune"],
        patch_size_pixels=56,
        spacing_um_px=0.25,
        transform=[],
    )
    model = ModelHandle(name="qupath.geojson", config=cfg)
    _, failed_inference = run_inference(
        wsi_dir=None,
        slide_paths=None,
        results_dir=URIPath(str(results)),
        qupath_geojson_detection_dir=URIPath(str(qdir)),
        model_info=model,
        object_based=True,
    )
    assert failed_inference == []
    df = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    assert len(df) == 2
    # Centroids (25,30) & (125,135) um at 0.25 mpp -> px/..., minus half 28.
    np.testing.assert_array_equal(df["minx"], [72, 472])
    np.testing.assert_array_equal(df["prob_tumor"], [1.0, 0.0])
    np.testing.assert_array_equal(df["prob_immune"], [0.0, 1.0])


def test_qupath_unknown_class_names_yield_zero_rows(purple_slide, tmp_path):
    """Detections whose class is unknown or missing get all-zero prob rows;
    the slide still exports (reference one-hot synthesis semantics)."""
    qdir = tmp_path / "qp"
    qdir.mkdir()
    df = pd.DataFrame(
        {
            "Object type": ["Detection", "Detection", "Detection"],
            "Name": ["Tumor cell", "???", None],
            "Classification": ["Tumor", "Necrosis", None],  # 2nd/3rd unknown
            "Centroid X µm": [25.0, 125.0, 225.0],
            "Centroid Y µm": [30.0, 135.0, 235.0],
            "Parent": ["ROI", "ROI", "ROI"],
        }
    )
    df.to_csv(qdir / "purple.txt", sep="\t", index=False)
    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=56,
        patch_spacing_um_px=0.25,
        object_based=True,
    )
    cfg = ModelConfiguration(
        architecture="qupath.detection", num_classes=2,
        class_names=["tumor", "immune"], patch_size_pixels=56,
        spacing_um_px=0.25, transform=[],
    )
    _, failed = run_inference(
        wsi_dir=None, slide_paths=None, results_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        model_info=ModelHandle(name="qupath.detection", config=cfg),
        object_based=True,
    )
    assert failed == []
    out = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    np.testing.assert_array_equal(out["prob_tumor"], [1.0, 0.0, 0.0])
    np.testing.assert_array_equal(out["prob_immune"], [0.0, 0.0, 0.0])


def test_qupath_malformed_tsv_fails_one_slide_not_cohort(purple_slide, tmp_path):
    """--qupath-name-as-class with a TSV that has no Name column marks the
    slide failed instead of aborting the run."""
    qdir = tmp_path / "qp"
    qdir.mkdir()
    pd.DataFrame(
        {
            "Object type": ["Detection"],
            "Classification": ["Tumor"],
            "Centroid X µm": [25.0],
            "Centroid Y µm": [30.0],
            "Parent": ["ROI"],
        }
    ).to_csv(qdir / "purple.txt", sep="\t", index=False)
    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=56,
        patch_spacing_um_px=0.25,
        object_based=True,
    )
    cfg = ModelConfiguration(
        architecture="qupath.detection", num_classes=2,
        class_names=["tumor", "immune"], patch_size_pixels=56,
        spacing_um_px=0.25, transform=[],
    )
    _, failed = run_inference(
        wsi_dir=None, slide_paths=None, results_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        qupath_name_as_class=True,  # Name column absent -> per-slide failure
        model_info=ModelHandle(name="qupath.detection", config=cfg),
        object_based=True,
    )
    assert failed == ["purple"]
    assert not (results / "model-outputs-csv" / "purple.csv").exists()


def test_qupath_tsv_probs_stay_row_aligned_past_annotations(purple_slide, tmp_path):
    """A non-Detection row in the TSV must not shift every later cell's class.

    The reference indexes the Detection/Cell SUBSET but scatters its
    positions into the full-length probs array (run_inference.py:342-353),
    so an 'Annotation' row silently reassigns all following classes — a
    defect we do not reproduce.
    """
    mpp = 0.25
    qdir = tmp_path / "qp"
    qdir.mkdir()
    pd.DataFrame(
        {
            "Object type": ["Annotation", "Detection", "Cell"],
            "Name": ["Region A", "Tumor cell", "Immune cell"],
            "Classification": ["RegionA", "Tumor", "Immune"],
            "Centroid X µm": [50.0 * mpp, 100.0 * mpp, 500.0 * mpp],
            "Centroid Y µm": [60.0 * mpp, 120.0 * mpp, 540.0 * mpp],
            "Parent": ["ROI", "ROI", "ROI"],
        }
    ).to_csv(qdir / "purple.txt", sep="\t", index=False)

    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=56,
        patch_spacing_um_px=0.25,
        object_based=True,
    )
    cfg = ModelConfiguration(
        architecture="qupath.detection",
        num_classes=2,
        class_names=["tumor", "immune"],
        patch_size_pixels=56,
        spacing_um_px=0.25,
        transform=[],
    )
    model = ModelHandle(name="qupath.detection", config=cfg)
    _, failed_inference = run_inference(
        wsi_dir=None,
        slide_paths=None,
        results_dir=URIPath(str(results)),
        qupath_detection_dir=URIPath(str(qdir)),
        model_info=model,
        object_based=True,
    )
    assert failed_inference == []
    df = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    # row 0 (Annotation): all-zero probs; rows 1-2 keep their OWN classes
    np.testing.assert_array_equal(df["prob_tumor"], [0.0, 1.0, 0.0])
    np.testing.assert_array_equal(df["prob_immune"], [0.0, 0.0, 1.0])


def test_qupath_geojson_annotation_pseudo_model(purple_slide, tmp_path):
    """The annotation-dir mode (reference declares it but left the
    run_inference branch an empty stub) produces one one-hot row per
    annotation region."""
    import json as _json

    qdir = tmp_path / "qa"
    qdir.mkdir()

    def region(cx, cy, r, name):
        ring = [
            [cx - r, cy - r], [cx - r, cy + r], [cx + r, cy + r],
            [cx + r, cy - r], [cx - r, cy - r],
        ]
        return {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [ring]},
            "properties": {
                "objectType": "annotation",
                "classification": {"name": name},
            },
        }

    (qdir / "purple.geojson").write_text(
        _json.dumps(
            {
                "type": "FeatureCollection",
                "features": [region(25.0, 30.0, 10.0, "Stroma"),
                             region(125.0, 135.0, 10.0, "Tumor")],
            }
        )
    )
    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=None,
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=URIPath(str(qdir)),
        patch_size_px=56,
        patch_spacing_um_px=0.25,
        object_based=False,
    )
    cfg = ModelConfiguration(
        architecture="qupath.geojson",
        num_classes=2,
        class_names=["stroma", "tumor"],
        patch_size_pixels=56,
        spacing_um_px=0.25,
        transform=[],
    )
    model = ModelHandle(name="qupath.geojson", config=cfg)
    _, failed_inference = run_inference(
        wsi_dir=None,
        slide_paths=None,
        results_dir=URIPath(str(results)),
        qupath_geojson_annotation_dir=URIPath(str(qdir)),
        model_info=model,
        object_based=False,
    )
    assert failed_inference == []
    df = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    assert len(df) == 2
    np.testing.assert_array_equal(df["prob_stroma"], [1.0, 0.0])
    np.testing.assert_array_equal(df["prob_tumor"], [0.0, 1.0])
    # coords are centroid-centred patch boxes in pixels
    assert (df["width"] == 56).all()
