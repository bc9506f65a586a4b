"""Exporter unit tests mirroring the reference's active test suite
(reference: tests/test_all.py:23-228): hermetic, CPU-only, no models/slides."""

import gzip
import json
from concurrent.futures import Future
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import wsinsight_tpu.writers.geojson as geojson_mod
import wsinsight_tpu.writers.omecsv as omecsv_mod
from wsinsight_tpu.writers.geojson import (
    _build_geojson_dict_from_csv,
    _dataframe_to_geojson_box_fast,
    _dataframe_to_geojson_polygon_fast,
    _make_distinct_colors,
    write_geojsons,
)
from wsinsight_tpu.writers.omecsv import write_omecsvs
from wsinsight_tpu.writers.wkt import parse_wkt, polygon_wkt, wkt_to_geojson_geometry


class InlineExecutor:
    """Drop-in ProcessPoolExecutor that runs submissions synchronously
    (reference: tests/test_all.py:23-44)."""

    def __init__(self, *args, **kwargs):
        pass

    def submit(self, fn, *args, **kwargs):
        fut: Future = Future()
        try:
            fut.set_result(fn(*args, **kwargs))
        except Exception as e:  # pragma: no cover
            fut.set_exception(e)
        return fut

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@pytest.fixture(autouse=True)
def inline_pools(monkeypatch):
    monkeypatch.setattr(geojson_mod, "ProcessPoolExecutor", InlineExecutor)
    monkeypatch.setattr(omecsv_mod, "ProcessPoolExecutor", InlineExecutor)


def _write_minimal_csv(path: Path) -> None:
    """2-row synthetic model-output CSV (reference: tests/test_all.py:47-59)."""
    df = pd.DataFrame(
        {
            "minx": [0, 350],
            "miny": [0, 0],
            "width": [350, 350],
            "height": [350, 350],
            "prob_background": [0.9, 0.2],
            "prob_tumor": [0.1, 0.8],
        }
    )
    df.to_csv(path, index=False)


def test_make_distinct_colors():
    colors = _make_distinct_colors(5)
    assert len(colors) == 5
    hexes = {c["hex"] for c in colors}
    assert len(hexes) == 5
    for c in colors:
        assert len(c["rgb"]) == 3
        assert all(0 <= v <= 255 for v in c["rgb"])
    with pytest.raises(ValueError):
        _make_distinct_colors(0)


def test_box_geojson_properties():
    df = pd.DataFrame(
        {
            "minx": [10],
            "miny": [20],
            "width": [100],
            "height": [100],
            "prob_background": [0.25],
            "prob_tumor": [0.75],
        }
    )
    gj = _dataframe_to_geojson_box_fast(
        df, ["prob_background", "prob_tumor"], overlap=0.0, set_classification=True
    )
    assert gj["type"] == "FeatureCollection"
    feat = gj["features"][0]
    assert feat["type"] == "Feature"
    props = feat["properties"]
    assert props["isLocked"] is True
    assert props["objectType"] == "tile"
    assert props["measurements"] == {
        "prob_background": pytest.approx(0.25),
        "prob_tumor": pytest.approx(0.75),
    }
    assert props["classification"]["name"] == "prob_tumor"
    ring = feat["geometry"]["coordinates"][0]
    # Vertex order from the reference: (maxx,miny),(maxx,maxy),(minx,maxy),(minx,miny),close
    assert ring == [[110, 20], [110, 120], [10, 120], [10, 20], [110, 20]]


def test_box_geojson_overlap_shrink():
    df = pd.DataFrame(
        {
            "minx": [0],
            "miny": [0],
            "width": [100],
            "height": [100],
            "prob_x": [1.0],
        }
    )
    gj = _dataframe_to_geojson_box_fast(df, ["prob_x"], overlap=0.5)
    ring = gj["features"][0]["geometry"]["coordinates"][0]
    # pw = 50, margins 25 -> box [25, 75]
    assert ring == [[75, 25], [75, 75], [25, 75], [25, 25], [75, 25]]


def test_wkt_polygon_geojson():
    df = pd.DataFrame(
        {
            "polygon_wkt": ["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"],
            "prob_a": [0.3],
            "prob_b": [0.7],
        }
    )
    gj = _dataframe_to_geojson_polygon_fast(df, ["prob_a", "prob_b"], set_classification=True)
    feat = gj["features"][0]
    assert feat["geometry"]["type"] == "Polygon"
    assert feat["geometry"]["coordinates"][0][0] == [0.0, 0.0]
    assert feat["properties"]["classification"]["name"] == "prob_b"
    assert feat["properties"]["isLocked"] is True


def test_csv_to_geojson_builder(tmp_path):
    csv = tmp_path / "slide1.csv"
    _write_minimal_csv(csv)
    out_path, gj = _build_geojson_dict_from_csv(
        csv, overlap=0.0, results_dir=tmp_path, output_dir=Path("gj")
    )
    assert str(out_path).endswith("gj/slide1.geojson")
    assert len(gj["features"]) == 2


def test_write_geojsons_end_to_end(tmp_path):
    csv_dir = tmp_path / "model-outputs-csv"
    csv_dir.mkdir()
    for stem in ("s1", "s2"):
        _write_minimal_csv(csv_dir / f"{stem}.csv")
    out_dir = Path("model-outputs-geojson")
    write_geojsons(
        sorted(csv_dir.iterdir()),
        results_dir=tmp_path,
        overlap=0.0,
        output_dir=out_dir,
        num_workers=1,
        show_progress=False,
    )
    for stem in ("s1", "s2"):
        p = tmp_path / out_dir / f"{stem}.geojson"
        assert p.exists()
        data = json.loads(p.read_text())
        assert data["type"] == "FeatureCollection"
        assert len(data["features"]) == 2
    # Resume: delete one and re-run; only the missing one is regenerated.
    (tmp_path / out_dir / "s1.geojson").unlink()
    mtime_s2 = (tmp_path / out_dir / "s2.geojson").stat().st_mtime_ns
    write_geojsons(
        sorted(csv_dir.iterdir()),
        results_dir=tmp_path,
        overlap=0.0,
        output_dir=out_dir,
        num_workers=1,
        show_progress=False,
    )
    assert (tmp_path / out_dir / "s1.geojson").exists()
    assert (tmp_path / out_dir / "s2.geojson").stat().st_mtime_ns == mtime_s2


def test_omecsv_header_and_content(tmp_path):
    csv = tmp_path / "slideA.csv"
    _write_minimal_csv(csv)
    write_omecsvs(
        [csv],
        [],
        overlap=0.0,
        results_dir=tmp_path,
        output_dir=Path("ome"),
        prefix="prob",
        num_workers=1,
        show_progress=False,
    )
    out = tmp_path / "ome" / "slideA.ome.csv.gz"
    assert out.exists()
    text = gzip.decompress(out.read_bytes()).decode()
    lines = text.splitlines()
    assert lines[0] == (
        "object,secondary_object,polygon,objectType,classification,"
        "prob_background,prob_tumor"
    )
    assert lines[1].startswith('0,0,"POLYGON ((350 0,350 350,0 350,0 0,350 0))",tile,background,')
    assert lines[2].split(",")[-3].rstrip('"') .endswith("tumor") or "tumor" in lines[2]
    assert len(lines) == 3


def test_omecsv_vectorized_rows_match_scalar_oracle():
    """The column-wise string assembly is byte-identical to naive f-strings."""
    from wsinsight_tpu.writers.omecsv import _render_table

    rng = np.random.default_rng(7)
    n = 40
    probs = rng.random((n, 3))
    probs[:, 2] = np.round(probs[:, 2], 1)  # mix of long and short float reprs
    df = pd.DataFrame({f"prob_{c}": probs[:, i] for i, c in enumerate("abc")})
    minx2 = rng.integers(0, 99999, n)
    miny2 = rng.integers(0, 99999, n)
    maxx2, maxy2 = minx2 + 224, miny2 + 224

    got = _render_table(df, list(df.columns), (minx2, miny2, maxx2, maxy2), "prob_")

    arr = df.to_numpy()
    names = np.array(list("abc"))
    expect = [
        "object,secondary_object,polygon,objectType,classification,"
        "prob_a,prob_b,prob_c"
    ]
    for i in range(n):
        ring = ",".join(
            [
                f"{maxx2[i]} {miny2[i]}",
                f"{maxx2[i]} {maxy2[i]}",
                f"{minx2[i]} {maxy2[i]}",
                f"{minx2[i]} {miny2[i]}",
                f"{maxx2[i]} {miny2[i]}",
            ]
        )
        expect.append(
            f'{i},{i},"POLYGON (({ring}))",tile,'
            f"{names[arr[i].argmax()]},{','.join(map(str, arr[i]))}"
        )
    assert got == "\n".join(expect)


def test_write_omecsvs_batch_and_resume(tmp_path):
    csv_dir = tmp_path / "csvs"
    csv_dir.mkdir()
    for stem in ("a", "b"):
        _write_minimal_csv(csv_dir / f"{stem}.csv")
    write_omecsvs(
        sorted(csv_dir.iterdir()),
        [],
        overlap=0.0,
        results_dir=tmp_path,
        output_dir=Path("ome"),
        prefix="prob",
        num_workers=1,
        show_progress=False,
    )
    outs = sorted((tmp_path / "ome").iterdir())
    assert [p.name for p in outs] == ["a.ome.csv.gz", "b.ome.csv.gz"]
    mtime = outs[0].stat().st_mtime_ns
    write_omecsvs(
        sorted(csv_dir.iterdir()),
        [],
        overlap=0.0,
        results_dir=tmp_path,
        output_dir=Path("ome"),
        prefix="prob",
        num_workers=1,
        show_progress=False,
    )
    assert outs[0].stat().st_mtime_ns == mtime  # skipped on resume


def test_wkt_roundtrip():
    ring = np.array([[0, 0], [5, 0], [5, 5], [0, 5]], dtype=float)
    text = polygon_wkt([ring])
    assert text == "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"
    gtype, polys = parse_wkt(text)
    assert gtype == "POLYGON"
    np.testing.assert_allclose(polys[0][0][:4], ring)
    geom = wkt_to_geojson_geometry(text)
    assert geom["type"] == "Polygon"
    assert geom["coordinates"][0][-1] == [0.0, 0.0]


def test_wkt_with_hole_and_multipolygon():
    text = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    gtype, polys = parse_wkt(text)
    assert gtype == "POLYGON"
    assert len(polys[0]) == 2
    mtext = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"
    gtype, polys = parse_wkt(mtext)
    assert gtype == "MULTIPOLYGON"
    assert len(polys) == 2
