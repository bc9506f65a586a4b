"""CLI tests via click.testing.CliRunner (reference: tests/test_all.py:283-373)."""

import json

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from wsinsight_tpu.cli.cli import cli
from wsinsight_tpu.zoo import make_random_local_model


@pytest.fixture(scope="module")
def model_files(tmp_path_factory):
    # resize_size 32: the grid anchors (144 patches, geojson geometry,
    # metadata) depend on patch size/spacing, not the model input; 32 px
    # quarters the forward FLOPs on the 1-core fast-tier host.
    d = tmp_path_factory.mktemp("climodel")
    return make_random_local_model(
        "resnet34", 2, d, class_names=["Other", "Tumor"], resize_size=32
    )


def test_cli_help():
    runner = CliRunner()
    res = runner.invoke(cli, ["--help"])
    assert res.exit_code == 0
    for cmd in ("run", "patch", "infer"):
        assert cmd in res.output


def test_cli_run_end_to_end(purple_slide, model_files, tmp_path):
    cfg, weights = model_files
    results = tmp_path / "results"
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "run",
            "-i", str(purple_slide.parent),
            "-o", str(results),
            "--config", str(cfg),
            "--model-path", str(weights),
            "--geojson",
            "--omecsv",
            "-b", "64",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    csv = results / "model-outputs-csv" / "purple.csv"
    df = pd.read_csv(csv)
    assert len(df) == 144
    assert (results / "model-outputs-geojson" / "purple.geojson").exists()
    assert (results / "model-outputs-omecsv" / "purple.ome.csv.gz").exists()
    assert (results / "masks" / "purple.jpg").exists()
    assert (results / "wsi_list.csv").exists()
    # GeoJSON box geometry equals CSV coords (reference: tests/test_all.py:399-410).
    gj = json.loads((results / "model-outputs-geojson" / "purple.geojson").read_text())
    feat0 = gj["features"][0]
    ring = np.asarray(feat0["geometry"]["coordinates"][0])
    row0 = df.iloc[0]
    assert ring[:, 0].min() == row0.minx
    assert ring[:, 1].min() == row0.miny
    assert ring[:, 0].max() == row0.minx + row0.width
    assert ring[:, 1].max() == row0.miny + row0.height
    # Metadata files written for each stage.
    metas = sorted(results.glob("*_metadata_*.json"))
    prefixes = {m.name.split("_metadata_")[0] for m in metas}
    assert {"patch", "infer", "run"} <= prefixes
    meta = json.loads(metas[0].read_text())
    assert meta["model_config"]["architecture"] == "resnet34"
    assert meta["runtime"]["versions"]["jax"]


def test_cli_patch_registered_model_no_weights(tmp_path, purple_slide):
    """The patch stage only needs the model CONFIG; registered models work
    offline without any weights on disk."""
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "patch",
            "-i", str(purple_slide.parent),
            "-o", str(tmp_path / "results"),
            "-m", "breast-tumor-resnet34.tcga-brca",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    import h5py

    with h5py.File(tmp_path / "results" / "patches" / "purple.h5") as f:
        assert f["/coords"].shape == (144, 2)


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_cli_multi_slide_cohort(tmp_path, model_files, purple_slide):
    """Two slides through `run`: per-slide CSVs, masks, and resume."""
    import os

    cfg, weights = model_files
    slides = tmp_path / "slides"
    slides.mkdir()
    os.symlink(purple_slide, slides / "s1.tif")
    os.symlink(purple_slide, slides / "s2.tif")
    results = tmp_path / "results"
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "run",
            "-i", str(slides),
            "-o", str(results),
            "--config", str(cfg),
            "--model-path", str(weights),
            "-b", "64",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    for stem in ("s1", "s2"):
        df = pd.read_csv(results / "model-outputs-csv" / f"{stem}.csv")
        assert len(df) == 144
        assert (results / "masks" / f"{stem}.jpg").exists()
    # Stage timings captured into the metadata.
    metas = sorted(results.glob("infer_metadata_*.json"))
    meta = json.loads(metas[-1].read_text())
    assert "inference" in meta["stage_timings_sec"]
    assert meta["stage_timings_sec"]["inference"] > 0


def test_cli_patch_requires_model(tmp_path, purple_slide):
    runner = CliRunner()
    res = runner.invoke(
        cli,
        ["patch", "-i", str(purple_slide.parent), "-o", str(tmp_path / "r")],
    )
    assert res.exit_code != 0
    assert "required" in res.output


def test_cli_mutually_exclusive_model_args(tmp_path, purple_slide, model_files):
    cfg, weights = model_files
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "patch",
            "-i", str(purple_slide.parent),
            "-o", str(tmp_path / "r"),
            "-m", "breast-tumor-resnet34.tcga-brca",
            "--config", str(cfg),
            "--model-path", str(weights),
        ],
    )
    assert res.exit_code != 0
    assert "mutually exclusive" in res.output


def test_compute_overlap_math():
    """Step options -> overlap (reference: cli/patch.py:824-851)."""
    import click

    from wsinsight_tpu.cli._options import compute_overlap
    from wsinsight_tpu.zoo import ModelConfiguration

    cfg = ModelConfiguration(
        architecture="resnet34", num_classes=2, class_names=["a", "b"],
        patch_size_pixels=350, spacing_um_px=0.25,
    )
    assert compute_overlap(cfg, 0.0, 0.0, 0) == 0.0
    assert compute_overlap(cfg, 0.25, 0.0, 0) == 0.25
    # patch-size-um: full patch is 87.5 um; step of 43.75 um = 50% overlap.
    assert compute_overlap(cfg, 0.0, 43.75, 0) == pytest.approx(0.5)
    # patch-size-px: step of 175 px of 350 = 50% overlap.
    assert compute_overlap(cfg, 0.0, 0.0, 175) == pytest.approx(0.5)
    with pytest.raises(click.ClickException):
        compute_overlap(cfg, 0.1, 10.0, 0)  # two options at once
    with pytest.raises(click.ClickException):
        compute_overlap(cfg, 0.0, 100.0, 0)  # um larger than the patch


def test_upsert_by_key():
    from wsinsight_tpu.insightlib.hplot import upsert_by_key

    old = pd.DataFrame({"id": ["a", "b"], "v": [1, 2]})
    new = pd.DataFrame({"id": ["b", "c"], "v": [20, 30]})
    out = upsert_by_key(old, new, key="id")
    assert out.set_index("id")["v"].to_dict() == {"a": 1, "b": 20, "c": 30}


def test_cli_unknown_registered_model(tmp_path, purple_slide):
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "patch",
            "-i", str(purple_slide.parent),
            "-o", str(tmp_path / "r"),
            "-m", "not-a-model",
        ],
    )
    assert res.exit_code != 0


def test_models_convert_report(tmp_path):
    """`wsinsight models convert --report` prints per-layer mapping coverage
    and writes a loadable msgpack — the ingestion report to run on real zoo
    downloads (VERDICT r3 #6)."""
    import sys

    torch = pytest.importorskip("torch")  # test-only dep; skip when absent
    from click.testing import CliRunner

    sys.path.insert(0, "tests")
    import torch_refs

    from wsinsight_tpu.cli.cli import cli
    from wsinsight_tpu.models.convert import load_flax_params

    tm = torch_refs.torch_resnet34(2).eval()
    ckpt = tmp_path / "m.pt"
    torch.save(tm.state_dict(), ckpt)
    out = tmp_path / "m.msgpack"

    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "models", "convert", str(ckpt), str(out),
            "--architecture", "resnet34", "--num-classes", "2", "--report",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "template leaves filled:" in res.output
    assert "mapping complete" in res.output
    assert out.exists() and load_flax_params(out)

    # report-only mode (no OUTPUT): still prints coverage, writes nothing
    res2 = runner.invoke(
        cli,
        [
            "models", "convert", str(ckpt),
            "--architecture", "resnet34", "--num-classes", "2", "--report",
        ],
        catch_exceptions=False,
    )
    assert res2.exit_code == 0, res2.output
    assert "template leaves filled:" in res2.output

    # bare `wsinsight models` still lists the registry (back-compat)
    res3 = runner.invoke(cli, ["models"], catch_exceptions=False)
    assert res3.exit_code == 0
    assert "resnet34" in res3.output


def test_run_adopts_every_patch_and_infer_param():
    """`run` must forward the full union of the stage params (reference:
    wsinsight/cli/run.py:89-155 kept hand-written lists that drifted; ours is
    derived from the subcommands' click declarations, so any flag added to
    `patch` or `infer` appears on `run` automatically)."""
    from wsinsight_tpu.cli.infer import infer
    from wsinsight_tpu.cli.patch import patch
    from wsinsight_tpu.cli.run import run

    run_params = {p.name for p in run.params}
    stage_params = {p.name for p in patch.params} | {p.name for p in infer.params}
    missing = stage_params - run_params
    assert not missing, f"run does not forward stage params: {sorted(missing)}"
    # and run adds nothing beyond the stages except its own --qupath flag
    extra = run_params - stage_params - {"qupath"}
    assert not extra, f"unexpected run-only params: {sorted(extra)}"
