"""CLI golden row-count regression across the zoo geometries.

Mirrors the reference's 5-model purple.tif regression (reference:
tests/test_all.py:283-357) through the real CLI: each architecture+geometry
must reproduce the golden CSV's exact row count and coordinates (probability
values need the real weights, which require network; geometry is the
framework's contract)."""

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from wsinsight_tpu.cli.cli import cli
from wsinsight_tpu.zoo import make_random_local_model

# (architecture, patch_px, spacing_um_px, golden dir, expected rows)
ZOO_CASES = [
    ("resnet34", 350, 0.25, "breast-tumor-resnet34.tcga-brca", 144),
    ("inception_v4", 350, 0.25, "breast-tumor-inception_v4.tcga-brca", 144),
    ("vgg16mod", 350, 0.25, "breast-tumor-vgg16mod.tcga-brca", 144),
    ("resnet34", 350, 0.5, "lung-tumor-resnet34.tcga-luad", 36),
    ("inception_v4nobn", 100, 0.5, "pancancer-lymphocytes-inceptionv4.tcga", 400),
    ("preactresnet34", 350, 1.5, "pancreas-tumor-preactresnet34.tcga-paad", 4),
    ("resnet34", 175, 0.5, "prostate-tumor-resnet34.tcga-prad", 144),
]


@pytest.mark.slow
@pytest.mark.parametrize("arch,patch_px,spacing,golden,expected", ZOO_CASES)
def test_zoo_geometry_through_cli(arch, patch_px, spacing, golden, expected, purple_slide, tmp_path):
    cfg, weights = make_random_local_model(
        arch,
        2,
        tmp_path / "m",
        class_names=["Other", "Tumor"],
        patch_size_pixels=patch_px,
        spacing_um_px=spacing,
        resize_size=64 if arch.startswith(("resnet", "preact", "vgg")) else 100,
    )
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
            "-b", "64",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    df = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    assert len(df) == expected
    ref = pd.read_csv(f"tests/reference/{golden}/purple.csv")
    assert len(ref) == expected
    np.testing.assert_array_equal(
        np.sort(df[["minx", "miny"]].to_numpy(), axis=0),
        np.sort(ref[["minx", "miny"]].to_numpy(), axis=0),
    )
    assert (df["width"] == ref["width"].iloc[0]).all()
