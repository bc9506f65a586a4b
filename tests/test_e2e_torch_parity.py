"""End-to-end cross-framework parity: the north-star metric.

BASELINE.md: per-patch probabilities must match the PyTorch reference within
1e-3. This test builds a torch ResNet34 with random weights, feeds its raw
state dict to the CLI (converted to flax on load), runs the full
slide->patches->inference pipeline, and independently computes the reference
pipeline in torch (decode -> PIL resize -> ToTensor -> Normalize -> forward
-> softmax). Every patch probability must agree to 1e-3 (asserted at 2e-4).
"""

import json

import numpy as np
import pandas as pd
import pytest
import torch
from click.testing import CliRunner
from PIL import Image

import torch_refs
from wsinsight_tpu.cli.cli import cli
from wsinsight_tpu.wsi.slide import TpuSlide


@pytest.mark.slow
def test_full_pipeline_matches_torch_reference(purple_slide, tmp_path):
    # --- torch model with non-trivial weights, saved as a raw state dict ----
    tm = torch_refs.torch_resnet34(2).eval()
    g = torch.Generator().manual_seed(7)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    weights = tmp_path / "model.pt"
    torch.save(tm.state_dict(), weights)

    mean = [0.7238, 0.5716, 0.6779]
    std = [0.112, 0.1459, 0.1089]
    cfg = {
        "architecture": "resnet34",
        "num_classes": 2,
        "class_names": ["Other", "Tumor"],
        "patch_size_pixels": 350,
        "spacing_um_px": 0.25,
        "transform": [
            {"name": "Resize", "arguments": {"size": 224}},
            {"name": "ToTensor"},
            {"name": "Normalize", "arguments": {"mean": mean, "std": std}},
        ],
    }
    config = tmp_path / "config.json"
    config.write_text(json.dumps(cfg))

    # --- our pipeline through the real CLI (torch checkpoint ingested) ------
    results = tmp_path / "results"
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "run",
            "-i", str(purple_slide.parent),
            "-o", str(results),
            "--config", str(config),
            "--model-path", str(weights),
            "-b", "64",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    ours = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    assert len(ours) == 144

    # --- the reference pipeline in torch, computed independently ------------
    slide = TpuSlide(str(purple_slide))
    mean_t = torch.tensor(mean).view(3, 1, 1)
    std_t = torch.tensor(std).view(3, 1, 1)
    expected = []
    with torch.no_grad():
        for _, row in ours.iterrows():
            patch = slide.read_region((int(row.minx), int(row.miny)), 0, (350, 350))
            pil = patch.resize((224, 224), Image.Resampling.BILINEAR)
            x = torch.from_numpy(np.asarray(pil)).permute(2, 0, 1).float() / 255.0
            x = (x - mean_t) / std_t
            logits = tm(x[None])
            expected.append(torch.softmax(logits, dim=1)[0].numpy())
    expected = np.stack(expected)

    got = ours[["prob_Other", "prob_Tumor"]].to_numpy()
    max_diff = np.abs(got - expected).max()
    assert max_diff < 2e-4, f"cross-framework drift {max_diff} exceeds budget"


@pytest.mark.slow
def test_real_zoo_resnet34_golden_online(purple_slide, tmp_path):
    """Online-gated real-weights golden (VERDICT r3 #6): download the actual
    breast-tumor-resnet34 TorchScript from the zoo, convert with the template
    converter, and reproduce the committed reference CSV's probabilities
    within the 1e-3 cross-framework budget (the reference asserts 1e-7
    torch-vs-torch against the same file, tests/test_all.py:283-357).
    Skipped wherever the checkpoint cannot be obtained (no network and no
    local HF cache)."""
    from wsinsight_tpu.zoo import get_registered_model

    handle = get_registered_model("breast-tumor-resnet34.tcga-brca")
    try:
        handle.load_flax_params()  # resolves HF cache, downloads if online
    except Exception as err:
        pytest.skip(f"real zoo weights unavailable here: {err}")

    results = tmp_path / "results"
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "run",
            "-i", str(purple_slide.parent),
            "-o", str(results),
            "-m", "breast-tumor-resnet34.tcga-brca",
            "-b", "64",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output

    ours = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    golden = pd.read_csv("tests/reference/breast-tumor-resnet34.tcga-brca/purple.csv")
    assert len(ours) == len(golden)
    for col in ("minx", "miny", "width", "height"):
        np.testing.assert_array_equal(ours[col].to_numpy(), golden[col].to_numpy())
    prob_cols = [c for c in golden.columns if c.startswith("prob_")]
    assert prob_cols
    np.testing.assert_allclose(
        ours[prob_cols].to_numpy(), golden[prob_cols].to_numpy(), atol=1e-3
    )
