"""End-task drift of the lossy fast-input wires (VERDICT r3 #8).

Measures what the YUV 4:2:0 wire and the DCT half-scale decode do to the
DECISIONS, not just the pixels: run the full inference engine on a
tissue-statistics synthetic H&E slide three times (exact RGB wire with host
resize; WSINSIGHT_WIRE=yuv420; + WSINSIGHT_DECODE_SCALE=2) with
trained-scale weights (torch-mirror ResNet34 with randomized BN statistics,
converted through the production converter), and report per-patch argmax
flip rate and probability drift vs the exact path.

Usage: python scripts/wire_drift_report.py [--side 8192] [--out report.json]
Results are recorded in docs/design.md's wire table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def make_tissue_slide(path: str, side: int, rng) -> None:
    import cv2

    from wsinsight_tpu.wsi.tiff import write_pyramidal_tiff

    base = rng.normal(0, 1, size=(side // 16, side // 16, 3)).astype(np.float32)
    base = cv2.resize(base, (side, side), interpolation=cv2.INTER_CUBIC)
    tex = rng.normal(0, 1, size=(side // 4, side // 4, 3)).astype(np.float32)
    tex = cv2.resize(tex, (side, side), interpolation=cv2.INTER_LINEAR)
    img = np.clip(
        np.stack(
            [
                200 + 28 * base[..., 0] + 10 * tex[..., 0],
                120 + 40 * base[..., 1] + 14 * tex[..., 1],
                170 + 34 * base[..., 2] + 12 * tex[..., 2],
            ],
            -1,
        ),
        0,
        255,
    ).astype(np.uint8)
    write_pyramidal_tiff(path, img, tile=(256, 256), compression="jpeg", mpp=0.25)


def trained_scale_model(out_dir: Path) -> tuple[Path, Path]:
    """Torch-mirror ResNet34 with randomized (non-degenerate) BN stats,
    converted via the production path — trained-scale weight magnitudes."""
    import torch
    import torch_refs

    from wsinsight_tpu.models.convert import (
        convert_with_template,
        save_flax_params,
        state_dict_to_arrays,
    )

    torch.manual_seed(7)  # reproducible conv/fc init across runs
    tm = torch_refs.torch_resnet34(2).eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)

    import jax
    import jax.numpy as jnp

    from wsinsight_tpu.models import create_model

    template = create_model("resnet34", 2).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    params = convert_with_template(state_dict_to_arrays(tm.state_dict()), template)

    out_dir.mkdir(parents=True, exist_ok=True)
    weights = out_dir / "weights.msgpack"
    save_flax_params(params, weights)
    cfg = {
        "spec_version": "1.0",
        "architecture": "resnet34",
        "num_classes": 2,
        "class_names": ["notumor", "tumor"],
        "patch_size_pixels": 350,
        "spacing_um_px": 0.25,
        "transform": [
            {"name": "Resize", "arguments": {"size": 224}},
            {"name": "ToTensor"},
            {
                "name": "Normalize",
                "arguments": {
                    "mean": [0.7238, 0.5716, 0.6779],
                    "std": [0.112, 0.1459, 0.1089],
                },
            },
        ],
    }
    cfg_path = out_dir / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    return cfg_path, weights


def run_config(tag: str, env: dict, slide_dir: Path, model: tuple[Path, Path], td: Path):
    from wsinsight_tpu.engine import run_inference
    from wsinsight_tpu.patchlib import segment_and_patch_one_slide
    from wsinsight_tpu.uri_path import URIPath
    from wsinsight_tpu.zoo import load_local_model

    results = td / f"results_{tag}"
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        slide_path = next(slide_dir.glob("*.svs"))
        t0 = time.perf_counter()
        segment_and_patch_one_slide(
            slide_path=URIPath(str(slide_path)),
            save_dir=URIPath(str(results)),
            qupath_detection_dir=None,
            qupath_geojson_detection_dir=None,
            qupath_geojson_annotation_dir=None,
            patch_size_px=350,
            patch_spacing_um_px=0.25,
        )
        run_inference(
            wsi_dir=URIPath(str(slide_dir)),
            slide_paths=[URIPath(str(slide_path))],
            results_dir=URIPath(str(results)),
            model_info=load_local_model(*model),
            batch_size=32,
            num_workers=4,
        )
        dt = time.perf_counter() - t0
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)
    import pandas as pd

    csv = results / "model-outputs-csv" / (slide_path.stem + ".csv")
    return pd.read_csv(csv), dt


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--side", type=int, default=8192)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(13)
    with tempfile.TemporaryDirectory(prefix="wire_drift_") as tds:
        td = Path(tds)
        slide_dir = td / "slides"
        slide_dir.mkdir()
        make_tissue_slide(str(slide_dir / "tissue.svs"), args.side, rng)
        model = trained_scale_model(td / "model")

        exact, dt_exact = run_config(
            "exact", {"WSINSIGHT_HOST_RESIZE": "1"}, slide_dir, model, td
        )
        configs = {
            "yuv420": {"WSINSIGHT_HOST_RESIZE": "1", "WSINSIGHT_WIRE": "yuv420"},
            "half_scale_yuv420": {
                "WSINSIGHT_WIRE": "yuv420",
                "WSINSIGHT_DECODE_SCALE": "2",
            },
        }
        prob_cols = [c for c in exact.columns if c.startswith("prob_")]
        base_probs = exact[prob_cols].to_numpy()
        base_arg = base_probs.argmax(1)

        # Saturation check: a zero flip rate only means something if the
        # decisions were contested — report how far the exact path's top
        # probabilities sit from 1.0.
        top = base_probs.max(1)
        report = {
            "n_patches": int(len(exact)),
            "exact_wall_sec": round(dt_exact, 2),
            "exact_top_prob": {
                "frac_below_0.99": round(float((top < 0.99).mean()), 4),
                "frac_below_0.9": round(float((top < 0.9).mean()), 4),
                "p10": round(float(np.percentile(top, 10)), 4),
                "median": round(float(np.median(top)), 4),
            },
            "configs": {},
        }
        for tag, env in configs.items():
            df, dt = run_config(tag, env, slide_dir, model, td)
            probs = df[prob_cols].to_numpy()
            flips = int((probs.argmax(1) != base_arg).sum())
            dp = np.abs(probs - base_probs)
            report["configs"][tag] = {
                "argmax_flip_rate": round(flips / len(exact), 5),
                "argmax_flips": flips,
                "max_abs_dprob": round(float(dp.max()), 5),
                "mean_abs_dprob": round(float(dp.mean()), 6),
                "p99_abs_dprob": round(float(np.percentile(dp, 99)), 5),
                "wall_sec": round(dt, 2),
            }

    print(json.dumps(report, indent=1))
    if args.out:
        args.out.write_text(json.dumps(report, indent=1) + "\n")


if __name__ == "__main__":
    main()
