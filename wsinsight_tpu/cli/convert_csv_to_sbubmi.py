"""Convert model-output CSVs to Stony Brook BMI viewer formats.

Re-creation of the reference's legacy `tosbu` exporter (reference:
wsinsight/cli/convert_csv_to_sbubmi.py:1-439). Output tree:

single class:
    heatmap_json/heatmap-SLIDEID.json + meta-SLIDEID.json
    heatmap_txt/{color-SLIDEID, prediction-SLIDEID}
multi class: one subdirectory per class label.

Like the reference, the command is implemented but not registered on the CLI
group (reference: cli/cli.py:53); import `tosbu` to use it.
"""

from __future__ import annotations

import json
import random
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any

import click
import numpy as np
import pandas as pd

from ..wsi import get_wsi_cls


def _box_to_polygon(*, minx: float, miny: float, width: float, height: float):
    maxx = minx + width
    maxy = miny + height
    return [(maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny), (maxx, miny)]


def write_heatmap_and_meta_json_lines(
    input: str | Path,
    output_heatmap: str | Path,
    output_meta: str | Path,
    slide_width: int,
    slide_height: int,
    execution_id: str,
    study_id: str,
    case_id: str,
    subject_id: str,
    class_name: str,
    run_metadata: dict,
) -> None:
    """Write JSON-lines heatmap + meta files for one slide."""
    date = int(time.time())
    version_dict: dict = (run_metadata.get("runtime") or {}).get("git") or {}
    weights = run_metadata.get("model_weights") or {}
    version_dict = dict(version_dict)
    version_dict["model_path"] = weights.get("weights_file")
    version_dict["model_hash"] = weights.get("weights_sha256")
    version_dict["model_url"] = weights.get("weights_url")
    version_dict["model_ver"] = None

    def row_to_json(row: pd.Series) -> dict[str, Any]:
        minx, miny, width, height = row["minx"], row["miny"], row["width"], row["height"]
        patch_area_base_pixels = width * height
        minx = float(minx / slide_width)
        miny = float(miny / slide_height)
        width = float(width / slide_width)
        height = float(height / slide_height)
        maxx = minx + width
        maxy = miny + height
        coords = _box_to_polygon(minx=minx, miny=miny, width=width, height=height)
        if f"prob_{class_name}" not in row.index:
            raise KeyError(f"class name not found in results: {class_name}")
        class_probability: float = row[f"prob_{class_name}"]
        return {
            "type": "Feature",
            "parent_id": "self",
            "object_type": "heatmap_multiple",
            "x": (minx + maxx) / 2,
            "y": (miny + maxy) / 2,
            "normalized": "true",
            "footprint": patch_area_base_pixels,
            "geometry": {"coordinates": [coords], "type": "Polygon"},
            "provenance": {
                "analysis": {
                    "source": "computer",
                    "execution_id": execution_id,
                    "cancer_type": "quip",
                    "study_id": study_id,
                    "computation": "heatmap",
                    "execution_time": run_metadata.get("timestamp"),
                },
                "image": {"case_id": case_id, "subject_id": subject_id},
                "version": version_dict,
            },
            "bbox": [minx, miny, maxx, maxy],
            "properties": {
                "multiheat_param": {
                    "human_weight": -1,
                    "metric_array": [class_probability],
                    "heatname_array": [class_name],
                    "weight_array": ["1"],
                },
                "metric_value": class_probability,
                "metric_type": "tile_dice",
                "human_mark": -1,
            },
            "date": {"$date": date},
        }

    df = pd.read_csv(input)
    features = df.apply(row_to_json, axis=1).tolist()
    with open(output_heatmap, "w") as f:
        f.writelines(json.dumps(row) + "\n" for row in features)

    meta_dict = {
        "color": "yellow",
        "title": execution_id,
        "image": {"case_id": case_id, "subject_id": subject_id},
        "provenance": {
            "analysis_execution_id": execution_id,
            "analysis_execution_date": run_metadata.get("timestamp"),
            "study_id": study_id,
            "type": "computer",
            "version": version_dict,
        },
        "submit_date": {"$date": date},
        "randval": random.uniform(0, 1),
    }
    with open(output_meta, "w") as f:
        json.dump(meta_dict, f)


def write_heatmap_txt(input: str | Path, output: str | Path, class_names: list[str]) -> None:
    """Per-patch center coordinates + class probabilities, space-separated."""
    df = pd.read_csv(input)
    df.loc[:, "x_loc"] = (df.minx + (df.width / 2)).round().astype(int)
    df.loc[:, "y_loc"] = (df.miny + (df.height / 2)).round().astype(int)
    prob_cols = [f"prob_{c}" for c in class_names]
    df = df.loc[:, ["x_loc", "y_loc", *prob_cols]]
    df = df.rename(columns={c: c[5:] for c in prob_cols})
    df.to_csv(output, index=False, sep=" ")


def write_color_txt(
    input: str | Path,
    output: str | Path,
    slide,
    num_processes: int = 6,
) -> None:
    """Whiteness/blackness/redness per patch. Threaded (the in-house reader
    decodes without the GIL; the reference used a fork pool)."""
    df = pd.read_csv(input)

    def get_color(row: dict) -> tuple[float, float, float]:
        patch_im = slide.read_region(
            location=(int(row["minx"]), int(row["miny"])),
            level=0,
            size=(int(row["width"]), int(row["height"])),
        )
        arr = np.asarray(patch_im)
        white = float(np.std(arr, axis=(0, 1)).mean())
        black = float(arr.mean())
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        red = float(np.mean((r >= 190) * (g <= 100) * (b <= 100)))
        return white, black, red

    rows = df.to_dict("records")
    with ThreadPoolExecutor(max_workers=max(1, num_processes)) as ex:
        results = list(ex.map(get_color, rows))
    df.loc[:, ["whiteness", "blackness", "redness"]] = results
    # Reference computes these center-ish columns with the same (quirky) math.
    df.loc[:, "cx"] = (df.minx + ((df.minx + df.width) / 2)).astype(int)
    df.loc[:, "cy"] = (df.miny + ((df.miny + df.height) / 2)).astype(int)
    df = df.loc[:, ["cx", "cy", "whiteness", "blackness", "redness"]]
    df.to_csv(output, header=False, index=False, sep=" ")


@click.command()
@click.argument("results_dir", type=click.Path(exists=True, file_okay=False, path_type=Path))
@click.argument("output", type=click.Path(exists=False, path_type=Path))
@click.option("--wsi-dir", required=True, type=click.Path(exists=True, file_okay=False, path_type=Path))
@click.option("--execution-id", required=True, help="Unique execution ID for this run.")
@click.option("--study-id", required=True, help="Study ID, like TCGA-BRCA.")
@click.option("--make-color-text/--no-make-color-text", default=False)
@click.option("--num-processes", type=int, default=4)
def tosbu(
    *,
    results_dir: Path,
    output: Path,
    wsi_dir: Path,
    execution_id: str,
    study_id: str,
    make_color_text: bool = False,
    num_processes: int = 4,
) -> None:
    """Convert model outputs to Stony Brook BMI viewer formats."""
    if output.exists():
        raise click.ClickException("Output directory already exists.")
    model_outputs = results_dir / "model-outputs-csv"
    if not model_outputs.exists():
        model_outputs = results_dir / "model-outputs"  # legacy layout
    if not model_outputs.exists():
        raise click.ClickException(
            "Model outputs have not been generated yet. Please run model inference."
        )
    metas = sorted(results_dir.glob("*_metadata_*.json")) + [results_dir / "run_metadata.json"]
    metas = [m for m in metas if m.exists()]
    if not metas:
        raise click.ClickException(f"Cannot find run metadata in {results_dir}.")
    csvs = sorted(model_outputs.glob("*.csv"))
    if not csvs:
        raise click.ClickException("No CSVs found. Did you generate model outputs?")

    output.mkdir(exist_ok=False)
    with open(metas[-1]) as f:
        run_metadata: dict = json.load(f)

    class_names = (run_metadata.get("model_config") or {}).get("class_names") or (
        run_metadata.get("model_weights") or {}
    ).get("class_names", [])
    ignore_names = {"notils", "notumor"}
    class_names = [n for n in class_names if n not in ignore_names]
    if not class_names:
        raise click.ClickException("No class names found in run metadata.")

    for ii, input_csv in enumerate(csvs):
        click.echo(f"Converting outputs for slide {ii + 1} of {len(csvs)}")
        slide_id = input_csv.stem
        candidates = list(wsi_dir.glob(f"{slide_id}.*"))
        if not candidates:
            click.secho(f"WSI file not found for: {slide_id}; skipping", bg="red")
            continue
        slide = get_wsi_cls()(candidates[0])
        slide_width, slide_height = slide.level_dimensions[0]

        for class_name in class_names:
            sub = "" if len(class_names) == 1 else class_name
            output_heatmap = output / "heatmap_json" / sub / f"heatmap_{slide_id}.json"
            output_meta = output_heatmap.parent / f"meta_{slide_id}.json"
            output_heatmap.parent.mkdir(parents=True, exist_ok=True)
            write_heatmap_and_meta_json_lines(
                input=input_csv,
                output_heatmap=output_heatmap,
                output_meta=output_meta,
                slide_width=slide_width,
                slide_height=slide_height,
                execution_id=execution_id,
                study_id=study_id,
                case_id=slide_id,
                subject_id=slide_id,
                class_name=class_name,
                run_metadata=run_metadata,
            )
            output_txt = output / "heatmap_txt" / sub / f"prediction-{slide_id}"
            output_txt.parent.mkdir(parents=True, exist_ok=True)
            write_heatmap_txt(input=input_csv, output=output_txt, class_names=[class_name])

        if make_color_text:
            sub = "" if len(class_names) == 1 else class_names[0]
            output_color = output / "heatmap_txt" / sub / f"color-{slide_id}"
            write_color_txt(
                input=input_csv, output=output_color, slide=slide, num_processes=num_processes
            )
            for class_name in class_names[1:]:
                cp_dst = output / "heatmap_txt" / class_name / output_color.name
                cp_dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy(output_color, cp_dst)
