"""QuPath project builder pairing model-output CSVs with GeoJSON overlays.

Re-creation of the reference helper (reference: wsinsight/qupath.py:20-88);
requires `paquo` + a QuPath installation (PAQUO_QUPATH_DIR) at runtime.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from ..uri_path import URIPath

try:
    from paquo.images import QuPathPathObjectHierarchy  # type: ignore
    from paquo.projects import QuPathProject, QuPathProjectImageEntry  # type: ignore

    HAS_PAQUO = True
except Exception:
    HAS_PAQUO = False


def add_image_and_geojson(qupath_proj, *, image_path, geojson_path) -> None:
    """Register one image plus its GeoJSON annotations into a QuPath project."""
    with open(geojson_path) as f:
        try:
            geojson_features = json.load(f)["features"]
        except Exception as e:
            print(f"Unable to find features key:: {e}")
            return

    entry = qupath_proj.add_image(image_path)
    if not isinstance(entry, QuPathProjectImageEntry):
        print("Unexpected return from QuPathProject.add_image; contact the developer.")
        return
    try:
        hierarchy: QuPathPathObjectHierarchy = entry.hierarchy
        hierarchy.load_geojson(geojson_features)
    except Exception as e:
        print(f"Failed to run load_geojson function with error:: {e}")


def make_qupath_project(
    wsi_dir: str | URIPath | None,
    results_dir: Path,
    slide_paths=None,
) -> None:
    """Materialize a QuPath project from CSV+GeoJSON outputs.

    Images pair with CSV stems from `slide_paths` when given (any suffix);
    otherwise from `wsi_dir/<stem>.svs` like the reference (qupath.py:48-88).
    With neither, there is nothing to pair against — fail fast instead of
    TypeError-ing after the whole pipeline already ran.
    """
    if not HAS_PAQUO:
        print(
            """Cannot find QuPath.
QuPath is required to use this functionality but it cannot be found.
If QuPath is installed, please define the environment variable
PAQUO_QUPATH_DIR with the location of the QuPath installation.
If QuPath is not installed, please install it from https://qupath.github.io/."""
        )
        sys.exit(1)

    print("Found QuPath successfully!")
    qupath_project_directory = results_dir / "model-outputs-qupath"

    if wsi_dir is None and not slide_paths:
        raise ValueError(
            "make_qupath_project needs wsi_dir or slide_paths to locate images"
        )
    by_stem = {p.stem: p for p in slide_paths} if slide_paths else {}

    csv_files = list((results_dir / "model-outputs-csv").glob("*.csv"))
    slides_and_geojsons = []
    for csv_file in csv_files:
        file_name = csv_file.stem
        json_file = results_dir / "model-outputs-geojson" / (file_name + ".geojson")
        if by_stem:
            image_file = by_stem.get(file_name)
        else:
            image_file = wsi_dir / (file_name + ".svs")
        if image_file is not None and json_file.exists() and image_file.exists():
            slides_and_geojsons.append((image_file, json_file))
        else:
            print(f"Skipping CSV: {csv_file.name} (No corresponding JSON)")

    with QuPathProject(qupath_project_directory, mode="w") as qp:
        for image_path, geojson_path in slides_and_geojsons:
            try:
                add_image_and_geojson(qp, image_path=image_path, geojson_path=geojson_path)
            except Exception as e:
                print(f"Failed to add image/geojson with error:: {e}")
    print("Successfully created QuPath Project!")
