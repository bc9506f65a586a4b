"""`wsinsight run` — one-shot patch + infer orchestration.

Mirrors the reference composition (reference: wsinsight/cli/run.py:620-689):
enumerate slides once, ctx.invoke the patch stage then the infer stage with the
overlapping parameter subsets, optionally build a QuPath project.
"""

from __future__ import annotations

import click

from ..utils.metadata import write_run_metadata
from . import _options as opt
from .infer import infer
from .patch import patch

# Parameter names forwarded to each stage (reference: cli/run.py:89-155).
_PATCH_PARAM_NAMES = [
    "wsi_dir",
    "slide_paths",
    "results_dir",
    "references_dir",
    "qupath_detection_dir",
    "qupath_geojson_detection_dir",
    "qupath_geojson_annotation_dir",
    "qupath_detection_patch_size",
    "qupath_annotation_patch_size",
    "qupath_spacing_um_px",
    "qupath_name_as_class",
    "model_name",
    "config",
    "model_path",
    "cache_image_patches",
    "histoqc_dir",
    "seg_thumbsize",
    "seg_median_filter_size",
    "seg_binary_threshold",
    "seg_closing_kernel_size",
    "seg_min_object_size_um2",
    "seg_min_hole_size_um2",
    "patch_overlap_ratio",
    "patch_size_um",
    "patch_size_px",
]

_INFER_PARAM_NAMES = [
    "wsi_dir",
    "slide_paths",
    "results_dir",
    "references_dir",
    "qupath_detection_dir",
    "qupath_geojson_detection_dir",
    "qupath_geojson_annotation_dir",
    "qupath_detection_patch_size",
    "qupath_annotation_patch_size",
    "qupath_spacing_um_px",
    "qupath_name_as_class",
    "model_name",
    "config",
    "model_path",
    "batch_size",
    "num_workers",
    "export_workers",
    "stitch_workers",
    "speedup",
    "fast_input",
    "geojson",
    "omecsv",
    "patch_overlap_ratio",
    "patch_size_um",
    "patch_size_px",
    "hplot",
    "hplot_max_neighbor_distance",
    "hplot_base_types",
    "hplot_target_types",
    "hplot_k",
    "hplot_n",
    "hplot_r",
    "hplot_range_max",
    "hplot_range_min",
    "hplot_samples_with_valid_range_only",
    "cme_cellular",
    "cme_annotation",
    "cme_soft_mode",
    "cme_clustering_k",
    "cme_clustering_resolutions",
]


def _copy_params(fn):
    """Attach all params of command `fn` to the decorated function (dedup).

    Appends to __click_params__, which @click.command collects when it builds
    the Command (applied below @click.command in the decorator stack).
    """

    def deco(target):
        params = list(getattr(target, "__click_params__", []))
        existing = {p.name for p in params}
        for param in fn.params:
            if param.name not in existing:
                params.append(param)
                existing.add(param.name)
        target.__click_params__ = params
        return target

    return deco


@click.command()
@click.pass_context
@click.option(
    "--qupath",
    is_flag=True,
    default=False,
    show_default=True,
    help="Create a QuPath project from the results (requires paquo + QuPath).",
)
@_copy_params(patch)
@_copy_params(infer)
def run(ctx: click.Context, *, qupath: bool, **params) -> None:
    """Run the patch stage then the infer stage in one shot."""
    wsi_dir = params.get("wsi_dir")
    slide_paths = params.get("slide_paths")
    if wsi_dir is not None and not slide_paths:
        params["slide_paths"] = tuple(opt.list_slides(wsi_dir))

    patch_kwargs = {k: params[k] for k in _PATCH_PARAM_NAMES if k in params}
    ctx.invoke(patch, **patch_kwargs)

    infer_kwargs = {k: params[k] for k in _INFER_PARAM_NAMES if k in params}
    ctx.invoke(infer, **infer_kwargs)

    if qupath:
        from ..writers import make_qupath_project

        click.echo("Creating QuPath project with results")
        make_qupath_project(
            wsi_dir, params["results_dir"], slide_paths=params.get("slide_paths")
        )

    results_dir = params["results_dir"]
    model_name = params.get("model_name")
    config = params.get("config")
    model_path = params.get("model_path")
    if model_name is not None or config is not None:
        model_obj = opt.resolve_model(model_name, config, model_path)
        out = write_run_metadata(results_dir, "run", model_obj)
        click.echo(f"\nSaved metadata about run to {out}\n")
    click.secho("\nWSInsight tasks are all finished.\n", fg="green")
