"""`wsinsight models` — registry listing + checkpoint ingestion tooling.

The reference points users at the external `wsinfer-zoo ls` for listing
(reference: README.md:252) and ships standalone conversion scripts
(reference: scripts/convert_to_torchscript.py); here both live on the CLI:

* ``wsinsight models`` / ``wsinsight models ls`` — registry table
* ``wsinsight models convert IN [OUT] --architecture A --num-classes N
  [--report]`` — torch->flax conversion with a per-layer mapping-coverage
  report (works on any state dict, including torch mirrors, so ingestion
  problems surface before real zoo weights are ever downloaded).
"""

from __future__ import annotations

from pathlib import Path

import click

from ..zoo import load_registry


@click.group(name="models", invoke_without_command=True)
@click.pass_context
def models_cmd(ctx: click.Context) -> None:
    """Model registry + conversion tools (run bare to list models)."""
    if ctx.invoked_subcommand is None:
        _print_registry()


def _print_registry() -> None:
    reg = load_registry()
    rows = []
    for name, entry in sorted(reg.models.items()):
        cfg = entry.get("config", {})
        rows.append(
            (
                name,
                cfg.get("architecture", "?"),
                f"{cfg.get('patch_size_pixels', '?')}px @ {cfg.get('spacing_um_px', '?')}um",
                ",".join(map(str, cfg.get("class_names", []))),
            )
        )
    if not rows:
        click.echo("No models registered.")
        return
    w0 = max(len(r[0]) for r in rows)
    w1 = max(len(r[1]) for r in rows)
    w2 = max(len(r[2]) for r in rows)
    for name, arch, geom, classes in rows:
        click.echo(f"{name:<{w0}}  {arch:<{w1}}  {geom:<{w2}}  {classes}")


@models_cmd.command(name="ls")
def models_ls() -> None:
    """List registered models and their geometry."""
    _print_registry()


@models_cmd.command(name="convert")
@click.argument("input", type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.argument("output", required=False, type=click.Path(dir_okay=False, path_type=Path))
@click.option("--architecture", required=True, help="flax registry name (see `wsinsight models`)")
@click.option("--num-classes", type=int, required=True)
@click.option("--input-size", type=int, default=None,
              help="model input side in px (default 256 for cell models, 224 otherwise)")
@click.option("--halo-size", type=int, default=None, help="halo for cell models")
@click.option("--report", "show_report", is_flag=True,
              help="print per-layer mapping coverage; with no OUTPUT, report only")
def models_convert(
    input: Path,
    output: Path | None,
    architecture: str,
    num_classes: int,
    input_size: int | None,
    halo_size: int | None,
    show_report: bool,
) -> None:
    """Convert a torch checkpoint (state dict or TorchScript) to flax msgpack.

    With --report, prints how every torch tensor mapped onto the flax
    template (the ingestion report for real zoo weights: run it on a fresh
    download before trusting the conversion).
    """
    import jax
    import jax.numpy as jnp

    from ..models import create_model
    from ..models.convert import (
        conversion_report,
        convert_with_template,
        load_torch_weights,
        normalize_hovernet_keys,
        save_flax_params,
    )

    arch_key = architecture.lower().replace("-", "_")
    is_cell = arch_key.startswith(("cellvit", "hovernet"))
    size = input_size or (256 if is_cell else 224)

    model = create_model(architecture, num_classes)
    if halo_size is not None and hasattr(model, "halo_size"):
        model = model.clone(halo_size=halo_size)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32)
    )["params"]

    sd = load_torch_weights(input)
    if arch_key.startswith("hovernet"):
        sd = normalize_hovernet_keys(sd)

    if show_report:
        rep = conversion_report(sd, template)
        click.echo(
            f"template leaves filled: {rep['template_filled']}/{rep['template_leaves']}"
            f"  (torch tensors: {rep['torch_tensors']})"
        )
        for problem in rep["problems"]:
            click.echo(f"  ! {problem}")
        if rep["ok"]:
            click.echo("mapping complete: every template leaf filled, no leftovers")
        if output is None:
            if not rep["ok"]:
                raise SystemExit(1)
            return
        params = rep["params"]
        if not rep["ok"]:
            raise click.ClickException(
                "conversion has mismatches (see report above); not writing output"
            )
    else:
        params = convert_with_template(sd, template, strict=True)

    assert output is not None
    sha = save_flax_params(params, output)
    click.echo(f"wrote {output} (sha256={sha})")
