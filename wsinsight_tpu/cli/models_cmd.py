"""`wsinsight models` — list the model registry (the reference points users at
the external `wsinfer-zoo ls`, reference: README.md:252)."""

from __future__ import annotations

import click

from ..zoo import load_registry


@click.command(name="models")
def models_cmd() -> None:
    """List registered models and their geometry."""
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
