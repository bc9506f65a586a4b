"""Convert a torch/TorchScript zoo checkpoint to a flax msgpack checkpoint.

The analog of the reference's conversion tooling (reference:
scripts/convert_to_torchscript.py:22-45 and the TF->PyTorch converters): the
zoo ships TorchScript weights; wsinsight-tpu executes flax modules, so each
checkpoint is converted once and cached.

Conversion is template-guided: the flax module's own init tree drives the
nesting, leaf names, and target shapes (models/convert.py convert_with_template),
so the nested ViT/CellViT/HoVer-Net families convert as reliably as the
flat-named classifiers, and any key-spelling mismatch in a newly released
checkpoint fails immediately with a per-layer report instead of silently
producing wrong weights.

Usage:
    python scripts/convert_torch_to_flax.py INPUT.pt OUTPUT.msgpack \
        --architecture resnet34 --num-classes 2 [--input-size 224] \
        [--halo-size 46] [--validate]

With --validate and a TorchScript input, a random batch is run through BOTH
frameworks and the max |d logit| is printed (budget: 1e-3, BASELINE.md); for
plain state-dict inputs (no executable torch graph) validation falls back to
a flax forward + shape report.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _build_model(architecture: str, num_classes: int, halo_size: int | None):
    from wsinsight_tpu.models import create_model

    model = create_model(architecture, num_classes)
    if halo_size is not None and hasattr(model, "halo_size"):
        model = model.clone(halo_size=halo_size)
    return model


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", type=Path, help="torch checkpoint (.pt/.pth/.ts state dict or TorchScript)")
    ap.add_argument("output", type=Path, help="output flax .msgpack path")
    ap.add_argument("--architecture", required=True)
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--input-size", type=int, default=None,
                    help="model input side in px (default: 256 for cell models, 224 otherwise)")
    ap.add_argument("--halo-size", type=int, default=None,
                    help="halo for cell models (clones the module before init)")
    ap.add_argument("--validate", action="store_true",
                    help="run a random batch through torch + flax and report max |dlogit|")
    ap.add_argument("--atol", type=float, default=1e-3, help="validation budget (default 1e-3)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wsinsight_tpu.models.convert import (
        HAS_TORCH,
        convert_with_template,
        load_torch_weights,
        save_flax_params,
    )

    is_cell = args.architecture.lower().replace("-", "_").startswith(("cellvit", "hovernet"))
    size = args.input_size or (256 if is_cell else 224)

    model = _build_model(args.architecture, args.num_classes, args.halo_size)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32)
    )["params"]

    sd = load_torch_weights(args.input)
    if args.architecture.lower().replace("-", "_").startswith("hovernet"):
        from wsinsight_tpu.models.convert import normalize_hovernet_keys

        sd = normalize_hovernet_keys(sd)
    params = convert_with_template(sd, template, strict=True)
    sha = save_flax_params(params, args.output)
    print(f"wrote {args.output} (sha256={sha}, {len(sd)} torch tensors mapped)")

    if not args.validate:
        return

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    flax_out = model.apply({"params": params}, jnp.asarray(x))

    torch_out = None
    if HAS_TORCH:
        import torch

        try:
            ts = torch.jit.load(str(args.input), map_location="cpu").eval()
            with torch.no_grad():
                torch_out = ts(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        except Exception as err:  # plain state dict: no executable torch graph
            print(f"torch forward unavailable ({type(err).__name__}); shape check only")

    def _report(name: str, f, t) -> None:
        f = np.asarray(f, np.float32)
        t = t.detach().cpu().numpy().astype(np.float32)
        if t.ndim == 4 and f.ndim == 4 and t.shape[1] == f.shape[-1]:
            t = np.transpose(t, (0, 2, 3, 1))  # NCHW -> NHWC map heads
        d = float(np.max(np.abs(f - t)))
        status = "OK" if d <= args.atol else f"EXCEEDS budget {args.atol}"
        print(f"  {name}: max |d| = {d:.3e}  [{status}]")

    if torch_out is None:
        shape = jax.tree_util.tree_map(lambda t: tuple(t.shape), flax_out)
        print(f"flax forward OK, output shape(s): {shape}")
        return

    print("torch-vs-flax parity on a random batch:")
    if isinstance(flax_out, dict):
        if isinstance(torch_out, (list, tuple)):
            # A tuple-returning TorchScript graph carries no head names; pair
            # positionally with the flax module's forward-return order (its
            # dict insertion order), NOT alphabetically — e.g. CellViT returns
            # (nuclei_binary_map, hv_map, nuclei_type_map, tissue_types).
            heads = list(flax_out)
            print(f"  (torch tuple output paired positionally as: {heads})")
            torch_out = dict(zip(heads, torch_out))
        for key in flax_out:
            if isinstance(torch_out, dict) and key in torch_out:
                _report(key, flax_out[key], torch_out[key])
    else:
        _report("logits", flax_out, torch_out)


if __name__ == "__main__":
    main()
