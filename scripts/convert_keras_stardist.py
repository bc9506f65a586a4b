"""Convert StarDist's released Keras weights to a flax msgpack checkpoint.

Usage:
    python scripts/convert_keras_stardist.py weights_best.h5 \
        $WSINSIGHT_MODEL_DIR/stardist_2D_versatile_he.msgpack

The input is the ``weights_best.h5`` from the official ``2D_versatile_he``
model (what TF/StarDist downloads to
``~/.keras/models/StarDist2D/2D_versatile_he/``). No TensorFlow needed — the
HDF5 weight file is parsed directly. The analogue of the reference's
TF->torch converters (/root/reference/scripts/convert_tf_to_pytorch_til_*.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("keras_h5", type=Path, help="released weights_best.h5")
    ap.add_argument("out_msgpack", type=Path, help="flax checkpoint to write")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wsinsight_tpu.models.convert import convert_stardist_keras_h5, save_flax_params
    from wsinsight_tpu.models.stardist import StarDistUNet

    params = convert_stardist_keras_h5(args.keras_h5)

    # Structural gate: the converted tree must initialize-compatible with the
    # flax module (same names, same shapes) and run one forward.
    model = StarDistUNet()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    for name, leaves in ref.items():
        for leaf, arr in leaves.items():
            got = np.shape(params[name][leaf])
            want = np.shape(arr)
            assert got == want, f"{name}/{leaf}: {got} != {want}"
    prob, dist = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
    assert prob.shape == (1, 32, 32, 1) and dist.shape == (1, 32, 32, 32)

    args.out_msgpack.parent.mkdir(parents=True, exist_ok=True)
    digest = save_flax_params(params, args.out_msgpack)
    print(f"wrote {args.out_msgpack} sha256={digest}")


if __name__ == "__main__":
    main()
