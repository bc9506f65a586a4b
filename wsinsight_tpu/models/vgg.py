"""Flax VGG16 (torchvision layout) with replaceable final classifier.

Serves `breast-tumor-vgg16mod.tcga-brca` and the TIL VGG16 (reference:
scripts/convert_tf_to_pytorch_til_vgg16.py:28-78 — torchvision vgg16 with
classifier[6] swapped for num_classes). Torch key layout: features.{idx},
classifier.{0,3,6}.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchConv, TorchLinear, adaptive_avg_pool_torch, max_pool_torch

Dtype = Any

# torchvision vgg16 "D" config with torch Sequential indices for conv layers.
_VGG16_CFG = [
    (0, 64), (2, 64), "M",
    (5, 128), (7, 128), "M",
    (10, 256), (12, 256), (14, 256), "M",
    (17, 512), (19, 512), (21, 512), "M",
    (24, 512), (26, 512), (28, 512), "M",
]


class VGG16(nn.Module):
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        for item in _VGG16_CFG:
            if item == "M":
                x = max_pool_torch(x, (2, 2), (2, 2))
            else:
                idx, out_ch = item
                x = TorchConv(out_ch, (3, 3), (1, 1), (1, 1), dtype=dt, name=f"features.{idx}")(x)
                x = nn.relu(x)
        x = adaptive_avg_pool_torch(x, (7, 7))
        # torch flattens NCHW -> (N, C*7*7); transpose to match that ordering.
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = nn.relu(TorchLinear(4096, dtype=dt, name="classifier.0")(x))
        x = nn.relu(TorchLinear(4096, dtype=dt, name="classifier.3")(x))
        return TorchLinear(self.num_classes, dtype=dt, name="classifier.6")(x).astype(jnp.float32)


def vgg16(num_classes: int, dtype: Dtype = jnp.float32) -> VGG16:
    return VGG16(num_classes=num_classes, dtype=dtype)


# `vgg16mod` in the zoo registry is vgg16 with a replaced final linear; the
# architecture graph is identical, only the checkpoint differs.
vgg16mod = vgg16
