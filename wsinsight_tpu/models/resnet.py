"""Flax ResNet-34/50 and pre-activation ResNet-34, torchvision state-dict compatible.

Replaces the reference's opaque TorchScript zoo forwards for
`breast-tumor-resnet34.tcga-brca`, `lung-tumor-resnet34.tcga-luad`,
`prostate-tumor-resnet34.tcga-prad` (ResNet34), resnet50-based models, and
`pancreas-tumor-preactresnet34.tcga-paad` (reference executes these at
wsinsight/modellib/run_inference.py:537-558). Layer names follow torch keys so
:mod:`wsinsight_tpu.models.convert` maps checkpoints mechanically.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import EvalBN, TorchConv, TorchLinear, global_avg_pool, max_pool_torch

Dtype = Any


class ResNet(nn.Module):
    """torchvision.models.resnet{18,34,50,...} (eval mode)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    bottleneck: bool = False
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        x = TorchConv(64, (7, 7), (2, 2), (3, 3), use_bias=False, dtype=dt, name="conv1")(x)
        x = EvalBN(64, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_torch(x, (3, 3), (2, 2), (1, 1))

        expansion = 4 if self.bottleneck else 1
        width = 64
        for li, blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                prefix = f"layer{li + 1}.{bi}"
                s = stride if bi == 0 else 1
                in_ch = x.shape[-1]
                out_ch = width * expansion
                identity = x
                if s != 1 or in_ch != out_ch:
                    identity = TorchConv(
                        out_ch, (1, 1), (s, s), use_bias=False, dtype=dt,
                        name=f"{prefix}.downsample.0",
                    )(x)
                    identity = EvalBN(out_ch, name=f"{prefix}.downsample.1")(identity)
                if self.bottleneck:
                    y = TorchConv(width, (1, 1), use_bias=False, dtype=dt, name=f"{prefix}.conv1")(x)
                    y = nn.relu(EvalBN(width, name=f"{prefix}.bn1")(y))
                    y = TorchConv(width, (3, 3), (s, s), (1, 1), use_bias=False, dtype=dt, name=f"{prefix}.conv2")(y)
                    y = nn.relu(EvalBN(width, name=f"{prefix}.bn2")(y))
                    y = TorchConv(out_ch, (1, 1), use_bias=False, dtype=dt, name=f"{prefix}.conv3")(y)
                    y = EvalBN(out_ch, name=f"{prefix}.bn3")(y)
                else:
                    y = TorchConv(width, (3, 3), (s, s), (1, 1), use_bias=False, dtype=dt, name=f"{prefix}.conv1")(x)
                    y = nn.relu(EvalBN(width, name=f"{prefix}.bn1")(y))
                    y = TorchConv(width, (3, 3), (1, 1), (1, 1), use_bias=False, dtype=dt, name=f"{prefix}.conv2")(y)
                    y = EvalBN(width, name=f"{prefix}.bn2")(y)
                x = nn.relu(y + identity)
            width *= 2

        x = global_avg_pool(x)
        return TorchLinear(self.num_classes, dtype=dt, name="fc")(x).astype(jnp.float32)


class PreActResNet(nn.Module):
    """Pre-activation ResNet (He et al. 2016), ImageNet layout.

    Used by the paad preactresnet34 zoo model. Blocks are bn->relu->conv with
    the shortcut taken after the first pre-activation; final bn->relu before
    global pooling. Torch key layout: conv1, layer{L}.{B}.bn1/conv1/bn2/conv2,
    layer{L}.{B}.downsample.0, bn_final, fc.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        x = TorchConv(64, (7, 7), (2, 2), (3, 3), use_bias=False, dtype=dt, name="conv1")(x)
        x = max_pool_torch(x, (3, 3), (2, 2), (1, 1))

        width = 64
        for li, blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                prefix = f"layer{li + 1}.{bi}"
                s = stride if bi == 0 else 1
                in_ch = x.shape[-1]
                pre = nn.relu(EvalBN(in_ch, name=f"{prefix}.bn1")(x))
                if s != 1 or in_ch != width:
                    identity = TorchConv(
                        width, (1, 1), (s, s), use_bias=False, dtype=dt,
                        name=f"{prefix}.downsample.0",
                    )(pre)
                else:
                    identity = x
                y = TorchConv(width, (3, 3), (s, s), (1, 1), use_bias=False, dtype=dt, name=f"{prefix}.conv1")(pre)
                y = nn.relu(EvalBN(width, name=f"{prefix}.bn2")(y))
                y = TorchConv(width, (3, 3), (1, 1), (1, 1), use_bias=False, dtype=dt, name=f"{prefix}.conv2")(y)
                x = y + identity
            width *= 2

        x = nn.relu(EvalBN(x.shape[-1], name="bn_final")(x))
        x = global_avg_pool(x)
        return TorchLinear(self.num_classes, dtype=dt, name="fc")(x).astype(jnp.float32)


def resnet34(num_classes: int, dtype: Dtype = jnp.float32) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), bottleneck=False, num_classes=num_classes, dtype=dtype)


def resnet50(num_classes: int, dtype: Dtype = jnp.float32) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), bottleneck=True, num_classes=num_classes, dtype=dtype)


def preactresnet34(num_classes: int, dtype: Dtype = jnp.float32) -> PreActResNet:
    return PreActResNet(layers=(3, 4, 6, 3), num_classes=num_classes, dtype=dtype)
