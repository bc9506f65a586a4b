"""HoVer-Net (fast/PanNuke) in flax.

Serves the `hovernet_fast_pannuke` single-cell model (reference:
README.md:217 — ResNet50 backbone, dual-branch decoders predicting nuclear
masks + horizontal/vertical distance maps; executed as TorchScript through the
same stitcher contract as CellViT, modellib/tilefuse.py:220-278).

Structure: pre-activation ResNet50 encoder with skip features at 4 scales,
three upsampling decoders with dense conv units (NP 2ch / HV 2ch / TP Kch),
outputs center-cropped to patch - 2*halo (fast mode: 256 -> 164). Checkpoint
key mapping will be finalized against the released weights; the forward
contract (dict of channel-first maps) is what the engine consumes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import EvalBN, TorchConv, max_pool_torch

Dtype = Any


class PreActBottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        in_ch = x.shape[-1]
        out_ch = self.features * 4
        pre = nn.relu(EvalBN(in_ch, name="bn1")(x))
        if self.stride != 1 or in_ch != out_ch:
            shortcut = TorchConv(out_ch, (1, 1), (self.stride, self.stride), use_bias=False,
                                 dtype=dt, name="shortcut")(pre)
        else:
            shortcut = x
        y = TorchConv(self.features, (1, 1), use_bias=False, dtype=dt, name="conv1")(pre)
        y = nn.relu(EvalBN(self.features, name="bn2")(y))
        y = TorchConv(self.features, (3, 3), (self.stride, self.stride), (1, 1),
                      use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.relu(EvalBN(self.features, name="bn3")(y))
        y = TorchConv(out_ch, (1, 1), use_bias=False, dtype=dt, name="conv3")(y)
        return y + shortcut


class DenseUnit(nn.Module):
    """HoVer-Net dense decoder unit: bn-relu-conv1x1 -> bn-relu-conv3x3(grouped
    in the original; plain here), concatenated to the input."""

    growth: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        y = nn.relu(EvalBN(x.shape[-1], name="bn1")(x))
        y = TorchConv(128, (1, 1), use_bias=False, dtype=dt, name="conv1")(y)
        y = nn.relu(EvalBN(128, name="bn2")(y))
        y = TorchConv(self.growth, (3, 3), padding=(1, 1), use_bias=False, dtype=dt, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class HoverDecoder(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, d0, d1, d2, d3):
        dt = self.dtype
        # H/16 -> H/8, merge with d2, dense x4
        x = jnp.concatenate([_up2(d3), d2], axis=-1)
        x = TorchConv(256, (5, 5), padding=(2, 2), use_bias=False, dtype=dt, name="u3.conva")(x)
        for i in range(4):
            x = DenseUnit(dtype=dt, name=f"u3.dense{i}")(x)
        x = TorchConv(512, (1, 1), use_bias=False, dtype=dt, name="u3.convf")(x)
        # H/8 -> H/4, merge with d1, dense x4
        x = jnp.concatenate([_up2(x), d1], axis=-1)
        x = TorchConv(128, (5, 5), padding=(2, 2), use_bias=False, dtype=dt, name="u2.conva")(x)
        for i in range(4):
            x = DenseUnit(dtype=dt, name=f"u2.dense{i}")(x)
        x = TorchConv(256, (1, 1), use_bias=False, dtype=dt, name="u2.convf")(x)
        # H/4 -> H/2 -> H, merge with d0
        x = _up2(x)
        x = TorchConv(64, (5, 5), padding=(2, 2), use_bias=False, dtype=dt, name="u1.conva")(x)
        x = _up2(x)
        x = jnp.concatenate([x, d0], axis=-1)
        x = nn.relu(EvalBN(x.shape[-1], name="u0.bn")(x))
        x = TorchConv(64, (3, 3), padding=(1, 1), use_bias=False, dtype=dt, name="u0.conv")(x)
        x = nn.relu(x)
        return TorchConv(self.out_channels, (1, 1), use_bias=True, dtype=dt, name="head")(x)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class HoVerNetFast(nn.Module):
    num_nuclei_classes: int = 6
    halo_size: int = 46
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        dt = self.dtype
        x = x.astype(dt)
        d0 = TorchConv(64, (7, 7), (1, 1), (3, 3), use_bias=False, dtype=dt, name="conv0")(x)
        d0 = nn.relu(EvalBN(64, name="bn0")(d0))
        y = max_pool_torch(d0, (3, 3), (2, 2), (1, 1))
        stages = []
        widths = (64, 128, 256, 512)
        blocks = (3, 4, 6, 3)
        for si, (wd, nb) in enumerate(zip(widths, blocks)):
            for bi in range(nb):
                stride = 2 if (bi == 0 and si > 0) else 1
                y = PreActBottleneck(wd, stride, dtype=dt, name=f"res{si}.{bi}")(y)
            stages.append(y)
        # d0 @H (stem), stages: res0 @H/2, res1 @H/4, res2 @H/8, res3 @H/16
        d1, d2, d3 = stages[1], stages[2], stages[3]

        out = {}
        for key, ch, name in (
            ("nuclei_binary_map", 2, "np"),
            ("hv_map", 2, "hv"),
            ("nuclei_type_map", self.num_nuclei_classes, "tp"),
        ):
            m = HoverDecoder(ch, dtype=dt, name=f"decoder.{name}")(d0, d1, d2, d3)
            h = self.halo_size
            if h > 0:
                m = m[:, h:-h, h:-h, :]
            out[key] = jnp.transpose(m, (0, 3, 1, 2)).astype(jnp.float32)
        return out


def hovernet_fast(num_classes: int, halo_size: int = 46, dtype: Dtype = jnp.float32) -> HoVerNetFast:
    return HoVerNetFast(num_nuclei_classes=num_classes, halo_size=halo_size, dtype=dtype)
