"""HoVer-Net (fast/PanNuke) in flax.

Serves the `hovernet_fast_pannuke` single-cell model (reference:
README.md:217 — executed as TorchScript through the same stitcher contract
as CellViT, modellib/tilefuse.py:220-278).

The graph follows the released hover_net "fast" topology so checkpoint
tensors map 1:1:

* pre-activation ResNet50 encoder — 7x7/1 stem, NO stem pooling, stages of
  3/4/6/3 bottlenecks with widths 64/128/256/512 (stage outputs 256/512/
  1024/2048 at H, H/2, H/4, H/8), then ``conv_bot`` 1x1 2048->1024,
* per-branch decoder (np/hv/tp) with ADDITIVE skips: u3 = up2(d3')+d2 ->
  conva 5x5 (1024->256) -> 8 grouped dense units (+32 each) -> bn/relu ->
  convf 1x1 (512->512); u2 = up2+d1 -> conva (512->128) -> 4 dense units ->
  convf (256->256); u1 = up2+d0 -> conva (256->64); u0 head =
  bn-relu-conv1x1,
* dense unit: bn-relu-conv1x1(128) -> bn-relu-conv5x5(32, groups=4).

Deliberate deviation: upstream uses VALID 5x5 convolutions with
crop-to-shape bookkeeping (fast mode crops the d0/d1 skips by 92/36 px);
this module uses SAME padding and crops only the final halo (46 px). Weight
SHAPES are identical, but spatial semantics deviate: the decoder receptive
field (conva 5x5 + dense 5x5 chains at H/4, plus the encoder) propagates
padding effects well past the 46 px halo, so outputs INSIDE the kept
164x164 region can drift from released hover_net weights, strongest near
borders. Torch-mirror parity tests share the SAME-padding graph and cannot
see this; validate against the released TorchScript before relying on
border-region cell calls. Outputs are channel-first maps cropped to
patch - 2*halo (fast mode: 256 -> 164).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import EvalBN, TorchConv

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
    """hover_net dense decoder unit: bn-relu-conv1x1(128) ->
    bn-relu-conv5x5(growth, groups=4), concatenated onto the stack."""

    growth: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        y = nn.relu(EvalBN(x.shape[-1], name="bn1")(x))
        y = TorchConv(128, (1, 1), use_bias=False, dtype=dt, name="conv1")(y)
        y = nn.relu(EvalBN(128, name="bn2")(y))
        y = TorchConv(self.growth, (5, 5), padding=(2, 2), use_bias=False, groups=4,
                      dtype=dt, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class HoverDecoder(nn.Module):
    """One branch: additive-skip upsampling chain u3 -> u2 -> u1 -> u0."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, d0, d1, d2, d3):
        dt = self.dtype
        # u3: H/8 -> H/4, add d2 (both 1024 ch)
        x = _up2(d3) + d2
        x = TorchConv(256, (5, 5), padding=(2, 2), use_bias=False, dtype=dt, name="u3.conva")(x)
        for i in range(8):
            x = DenseUnit(dtype=dt, name=f"u3.dense{i}")(x)
        x = nn.relu(EvalBN(x.shape[-1], name="u3.bna")(x))
        x = TorchConv(512, (1, 1), use_bias=False, dtype=dt, name="u3.convf")(x)
        # u2: H/4 -> H/2, add d1 (both 512 ch)
        x = _up2(x) + d1
        x = TorchConv(128, (5, 5), padding=(2, 2), use_bias=False, dtype=dt, name="u2.conva")(x)
        for i in range(4):
            x = DenseUnit(dtype=dt, name=f"u2.dense{i}")(x)
        x = nn.relu(EvalBN(x.shape[-1], name="u2.bna")(x))
        x = TorchConv(256, (1, 1), use_bias=False, dtype=dt, name="u2.convf")(x)
        # u1: H/2 -> H, add d0 (both 256 ch)
        x = _up2(x) + d0
        x = TorchConv(64, (5, 5), padding=(2, 2), use_bias=False, dtype=dt, name="u1.conva")(x)
        # u0 head
        x = nn.relu(EvalBN(64, name="u0.bn")(x))
        return TorchConv(self.out_channels, (1, 1), use_bias=True, dtype=dt, name="u0.conv")(x)


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
        y = TorchConv(64, (7, 7), (1, 1), (3, 3), use_bias=False, dtype=dt, name="conv0")(x)
        y = nn.relu(EvalBN(64, name="bn0")(y))
        # hover_net has NO stem pooling: stage d0 runs at full resolution and
        # d1..d3 downsample, so the deepest features sit at H/8 (not H/16).
        stages = []
        widths = (64, 128, 256, 512)
        blocks = (3, 4, 6, 3)
        for si, (wd, nb) in enumerate(zip(widths, blocks)):
            for bi in range(nb):
                stride = 2 if (bi == 0 and si > 0) else 1
                y = PreActBottleneck(wd, stride, dtype=dt, name=f"res{si}.{bi}")(y)
            stages.append(y)
        d0, d1, d2, d3 = stages  # 256@H, 512@H/2, 1024@H/4, 2048@H/8
        d3 = TorchConv(1024, (1, 1), use_bias=False, dtype=dt, name="conv_bot")(d3)

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
