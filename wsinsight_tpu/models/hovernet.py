"""HoVer-Net (fast/PanNuke) in flax, spatially faithful to the released graph.

Serves the `hovernet_fast_pannuke` single-cell model (reference:
README.md:217 — executed as TorchScript through the same stitcher contract
as CellViT, modellib/tilefuse.py:220-278).

The graph reproduces the released hover_net "fast" topology exactly — both
weight SHAPES and SPATIAL semantics — so checkpoint tensors map 1:1 and
outputs match inside the full kept region:

* encoder: TF-SAME 7x7/1 stem (conv0) then four residual blocks d0..d3
  (3/4/6/3 bottleneck units, widths 64/128/256/512, strides 1/2/2/2).
  hover_net's block structure differs from torchvision preact ResNet50:
  a single 1x1 shortcut conv at BLOCK entry (updated to the running sum
  after each unit), the FIRST unit of each block has no preact bn/relu
  (the previous block's trailing `blk_bna` already normalized), every
  block ends with a bn-relu (`blk_bna`), and the stride-2 3x3 convs use
  TF-SAME padding — asymmetric (0, 1) on even inputs, NOT torch's (1, 1).
* `conv_bot` 1x1 2048->1024 on d3.
* decoders (np/hv/tp), fast mode, ksize=3 with VALID convolutions and
  crop bookkeeping: the d0/d1 skips are center-cropped by 92/36 px total,
  each dense unit's 3x3 VALID conv shrinks the stack by 2 (the stack is
  center-cropped to match before concat), and u1's conva is the single
  TF-SAME-padded decoder conv.  u3 = up2(d3)+d2 -> conva 3x3 VALID
  (1024->256) -> 8 dense units (+32 each) -> bn/relu -> convf 1x1
  (512->512); u2 = up2+crop36(d1) -> conva (512->128) -> 4 dense units ->
  convf (256->256); u1 = up2+crop92(d0) -> conva SAME (256->64); u0 head
  = bn-relu-conv1x1.
* dense unit: bn-relu-conv1x1(128) -> bn-relu-conv3x3 VALID (32, groups=4).

The VALID arithmetic makes the output size input-92 for any input divisible
by 8 (fast mode: 256 -> 164), i.e. an intrinsic 46 px halo — the registry's
`halo_size_pixels: 46` and the stitcher's `patch - 2*halo` contract hold by
construction. `halo_size` > 46 center-crops the extra margin; < 46 is a
config error (the architecture cannot produce it).

Conversion note: released hover_net state dicts carry "/" in module names
(`conv0./.weight`, `preact/bn.*`) and an `upsample2x.unpool_mat` buffer;
`scripts/convert_torch_to_flax.py` normalizes those spellings onto this
module's names before the template-guided conversion.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import EvalBN, TorchConv

Dtype = Any


def tf_same_pads(size_h: int, size_w: int, ksize: int, stride: int):
    """TF-SAME per-side padding, as hover_net's TFSamepaddingLayer computes it
    (asymmetric: the extra pixel goes at the END — (0, 1) for 3x3/s2 on even
    inputs, where torch's padding=1 would pad (1, 1) and shift the grid)."""

    def one(size: int) -> tuple[int, int]:
        if size % stride == 0:
            pad = max(ksize - stride, 0)
        else:
            pad = max(ksize - (size % stride), 0)
        return pad // 2, pad - pad // 2

    return one(size_h), one(size_w)


class ResidualStage(nn.Module):
    """One hover_net encoder block (d0..d3): block-entry shortcut,
    first-unit preact skip, trailing blk_bna."""

    width: int
    n_units: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        out_ch = self.width * 4
        in_ch = x.shape[-1]
        if self.stride != 1 or in_ch != out_ch:
            shortcut = TorchConv(
                out_ch, (1, 1), (self.stride, self.stride), use_bias=False,
                dtype=dt, name="shortcut",
            )(x)
        else:  # never hit in hover_net fast; kept for structural fidelity
            shortcut = x
        for j in range(self.n_units):
            u = x
            if j != 0:
                # first unit: previous blk_bna / conv0.bn already normalized
                u = nn.relu(EvalBN(u.shape[-1], name=f"units.{j}.preact_bn")(u))
            u = TorchConv(self.width, (1, 1), use_bias=False, dtype=dt,
                          name=f"units.{j}.conv1")(u)
            u = nn.relu(EvalBN(self.width, name=f"units.{j}.conv1_bn")(u))
            s = self.stride if j == 0 else 1
            pads = tf_same_pads(u.shape[1], u.shape[2], 3, s)
            u = TorchConv(self.width, (3, 3), (s, s), padding=pads,
                          use_bias=False, dtype=dt, name=f"units.{j}.conv2")(u)
            u = nn.relu(EvalBN(self.width, name=f"units.{j}.conv2_bn")(u))
            u = TorchConv(out_ch, (1, 1), use_bias=False, dtype=dt,
                          name=f"units.{j}.conv3")(u)
            x = u + shortcut
            shortcut = x
        return nn.relu(EvalBN(out_ch, name="blk_bna.bn")(x))


class HoverDenseBlock(nn.Module):
    """hover_net DenseBlock (fast mode): units of bn-relu-conv1x1(128) ->
    bn-relu-conv3x3 VALID (32ch, groups=4); the running stack is center-
    cropped 1 px/side to the unit output before concat; trailing bn-relu."""

    n_units: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        for j in range(self.n_units):
            y = nn.relu(EvalBN(x.shape[-1], name=f"units.{j}.preact_bna_bn")(x))
            y = TorchConv(128, (1, 1), use_bias=False, dtype=dt,
                          name=f"units.{j}.conv1")(y)
            y = nn.relu(EvalBN(128, name=f"units.{j}.conv1_bn")(y))
            y = TorchConv(32, (3, 3), use_bias=False, groups=4, dtype=dt,
                          name=f"units.{j}.conv2")(y)  # VALID: shrinks 2
            x = jnp.concatenate([x[:, 1:-1, 1:-1, :], y], axis=-1)
        return nn.relu(EvalBN(x.shape[-1], name="blk_bna.bn")(x))


class HoverDecoder(nn.Module):
    """One branch (fast mode, ksize=3): u3 -> u2 -> u1 -> u0 with VALID
    convs; expects the PRE-CROPPED d0/d1 skips (92/36 px total)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, d0c, d1c, d2, d3):
        dt = self.dtype
        # u3: H/8 -> H/4, add d2 (both 1024 ch)
        x = _up2(d3) + d2
        x = TorchConv(256, (3, 3), use_bias=False, dtype=dt, name="u3.conva")(x)
        x = HoverDenseBlock(8, dtype=dt, name="u3.dense")(x)
        x = TorchConv(512, (1, 1), use_bias=False, dtype=dt, name="u3.convf")(x)
        # u2: add the 36px-cropped d1 (both 512 ch)
        x = _up2(x) + d1c
        x = TorchConv(128, (3, 3), use_bias=False, dtype=dt, name="u2.conva")(x)
        x = HoverDenseBlock(4, dtype=dt, name="u2.dense")(x)
        x = TorchConv(256, (1, 1), use_bias=False, dtype=dt, name="u2.convf")(x)
        # u1: add the 92px-cropped d0; conva is the one SAME-padded decoder conv
        x = _up2(x) + d0c
        x = TorchConv(64, (3, 3), padding=(1, 1), use_bias=False, dtype=dt,
                      name="u1.conva")(x)
        # u0 head
        x = nn.relu(EvalBN(64, name="u0.bn")(x))
        return TorchConv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                         name="u0.conv")(x)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class HoVerNetFast(nn.Module):
    num_nuclei_classes: int = 6
    halo_size: int = 46
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        if self.halo_size < 46:
            raise ValueError(
                "hover_net fast has an intrinsic 46 px halo (VALID decoder "
                f"shrinks input by 92); halo_size={self.halo_size} < 46"
            )
        if x.shape[1] % 8 or x.shape[2] % 8 or min(x.shape[1], x.shape[2]) < 96:
            raise ValueError(
                f"input {x.shape[1]}x{x.shape[2]} must be divisible by 8 and "
                ">= 96 for the VALID decoder arithmetic"
            )
        dt = self.dtype
        x = x.astype(dt)
        ph, pw = tf_same_pads(x.shape[1], x.shape[2], 7, 1)  # (3,3): TF==torch
        y = TorchConv(64, (7, 7), (1, 1), (ph, pw), use_bias=False, dtype=dt,
                      name="conv0.conv")(x)
        y = nn.relu(EvalBN(64, name="conv0.bn")(y))
        # hover_net has NO stem pooling: d0 runs at full resolution and
        # d1..d3 downsample, so the deepest features sit at H/8 (not H/16).
        d0 = ResidualStage(64, 3, 1, dtype=dt, name="d0")(y)
        d1 = ResidualStage(128, 4, 2, dtype=dt, name="d1")(d0)
        d2 = ResidualStage(256, 6, 2, dtype=dt, name="d2")(d1)
        d3 = ResidualStage(512, 3, 2, dtype=dt, name="d3")(d2)
        d3 = TorchConv(1024, (1, 1), use_bias=False, dtype=dt, name="conv_bot")(d3)
        # fast-mode crop bookkeeping (net_desc: crop_op(d0,[92,92]) / [36,36])
        d0c = d0[:, 46:-46, 46:-46, :]
        d1c = d1[:, 18:-18, 18:-18, :]

        out = {}
        extra = self.halo_size - 46
        for key, ch, name in (
            ("nuclei_binary_map", 2, "np"),
            ("hv_map", 2, "hv"),
            ("nuclei_type_map", self.num_nuclei_classes, "tp"),
        ):
            m = HoverDecoder(ch, dtype=dt, name=f"decoder.{name}")(d0c, d1c, d2, d3)
            if extra > 0:
                m = m[:, extra:-extra, extra:-extra, :]
            out[key] = jnp.transpose(m, (0, 3, 1, 2)).astype(jnp.float32)
        return out


def hovernet_fast(num_classes: int, halo_size: int = 46, dtype: Dtype = jnp.float32) -> HoVerNetFast:
    return HoVerNetFast(num_nuclei_classes=num_classes, halo_size=halo_size, dtype=dtype)
