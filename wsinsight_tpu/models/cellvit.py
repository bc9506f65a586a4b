"""CellViT nucleus instance segmentation in flax (SAM and ViT-256 variants).

Serves the WSInsight-native single-cell models (reference: README.md:213-216;
executed as opaque TorchScript through the stitcher contract at
modellib/tilefuse.py:220-278). Architecture follows the public CellViT design:
ViT encoder with skip features at four depths, three U-Net-style upsampling
branches (nuclei binary map, HV map, nuclei type map) over transposed-conv
decoder blocks, and a tissue-type classifier head on the pooled token.

Output contract (what the reference stitcher consumes): a dict with
``nuclei_binary_map`` (B, 2, O, O), ``hv_map`` (B, 2, O, O),
``nuclei_type_map`` (B, K, O, O) where O = patch - 2*halo (center crop), plus
``tissue_types`` logits.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import EvalBN, TorchConv
from .vit import (
    SAM_VIT_B,
    SAM_VIT_H,
    SAM_VIT_L,
    VIRCHOW_VIT_H,
    VIT_256,
    ViTConfig,
    ViTEncoder,
)

Dtype = Any


class Conv2DBlock(nn.Module):
    """conv3x3 + bn + relu (CellViT Conv2DBlock)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.features, (3, 3), (1, 1), (1, 1), use_bias=True,
                      dtype=self.dtype, name="conv")(x)
        x = EvalBN(self.features, name="bn")(x)
        return nn.relu(x)


class Deconv2DBlock(nn.Module):
    """convtranspose2x2(s2) + conv3x3 + bn + relu (CellViT Deconv2DBlock)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype,
            name="deconv",
        )(x)
        x = TorchConv(self.features, (3, 3), (1, 1), (1, 1), use_bias=True,
                      dtype=self.dtype, name="conv")(x)
        x = EvalBN(self.features, name="bn")(x)
        return nn.relu(x)


class UpsamplingBranch(nn.Module):
    """One decoder branch: z4..z1 skips + input image -> (B, H, W, out).

    Layer layout and widths follow upstream CellViT exactly (TIO-IKIM
    CellViT ``_create_upsampling_branch``): bottleneck/skip widths depend on
    the encoder embed dim (512/512/256 for the SAM encoders, 312/256/128 for
    the ViT-256 encoder), the three upsamplers carry 3/2/2 Conv2DBlocks, and
    terminal widths (256/128/64) are fixed — otherwise released checkpoints
    cannot map onto the module.
    """

    out_channels: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, z1, z2, z3, z4):
        dt = self.dtype
        if self.embed_dim < 512:  # ViT-256 encoder
            bottleneck, skip11, skip12 = 312, 256, 128
        else:  # SAM encoders
            bottleneck, skip11, skip12 = 512, 512, 256
        # bottleneck: 16 -> 32
        b4 = nn.ConvTranspose(bottleneck, (2, 2), strides=(2, 2), padding="VALID",
                              dtype=dt, name="bottleneck_upsampler")(z4)
        # skip 3: 16 -> 32
        b3 = Deconv2DBlock(bottleneck, dtype=dt, name="decoder3.0")(z3)
        y = jnp.concatenate([b3, b4], axis=-1)
        y = Conv2DBlock(bottleneck, dtype=dt, name="decoder3_upsampler.0")(y)
        y = Conv2DBlock(bottleneck, dtype=dt, name="decoder3_upsampler.1")(y)
        y = Conv2DBlock(bottleneck, dtype=dt, name="decoder3_upsampler.2")(y)
        y = nn.ConvTranspose(256, (2, 2), strides=(2, 2), padding="VALID", dtype=dt,
                             name="decoder3_upsampler.3")(y)  # 32 -> 64
        # skip 2: 16 -> 64
        b2 = Deconv2DBlock(skip11, dtype=dt, name="decoder2.0")(z2)
        b2 = Deconv2DBlock(256, dtype=dt, name="decoder2.1")(b2)
        y = jnp.concatenate([b2, y], axis=-1)
        y = Conv2DBlock(256, dtype=dt, name="decoder2_upsampler.0")(y)
        y = Conv2DBlock(256, dtype=dt, name="decoder2_upsampler.1")(y)
        y = nn.ConvTranspose(128, (2, 2), strides=(2, 2), padding="VALID", dtype=dt,
                             name="decoder2_upsampler.2")(y)  # 64 -> 128
        # skip 1: 16 -> 128
        b1 = Deconv2DBlock(skip11, dtype=dt, name="decoder1.0")(z1)
        b1 = Deconv2DBlock(skip12, dtype=dt, name="decoder1.1")(b1)
        b1 = Deconv2DBlock(128, dtype=dt, name="decoder1.2")(b1)
        y = jnp.concatenate([b1, y], axis=-1)
        y = Conv2DBlock(128, dtype=dt, name="decoder1_upsampler.0")(y)
        y = Conv2DBlock(128, dtype=dt, name="decoder1_upsampler.1")(y)
        y = nn.ConvTranspose(64, (2, 2), strides=(2, 2), padding="VALID", dtype=dt,
                             name="decoder1_upsampler.2")(y)  # 128 -> 256
        # image-level features
        b0 = Conv2DBlock(32, dtype=dt, name="decoder0.0")(img)
        b0 = Conv2DBlock(64, dtype=dt, name="decoder0.1")(b0)
        y = jnp.concatenate([b0, y], axis=-1)
        y = Conv2DBlock(64, dtype=dt, name="decoder0_header.0")(y)
        y = Conv2DBlock(64, dtype=dt, name="decoder0_header.1")(y)
        y = TorchConv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                      name="decoder0_header.2")(y)
        return y


_VARIANTS: dict[str, ViTConfig] = {
    "sam-b": SAM_VIT_B,
    "sam-l": SAM_VIT_L,
    "sam-h": SAM_VIT_H,
    "256": VIT_256,
    "virchow": VIRCHOW_VIT_H,
}


class CellViT(nn.Module):
    """CellViT with NP/HV/TP branches and tissue classifier."""

    variant: str = "sam-h"
    num_nuclei_classes: int = 6
    num_tissue_classes: int = 19
    halo_size: int = 46
    dtype: Dtype = jnp.float32
    # test hook: a custom ViTConfig (e.g. a small Virchow-feature config for
    # parity tests) instead of the registered variant's
    config_override: ViTConfig | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        """x: (B, H, W, 3) float (already normalized). Returns channel-first
        maps cropped to the halo interior, matching the stitcher contract."""
        cfg = self.config_override or _VARIANTS[self.variant]
        _, skips, pooled = ViTEncoder(cfg, dtype=self.dtype, name="encoder")(x)
        z1, z2, z3, z4 = skips

        if cfg.patch_size != 16:
            # /14 backbones (Virchow ViT-H/14) feed the /16 UNETR decoder by
            # bilinearly resizing each skip grid to H/16 x W/16 — the decoder
            # geometry (4 x2 deconv stages + the full-res image skip) demands
            # a /16 grid, and a learned adapter would break checkpoint
            # compatibility. Validated against released weights via the
            # template-conversion coverage report on first real ingestion.
            gh2, gw2 = x.shape[1] // 16, x.shape[2] // 16
            rs = lambda z: jax.image.resize(  # noqa: E731
                z, (z.shape[0], gh2, gw2, z.shape[3]), method="bilinear"
            )
            z1, z2, z3, z4 = rs(z1), rs(z2), rs(z3), rs(z4)

        np_map = UpsamplingBranch(2, cfg.embed_dim, dtype=self.dtype,
                                  name="nuclei_binary_map_decoder")(x, z1, z2, z3, z4)
        hv_map = UpsamplingBranch(2, cfg.embed_dim, dtype=self.dtype,
                                  name="hv_map_decoder")(x, z1, z2, z3, z4)
        tp_map = UpsamplingBranch(self.num_nuclei_classes, cfg.embed_dim, dtype=self.dtype,
                                  name="nuclei_type_maps_decoder")(x, z1, z2, z3, z4)
        tissue = nn.Dense(self.num_tissue_classes, dtype=self.dtype,
                          name="classifier_head")(pooled)

        h = self.halo_size
        if h > 0:
            np_map = np_map[:, h:-h, h:-h, :]
            hv_map = hv_map[:, h:-h, h:-h, :]
            tp_map = tp_map[:, h:-h, h:-h, :]

        to_cf = lambda t: jnp.transpose(t, (0, 3, 1, 2)).astype(jnp.float32)
        return {
            "nuclei_binary_map": to_cf(np_map),
            "hv_map": to_cf(hv_map),
            "nuclei_type_map": to_cf(tp_map),
            "tissue_types": tissue.astype(jnp.float32),
        }


def cellvit_sam_h(num_classes: int, halo_size: int = 46, dtype: Dtype = jnp.float32) -> CellViT:
    return CellViT(variant="sam-h", num_nuclei_classes=num_classes, halo_size=halo_size, dtype=dtype)


def cellvit_sam_l(num_classes: int, halo_size: int = 46, dtype: Dtype = jnp.float32) -> CellViT:
    return CellViT(variant="sam-l", num_nuclei_classes=num_classes, halo_size=halo_size, dtype=dtype)


def cellvit_sam_b(num_classes: int, halo_size: int = 46, dtype: Dtype = jnp.float32) -> CellViT:
    return CellViT(variant="sam-b", num_nuclei_classes=num_classes, halo_size=halo_size, dtype=dtype)


def cellvit_256(num_classes: int, halo_size: int = 46, dtype: Dtype = jnp.float32) -> CellViT:
    return CellViT(variant="256", num_nuclei_classes=num_classes, halo_size=halo_size, dtype=dtype)


def cellvit_virchow(num_classes: int, halo_size: int = 46, dtype: Dtype = jnp.float32) -> CellViT:
    """CellViT with the Virchow ViT-H/14 encoder (CellViT-Virchow-x40-AMP,
    reference: README.md:215-228). Decoder widths follow the SAM lineage
    (embed 1280 >= 512); /14 skips are resized to the /16 decoder grid."""
    return CellViT(variant="virchow", num_nuclei_classes=num_classes, halo_size=halo_size, dtype=dtype)
