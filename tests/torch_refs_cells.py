"""Torch reference implementations for the cell-model converter tests.

These mirror the wsinsight_tpu flax architectures with the torch module
naming the converter expects, so `convert_with_template` can be validated
numerically end to end (same weights -> same outputs). They are test-only
oracles, written from the public CellViT architecture description.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


# ---------------------------------------------------------------------------
# ViT-256 encoder (standard ViT, cls token, global attention)
# ---------------------------------------------------------------------------


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch=16):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    def forward(self, x):  # (B,3,H,W) -> (B, gh*gw, C)
        y = self.proj(x)
        b, c, gh, gw = y.shape
        return y.flatten(2).transpose(1, 2), (gh, gw)


class Mlp(nn.Module):
    """SAM-style naming (lin1/lin2)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.lin1 = nn.Linear(dim, hidden)
        self.lin2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.lin2(nn.functional.gelu(self.lin1(x)))


class MlpTimm(nn.Module):
    """DINO/HIPT (timm) naming (fc1/fc2) — the CellViT-256 encoder lineage."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class Attention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):  # (B, N, C)
        b, n, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (b, heads, n, hd)
        attn = (q * (hd**-0.5)) @ k.transpose(-2, -1)
        attn = attn.float().softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class Block(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MlpTimm(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class ViT256Encoder(nn.Module):
    def __init__(self, dim=384, depth=12, heads=6, n_tokens=17, extract=(3, 6, 9, 12)):
        super().__init__()
        self.patch_embed = PatchEmbed(dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n_tokens, dim))
        self.blocks = nn.Sequential(*[Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.extract = extract

    def forward(self, x):
        tokens, (gh, gw) = self.patch_embed(x)
        b = tokens.shape[0]
        tokens = torch.cat([self.cls_token.expand(b, -1, -1), tokens], dim=1)
        tokens = tokens + self.pos_embed
        skips = []
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens)
            if (i + 1) in self.extract:
                grid = tokens[:, 1:, :].transpose(1, 2).reshape(b, -1, gh, gw)
                skips.append(grid)
        return skips, self.norm(tokens)[:, 0, :]


# ---------------------------------------------------------------------------
# CellViT decoder branches
# ---------------------------------------------------------------------------


class Conv2DBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, padding=1)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class Deconv2DBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.deconv = nn.ConvTranspose2d(cin, cout, 2, stride=2)
        self.conv = nn.Conv2d(cout, cout, 3, padding=1)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(self.deconv(x))))


class UpsamplingBranch(nn.Module):
    def __init__(self, dim, out_channels):
        super().__init__()
        # widths/counts follow upstream CellViT _create_upsampling_branch
        if dim < 512:  # ViT-256 encoder
            bott, s11, s12 = 312, 256, 128
        else:  # SAM encoders
            bott, s11, s12 = 512, 512, 256
        self.bottleneck_upsampler = nn.ConvTranspose2d(dim, bott, 2, stride=2)
        self.decoder3 = nn.Sequential(Deconv2DBlock(dim, bott))
        self.decoder3_upsampler = nn.Sequential(
            Conv2DBlock(bott * 2, bott), Conv2DBlock(bott, bott), Conv2DBlock(bott, bott),
            nn.ConvTranspose2d(bott, 256, 2, stride=2),
        )
        self.decoder2 = nn.Sequential(Deconv2DBlock(dim, s11), Deconv2DBlock(s11, 256))
        self.decoder2_upsampler = nn.Sequential(
            Conv2DBlock(512, 256), Conv2DBlock(256, 256),
            nn.ConvTranspose2d(256, 128, 2, stride=2),
        )
        self.decoder1 = nn.Sequential(
            Deconv2DBlock(dim, s11), Deconv2DBlock(s11, s12), Deconv2DBlock(s12, 128)
        )
        self.decoder1_upsampler = nn.Sequential(
            Conv2DBlock(256, 128), Conv2DBlock(128, 128),
            nn.ConvTranspose2d(128, 64, 2, stride=2),
        )
        self.decoder0 = nn.Sequential(Conv2DBlock(3, 32), Conv2DBlock(32, 64))
        self.decoder0_header = nn.Sequential(
            Conv2DBlock(128, 64), Conv2DBlock(64, 64), nn.Conv2d(64, out_channels, 1)
        )

    def forward(self, img, z1, z2, z3, z4):
        b4 = self.bottleneck_upsampler(z4)
        b3 = self.decoder3(z3)
        y = self.decoder3_upsampler(torch.cat([b3, b4], dim=1))
        b2 = self.decoder2(z2)
        y = self.decoder2_upsampler(torch.cat([b2, y], dim=1))
        b1 = self.decoder1(z1)
        y = self.decoder1_upsampler(torch.cat([b1, y], dim=1))
        b0 = self.decoder0(img)
        return self.decoder0_header(torch.cat([b0, y], dim=1))


class MlpSwiGLUPacked(nn.Module):
    """timm SwiGLUPacked naming/semantics (Virchow): fc1 packs 2*hidden;
    gate is the FIRST half — silu(x1) * x2 -> fc2."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, 2 * hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        x1, x2 = self.fc1(x).chunk(2, dim=-1)
        return self.fc2(nn.functional.silu(x1) * x2)


class LayerScale(nn.Module):
    """timm/DINOv2 LayerScale (leaf name .gamma)."""

    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim,), float(init)))

    def forward(self, x):
        return x * self.gamma


class VirchowBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=5.3375):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.ls1 = LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MlpSwiGLUPacked(dim, int(dim * mlp_ratio))
        self.ls2 = LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class VirchowEncoder(nn.Module):
    """Virchow-style DINOv2 ViT (patch 14, cls token, SwiGLU, LayerScale)."""

    def __init__(self, dim, depth, heads, n_tokens, extract, mlp_ratio=5.3375):
        super().__init__()
        self.patch_embed = PatchEmbed(dim, patch=14)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n_tokens, dim))
        self.blocks = nn.Sequential(
            *[VirchowBlock(dim, heads, mlp_ratio) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.extract = extract

    def forward(self, x):
        tokens, (gh, gw) = self.patch_embed(x)
        b = tokens.shape[0]
        tokens = torch.cat([self.cls_token.expand(b, -1, -1), tokens], dim=1)
        tokens = tokens + self.pos_embed
        skips = []
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens)
            if (i + 1) in self.extract:
                grid = tokens[:, 1:, :].transpose(1, 2).reshape(b, -1, gh, gw)
                skips.append(grid)
        return skips, self.norm(tokens)[:, 0, :]


def _resize_grid_like_flax(z, gh2, gw2):
    """The /14 -> /16 skip adapter, SHARED with the flax model (the adapter
    is ours, not part of any released checkpoint — see models/cellvit.py);
    both sides call jax.image.resize so adapter semantics cannot diverge."""
    import jax
    import numpy as np

    z_hwc = np.transpose(z.detach().numpy(), (0, 2, 3, 1))
    out = jax.image.resize(
        z_hwc, (z_hwc.shape[0], gh2, gw2, z_hwc.shape[3]), method="bilinear"
    )
    return torch.from_numpy(np.transpose(np.asarray(out), (0, 3, 1, 2)))


class TorchCellViTVirchow(nn.Module):
    """CellViT with a (configurably small) Virchow encoder, matching
    wsinsight_tpu naming — exercises SwiGLU, LayerScale, patch-14 embedding
    and the shared /16 skip adapter."""

    def __init__(self, dim=64, depth=4, heads=4, num_nuclei_classes=3,
                 num_tissue_classes=19, halo=8, n_tokens=65,
                 extract=(1, 2, 3, 4)):
        super().__init__()
        self.halo = halo
        self.encoder = VirchowEncoder(dim, depth, heads, n_tokens, extract)
        self.nuclei_binary_map_decoder = UpsamplingBranch(dim, 2)
        self.hv_map_decoder = UpsamplingBranch(dim, 2)
        self.nuclei_type_maps_decoder = UpsamplingBranch(dim, num_nuclei_classes)
        self.classifier_head = nn.Linear(dim, num_tissue_classes)

    def forward(self, x):
        (z1, z2, z3, z4), cls_tok = self.encoder(x)
        gh2, gw2 = x.shape[2] // 16, x.shape[3] // 16
        z1, z2, z3, z4 = (
            _resize_grid_like_flax(z, gh2, gw2) for z in (z1, z2, z3, z4)
        )
        np_map = self.nuclei_binary_map_decoder(x, z1, z2, z3, z4)
        hv_map = self.hv_map_decoder(x, z1, z2, z3, z4)
        tp_map = self.nuclei_type_maps_decoder(x, z1, z2, z3, z4)
        h = self.halo
        if h > 0:
            np_map = np_map[:, :, h:-h, h:-h]
            hv_map = hv_map[:, :, h:-h, h:-h]
            tp_map = tp_map[:, :, h:-h, h:-h]
        return {
            "nuclei_binary_map": np_map,
            "hv_map": hv_map,
            "nuclei_type_map": tp_map,
            "tissue_types": self.classifier_head(cls_tok),
        }


class TorchCellViT256(nn.Module):
    """CellViT with the ViT-256 encoder, matching wsinsight_tpu naming."""

    def __init__(self, num_nuclei_classes=3, num_tissue_classes=19, halo=8, n_tokens=17):
        super().__init__()
        dim = 384
        self.halo = halo
        self.encoder = ViT256Encoder(dim=dim, n_tokens=n_tokens)
        self.nuclei_binary_map_decoder = UpsamplingBranch(dim, 2)
        self.hv_map_decoder = UpsamplingBranch(dim, 2)
        self.nuclei_type_maps_decoder = UpsamplingBranch(dim, num_nuclei_classes)
        self.classifier_head = nn.Linear(dim, num_tissue_classes)

    def forward(self, x):
        (z1, z2, z3, z4), cls_tok = self.encoder(x)
        np_map = self.nuclei_binary_map_decoder(x, z1, z2, z3, z4)
        hv_map = self.hv_map_decoder(x, z1, z2, z3, z4)
        tp_map = self.nuclei_type_maps_decoder(x, z1, z2, z3, z4)
        h = self.halo
        if h > 0:
            np_map = np_map[:, :, h:-h, h:-h]
            hv_map = hv_map[:, :, h:-h, h:-h]
            tp_map = tp_map[:, :, h:-h, h:-h]
        return {
            "nuclei_binary_map": np_map,
            "hv_map": hv_map,
            "nuclei_type_map": tp_map,
            "tissue_types": self.classifier_head(cls_tok),
        }


# ---------------------------------------------------------------------------
# HoVer-Net (fast) mirror — upstream-faithful: TF-SAME encoder padding,
# block-entry shortcut + first-unit preact skip + trailing blk_bna,
# VALID 3x3 decoder convs with crop bookkeeping (92/36 px skips).
# ---------------------------------------------------------------------------


def _tf_same_pad(x, ksize, stride):
    """hover_net TFSamepaddingLayer: asymmetric TF-SAME (extra px at end)."""

    def one(size):
        pad = max(ksize - stride, 0) if size % stride == 0 else max(ksize - size % stride, 0)
        return pad // 2, pad - pad // 2

    (t, b), (l, r) = one(x.shape[2]), one(x.shape[3])
    return nn.functional.pad(x, (l, r, t, b))


class _HVResUnit(nn.Module):
    def __init__(self, cin, width, stride, first):
        super().__init__()
        self.stride = stride
        self.first = first
        if not first:
            self.preact_bn = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.conv1_bn = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=0, bias=False)
        self.conv2_bn = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)

    def forward(self, x):
        if not self.first:
            x = torch.relu(self.preact_bn(x))
        x = torch.relu(self.conv1_bn(self.conv1(x)))
        x = torch.relu(self.conv2_bn(self.conv2(_tf_same_pad(x, 3, self.stride))))
        return self.conv3(x)


class _HVBnRelu(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.bn = nn.BatchNorm2d(ch)

    def forward(self, x):
        return torch.relu(self.bn(x))


class _HVStage(nn.Module):
    def __init__(self, cin, width, n_units, stride):
        super().__init__()
        self.shortcut = nn.Conv2d(cin, width * 4, 1, stride=stride, bias=False)
        units = []
        c = cin
        for j in range(n_units):
            units.append(_HVResUnit(c, width, stride if j == 0 else 1, j == 0))
            c = width * 4
        self.units = nn.ModuleList(units)
        self.blk_bna = _HVBnRelu(width * 4)

    def forward(self, x):
        shortcut = self.shortcut(x)
        for unit in self.units:
            x = unit(x) + shortcut
            shortcut = x
        return self.blk_bna(x)


class _HVDenseUnit(nn.Module):
    def __init__(self, cin, growth=32):
        super().__init__()
        self.preact_bna_bn = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, 128, 1, bias=False)
        self.conv1_bn = nn.BatchNorm2d(128)
        self.conv2 = nn.Conv2d(128, growth, 3, padding=0, groups=4, bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.preact_bna_bn(x)))
        y = self.conv2(torch.relu(self.conv1_bn(y)))
        return torch.cat([x[:, :, 1:-1, 1:-1], y], dim=1)


class _HVDenseBlock(nn.Module):
    def __init__(self, cin, n_units):
        super().__init__()
        self.units = nn.ModuleList(
            [_HVDenseUnit(cin + 32 * j) for j in range(n_units)]
        )
        self.blk_bna = _HVBnRelu(cin + 32 * n_units)

    def forward(self, x):
        for unit in self.units:
            x = unit(x)
        return self.blk_bna(x)


def _up2(x):
    return nn.functional.interpolate(x, scale_factor=2, mode="nearest")


class _HVU(nn.Module):
    """u3/u2: conva 3x3 VALID -> dense block -> convf 1x1."""

    def __init__(self, cin, mid, n_dense, cout):
        super().__init__()
        self.conva = nn.Conv2d(cin, mid, 3, padding=0, bias=False)
        self.dense = _HVDenseBlock(mid, n_dense)
        self.convf = nn.Conv2d(mid + 32 * n_dense, cout, 1, bias=False)

    def forward(self, x):
        return self.convf(self.dense(self.conva(x)))


class _HVU1(nn.Module):
    def __init__(self):
        super().__init__()
        self.conva = nn.Conv2d(256, 64, 3, padding=0, bias=False)

    def forward(self, x):
        return self.conva(_tf_same_pad(x, 3, 1))


class _HVU0(nn.Module):
    def __init__(self, out_channels):
        super().__init__()
        self.bn = nn.BatchNorm2d(64)
        self.conv = nn.Conv2d(64, out_channels, 1, bias=True)

    def forward(self, x):
        return self.conv(torch.relu(self.bn(x)))


class TorchHoverDecoder(nn.Module):
    """Mirrors wsinsight_tpu HoverDecoder: fast-mode ksize=3 VALID branch;
    expects pre-cropped d0/d1 skips."""

    def __init__(self, out_channels):
        super().__init__()
        self.u3 = _HVU(1024, 256, 8, 512)
        self.u2 = _HVU(512, 128, 4, 256)
        self.u1 = _HVU1()
        self.u0 = _HVU0(out_channels)

    def forward(self, d0c, d1c, d2, d3):
        x = self.u3(_up2(d3) + d2)
        x = self.u2(_up2(x) + d1c)
        x = self.u1(_up2(x) + d0c)
        return self.u0(x)


class _HVConv0(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 64, 7, padding=0, bias=False)
        self.bn = nn.BatchNorm2d(64)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(_tf_same_pad(x, 7, 1))))


class TorchHoVerNetFast(nn.Module):
    def __init__(self, num_nuclei_classes=3):
        super().__init__()
        self.conv0 = _HVConv0()
        widths = (64, 128, 256, 512)
        blocks = (3, 4, 6, 3)
        cin = 64
        for si, (wd, nb) in enumerate(zip(widths, blocks)):
            setattr(self, f"d{si}", _HVStage(cin, wd, nb, 1 if si == 0 else 2))
            cin = wd * 4
        self.conv_bot = nn.Conv2d(2048, 1024, 1, bias=False)
        self.decoder = nn.ModuleDict(
            {
                "np": TorchHoverDecoder(2),
                "hv": TorchHoverDecoder(2),
                "tp": TorchHoverDecoder(num_nuclei_classes),
            }
        )

    def forward(self, x):
        d0 = self.d0(self.conv0(x))
        d1 = self.d1(d0)
        d2 = self.d2(d1)
        d3 = self.conv_bot(self.d3(d2))
        d0c = d0[:, :, 46:-46, 46:-46]
        d1c = d1[:, :, 18:-18, 18:-18]
        out = {}
        for key, name in (
            ("nuclei_binary_map", "np"),
            ("hv_map", "hv"),
            ("nuclei_type_map", "tp"),
        ):
            out[key] = self.decoder[name](d0c, d1c, d2, d3)
        return out


# ---------------------------------------------------------------------------
# StarDist U-Net mirror
# ---------------------------------------------------------------------------


class TorchStarDistUNet(nn.Module):
    """Mirror of wsinsight_tpu.models.stardist.StarDistUNet — the released
    2D_versatile_he topology: grid (2,2) pooled stem, csbdeep unet_block
    (depth 3, base 32, 2 convs per level, middle/up blocks HALVE width on
    their last conv), 128-wide features conv, sigmoid prob + LINEAR dist
    heads on the 2x grid. Module names match the flax template paths so
    convert_with_template maps the state dict verbatim."""

    def __init__(self, base_filters=32, depth=3, n_conv=2, n_rays=32,
                 features_after=128):
        super().__init__()
        self.depth, self.n_conv = depth, n_conv
        f = base_filters
        cin = 3
        for i in range(n_conv):
            setattr(self, f"stem_conv_{i}", nn.Conv2d(cin, f, 3, padding=1))
            cin = f
        for level in range(depth):
            w = f * 2**level
            for i in range(n_conv):
                setattr(self, f"down_level_{level}_no_{i}", nn.Conv2d(cin, w, 3, padding=1))
                cin = w
        for i in range(n_conv - 1):
            w = f * 2**depth
            setattr(self, f"middle_{i}", nn.Conv2d(cin, w, 3, padding=1))
            cin = w
        w = f * 2 ** max(0, depth - 1)
        setattr(self, f"middle_{n_conv - 1}", nn.Conv2d(cin, w, 3, padding=1))
        cin = w
        for level in reversed(range(depth)):
            cin = cin + f * 2**level  # skip concat
            for i in range(n_conv - 1):
                w = f * 2**level
                setattr(self, f"up_level_{level}_no_{i}", nn.Conv2d(cin, w, 3, padding=1))
                cin = w
            w = f * 2 ** max(0, level - 1)
            setattr(self, f"up_level_{level}_no_{n_conv - 1}", nn.Conv2d(cin, w, 3, padding=1))
            cin = w
        self.features = nn.Conv2d(cin, features_after, 3, padding=1)
        self.prob = nn.Conv2d(features_after, 1, 1)
        self.dist = nn.Conv2d(features_after, n_rays, 1)

    def forward(self, x):
        for i in range(self.n_conv):
            x = torch.relu(getattr(self, f"stem_conv_{i}")(x))
        x = nn.functional.max_pool2d(x, 2)
        skips = []
        for level in range(self.depth):
            for i in range(self.n_conv):
                x = torch.relu(getattr(self, f"down_level_{level}_no_{i}")(x))
            skips.append(x)
            x = nn.functional.max_pool2d(x, 2)
        for i in range(self.n_conv):
            x = torch.relu(getattr(self, f"middle_{i}")(x))
        for level in reversed(range(self.depth)):
            x = nn.functional.interpolate(x, scale_factor=2, mode="nearest")
            x = torch.cat([x, skips[level]], dim=1)
            for i in range(self.n_conv):
                x = torch.relu(getattr(self, f"up_level_{level}_no_{i}")(x))
        feat = torch.relu(self.features(x))
        return torch.sigmoid(self.prob(feat)), self.dist(feat)


# ---------------------------------------------------------------------------
# SAM-style ViT encoder mirror (windowed attention + decomposed rel-pos)
# ---------------------------------------------------------------------------


def _torch_get_rel_pos(q_size, k_size, rel_pos):
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = nn.functional.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist, mode="linear",
        ).reshape(-1, max_rel_dist).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


class SamAttention(nn.Module):
    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        head_dim = dim // heads
        self.rel_pos_h = nn.Parameter(torch.zeros(2 * input_size[0] - 1, head_dim))
        self.rel_pos_w = nn.Parameter(torch.zeros(2 * input_size[1] - 1, head_dim))

    def forward(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = (t.reshape(b * self.heads, h * w, hd) for t in (qkv[0], qkv[1], qkv[2]))
        attn = (q * (hd**-0.5)) @ k.transpose(-2, -1)

        rh = _torch_get_rel_pos(h, h, self.rel_pos_h)
        rw = _torch_get_rel_pos(w, w, self.rel_pos_w)
        rq = q.reshape(b * self.heads, h, w, hd)
        rel_h = torch.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = attn.view(b * self.heads, h, w, h, w)
        attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        attn = attn.view(b * self.heads, h * w, h * w)

        attn = attn.float().softmax(dim=-1)
        out = (attn @ v).view(b, self.heads, h * w, hd)
        out = out.permute(0, 2, 1, 3).reshape(b, h, w, c)
        return self.proj(out)


def _window_partition(x, window):
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = nn.functional.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = h + pad_h, w + pad_w
    x = x.view(b, hp // window, window, wp // window, window, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c), (hp, wp)


def _window_unpartition(windows, window, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.view(b, hp // window, wp // window, window, window, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


class SamBlock(nn.Module):
    def __init__(self, dim, heads, window, grid, mlp_ratio=4.0):
        super().__init__()
        self.window = window
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        size = (window, window) if window > 0 else grid
        self.attn = SamAttention(dim, heads, size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):  # (B, H, W, C)
        shortcut = x
        y = self.norm1(x)
        if self.window > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = _window_partition(y, self.window)
            y = self.attn(y)
            y = _window_unpartition(y, self.window, pad_hw, (h, w))
        else:
            y = self.attn(y)
        x = shortcut + y
        return x + self.mlp(self.norm2(x))


class SamViTEncoder(nn.Module):
    """SAM ViT-B geometry at an arbitrary input grid, channel-last like SAM."""

    def __init__(self, dim=768, depth=12, heads=12, grid=(4, 4), window=3,
                 global_idx=(2, 5, 8, 11), extract=(3, 6, 9, 12)):
        super().__init__()
        self.patch_embed = PatchEmbed(dim)
        self.pos_embed = nn.Parameter(torch.zeros(1, grid[0], grid[1], dim))
        self.blocks = nn.Sequential(
            *[
                SamBlock(dim, heads, 0 if i in global_idx else window, grid)
                for i in range(depth)
            ]
        )
        self.extract = extract

    def forward(self, x):
        tokens, (gh, gw) = self.patch_embed(x)
        b = tokens.shape[0]
        grid = tokens.view(b, gh, gw, -1) + self.pos_embed
        skips = []
        for i, blk in enumerate(self.blocks):
            grid = blk(grid)
            if (i + 1) in self.extract:
                skips.append(grid.permute(0, 3, 1, 2))
        return skips, grid.mean(dim=(1, 2))


class TorchCellViTSAMB(nn.Module):
    """CellViT with the SAM ViT-B encoder, matching wsinsight_tpu naming."""

    def __init__(self, num_nuclei_classes=3, num_tissue_classes=19, halo=8, grid=(4, 4)):
        super().__init__()
        dim = 768
        self.halo = halo
        self.encoder = SamViTEncoder(dim=dim, grid=grid, window=14)
        self.nuclei_binary_map_decoder = UpsamplingBranch(dim, 2)
        self.hv_map_decoder = UpsamplingBranch(dim, 2)
        self.nuclei_type_maps_decoder = UpsamplingBranch(dim, num_nuclei_classes)
        self.classifier_head = nn.Linear(dim, num_tissue_classes)

    def forward(self, x):
        (z1, z2, z3, z4), pooled = self.encoder(x)
        np_map = self.nuclei_binary_map_decoder(x, z1, z2, z3, z4)
        hv_map = self.hv_map_decoder(x, z1, z2, z3, z4)
        tp_map = self.nuclei_type_maps_decoder(x, z1, z2, z3, z4)
        h = self.halo
        if h > 0:
            np_map = np_map[:, :, h:-h, h:-h]
            hv_map = hv_map[:, :, h:-h, h:-h]
            tp_map = tp_map[:, :, h:-h, h:-h]
        return {
            "nuclei_binary_map": np_map,
            "hv_map": hv_map,
            "nuclei_type_map": tp_map,
            "tissue_types": self.classifier_head(pooled),
        }


class TorchFoundationViT(nn.Module):
    """timm vit_*_reg4_dinov2 layout (H-Optimus-0): pos_embed added to PATCH
    tokens only (no_embed_class), cls + N register tokens concatenated after,
    SwiGLU-packed MLP + LayerScale blocks, final LayerNorm, cls embedding."""

    def __init__(self, dim=64, depth=3, heads=4, n_patches=64, reg_tokens=4,
                 mlp_ratio=4096 / 1536):
        super().__init__()
        self.patch_embed = PatchEmbed(dim, patch=14)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.reg_token = nn.Parameter(torch.zeros(1, reg_tokens, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n_patches, dim))
        self.blocks = nn.Sequential(
            *[VirchowBlock(dim, heads, mlp_ratio) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        tokens, _ = self.patch_embed(x)
        b = tokens.shape[0]
        tokens = tokens + self.pos_embed
        tokens = torch.cat(
            [self.cls_token.expand(b, -1, -1), self.reg_token.expand(b, -1, -1), tokens],
            dim=1,
        )
        for blk in self.blocks:
            tokens = blk(tokens)
        return self.norm(tokens)[:, 0, :]
