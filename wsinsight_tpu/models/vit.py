"""ViT encoders for CellViT: SAM-style (windowed attention + decomposed
relative positions) and standard ViT-256 (HIPT), in flax.

These back the CellViT variants the reference ships as TorchScript
(reference: README.md:215-216 — CellViT-256-* and CellViT-SAM-H-*). TPU notes:
attention runs as batched MXU matmuls over (windows*batch, tokens, dim);
shapes are static for a fixed input size so XLA pipelines the whole encoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 16
    mlp_ratio: float = 4.0
    window_size: int = 14  # SAM variants; 0 = all-global
    global_attn_indexes: tuple = ()
    use_rel_pos: bool = False  # SAM decomposed relative positions
    use_cls_token: bool = True  # standard ViT; SAM has none
    extract_layers: tuple = ()
    # torch leaf naming of the block MLP: SAM exports lin1/lin2, DINO/HIPT
    # (the CellViT-256 encoder lineage) exports fc1/fc2 — the names must
    # match the released checkpoint's keys for template conversion.
    mlp_naming: tuple = ("mlp.lin1", "mlp.lin2")
    # DINOv2-lineage extensions (Virchow): SwiGLU-packed MLP, LayerScale
    # residual gains (ls1/ls2 gamma), and a NATIVE pos-embed grid — the
    # checkpoint's grid (e.g. 16 for 224/14); at other input sizes the grid
    # half of pos_embed is bilinearly interpolated at trace time, exactly the
    # DINOv2 convention, so released weights load without reshaping.
    mlp_type: str = "gelu"  # "gelu" | "swiglu"
    layer_scale: bool = False
    native_grid: int = 0  # 0 = init pos_embed at the runtime grid
    # timm reg4 models (DINOv2 registers): N learned register tokens appended
    # after cls, and (no_embed_class) a pos_embed that covers ONLY the patch
    # grid — cls/reg tokens are concatenated after the add.
    reg_tokens: int = 0
    no_embed_class: bool = False


SAM_VIT_B = ViTConfig(768, 12, 12, use_rel_pos=True, use_cls_token=False,
                      global_attn_indexes=(2, 5, 8, 11), extract_layers=(3, 6, 9, 12))
SAM_VIT_L = ViTConfig(1024, 24, 16, use_rel_pos=True, use_cls_token=False,
                      global_attn_indexes=(5, 11, 17, 23), extract_layers=(6, 12, 18, 24))
SAM_VIT_H = ViTConfig(1280, 32, 16, use_rel_pos=True, use_cls_token=False,
                      global_attn_indexes=(7, 15, 23, 31), extract_layers=(8, 16, 24, 32))
VIT_256 = ViTConfig(384, 12, 6, use_rel_pos=False, use_cls_token=True,
                    window_size=0, extract_layers=(3, 6, 9, 12),
                    mlp_naming=("mlp.fc1", "mlp.fc2"))
# Virchow (Paige; the encoder behind CellViT-Virchow-x40-AMP, reference:
# README.md:215-228): ViT-H/14 trained with DINOv2 — embed 1280, depth 32,
# heads 16, mlp_ratio 5.3375 with SwiGLU-packed MLP (timm SwiGLUPacked:
# fc1 -> 2*hidden, silu(first half) * second half -> fc2), LayerScale, class
# token, no windowed attention. Native grid 16 (224/14). Skips extracted
# every depth/4 blocks like the SAM variants.
VIRCHOW_VIT_H = ViTConfig(1280, 32, 16, patch_size=14, mlp_ratio=5.3375,
                          window_size=0, use_rel_pos=False, use_cls_token=True,
                          extract_layers=(8, 16, 24, 32),
                          mlp_naming=("mlp.fc1", "mlp.fc2"),
                          mlp_type="swiglu", layer_scale=True, native_grid=16)
# H-Optimus-0 (Bioptimus; the reference's CME foundation encoder,
# cme_generation.py:436-475 runs it via timm "hf-hub:bioptimus/H-optimus-0"):
# timm vit_giant_patch14_reg4_dinov2 + SwiGLUPacked — embed 1536, depth 40,
# heads 24, patch 14, swiglu hidden int(1536 * 16/3)//2 = 4096 (our ratio is
# the post-pack 4096/1536), LayerScale, 4 register tokens, pos_embed over the
# patch grid only (no_embed_class), 224-px inputs (grid 16).
HOPTIMUS_VIT_G = ViTConfig(1536, 40, 24, patch_size=14, mlp_ratio=4096 / 1536,
                           window_size=0, use_rel_pos=False, use_cls_token=True,
                           mlp_naming=("mlp.fc1", "mlp.fc2"),
                           mlp_type="swiglu", layer_scale=True, native_grid=16,
                           reg_tokens=4, no_embed_class=True)


def _use_flash() -> bool:
    """Fused pallas attention (WSINSIGHT_FLASH_ATTN=1, TPU backends only).

    The XLA formulation below is kept for CPU (tests, multichip dryruns)
    and as the numerical reference.
    """
    import os

    if os.environ.get("WSINSIGHT_FLASH_ATTN", "0") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Slice/interpolate relative position embeddings (SAM get_rel_pos)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative.astype(jnp.int32)]


class Attention(nn.Module):
    """Multi-head attention with optional SAM decomposed rel-pos, on (B,H,W,C).

    When ``window_size > 0`` the module handles the SAM window layout
    itself — but unlike the upstream pad-then-project order
    (segment_anything image_encoder.py: window_partition before qkv), the
    qkv and proj Dense layers here run on the REAL token grid and only the
    attention core sees padded windows. Zero rows through a Dense come out
    as exactly its bias, so the padded q/k/v are reconstructed by
    broadcasting the qkv bias into the pad region — numerically identical,
    and at CellViT shapes (256-px input, 16x16 grid padded to 28x28 for
    14x14 windows) it cuts the projection FLOPs ~3x, the bulk of a
    windowed block's matmul work on the MXU.
    """

    dim: int
    num_heads: int
    use_rel_pos: bool = False
    window_size: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv_dense = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")
        qkv = qkv_dense(x)  # (b, h, w, 3*dim)

        ws = self.window_size
        if _use_flash():
            return self._flash(x, qkv, qkv_dense, head_dim, scale)
        if ws > 0:
            pad_h = (ws - h % ws) % ws
            pad_w = (ws - w % ws) % ws
            hp, wp = h + pad_h, w + pad_w
            if pad_h or pad_w:
                # zero-padding x before the Dense would have produced rows
                # equal to the qkv bias; broadcast it instead of projecting
                pad_val = qkv_dense(jnp.zeros((1, 1, 1, x.shape[-1]), x.dtype))
                padded = jnp.broadcast_to(pad_val, (b, hp, wp, 3 * self.dim))
                qkv = jax.lax.dynamic_update_slice(
                    padded, qkv.astype(padded.dtype), (0, 0, 0, 0)
                )
            qkv = qkv.reshape(b, hp // ws, ws, wp // ws, ws, 3 * self.dim)
            qkv = jnp.transpose(qkv, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, 3 * self.dim)
            ab, ah, aw = qkv.shape[0], ws, ws
        else:
            ab, ah, aw = b, h, w

        qkv = qkv.reshape(ab, ah * aw, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (ab, n, heads, hd)
        q = jnp.transpose(q, (0, 2, 1, 3)).reshape(ab * self.num_heads, ah * aw, head_dim)
        k = jnp.transpose(k, (0, 2, 1, 3)).reshape(ab * self.num_heads, ah * aw, head_dim)
        v = jnp.transpose(v, (0, 2, 1, 3)).reshape(ab * self.num_heads, ah * aw, head_dim)

        # Score storage dtype: f32 models keep exact f32 scores (the parity
        # reference); bf16 models store the (ab*heads, n, n) score tensor in
        # bf16 — it is by far the largest intermediate (78 MB per SAM-H
        # windowed layer at batch 8) and halving its HBM traffic saves
        # ~0.9 ms of the ~2.4 ms layer cost on a v5e chip. Softmax math
        # still runs in f32 on the (rounded) logits; end-task validation is
        # the bf16 wire budget (0 argmax flips, tests/test_cells.py).
        attn_dt = jnp.float32 if self.dtype == jnp.float32 else self.dtype
        bh = ab * self.num_heads
        n = ah * aw

        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * ah - 1, head_dim), jnp.float32
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * aw - 1, head_dim), jnp.float32
            )
            rh = _get_rel_pos(ah, ah, rel_pos_h)  # (ah, ah, hd)
            rw = _get_rel_pos(aw, aw, rel_pos_w)  # (aw, aw, hd)
            rq = q.reshape(bh, ah, aw, head_dim)
            rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)  # (bh, ah, aw, ah)
            rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)  # (bh, ah, aw, aw)
            if attn_dt == jnp.float32:
                attn = jnp.einsum(
                    "bqd,bkd->bqk", q * scale, k,
                    preferred_element_type=jnp.float32,
                ).reshape(bh, ah, aw, ah, aw)
                attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
                attn = attn.reshape(bh, n, n)
            else:
                # bf16 models fold rel-pos INTO the QK matmul: augment q
                # with the per-query rel values and k with constant one-hot
                # position channels (hd 80 + ah + aw <= 128 stays inside one
                # MXU lane tile), so the two broadcast adds over the score
                # tensor disappear — measured 1.53 -> 1.38 ms per SAM-H
                # windowed layer. The rel values round to bf16 before the
                # accumulate, the same rounding class as the bf16 score
                # storage above (f32 models keep the exact formulation).
                oh = jnp.concatenate(
                    [
                        jnp.repeat(jnp.eye(ah, dtype=attn_dt), aw, axis=0),
                        jnp.tile(jnp.eye(aw, dtype=attn_dt), (ah, 1)),
                    ],
                    axis=-1,
                )  # (n, ah+aw): [onehot(kh) | onehot(kw)] per key token
                q_aug = jnp.concatenate(
                    [
                        (q * scale).astype(attn_dt),
                        rel_h.reshape(bh, n, ah).astype(attn_dt),
                        rel_w.reshape(bh, n, aw).astype(attn_dt),
                    ],
                    axis=-1,
                )
                k_aug = jnp.concatenate(
                    [k.astype(attn_dt), jnp.broadcast_to(oh, (bh, n, ah + aw))],
                    axis=-1,
                )
                attn = jnp.einsum(
                    "bqd,bkd->bqk", q_aug, k_aug,
                    preferred_element_type=jnp.float32,
                ).astype(attn_dt)
        else:
            attn = jnp.einsum(
                "bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32
            ).astype(attn_dt)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkd->bqd", attn, v, preferred_element_type=jnp.float32)
        out = out.reshape(ab, self.num_heads, ah * aw, head_dim)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(ab, ah, aw, self.dim)

        if ws > 0:
            hp, wp = h + (ws - h % ws) % ws, w + (ws - w % ws) % ws
            out = out.reshape(b, hp // ws, wp // ws, ws, ws, self.dim)
            out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, self.dim)
            out = out[:, :h, :w, :]  # proj below runs on real tokens only
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

    def _flash(self, x, qkv, qkv_dense, head_dim, scale):
        """TPU path: fused pallas kernel straight off the qkv grid — no
        partition/head transposes and no HBM-resident score tensor."""
        from ..ops.flash_attn import window_attention

        b, h, w, _ = x.shape
        ws = self.window_size
        if ws > 0:
            pad_h = (ws - h % ws) % ws
            pad_w = (ws - w % ws) % ws
            hp, wp = h + pad_h, w + pad_w
            if pad_h or pad_w:
                # zero rows through the Dense come out as exactly its bias
                pad_val = qkv_dense(jnp.zeros((1, 1, 1, x.shape[-1]), x.dtype))
                padded = jnp.broadcast_to(pad_val, (b, hp, wp, 3 * self.dim))
                qkv = jax.lax.dynamic_update_slice(
                    padded, qkv.astype(padded.dtype), (0, 0, 0, 0)
                )
            ah, aw = ws, ws
        else:
            ah, aw = h, w
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * ah - 1, head_dim), jnp.float32
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * aw - 1, head_dim), jnp.float32
            )
            rh = _get_rel_pos(ah, ah, rel_pos_h).astype(self.dtype)
            rw = _get_rel_pos(aw, aw, rel_pos_w).astype(self.dtype)
        else:
            rh = rw = None
        out = window_attention(qkv, self.num_heads, ws, scale, rh, rw)
        out = out[:, :h, :w, :]
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Transformer block; windowed when window_size > 0 (SAM layout)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int
    use_rel_pos: bool
    mlp_naming: tuple = ("mlp.lin1", "mlp.lin2")
    mlp_type: str = "gelu"
    layer_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = Attention(
            self.dim,
            self.num_heads,
            use_rel_pos=self.use_rel_pos,
            window_size=self.window_size,
            dtype=self.dtype,
            name="attn",
        )(y)
        if self.layer_scale:  # DINOv2 LayerScale (timm ls1/ls2 .gamma leaves)
            y = y * self.param(
                "ls1.gamma", nn.initializers.constant(1e-5), (self.dim,), jnp.float32
            ).astype(y.dtype)
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        if self.mlp_type == "swiglu":
            # timm SwiGLUPacked: one packed fc1 -> 2*hidden; gate is the
            # FIRST half (gate_last=False): silu(x1) * x2 -> fc2.
            y = nn.Dense(2 * hidden, dtype=self.dtype, name=self.mlp_naming[0])(y)
            y1, y2 = jnp.split(y, 2, axis=-1)
            y = nn.silu(y1) * y2
        else:
            y = nn.Dense(hidden, dtype=self.dtype, name=self.mlp_naming[0])(y)
            y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name=self.mlp_naming[1])(y)
        if self.layer_scale:
            y = y * self.param(
                "ls2.gamma", nn.initializers.constant(1e-5), (self.dim,), jnp.float32
            ).astype(y.dtype)
        return x + y


class ViTEncoder(nn.Module):
    """ViT backbone emitting skip features at config.extract_layers.

    Returns (final, [skips...]) where each skip is (B, H/16, W/16, C).
    """

    config: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        cfg = self.config
        p = cfg.patch_size
        b, h, w, _ = x.shape
        gh, gw = h // p, w // p
        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), padding="VALID", dtype=self.dtype,
            name="patch_embed.proj",
        )(x)  # (B, gh, gw, C)

        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim), jnp.float32)
            ng = cfg.native_grid or 0
            pos_tokens = (ng * ng if ng else gh * gw) + 1
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, pos_tokens, cfg.embed_dim), jnp.float32,
            )
            if ng and (gh, gw) != (ng, ng):
                # DINOv2-style: keep the checkpoint's native grid in the
                # param; bilinearly interpolate the grid half to the runtime
                # grid at trace time (static shapes under jit).
                pos_grid = jax.image.resize(
                    pos[:, 1:, :].reshape(1, ng, ng, cfg.embed_dim),
                    (1, gh, gw, cfg.embed_dim),
                    method="bilinear",
                ).reshape(1, gh * gw, cfg.embed_dim)
                pos = jnp.concatenate([pos[:, :1, :], pos_grid], axis=1)
            tokens = x.reshape(b, gh * gw, cfg.embed_dim)
            tokens = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), tokens], axis=1) + pos
            grid = tokens[:, 1:, :].reshape(b, gh, gw, cfg.embed_dim)
            cls_tok = tokens[:, :1, :]
        else:
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, gh, gw, cfg.embed_dim), jnp.float32,
            )
            grid = x + pos
            cls_tok = None

        skips = []
        for i in range(cfg.depth):
            window = 0 if (cfg.window_size == 0 or i in cfg.global_attn_indexes) else cfg.window_size
            if cfg.use_cls_token:
                # Standard ViT: run attention over the token sequence (global);
                # fold cls token back in by flattening grid each block.
                tokens = jnp.concatenate(
                    [cls_tok, grid.reshape(b, gh * gw, cfg.embed_dim)], axis=1
                )
                tokens = tokens.reshape(b, 1, gh * gw + 1, cfg.embed_dim)
                tokens = Block(
                    cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, 0, False,
                    mlp_naming=cfg.mlp_naming, mlp_type=cfg.mlp_type,
                    layer_scale=cfg.layer_scale, dtype=self.dtype, name=f"blocks.{i}",
                )(tokens)
                tokens = tokens.reshape(b, gh * gw + 1, cfg.embed_dim)
                cls_tok = tokens[:, :1, :]
                grid = tokens[:, 1:, :].reshape(b, gh, gw, cfg.embed_dim)
            else:
                grid = Block(
                    cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, window, cfg.use_rel_pos,
                    mlp_naming=cfg.mlp_naming, mlp_type=cfg.mlp_type,
                    layer_scale=cfg.layer_scale, dtype=self.dtype, name=f"blocks.{i}",
                )(grid)
            if (i + 1) in cfg.extract_layers:
                skips.append(grid)

        if cfg.use_cls_token:
            # Standard (DINO/HIPT) ViT applies a final LayerNorm before the
            # head; skips stay pre-norm (CellViT extracts them per block).
            cls_tok = nn.LayerNorm(epsilon=1e-6, name="norm")(cls_tok)

        return grid, skips, (cls_tok[:, 0, :] if cls_tok is not None else grid.mean(axis=(1, 2)))


class FoundationViT(nn.Module):
    """Pooled-embedding ViT for foundation encoders (H-Optimus-0 layout).

    The timm vit_*_reg4_dinov2 graph: patch embed -> pos_embed added to the
    PATCH tokens only (no_embed_class) -> [cls, reg x N, patches] -> global
    blocks -> final LayerNorm -> cls token as the embedding (timm
    global_pool="token" with num_classes=0). Module names match the timm
    state dict (patch_embed.proj, cls_token, reg_token, pos_embed, blocks.N,
    norm) so checkpoints convert with the standard template converter.
    """

    config: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        p = cfg.patch_size
        b, h, w, _ = x.shape
        gh, gw = h // p, w // p
        tokens = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embed.proj",
        )(x).reshape(b, gh * gw, cfg.embed_dim)

        ng = cfg.native_grid or gh
        n_prefix = 0 if cfg.no_embed_class else 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, ng * ng + n_prefix, cfg.embed_dim), jnp.float32,
        )
        pos_grid, pos_prefix = pos[:, n_prefix:, :], pos[:, :n_prefix, :]
        if (gh, gw) != (ng, ng):
            # DINOv2 convention: bilinear-resample the grid half at trace time
            pos_grid = jax.image.resize(
                pos_grid.reshape(1, ng, ng, cfg.embed_dim),
                (1, gh, gw, cfg.embed_dim), method="bilinear",
            ).reshape(1, gh * gw, cfg.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim), jnp.float32)
        prefix = [jnp.tile(cls.astype(tokens.dtype), (b, 1, 1))]
        if cfg.reg_tokens:
            reg = self.param(
                "reg_token", nn.initializers.zeros, (1, cfg.reg_tokens, cfg.embed_dim), jnp.float32
            )
            prefix.append(jnp.tile(reg.astype(tokens.dtype), (b, 1, 1)))

        if cfg.no_embed_class:
            tokens = tokens + pos_grid.astype(tokens.dtype)
            tokens = jnp.concatenate(prefix + [tokens], axis=1)
        else:
            tokens = jnp.concatenate(prefix + [tokens], axis=1)
            full_pos = jnp.concatenate([pos_prefix, pos_grid], axis=1)
            tokens = tokens + full_pos.astype(tokens.dtype)

        n = tokens.shape[1]
        tokens = tokens.reshape(b, 1, n, cfg.embed_dim)
        for i in range(cfg.depth):
            tokens = Block(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, 0, False,
                mlp_naming=cfg.mlp_naming, mlp_type=cfg.mlp_type,
                layer_scale=cfg.layer_scale, dtype=self.dtype, name=f"blocks.{i}",
            )(tokens)
        tokens = tokens.reshape(b, n, cfg.embed_dim)
        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)
        return tokens[:, 0, :]  # cls embedding
