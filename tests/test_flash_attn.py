"""Fused pallas window attention vs the unfused XLA formulation.

Runs the kernel in interpret mode (CPU) on small shapes; the TPU bench and
samh profiler exercise the compiled path. Reference math mirrors the SAM
layout the torch parity tests pin (tests/torch_refs_cells.py:640-700).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wsinsight_tpu.ops.flash_attn import window_attention


def _reference(qkv, num_heads, window, scale, rh=None, rw=None):
    """Unfused formulation on the padded grid (token order row-major)."""
    b, hp, wp, c3 = qkv.shape
    dim = c3 // 3
    hd = dim // num_heads
    if window:
        ah = aw = window
        gh, gw = hp // window, wp // window
        q5 = qkv.reshape(b, gh, window, gw, window, c3)
        q5 = jnp.transpose(q5, (0, 1, 3, 2, 4, 5)).reshape(-1, window * window, c3)
    else:
        ah, aw = hp, wp
        gh = gw = 1
        q5 = qkv.reshape(b, hp * wp, c3)
    nb, n, _ = q5.shape
    q5 = q5.reshape(nb, n, 3, num_heads, hd)
    q, k, v = jnp.moveaxis(q5, 2, 0)
    q = jnp.transpose(q, (0, 2, 1, 3)).reshape(nb * num_heads, n, hd)
    k = jnp.transpose(k, (0, 2, 1, 3)).reshape(nb * num_heads, n, hd)
    v = jnp.transpose(v, (0, 2, 1, 3)).reshape(nb * num_heads, n, hd)
    attn = jnp.einsum("bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32)
    if rh is not None:
        rq = q.reshape(nb * num_heads, ah, aw, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = attn.reshape(nb * num_heads, ah, aw, ah, aw)
        attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        attn = attn.reshape(nb * num_heads, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bqk,bkd->bqd", attn, v, preferred_element_type=jnp.float32)
    out = out.reshape(nb, num_heads, n, hd)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(nb, ah, aw, dim)
    if window:
        out = out.reshape(b, gh, gw, window, window, dim)
        out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, dim)
    else:
        out = out.reshape(b, hp, wp, dim)
    return out.astype(jnp.float32)


def _toeplitz(table, size):
    idx = np.add.outer(np.arange(size), -np.arange(size)) + size - 1
    return table[idx]


@pytest.mark.parametrize("window", [3, 0])
def test_window_attention_rel_matches_xla(window):
    rng = np.random.default_rng(0)
    b, hp, wp, heads, hd = 2, 6, 6, 2, 16
    dim = heads * hd
    ah = window or hp
    aw = window or wp
    qkv = jnp.asarray(rng.normal(0, 1, (b, hp, wp, 3 * dim)), jnp.float32)
    rh = jnp.asarray(
        _toeplitz(rng.normal(0, 0.5, (2 * ah - 1, hd)).astype(np.float32), ah)
    )
    rw = jnp.asarray(
        _toeplitz(rng.normal(0, 0.5, (2 * aw - 1, hd)).astype(np.float32), aw)
    )
    scale = hd**-0.5
    got = window_attention(qkv, heads, window, scale, rh, rw, interpret=True)
    want = _reference(qkv, heads, window, scale, rh, rw)
    np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=2e-5, rtol=1e-5)


def test_window_attention_plain_matches_xla():
    rng = np.random.default_rng(1)
    b, n, heads, hd = 2, 9, 3, 8
    dim = heads * hd
    qkv = jnp.asarray(rng.normal(0, 1, (b, 1, n, 3 * dim)), jnp.float32)
    scale = hd**-0.5
    got = window_attention(qkv, heads, 0, scale, interpret=True)
    want = _reference(qkv, heads, 0, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=2e-5, rtol=1e-5)


def test_attention_bf16_augk_close_to_f32():
    """The bf16 XLA path folds rel-pos into the QK matmul (augmented
    channels); it must stay within bf16 rounding of the exact f32 path."""
    from wsinsight_tpu.models.vit import Attention

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 6, 6, 32)), jnp.float32)
    kw = dict(dim=32, num_heads=2, use_rel_pos=True, window_size=3)
    m32 = Attention(dtype=jnp.float32, **kw)
    params = m32.init(jax.random.PRNGKey(0), x)["params"]
    params = dict(params)
    params["rel_pos_h"] = jnp.asarray(
        rng.normal(0, 0.5, params["rel_pos_h"].shape), jnp.float32
    )
    params["rel_pos_w"] = jnp.asarray(
        rng.normal(0, 0.5, params["rel_pos_w"].shape), jnp.float32
    )
    want = np.asarray(m32.apply({"params": params}, x), np.float32)
    got = np.asarray(
        Attention(dtype=jnp.bfloat16, **kw).apply({"params": params}, x),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=6e-2, rtol=6e-2)
    # not degenerate: rel-pos actually contributes
    plain = np.asarray(
        m32.apply(
            {"params": {**params,
                        "rel_pos_h": jnp.zeros_like(params["rel_pos_h"]),
                        "rel_pos_w": jnp.zeros_like(params["rel_pos_w"])}},
            x,
        ),
        np.float32,
    )
    assert np.abs(plain - want).max() > 1e-3


@pytest.mark.slow  # SAM-H-width single layer (~5 GF on CPU)
def test_attention_bf16_augk_production_geometry():
    """Same check at the exact SAM-H geometry the bench runs: dim 1280,
    16 heads, 16x16 grid padded to 28x28 for 14x14 windows."""
    from wsinsight_tpu.models.vit import Attention

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 0.3, (1, 16, 16, 1280)), jnp.float32)
    kw = dict(dim=1280, num_heads=16, use_rel_pos=True, window_size=14)
    m32 = Attention(dtype=jnp.float32, **kw)
    params = dict(m32.init(jax.random.PRNGKey(0), x)["params"])
    params["rel_pos_h"] = jnp.asarray(
        rng.normal(0, 0.1, params["rel_pos_h"].shape), jnp.float32
    )
    params["rel_pos_w"] = jnp.asarray(
        rng.normal(0, 0.1, params["rel_pos_w"].shape), jnp.float32
    )
    want = np.asarray(m32.apply({"params": params}, x), np.float32)
    got = np.asarray(
        Attention(dtype=jnp.bfloat16, **kw).apply({"params": params}, x),
        np.float32,
    )
    # bf16 rounding of scores/values; the augk fold must not add more
    np.testing.assert_allclose(got, want, atol=8e-2, rtol=8e-2)


def test_window_attention_bf16_close():
    rng = np.random.default_rng(2)
    b, hp, wp, heads, hd = 1, 3, 3, 2, 16
    dim = heads * hd
    qkv32 = rng.normal(0, 1, (b, hp, wp, 3 * dim)).astype(np.float32)
    rh = _toeplitz(rng.normal(0, 0.5, (5, hd)).astype(np.float32), 3)
    scale = hd**-0.5
    got = window_attention(
        jnp.asarray(qkv32, jnp.bfloat16), heads, 3, scale,
        jnp.asarray(rh, jnp.bfloat16), jnp.asarray(rh, jnp.bfloat16),
        interpret=True,
    )
    want = _reference(jnp.asarray(qkv32), heads, 3, scale, jnp.asarray(rh), jnp.asarray(rh))
    np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=5e-2, rtol=5e-2)
