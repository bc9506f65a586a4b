"""Torch-semantics building blocks for the flax model zoo.

Every layer here reproduces the exact eval-time math of its PyTorch counterpart
(the reference executes TorchScript zoo models, reference:
wsinsight/modellib/models.py:51-108; we own the architectures instead). Modules
are given dotted torch-style names so converted state dicts map 1:1 onto the
flax param tree (see :mod:`wsinsight_tpu.models.convert`).

All tensors are NHWC (TPU-native layout). Compute dtype is configurable;
parameters stay float32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class TorchConv(nn.Module):
    """nn.Conv2d equivalent: zero padding (symmetric or per-side), optional bias.

    ``padding`` entries are either an int (symmetric, torch-style) or a
    ``(begin, end)`` pair — the latter expresses TF-SAME asymmetric padding
    (hover_net's TFSamepaddingLayer pads stride-2 3x3 convs as (0, 1)).

    Param layout: kernel (kh, kw, in, out) — converted from torch (out,in,kh,kw).
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[Any, Any] = (0, 0)
    use_bias: bool = True
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.kaiming_normal(),
            (kh, kw, in_ch // self.groups, self.features),
            jnp.float32,
        )
        pads = [
            (p, p) if isinstance(p, int) else (int(p[0]), int(p[1]))
            for p in self.padding
        ]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        return y


class EvalBN(nn.Module):
    """nn.BatchNorm2d in eval mode: y = (x - mean) * rsqrt(var + eps) * w + b.

    Kept as explicit params (weight/bias/running_mean/running_var) so converted
    checkpoints drop in unchanged; XLA fuses the affine into the conv epilogue.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (self.features,), jnp.float32)
        scale = w * jax.lax.rsqrt(var + self.eps)
        shift = b - mean * scale
        return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


class TorchLinear(nn.Module):
    """nn.Linear equivalent; kernel (in, out) — transposed from torch (out, in)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype), preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        return y


def max_pool_torch(
    x: jax.Array,
    window: tuple[int, int],
    strides: tuple[int, int],
    padding: tuple[int, int] = (0, 0),
) -> jax.Array:
    """nn.MaxPool2d: pads with -inf (so padding never wins)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window[0], window[1], 1),
        (1, strides[0], strides[1], 1),
        [(0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)],
    )


def avg_pool_torch(
    x: jax.Array,
    window: tuple[int, int],
    strides: tuple[int, int],
    padding: tuple[int, int] = (0, 0),
    count_include_pad: bool = True,
) -> jax.Array:
    """nn.AvgPool2d with torch's count_include_pad semantics."""
    sums = jax.lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        jax.lax.add,
        (1, window[0], window[1], 1),
        (1, strides[0], strides[1], 1),
        [(0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)],
    )
    if count_include_pad:
        return sums / (window[0] * window[1])
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones,
        jnp.array(0, x.dtype),
        jax.lax.add,
        (1, window[0], window[1], 1),
        (1, strides[0], strides[1], 1),
        [(0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)],
    )
    return sums / counts


def adaptive_avg_pool_torch(x: jax.Array, output_size: tuple[int, int]) -> jax.Array:
    """nn.AdaptiveAvgPool2d: bin i covers [floor(i*H/out), ceil((i+1)*H/out))."""
    n, h, w, c = x.shape
    oh, ow = output_size
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        return x.reshape(n, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))

    def pool_axis(arr: jax.Array, size: int, out: int, axis: int) -> jax.Array:
        # Build averaging matrix (out, size) on host; static shapes under jit.
        mat = np.zeros((out, size), np.float32)
        for i in range(out):
            s = (i * size) // out
            e = -(-((i + 1) * size) // out)
            mat[i, s:e] = 1.0 / (e - s)
        return jnp.tensordot(jnp.asarray(mat), arr, axes=[[1], [axis]])

    # Pool H then W; tensordot moves the contracted axis to front.
    y = pool_axis(x, h, oh, 1)  # (oh, n, w, c)
    y = pool_axis(y, w, ow, 2)  # (ow, oh, n, c)
    return jnp.transpose(y, (2, 1, 0, 3))


def global_avg_pool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d((1,1)) + flatten."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
