"""Pallas kernel: fused uint8 -> PIL-resize -> normalize, one VMEM pass.

The XLA preprocess path (ops/preprocess.py) materializes two HBM
intermediates per batch: the uint8->f32 conversion at source resolution and
the horizontal-pass result (~250 MB per 256x350^2 batch). This kernel keeps
the whole chain in VMEM per (image, channel): load the uint8 plane, run both
separable resize matmuls on the MXU against the PIL triangle-filter weights,
apply the per-pass PIL rounding and the normalize affine, and write only the
final (oh, ow) float32 plane. Grid = (batch, channels); planes are 2D with a
W-minor layout, which is what Mosaic tiles natively.

Same contract as the XLA exact=False path (f32-weight resize, <=1 uint8 level
from PIL on rounding ties); verified equal in tests. Enabled in the engine
speed path via WSINSIGHT_PALLAS_PREPROCESS=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .preprocess import _pil_bilinear_weights

try:  # TPU-specific memory spaces; interpret mode covers CPU tests.
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = _SMEM = None


def _kernel(x_ref, wh_ref, ww_ref, scale_ref, shift_ref, out_ref):
    """One (image, channel) plane per grid step."""
    c = pl.program_id(1)
    # Mosaic has no direct uint8 -> f32 cast; hop through int32.
    x = x_ref[0, 0].astype(jnp.int32).astype(jnp.float32)  # (H, W)
    # Precision is pinned: the kernel must compile identically under any
    # ambient jax.default_matmul_precision (Mosaic rejects 3-pass "high":
    # "Unsupported dot precision: HIGH"), and the f32-weight resize contract
    # wants full-precision accumulation regardless of the model's setting.
    precision = jax.lax.Precision.HIGHEST
    # Horizontal pass: (H, W) @ (W, OW) -> (H, OW)
    y = jax.lax.dot_general(
        x, ww_ref[:], (((1,), (1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)  # PIL per-pass uint8 rounding
    # Vertical pass: (OH, H) @ (H, OW) -> (OH, OW)
    z = jax.lax.dot_general(
        wh_ref[:], y, (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    z = jnp.clip(jnp.floor(z + 0.5), 0.0, 255.0)
    out_ref[0, 0] = z * scale_ref[c] + shift_ref[c]


@functools.partial(jax.jit, static_argnames=("out_hw",))
def fused_preprocess(
    batch_u8: jax.Array,
    out_hw: tuple[int, int],
    scale: jax.Array,
    shift: jax.Array,
) -> jax.Array:
    """(B, H, W, C) uint8 -> (B, oh, ow, C) f32: resize + (x*scale + shift)."""
    b, h, w, c = batch_u8.shape
    oh, ow = out_hw
    wh = jnp.asarray(_pil_bilinear_weights(h, oh))  # (OH, H)
    ww = jnp.asarray(_pil_bilinear_weights(w, ow))  # (OW, W)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (c,))
    shift = jnp.broadcast_to(jnp.asarray(shift, jnp.float32), (c,))

    # Channel-first so pallas blocks are clean 2D (H, W) planes.
    x_cf = jnp.transpose(batch_u8, (0, 3, 1, 2))

    interpret = jax.default_backend() != "tpu"
    if _VMEM is not None and not interpret:
        in_specs = [
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0), memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_SMEM),
            pl.BlockSpec(memory_space=_SMEM),
        ]
        out_specs = pl.BlockSpec(
            (1, 1, oh, ow), lambda i, j: (i, j, 0, 0), memory_space=_VMEM
        )
    else:
        in_specs = [
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((oh, h), lambda i, j: (0, 0)),
            pl.BlockSpec((ow, w), lambda i, j: (0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ]
        out_specs = pl.BlockSpec((1, 1, oh, ow), lambda i, j: (i, j, 0, 0))

    out_cf = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, oh, ow), jnp.float32),
        grid=(b, c),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=out_specs,
    )(x_cf, wh, ww, scale, shift)
    return jnp.transpose(out_cf, (0, 2, 3, 1))


def make_fused_preprocess_fn(spec):
    """Build a TransformSpec-compatible preprocess using the Pallas kernel.

    Supports the Resize + ToTensor + Normalize combination (the zoo default);
    returns None for configs the kernel does not cover (Scale, no resize).
    """
    if spec.size is None or spec.scale is not None:
        return None
    # Fold ToTensor (1/255) and Normalize into one affine on the 0..255 values.
    if spec.mean is not None:
        mean = np.asarray(spec.mean, np.float32)
        std = np.asarray(spec.std, np.float32)
    else:
        mean = np.zeros(3, np.float32)
        std = np.ones(3, np.float32)
    if spec.to_tensor:
        scale = 1.0 / (255.0 * std)
        shift = -mean / std
    else:
        scale = 1.0 / std
        shift = -mean / std

    oh, ow = spec.size

    def fn(batch_u8):
        return fused_preprocess(batch_u8, (oh, ow), scale, shift)

    return fn
