"""On-device patch preprocessing: PIL-matched resize + normalize, fused for TPU.

The reference preprocesses each patch on CPU dataloader workers with
torchvision transforms built from the model config (reference:
wsinsight/modellib/transforms.py:29-38; whitelist Resize/ToTensor/Normalize/
Scale at transforms.py:22-27). That path is decode -> PIL resize -> float
-> normalize per patch per worker.

Here the whole transform runs on TPU over uint8 batches:

* **Resize** reproduces PIL/torchvision `Resize` (bilinear, antialias) as two
  separable weight matmuls. PIL's triangle filter with support scaled by the
  downsampling factor is exactly a (H_out x H_in) banded matrix; both matrices
  are precomputed on host per (in, out) pair and the resize becomes two MXU
  matmuls. PIL rounds each pass to uint8; we reproduce that rounding so inputs
  match the torch pipeline to <=1 uint8 level.
* **ToTensor** is a multiply by 1/255.
* **Normalize** folds mean/std into a single scale+shift.
* **Scale** is the reference's min-max rescale (transforms.py:8-18).

Everything is jit-friendly: weights are closed-over constants, shapes static.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _pil_bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) triangle-filter matrix identical to PIL's bilinear.

    PIL (ImagingResampleHorizontal): center = (i + 0.5) * scale; support =
    filter.support * filterscale where filterscale = max(scale, 1); weights
    w(j) = triangle((j + 0.5 - center) / filterscale), normalized to sum 1.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support = 1
    precision = 1 << 22  # PIL PRECISION_BITS for 8-bit images
    mat = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax)
        w = (xs + 0.5 - center) / filterscale
        w = np.clip(1.0 - np.abs(w), 0.0, None)
        s = w.sum()
        if s > 0:
            # Quantize like PIL's fixed-point coefficients: with integer
            # accumulation this is bit-exact; in f32 a ~0.03% fraction of
            # pixels can land one uint8 level off on exact rounding ties.
            mat[i, xmin:xmax] = np.round(w / s * precision) / precision
    return mat.astype(np.float32)


def pil_resize_batch(
    x: jax.Array, out_hw: tuple[int, int], emulate_uint8: bool = True, exact: bool = False
) -> jax.Array:
    """Resize (B, H, W, C) float32 batch with PIL bilinear-antialias semantics.

    With `emulate_uint8`, each separable pass rounds to the nearest integer and
    clips to [0, 255], reproducing PIL's per-pass uint8 quantization. With
    `exact`, accumulation runs in int32 fixed point exactly like PIL's
    (bit-identical output; PIL's sums fit int32: 255 * 2^22 < 2^31); the f32
    default leaves ~0.03% of pixels one level off on rounding ties but rides
    the MXU.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    wh_np = _pil_bilinear_weights(h, oh)  # (oh, h)
    ww_np = _pil_bilinear_weights(w, ow)  # (ow, w)

    if exact and emulate_uint8:
        prec = 1 << 22
        kh = jnp.asarray(np.round(wh_np.astype(np.float64) * prec).astype(np.int32))
        kw = jnp.asarray(np.round(ww_np.astype(np.float64) * prec).astype(np.int32))
        v = x.astype(jnp.int32)
        # PIL: (sum + (1 << (PREC-1))) >> PREC, clipped to uint8.
        y = jnp.einsum("ow,bhwc->bhoc", kw, v, preferred_element_type=jnp.int32)
        y = jnp.clip((y + (prec >> 1)) >> 22, 0, 255)
        y = jnp.einsum("oh,bhwc->bowc", kh, y, preferred_element_type=jnp.int32)
        y = jnp.clip((y + (prec >> 1)) >> 22, 0, 255)
        return y.astype(jnp.float32)

    # Horizontal pass first (PIL resizes width then height).
    wh = jnp.asarray(wh_np)
    ww = jnp.asarray(ww_np)
    y = jnp.einsum("ow,bhwc->bhoc", ww, x, preferred_element_type=jnp.float32)
    if emulate_uint8:
        y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)  # PIL rounds half away from zero
    y = jnp.einsum("oh,bhwc->bowc", wh, y, preferred_element_type=jnp.float32)
    if emulate_uint8:
        y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)
    return y


def yuv420_to_rgb(packed: jax.Array) -> jax.Array:
    """Reconstruct RGB from the planar YUV 4:2:0 wire format, on device.

    Inverse of native.rgb_to_yuv420: packed is (B, H*3/2, W) uint8 — Y plane
    rows [0, H), then chroma rows holding Cb | Cr side by side at (H/2, W/2).
    Chroma upsamples bilinearly with half-pel siting (the adjoint of the
    packer's 2x2 box mean), then BT.601 full-range inverse, rounded and
    clipped to [0, 255] float32 so downstream preprocessing sees uint8-exact
    values. Used when WSINSIGHT_WIRE=yuv420 ships patches at 1.5 B/px over a
    thin host->device link (engine/data.py); lossy in chroma, so opt-in.
    """
    b, rows, w = packed.shape
    h = rows * 2 // 3
    cw = w // 2
    y = packed[:, :h, :].astype(jnp.float32)
    chroma = packed[:, h:, :].astype(jnp.float32)
    cb = jax.image.resize(chroma[:, :, :cw] - 128.0, (b, h, w), method="linear")
    cr = jax.image.resize(chroma[:, :, cw:] - 128.0, (b, h, w), method="linear")
    rgb = jnp.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return jnp.clip(jnp.round(rgb), 0.0, 255.0)


@dataclass(frozen=True)
class TransformSpec:
    """Resolved transform pipeline for a model config.

    Mirrors the reference's config-driven whitelist (reference:
    modellib/transforms.py:22-38). `size` of None means no resize.
    """

    size: tuple[int, int] | None = None
    mean: tuple[float, ...] | None = None
    std: tuple[float, ...] | None = None
    scale: tuple[float, float] | None = None  # (lower, upper) min-max rescale
    to_tensor: bool = True
    # Bit-exact PIL fixed-point resize (int32 accumulation). The f32 path is
    # MXU-friendly but can land ~0.03-3% of pixels one uint8 level off on
    # rounding ties depending on the scale factor.
    exact_resize: bool = True

    @classmethod
    def from_config(cls, transform_list: Sequence[Any]) -> "TransformSpec":
        """Build from a model-config transform list (dicts or objects with
        .name/.arguments)."""
        size = mean = std = scale = None
        to_tensor = False
        for t in transform_list or []:
            name = t["name"] if isinstance(t, dict) else t.name
            args = (t.get("arguments") if isinstance(t, dict) else t.arguments) or {}
            if name == "Resize":
                s = args.get("size")
                size = (s, s) if isinstance(s, int) else tuple(s)
            elif name == "ToTensor":
                to_tensor = True
            elif name == "Normalize":
                mean = tuple(args.get("mean"))
                std = tuple(args.get("std"))
            elif name == "Scale":
                scale = (float(args.get("lower", 0.0)), float(args.get("upper", 1.0)))
            else:
                raise KeyError(f"unknown transform '{name}'")
        return cls(size=size, mean=mean, std=std, scale=scale, to_tensor=to_tensor)


def make_preprocess_fn(
    spec: TransformSpec, compute_dtype: Any = jnp.float32
) -> Callable[[jax.Array], jax.Array]:
    """Build a jittable (B, H, W, 3) uint8 -> (B, oh, ow, 3) float fn."""

    def fn(batch_u8: jax.Array) -> jax.Array:
        x = batch_u8.astype(jnp.float32)
        if spec.size is not None:
            x = pil_resize_batch(x, spec.size, emulate_uint8=True, exact=spec.exact_resize)
        if spec.to_tensor:
            x = x * (1.0 / 255.0)
        if spec.scale is not None:
            lower, upper = spec.scale
            mn = jnp.min(x, axis=(1, 2, 3), keepdims=True)
            x = x - mn
            mx = jnp.max(x, axis=(1, 2, 3), keepdims=True)
            # guarded div: a constant patch (blank glass) would otherwise
            # emit NaN for the whole image and poison its CSV row
            x = x / jnp.maximum(mx, 1e-8)
            x = x * (upper - lower) + lower
        if spec.mean is not None:
            mean = jnp.asarray(spec.mean, jnp.float32)
            std = jnp.asarray(spec.std, jnp.float32)
            x = (x - mean) / std
        return x.astype(compute_dtype)

    return fn
