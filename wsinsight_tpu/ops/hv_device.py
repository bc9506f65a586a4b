"""Device (XLA) half of the HV separation-energy stage.

The most expensive dense step of nucleus post-processing is the wide Sobel
over the HV field (ksize=21 on 2048^2 finalize tiles — reference:
wsinsight/modellib/tilefuse.py:63-79). That part is foreground-independent:
``energy_raw = max(1 - unit(Sobel_x(unit(h))), 1 - unit(Sobel_y(unit(v))))``
only depends on the HV maps, so it can run batched on the accelerator while
the host keeps the sequential tail (hole fill, labeling, watershed).

Enabled by the stitcher when ``WSINSIGHT_DEVICE_RIDGE=1``; numerics are
pinned to the CPU/cv2 path by tests (same separable taps as
``cv2.getDerivKernels(1, 0, ksize=21)``, same REFLECT_101 border).
"""

from __future__ import annotations

import numpy as np


def _sobel_taps(ksize: int = 21) -> tuple[np.ndarray, np.ndarray]:
    """(derivative, smoothing) 1-D taps matching cv2.getDerivKernels(1,0,k).

    cv2 builds them from binomial coefficients: smoothing = C(k-2, i)
    normalized family, derivative = difference of binomials. Computed here
    from cv2 when available (exactness), with the binomial construction as
    the fallback.
    """
    try:
        import cv2

        kx, ky = cv2.getDerivKernels(1, 0, ksize=ksize)
        return kx.ravel().astype(np.float64), ky.ravel().astype(np.float64)
    except Exception:  # pragma: no cover - cv2 is a hard dep elsewhere
        from math import comb

        n = ksize - 2
        smooth = np.array([comb(n, i) for i in range(n + 1)], np.float64)
        smooth = np.convolve(smooth, [1.0, 2.0, 1.0])[: ksize]  # not exact; cv2 path preferred
        deriv = np.convolve([comb(n, i) for i in range(n + 1)], [-1.0, 0.0, 1.0])
        return deriv[:ksize], smooth


def make_energy_core(ksize: int = 21):
    """Pure single-image (H, W, 2) HV -> (H, W) raw separation energy.

    Traceable, so it composes inside other jitted programs (the streaming
    band engine slices a window on device and applies this core in the same
    kernel). The batched public entry point is ``make_energy_fn``.
    """
    import jax.numpy as jnp

    deriv, smooth = _sobel_taps(ksize)
    half = ksize // 2

    def _conv1d(x, taps, axis):
        # x: (H, W); correlate along `axis` with REFLECT_101 border.
        # Formulated as tap-by-tap shifted adds, NOT lax.conv: on TPU a
        # (1, ksize) conv lowers to the MXU in bf16 — ~100x slower for this
        # shape AND ~1e-2 relative error on the wide-support taps. The
        # shifted adds stay on the VPU in f32 (measured 114 ms -> <1 ms per
        # 2176^2 window) and are the accuracy the cv2-parity test pins.
        pad = [(0, 0), (0, 0)]
        pad[axis] = (half, half)
        xp = jnp.pad(x, pad, mode="reflect")
        n = x.shape[axis]
        acc = None
        for j, t in enumerate(taps):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(j, j + n)
            term = jnp.float32(t) * xp[tuple(sl)]
            acc = term if acc is None else acc + term
        return acc

    def _unit(x):
        lo, hi = x.min(), x.max()
        span = hi - lo
        return jnp.where(span > 0, (x - lo) / jnp.where(span > 0, span, 1.0), 0.0)

    def energy(hv):
        hv = hv.astype(jnp.float32)
        h_dir = _unit(hv[..., 0])
        v_dir = _unit(hv[..., 1])
        # cv2.Sobel(dx=1): derivative along x (columns), smoothing along y
        grad_h = _conv1d(_conv1d(h_dir, deriv, axis=1), smooth, axis=0)
        grad_v = _conv1d(_conv1d(v_dir, smooth, axis=1), deriv, axis=0)
        return jnp.maximum(1.0 - _unit(grad_h), 1.0 - _unit(grad_v))

    return energy


def make_blur3_core():
    """Pure (H, W) f32 -> (H, W) f32 [1,2,1]⊗[1,2,1] convolution, REFLECT_101.

    The integer watershed-basin blur (ops/hv_postproc._integer_basin) on the
    accelerator: inputs are integers in [0, 255], every product/sum stays
    <= 16 * 255 = 4080, so f32 arithmetic is EXACT and the device result is
    bit-identical to the host's integer cv2.sepFilter2D. Written as shifted
    adds on purpose — lax.conv would route through the MXU in bf16 on TPU,
    which is neither exact (4080 needs 12 mantissa bits) nor fast for a
    3-tap kernel.
    """
    import jax.numpy as jnp

    def blur3(x):
        x = x.astype(jnp.float32)
        xp = jnp.pad(x, ((0, 0), (1, 1)), mode="reflect")
        r = xp[:, :-2] + 2.0 * xp[:, 1:-1] + xp[:, 2:]
        rp = jnp.pad(r, ((1, 1), (0, 0)), mode="reflect")
        return rp[:-2] + 2.0 * rp[1:-1] + rp[2:]

    return blur3


def make_energy_fn(ksize: int = 21):
    """Jitted (B, H, W, 2) HV -> (B, H, W) raw separation energy."""
    import jax

    return jax.jit(jax.vmap(make_energy_core(ksize)))


_ENERGY_FN = None


def separation_energy_batched(hv_tiles: np.ndarray) -> np.ndarray:
    """Raw separation energy for a batch of HV tiles, computed on device."""
    global _ENERGY_FN
    if _ENERGY_FN is None:
        _ENERGY_FN = make_energy_fn()
    return np.asarray(_ENERGY_FN(np.asarray(hv_tiles)))
