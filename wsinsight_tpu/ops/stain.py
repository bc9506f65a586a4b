"""Macenko stain estimation and deconvolution-based normalization in JAX.

Replaces histomicstk's Cython path (reference:
wsinsight/modellib/run_inference.py:232-266 for estimation on one shuffled
256-patch batch; modellib/data.py:292-300 for per-patch normalization). The
math is small dense linear algebra that fuses into the TPU preprocess:

* RGB -> SDA optical density (htk rgb_to_sda convention with I_0),
* Macenko PCA: top-2 OD eigenvectors, robust angle percentiles, stain vectors,
* concentrations by least squares against the stain matrix,
* re-composition with a target stain matrix (eosin/hematoxylin/null).

Default target stains match the reference's stain_color_map selection
(run_inference.py:262-264).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-8
I_0 = 255.0

# histomicstk stain_color_map entries used by the reference.
STAIN_COLOR_MAP = {
    "hematoxylin": (0.65, 0.70, 0.29),
    "eosin": (0.07, 0.99, 0.11),
    "dab": (0.27, 0.57, 0.78),
    "null": (0.0, 0.0, 0.0),
}


def default_target_stains() -> np.ndarray:
    """W_def: columns eosin, hematoxylin, null (reference order)."""
    stains = ["eosin", "hematoxylin", "null"]
    w = np.array([STAIN_COLOR_MAP[s] for s in stains], dtype=np.float32).T
    return complement_stain_matrix(w)


def complement_stain_matrix(w: np.ndarray) -> np.ndarray:
    """Fill zero columns with the unit-normalized cross product of the others."""
    w = np.array(w, dtype=np.float32)
    for i in range(3):
        if np.allclose(w[:, i], 0):
            a = w[:, (i + 1) % 3]
            b = w[:, (i + 2) % 3]
            c = np.cross(a, b)
            n = np.linalg.norm(c)
            w[:, i] = c / n if n > 0 else c
    # normalize columns
    norms = np.linalg.norm(w, axis=0)
    norms[norms == 0] = 1.0
    return (w / norms).astype(np.float32)


def rgb_to_sda(im: jax.Array, i_0: float = I_0) -> jax.Array:
    """htk rgb_to_sda: -log(im / I_0) * 255 / log(I_0)."""
    im = jnp.maximum(im, EPSILON)
    return -jnp.log(im / i_0) * (255.0 / np.log(i_0))


def sda_to_rgb(sda: jax.Array, i_0: float = I_0) -> jax.Array:
    return i_0 * jnp.exp(-sda * (np.log(i_0) / 255.0))


def macenko_stain_matrix(
    pixels_rgb: jax.Array,
    i_0: float = I_0,
    minimum_magnitude: float = 16.0,
    min_angle_percentile: float = 0.01,
    max_angle_percentile: float = 0.99,
) -> jax.Array:
    """Estimate the (3,3) stain matrix from (N,3) RGB pixels (Macenko PCA).

    jit-friendly: magnitude filtering is done with weights instead of boolean
    indexing so shapes stay static.
    """
    sda = rgb_to_sda(pixels_rgb.astype(jnp.float32), i_0)  # (N, 3)
    mag = jnp.linalg.norm(sda, axis=1)
    w = (mag > minimum_magnitude).astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1.0)

    mean = (sda * w[:, None]).sum(0) / wsum
    centered = (sda - mean) * w[:, None]
    cov = centered.T @ centered / wsum
    evals, evecs = jnp.linalg.eigh(cov)
    basis = evecs[:, -2:]  # top-2 eigenvectors (columns)

    proj = sda @ basis  # (N, 2)
    angles = jnp.arctan2(proj[:, 1], proj[:, 0])
    # Weighted percentile via masked sort: push filtered-out pixels to +inf.
    angles_masked = jnp.where(w > 0, angles, jnp.inf)
    order = jnp.sort(angles_masked)
    n_valid = w.sum().astype(jnp.int32)
    lo_idx = jnp.clip((min_angle_percentile * n_valid).astype(jnp.int32), 0, len(angles) - 1)
    hi_idx = jnp.clip((max_angle_percentile * n_valid).astype(jnp.int32), 0, len(angles) - 1)
    a_min = order[lo_idx]
    a_max = order[hi_idx]

    def angle_to_vector(a):
        d = jnp.stack([jnp.cos(a), jnp.sin(a)])
        v = basis @ d
        return v / jnp.maximum(jnp.linalg.norm(v), EPSILON)

    v1 = angle_to_vector(a_min)
    v2 = angle_to_vector(a_max)
    # Column ORDER here is by projection extreme, not by stain identity —
    # estimate_stains_from_batch reorders columns by color similarity so
    # concentrations line up with the target matrix (see _match_stain_order).
    s3 = jnp.cross(v1, v2)
    s3 = s3 / jnp.maximum(jnp.linalg.norm(s3), EPSILON)
    return jnp.stack([v1, v2, s3], axis=1)  # columns = stains


def color_deconvolution(im_rgb: jax.Array, w: jax.Array, i_0: float = I_0) -> jax.Array:
    """Stain concentrations: solve sda = W @ c per pixel. im (..., 3)."""
    sda = rgb_to_sda(im_rgb, i_0)
    w_inv = jnp.linalg.inv(w)
    return jnp.einsum("ij,...j->...i", w_inv, sda)


def color_convolution(conc: jax.Array, w: jax.Array, i_0: float = I_0) -> jax.Array:
    sda = jnp.einsum("ij,...j->...i", w, conc)
    return jnp.clip(sda_to_rgb(sda, i_0), 0.0, 255.0)


def deconvolution_based_normalization(
    im_rgb: jax.Array,
    w_source: jax.Array,
    w_target: jax.Array,
    i_0: float = I_0,
) -> jax.Array:
    """Map image stains from w_source space to w_target space (htk equivalent,
    reference: modellib/data.py:295-299)."""
    conc = color_deconvolution(im_rgb, w_source, i_0)
    return color_convolution(conc, w_target, i_0)


def _match_stain_order(w: np.ndarray) -> np.ndarray:
    """Reorder the two estimated stain columns to (eosin, hematoxylin).

    Concentrations are re-rendered positionally against the target matrix
    (columns eosin, hematoxylin, null — the reference's order,
    run_inference.py:263-264), so the SOURCE columns must carry the same
    identities: pick the pairing whose columns are most cosine-similar to the
    canonical stain colors. Without this, hematoxylin concentrations get
    eosin's color and vice versa — an H/E swap on every normalized patch.
    """
    w = np.array(w, dtype=np.float32)

    def unit(v):
        v = np.asarray(v, np.float32)
        return v / max(float(np.linalg.norm(v)), EPSILON)

    e_ref = unit(STAIN_COLOR_MAP["eosin"])
    h_ref = unit(STAIN_COLOR_MAP["hematoxylin"])
    c0, c1 = unit(w[:, 0]), unit(w[:, 1])
    keep = float(c0 @ e_ref + c1 @ h_ref)
    swapped = float(c1 @ e_ref + c0 @ h_ref)
    if swapped > keep:
        w = w[:, [1, 0, 2]]
    # re-derive the residual column for the (possibly) new ordering
    w[:, 2] = np.cross(w[:, 0], w[:, 1])
    return w


def estimate_stains_from_batch(batch_u8: np.ndarray, max_pixels: int = 1 << 20) -> np.ndarray:
    """Host helper: estimate W_est from a (B,H,W,3) uint8 sample batch
    (reference samples one shuffled 256-patch batch, run_inference.py:259-261).

    Degenerate samples (blank background, saturated white, single-color
    tissue) make the Macenko PCA rank-deficient or non-finite; those fall
    back to the default target stains, turning normalization into a no-op
    instead of poisoning every downstream patch.
    """
    pixels = np.asarray(batch_u8, dtype=np.float32).reshape(-1, 3) + EPSILON
    if len(pixels) > max_pixels:
        idx = np.random.default_rng(0).choice(len(pixels), max_pixels, replace=False)
        pixels = pixels[idx]
    w = macenko_stain_matrix(jnp.asarray(pixels))
    w = _match_stain_order(np.asarray(w))
    w = complement_stain_matrix(w)
    if not np.isfinite(w).all() or abs(float(np.linalg.det(w))) < 1e-6:
        import logging

        logging.getLogger(__name__).warning(
            "stain estimation sample is degenerate (blank/single-color batch);"
            " using default target stains"
        )
        return default_target_stains()
    return w
