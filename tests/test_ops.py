"""Preprocess/stain op tests: PIL resize parity and stain-normalization sanity."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from wsinsight_tpu.ops.preprocess import (
    TransformSpec,
    make_preprocess_fn,
    pil_resize_batch,
)
from wsinsight_tpu.ops.stain import (
    color_convolution,
    color_deconvolution,
    default_target_stains,
    deconvolution_based_normalization,
    estimate_stains_from_batch,
)


@pytest.mark.parametrize("in_size,out_size", [(350, 224), (100, 100), (64, 224), (2100, 224)])
def test_resize_matches_pil(in_size, out_size):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(in_size, in_size, 3), dtype=np.uint8)
    expected = np.asarray(
        Image.fromarray(img).resize((out_size, out_size), Image.Resampling.BILINEAR)
    ).astype(np.float32)
    got = np.asarray(pil_resize_batch(jnp.asarray(img[None].astype(np.float32)), (out_size, out_size)))[0]
    # f32 path: rounding ties can land 1 uint8 level off on a tiny fraction.
    assert np.abs(got - expected).max() <= 1.0
    frac_exact = (np.abs(got - expected) < 0.5).mean()
    assert frac_exact > 0.95
    # int32 fixed-point path is bit-exact with PIL.
    exact = np.asarray(
        pil_resize_batch(
            jnp.asarray(img[None].astype(np.float32)), (out_size, out_size), exact=True
        )
    )[0]
    np.testing.assert_array_equal(exact, expected)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((350, 350), (224, 224)), ((100, 100), (224, 224)), ((257, 193), (96, 128))],
)
def test_native_resize_bit_exact_vs_pil(in_hw, out_hw):
    """The C++ batch resize (native/resize.cpp) is bit-identical to PIL —
    it consumes the same quantized coefficient tables as the device path."""
    from wsinsight_tpu.native import pil_resize_native

    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, size=(5, *in_hw, 3), dtype=np.uint8)
    got = pil_resize_native(batch, out_hw)
    if got is None:
        pytest.skip("native library not built")
    assert got.shape == (5, *out_hw, 3)
    for i in range(len(batch)):
        expected = np.asarray(
            Image.fromarray(batch[i]).resize(
                (out_hw[1], out_hw[0]), Image.Resampling.BILINEAR
            )
        )
        np.testing.assert_array_equal(got[i], expected)
    # single-image (rank-3) form and out= buffer reuse
    buf = np.empty((1, *out_hw, 3), np.uint8)
    one = pil_resize_native(batch[0], out_hw)
    np.testing.assert_array_equal(one, got[0])
    assert pil_resize_native(batch[:1], out_hw, out=buf) is buf
    np.testing.assert_array_equal(buf[0], got[0])


def test_pallas_fused_preprocess_matches_xla():
    from wsinsight_tpu.ops.pallas_preprocess import make_fused_preprocess_fn

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, size=(3, 96, 96, 3), dtype=np.uint8)
    spec = TransformSpec(
        size=(64, 64), mean=(0.7, 0.6, 0.5), std=(0.1, 0.2, 0.3),
        to_tensor=True, exact_resize=False,
    )
    ref = np.asarray(make_preprocess_fn(spec)(jnp.asarray(batch)))
    fn = make_fused_preprocess_fn(spec)
    got = np.asarray(fn(jnp.asarray(batch)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # Unsupported configs (Scale / no resize) fall back to None.
    assert make_fused_preprocess_fn(TransformSpec(size=None)) is None
    assert make_fused_preprocess_fn(TransformSpec(size=(8, 8), scale=(0, 1))) is None


def test_preprocess_fn_normalize():
    spec = TransformSpec(size=(4, 4), mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25), to_tensor=True)
    fn = make_preprocess_fn(spec)
    batch = np.full((2, 8, 8, 3), 255, np.uint8)
    out = np.asarray(fn(jnp.asarray(batch)))
    np.testing.assert_allclose(out, (1.0 - 0.5) / 0.25, atol=1e-6)
    assert out.shape == (2, 4, 4, 3)


def test_preprocess_scale():
    spec = TransformSpec(size=None, scale=(0.0, 1.0), to_tensor=True)
    fn = make_preprocess_fn(spec)
    batch = np.zeros((1, 4, 4, 3), np.uint8)
    batch[0, 0, 0, 0] = 255
    batch[0, 1, 1, 1] = 128
    out = np.asarray(fn(jnp.asarray(batch)))
    assert out.max() == pytest.approx(1.0)
    assert out.min() == pytest.approx(0.0)


def test_transform_spec_from_config():
    spec = TransformSpec.from_config(
        [
            {"name": "Resize", "arguments": {"size": 224}},
            {"name": "ToTensor"},
            {"name": "Normalize", "arguments": {"mean": [0.1, 0.2, 0.3], "std": [1, 1, 1]}},
        ]
    )
    assert spec.size == (224, 224)
    assert spec.mean == (0.1, 0.2, 0.3)
    with pytest.raises(KeyError):
        TransformSpec.from_config([{"name": "RandomCrop", "arguments": {}}])


def test_stain_deconvolution_roundtrip():
    w = default_target_stains()
    rng = np.random.default_rng(0)
    img = rng.integers(30, 220, size=(16, 16, 3)).astype(np.float32)
    conc = color_deconvolution(jnp.asarray(img), jnp.asarray(w))
    back = np.asarray(color_convolution(conc, jnp.asarray(w)))
    np.testing.assert_allclose(back, img, atol=1e-2)


def test_stain_normalization_identity_when_same_stains():
    w = default_target_stains()
    rng = np.random.default_rng(1)
    img = rng.integers(30, 220, size=(8, 8, 3)).astype(np.float32)
    out = np.asarray(deconvolution_based_normalization(jnp.asarray(img), jnp.asarray(w), jnp.asarray(w)))
    np.testing.assert_allclose(out, img, atol=1e-2)


def test_estimate_stains_shape():
    # Synthetic H&E-ish mixture.
    rng = np.random.default_rng(2)
    w_true = default_target_stains()
    conc = np.zeros((4096, 3), np.float32)
    conc[:, 0] = rng.uniform(0.0, 1.5, 4096)
    conc[:, 1] = rng.uniform(0.0, 1.5, 4096)
    rgb = np.asarray(color_convolution(jnp.asarray(conc * 80), jnp.asarray(w_true)))
    batch = rgb.reshape(1, 64, 64, 3).astype(np.uint8)
    w_est = estimate_stains_from_batch(batch)
    assert w_est.shape == (3, 3)
    np.testing.assert_allclose(np.linalg.norm(w_est, axis=0), 1.0, atol=1e-4)


def test_estimate_stains_degenerate_batches_fall_back():
    """Blank / saturated / single-color sample batches must not poison the
    stain matrix: the estimator falls back to the default target stains
    (identity normalization) instead of returning NaNs or a singular W."""
    from wsinsight_tpu.ops.stain import default_target_stains

    for batch in (
        np.full((2, 32, 32, 3), 255, np.uint8),   # saturated white background
        np.zeros((2, 32, 32, 3), np.uint8),        # black
        np.full((2, 32, 32, 3), (186, 90, 160), np.uint8),  # one flat color
    ):
        w = estimate_stains_from_batch(batch)
        assert np.isfinite(w).all()
        assert abs(np.linalg.det(w)) > 1e-6
        np.testing.assert_allclose(w, default_target_stains())


def test_stain_normalization_is_identity_on_target_stains():
    """Normalizing an image ALREADY rendered in the target stain space must be
    (near) a no-op — in particular hematoxylin and eosin must not swap (the
    concentration-to-target mapping is positional, so column identity
    matters)."""
    import jax.numpy as jnp

    from wsinsight_tpu.ops.stain import (
        color_convolution,
        deconvolution_based_normalization,
        default_target_stains,
        estimate_stains_from_batch,
    )

    rng = np.random.default_rng(0)
    w_def = default_target_stains()
    conc = np.zeros((64, 64, 3), np.float32)
    conc[..., 0] = rng.uniform(0, 80, (64, 64))   # eosin
    conc[..., 1] = rng.uniform(0, 120, (64, 64))  # hematoxylin
    img = np.clip(
        np.asarray(color_convolution(jnp.asarray(conc), jnp.asarray(w_def))), 0, 255
    ).astype(np.uint8)

    w_est = estimate_stains_from_batch(img[None])
    out = np.asarray(
        deconvolution_based_normalization(
            jnp.asarray(img, jnp.float32), jnp.asarray(w_est), jnp.asarray(w_def)
        )
    )
    assert np.abs(out - img.astype(np.float32)).mean() < 3.0
    # a hematoxylin-blue pixel stays blue (no H/E swap)
    px = np.array([[[47.0, 40.0, 119.0]]], np.float32)
    outpx = np.asarray(
        deconvolution_based_normalization(
            jnp.asarray(px), jnp.asarray(w_est), jnp.asarray(w_def)
        )
    )[0, 0]
    assert outpx[2] > outpx[0], f"blue pixel turned {outpx}"
