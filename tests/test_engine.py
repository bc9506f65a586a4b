"""End-to-end engine tests: patch stage -> inference -> CSV, on CPU devices.

Exercises the full slide->CSV flow with a random-weight local model (golden
probability values need real zoo weights, which require network; coordinate
layout, CSV schema, resume, and shard-invariance are asserted instead)."""

import numpy as np
import pandas as pd
import pytest

from wsinsight_tpu.engine import run_inference
from wsinsight_tpu.patchlib import segment_and_patch_one_slide
from wsinsight_tpu.uri_path import URIPath
from wsinsight_tpu.zoo import load_local_model, make_random_local_model


@pytest.fixture(scope="module")
def patched_results(purple_slide, tmp_path_factory):
    results = tmp_path_factory.mktemp("results")
    segment_and_patch_one_slide(
        slide_path=URIPath(str(purple_slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=None,
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=350,
        patch_spacing_um_px=0.25,
    )
    return results


@pytest.fixture(scope="module")
def local_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    # 32-px model input: grid anchors depend on patch size/spacing, not
    # the model resolution; quarters forward FLOPs on the 1-core host.
    cfg, weights = make_random_local_model(
        "resnet34", 2, d, class_names=["Other", "Tumor"], resize_size=32
    )
    return load_local_model(cfg, weights)


def test_engine_end_to_end(patched_results, local_model, purple_slide):
    failed_patching, failed_inference = run_inference(
        wsi_dir=URIPath(str(purple_slide.parent)),
        slide_paths=[URIPath(str(purple_slide))],
        results_dir=URIPath(str(patched_results)),
        model_info=local_model,
        batch_size=32,
        num_workers=2,
    )
    assert failed_patching == []
    assert failed_inference == []
    csv = patched_results / "model-outputs-csv" / "purple.csv"
    assert csv.exists()
    df = pd.read_csv(csv)
    assert list(df.columns) == ["minx", "miny", "width", "height", "prob_Other", "prob_Tumor"]
    assert len(df) == 144
    # Coordinates match the golden reference layout exactly.
    golden = pd.read_csv("tests/reference/breast-tumor-resnet34.tcga-brca/purple.csv")
    np.testing.assert_array_equal(df[["minx", "miny"]].to_numpy(), golden[["minx", "miny"]].to_numpy())
    assert (df["width"] == 350).all()
    # Probabilities sum to 1 (softmax) and are identical across patches of a
    # uniform slide.
    probs = df[["prob_Other", "prob_Tumor"]].to_numpy()
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(probs, np.broadcast_to(probs[0], probs.shape), atol=1e-5)


def test_engine_resume(patched_results, local_model, purple_slide):
    csv = patched_results / "model-outputs-csv" / "purple.csv"
    mtime = csv.stat().st_mtime_ns
    run_inference(
        wsi_dir=None,
        slide_paths=None,
        results_dir=URIPath(str(patched_results)),
        model_info=local_model,
    )
    assert csv.stat().st_mtime_ns == mtime


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_shard_invariance(patched_results, local_model, purple_slide, tmp_path):
    """Same CSV whether the batch shards over 1 or 8 CPU devices."""
    import shutil

    probs = {}
    for ndev, bs in ((1, 32), (8, 32)):
        results = tmp_path / f"r{ndev}"
        results.mkdir()
        shutil.copytree(patched_results / "patches", results / "patches")
        from wsinsight_tpu.engine.runner import ClassifierEngine
        from wsinsight_tpu.engine.data import PatchBatchSource

        engine = ClassifierEngine(local_model, max_devices=ndev)
        src = PatchBatchSource(
            wsi_path=URIPath(str(purple_slide)),
            patch_path=URIPath(str(results / "patches" / "purple.h5")),
            use_hdf5_images=False,
            batch_size=engine.pad_batch(bs),
            num_threads=2,
        )
        out = [engine.run_batch(b.images, b.n_valid) for b in src]
        src.close()
        probs[ndev] = np.concatenate(out, axis=0)
    np.testing.assert_allclose(probs[1], probs[8], atol=1e-6)


def test_speedup_equivalence(tmp_path, patched_results, purple_slide, local_model):
    """bf16 fast path stays close to the f32-parity path (the analog of the
    reference's +/-speedup equivalence test, reference: tests/test_all.py:615-643)."""
    from wsinsight_tpu.engine.data import PatchBatchSource
    from wsinsight_tpu.engine.runner import ClassifierEngine

    h5 = URIPath(str(patched_results / "patches" / "purple.h5"))
    probs = {}
    for mixed in (False, True):
        engine = ClassifierEngine(local_model, mixed_precision=mixed, max_devices=1)
        src = PatchBatchSource(
            wsi_path=URIPath(str(purple_slide)), patch_path=h5,
            use_hdf5_images=False, batch_size=16, num_threads=2,
        )
        batch = next(iter(src))
        src.close()
        probs[mixed] = engine.run_batch(batch.images, batch.n_valid)
    # Same argmax everywhere; probabilities within the bf16 budget. The
    # budget is measured, not guessed: on a real v5e chip, bf16-pass ResNet34
    # logits drift <= 0.37% relative to the f32-precision path (max |dlogit|
    # 9.6 on |logit| 2592 over a random 16-patch batch; probabilities
    # saturate so prob drift was 0.0). 0.01 gives ~3x headroom on probs.
    assert (probs[False].argmax(1) == probs[True].argmax(1)).all()
    np.testing.assert_allclose(probs[True], probs[False], atol=0.01)


def test_patch_source_hdf5_images(tmp_path):
    """PatchBatchSource serves /images caches without touching the slide
    (reference: modellib/data.py:198-236)."""
    from wsinsight_tpu.engine.data import PatchBatchSource
    from wsinsight_tpu.patchlib.io import save_hdf5

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(5, 32, 32, 3), dtype=np.uint8)
    coords = np.array([[0, 0], [32, 0], [64, 0], [0, 32], [32, 32]], np.int32)
    h5 = tmp_path / "s.h5"
    save_hdf5(
        path=h5, coords=coords, polygons=None, tile_dim=None, patch_size=32,
        patch_spacing_um_px=0.25, images=imgs, slide_path="/nonexistent.tif",
        slide_mpp=0.25, slide_width=96, slide_height=64,
    )
    src = PatchBatchSource(
        wsi_path=None, patch_path=URIPath(str(h5)), use_hdf5_images=True,
        batch_size=2, num_threads=2,
    )
    batches = list(src)
    src.close()
    assert [b.n_valid for b in batches] == [2, 2, 1]
    got = np.concatenate([b.images[: b.n_valid] for b in batches])
    np.testing.assert_array_equal(got, imgs)
    got_coords = np.concatenate([b.coords[: b.n_valid] for b in batches])
    np.testing.assert_array_equal(got_coords[:, :2], coords)


def test_host_resize_bit_identical(tmp_path):
    """WSINSIGHT_HOST_RESIZE moves the (downscaling) resize into the decode
    threads (PIL bilinear — the reference's own CPU transform placement).
    The device fixed-point resize is bit-exact PIL, so probabilities must be
    bitwise identical; upscale requests are ignored (they'd inflate H2D)."""
    from PIL import Image

    from wsinsight_tpu.engine.data import PatchBatchSource
    from wsinsight_tpu.engine.runner import ClassifierEngine
    from wsinsight_tpu.patchlib.io import save_hdf5
    from wsinsight_tpu.zoo import load_local_model, make_random_local_model

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, size=(5, 96, 96, 3), dtype=np.uint8)
    coords = np.array([[0, 0], [96, 0], [192, 0], [0, 96], [96, 96]], np.int32)
    h5 = tmp_path / "s.h5"
    save_hdf5(
        path=h5, coords=coords, polygons=None, tile_dim=None, patch_size=96,
        patch_spacing_um_px=0.25, images=imgs, slide_path="/nonexistent.tif",
        slide_mpp=0.25, slide_width=288, slide_height=192,
    )

    def one_batch(host_resize):
        src = PatchBatchSource(
            wsi_path=None, patch_path=URIPath(str(h5)), use_hdf5_images=True,
            batch_size=5, num_threads=2, host_resize=host_resize,
        )
        batch = next(iter(src))
        src.close()
        return batch

    resized = one_batch((64, 64))
    assert resized.images.shape == (5, 64, 64, 3)
    want = np.stack(
        [np.asarray(Image.fromarray(im).resize((64, 64), Image.BILINEAR)) for im in imgs]
    )
    np.testing.assert_array_equal(resized.images, want)

    full = one_batch((128, 128))  # upscale request: ignored
    assert full.images.shape == (5, 96, 96, 3)

    d = tmp_path / "model"
    cfg, weights = make_random_local_model(
        "resnet34", 2, d, patch_size_pixels=96, resize_size=64
    )
    engine = ClassifierEngine(load_local_model(cfg, weights), max_devices=1)
    p_device = engine.run_batch(full.images, 5)   # device does the 96 -> 64 resize
    p_host = engine.run_batch(resized.images, 5)  # resize already done on host
    np.testing.assert_array_equal(p_device, p_host)


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_stain_normalization_end_to_end(tmp_path, patched_results, purple_slide):
    """Macenko estimation from a shuffled sample batch + on-device
    normalization inside the jitted step (reference: run_inference.py:232-266)."""
    import shutil

    cfg, weights = make_random_local_model(
        "resnet34", 2, tmp_path / "m", class_names=["Other", "Tumor"], resize_size=64
    )
    model = load_local_model(cfg, weights)
    results = tmp_path / "results"
    results.mkdir()
    shutil.copytree(patched_results / "patches", results / "patches")
    failed_patching, failed_inference = run_inference(
        wsi_dir=None,
        slide_paths=None,
        results_dir=URIPath(str(results)),
        model_info=model,
        batch_size=64,
        num_workers=2,
        stain_normalization=True,
    )
    assert failed_inference == []
    df = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    assert len(df) == 144
    probs = df[["prob_Other", "prob_Tumor"]].to_numpy()
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_sigmoid_single_logit(tmp_path, patched_results, purple_slide):
    """num_classes=1 exercises the sigmoid branch (paad-style model)."""
    cfg, weights = make_random_local_model(
        "resnet34", 1, tmp_path, class_names=["Tumor"], resize_size=64
    )
    model = load_local_model(cfg, weights)
    import shutil

    results = tmp_path / "results"
    results.mkdir()
    shutil.copytree(patched_results / "patches", results / "patches")
    run_inference(
        wsi_dir=None,
        slide_paths=None,
        results_dir=URIPath(str(results)),
        model_info=model,
        batch_size=64,
    )
    df = pd.read_csv(results / "model-outputs-csv" / "purple.csv")
    assert list(df.columns) == ["minx", "miny", "width", "height", "prob_Tumor"]
    assert ((df["prob_Tumor"] >= 0) & (df["prob_Tumor"] <= 1)).all()


def test_yuv420_wire_pack_and_reconstruct():
    """The thin-link wire format: native packer == numpy fallback bit-for-bit;
    device reconstruction is near-lossless on smooth content and exact on
    gray (constant-chroma) images. Chroma subsampling is lossy, hence the
    wire is opt-in (WSINSIGHT_WIRE=yuv420)."""
    import wsinsight_tpu.native as native_mod
    from wsinsight_tpu.native import rgb_to_yuv420
    from wsinsight_tpu.ops.preprocess import yuv420_to_rgb

    rng = np.random.default_rng(0)
    # smooth tissue-like field (chroma varies slowly, like real H&E)
    import cv2

    base = cv2.resize(
        rng.normal(0, 1, (14, 14, 3)).astype(np.float32), (96, 96),
        interpolation=cv2.INTER_CUBIC,
    )
    smooth = np.clip(
        np.stack(
            [200 + 28 * base[..., 0], 120 + 40 * base[..., 1], 170 + 34 * base[..., 2]],
            -1,
        ),
        0,
        255,
    ).astype(np.uint8)
    gray = np.repeat(rng.integers(0, 256, (96, 96, 1)), 3, axis=2).astype(np.uint8)
    batch = np.stack([smooth, gray])

    packed = rgb_to_yuv420(batch)
    assert packed.shape == (2, 144, 96) and packed.dtype == np.uint8

    # numpy fallback must produce the identical wire bytes (no silent format
    # drift with library availability)
    lib, tried = native_mod._lib, native_mod._tried
    try:
        native_mod._lib, native_mod._tried = None, True
        packed_np = rgb_to_yuv420(batch)
    finally:
        native_mod._lib, native_mod._tried = lib, tried
    np.testing.assert_array_equal(packed, packed_np)

    rec = np.asarray(yuv420_to_rgb(packed))
    err_smooth = np.abs(rec[0].astype(int) - smooth.astype(int))
    assert err_smooth.max() <= 16 and err_smooth.mean() < 2.0
    np.testing.assert_array_equal(rec[1].astype(np.uint8), gray)  # chroma const

    # odd dims: invalid geometry -> None (callers fall back to the RGB wire)
    assert rgb_to_yuv420(np.zeros((1, 95, 96, 3), np.uint8)) is None


def test_yuv420_wire_through_engine(tmp_path):
    """PatchBatchSource(wire="yuv420") ships rank-3 packed batches and the
    jitted step reconstructs on device (dispatch by rank); probabilities stay
    close to the exact RGB wire. Odd patch sizes fall back to RGB."""
    from wsinsight_tpu.engine.data import PatchBatchSource
    from wsinsight_tpu.engine.runner import ClassifierEngine
    from wsinsight_tpu.patchlib.io import save_hdf5

    rng = np.random.default_rng(3)
    import cv2

    imgs = []
    for _ in range(4):
        base = cv2.resize(
            rng.normal(0, 1, (12, 12, 3)).astype(np.float32), (96, 96),
            interpolation=cv2.INTER_CUBIC,
        )
        imgs.append(
            np.clip(
                np.stack(
                    [
                        200 + 28 * base[..., 0],
                        120 + 40 * base[..., 1],
                        170 + 34 * base[..., 2],
                    ],
                    -1,
                ),
                0,
                255,
            ).astype(np.uint8)
        )
    imgs = np.stack(imgs)
    coords = np.array([[0, 0], [96, 0], [0, 96], [96, 96]], np.int32)
    h5 = tmp_path / "s.h5"
    save_hdf5(
        path=h5, coords=coords, polygons=None, tile_dim=None, patch_size=96,
        patch_spacing_um_px=0.25, images=imgs, slide_path="/nonexistent.tif",
        slide_mpp=0.25, slide_width=192, slide_height=192,
    )

    def one_batch(wire):
        src = PatchBatchSource(
            wsi_path=None, patch_path=URIPath(str(h5)), use_hdf5_images=True,
            batch_size=4, num_threads=2, wire=wire,
        )
        batch = next(iter(src))
        src.close()
        return batch

    rgb = one_batch(None)
    assert rgb.images.shape == (4, 96, 96, 3)
    packed = one_batch("yuv420")
    assert packed.images.shape == (4, 144, 96)

    d = tmp_path / "model"
    cfg, weights = make_random_local_model(
        "resnet34", 2, d, patch_size_pixels=96, resize_size=64
    )
    engine = ClassifierEngine(load_local_model(cfg, weights), max_devices=1)
    p_rgb = engine.run_batch(rgb.images, 4)
    p_yuv = engine.run_batch(packed.images, 4)
    assert p_yuv.shape == p_rgb.shape
    np.testing.assert_allclose(p_yuv, p_rgb, atol=0.05)


def test_half_scale_decode_through_engine(tmp_path):
    """WSINSIGHT_DECODE_SCALE=2: DCT half-resolution decode + YUV wire.

    On a JPEG slide the source ships (ceil(ps/2) even)^2 packed planes and
    the device resizes from there; on a non-JPEG slide the probe fails and
    the source silently stays at full resolution. Pixels are lossy by
    contract, so the check is shape + probability sanity, not parity."""
    import cv2

    from wsinsight_tpu.engine.data import PatchBatchSource
    from wsinsight_tpu.engine.runner import ClassifierEngine
    from wsinsight_tpu.patchlib.io import save_hdf5
    from wsinsight_tpu.wsi.tiff import write_pyramidal_tiff

    rng = np.random.default_rng(0)
    base = cv2.resize(
        rng.normal(0, 1, (40, 40, 3)).astype(np.float32), (640, 640),
        interpolation=cv2.INTER_CUBIC,
    )
    img = np.clip(
        np.stack(
            [200 + 28 * base[..., 0], 120 + 40 * base[..., 1], 170 + 34 * base[..., 2]],
            -1,
        ),
        0,
        255,
    ).astype(np.uint8)
    coords = np.array([[0, 0], [160, 0], [0, 160], [160, 160]], np.int32)

    def run(compression):
        slide = tmp_path / f"s_{compression}.svs"
        write_pyramidal_tiff(str(slide), img, tile=(256, 256), compression=compression, mpp=0.25)
        h5 = tmp_path / f"s_{compression}.h5"
        save_hdf5(
            path=h5, coords=coords, polygons=None, tile_dim=None, patch_size=160,
            patch_spacing_um_px=0.25, slide_path=str(slide),
            slide_mpp=0.25, slide_width=640, slide_height=640,
        )
        src = PatchBatchSource(
            wsi_path=URIPath(str(slide)), patch_path=URIPath(str(h5)),
            use_hdf5_images=False, batch_size=4, num_threads=2,
            wire="yuv420", decode_scale=2,
        )
        batch = next(iter(src))
        src.close()
        return batch

    jpeg = run("jpeg")
    assert jpeg.images.shape == (4, 120, 80)  # hs=80: Y 80 rows + 40 chroma

    deflate = run("deflate")  # non-JPEG: half-scale probe fails, full-res wire
    assert deflate.images.shape == (4, 240, 160)

    d = tmp_path / "model"
    cfg, weights = make_random_local_model(
        "resnet34", 2, d, patch_size_pixels=160, resize_size=64
    )
    engine = ClassifierEngine(load_local_model(cfg, weights), max_devices=1)
    p_half = engine.run_batch(jpeg.images, 4)
    p_full = engine.run_batch(deflate.images, 4)
    assert p_half.shape == (4, 2)
    np.testing.assert_allclose(p_half.sum(axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(p_half, p_full, atol=0.2)  # same content, lossy path
