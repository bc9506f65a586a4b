"""Cell-path tests: watershed, HV post-processing, stitcher, end-to-end CellViT."""

import h5py
import numpy as np
import pandas as pd
import pytest

from wsinsight_tpu.ops.hv_postproc import proc_np_hv
from wsinsight_tpu.ops.watershed import remove_small_labels, watershed


def _synthetic_nuclei(h=256, w=256, centers=((60, 60), (60, 130), (170, 90))):
    """Build NP/HV/TP maps for circular nuclei at given (y, x) centers."""
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    np_map = np.zeros((h, w), np.float32)
    hv_map = np.zeros((h, w, 2), np.float32)
    r = 22.0
    for cy, cx in centers:
        d = np.hypot(yy - cy, xx - cx)
        inside = d < r
        np_map[inside] = 1.0
        hv_map[inside, 0] = ((xx - cx) / r)[inside]
        hv_map[inside, 1] = ((yy - cy) / r)[inside]
    tp_map = np.zeros((h, w, 3), np.float32)
    tp_map[..., 0] = 1.0 - np_map
    tp_map[..., 1] = np_map
    return np_map, hv_map, tp_map


def test_watershed_separates_touching_blobs():
    img = np.zeros((64, 64), np.float32)
    yy, xx = np.mgrid[:64, :64]
    img = np.minimum(np.hypot(yy - 20, xx - 20), np.hypot(yy - 20, xx - 40)).astype(np.float32)
    mask = img < 14
    markers = np.zeros((64, 64), np.int32)
    markers[20, 20] = 1
    markers[20, 40] = 2
    out = watershed(img, markers, mask)
    assert set(np.unique(out)) == {0, 1, 2}
    assert (out[mask] > 0).all()
    assert out[20, 25] == 1 and out[20, 35] == 2


def test_watershed_native_matches_python_fuzz():
    """Native watershed (boundary-ring seeding) is bit-identical to the
    pure-python reference, including marker blobs with interiors — the case
    the productive-seed pruning must not change."""
    from wsinsight_tpu.ops.watershed import _watershed_python, watershed_native

    rng = np.random.default_rng(7)
    ran_native = False
    for _ in range(4):
        h, w = rng.integers(40, 160, 2)
        img = rng.random((h, w)).astype(np.float32)
        mask = rng.random((h, w)) < 0.6
        markers = np.zeros((h, w), np.int32)
        yy, xx = np.mgrid[:h, :w]
        for lab in range(1, int(rng.integers(2, 7))):
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            markers[np.hypot(yy - cy, xx - cx) < int(rng.integers(2, 12))] = lab
        markers[~mask] = 0
        native = watershed_native(img, markers.copy(), mask=mask)
        if native is None:
            pytest.skip("native library not built")
        ran_native = True
        ref = _watershed_python(img, markers.copy(), mask=mask)
        np.testing.assert_array_equal(native, ref)
    assert ran_native


def test_remove_small_labels():
    labels = np.zeros((10, 10), np.int32)
    labels[0, 0] = 1  # size 1
    labels[5:8, 5:8] = 2  # size 9
    out = remove_small_labels(labels, min_size=5)
    assert (out != 1).all()
    assert (out[5:8, 5:8] == 2).all()


def test_proc_np_hv_counts_instances():
    np_map, hv_map, _ = _synthetic_nuclei()
    inst = proc_np_hv(np_map, hv_map, min_object_size=20)
    ids = set(np.unique(inst)) - {0}
    assert len(ids) == 3


def test_proc_np_hv_empty():
    inst = proc_np_hv(np.zeros((64, 64), np.float32), np.zeros((64, 64, 2), np.float32), 20)
    assert inst.sum() == 0


def test_extract_instances_lists_stay_aligned():
    """bbox/prob/polygon lists are the same length even with 1-px instances.

    A single-pixel instance has a degenerate (<3 vertex) contour; the
    reference kept its bbox+prob but dropped its polygon, desynchronising
    the /polygons group from the CSV rows. We drop it from all three.
    """
    from wsinsight_tpu.ops.hv_postproc import extract_instances

    np_map, hv_map, tp_map = _synthetic_nuclei()
    np_map[3, 3] = 1.0  # isolated single pixel -> degenerate contour
    inst, prob, poly = extract_instances(
        np_map, hv_map, tp_map, 0, 0, (slice(0, 256), slice(0, 256)),
        min_object_size=0,
    )
    assert len(inst) == len(prob) == len(poly)
    assert len(inst) >= 3  # the three real nuclei survive
    # and no returned bbox is the 1-px degenerate
    assert all(int(b[0, 2]) * int(b[0, 3]) > 1 for b in inst)


def test_stitcher_end_to_end():
    from wsinsight_tpu.engine.stitch import TileRemapStitcher

    h = w = 256
    np_map, hv_map, tp_map = _synthetic_nuclei(h, w)
    st = TileRemapStitcher(
        n_classes=3, slide_width=w, slide_height=h, slide_patch_size=164,
        slide_halo_size=0, slide_mpp=0.25, model_mpp=0.25,
    )
    # Bypass the device half: write canvases directly and finalize.
    st.np_map[:] = np_map
    st.hv_map[:] = hv_map
    st.tp_map[:] = tp_map
    inst, probs, polys = st.finalize(tile_size=128, padding_size=32, num_workers=2)
    assert len(inst) >= 3  # nuclei straddling tile borders may split across tiles
    probs_arr = np.concatenate(probs, axis=0)
    # Interior of nuclei is class 1.
    assert (probs_arr.argmax(axis=1) == 1).mean() > 0.6
    assert all(p.shape[1] == 2 for p in polys)


def test_stitcher_accumulate_device_half():
    from wsinsight_tpu.engine.stitch import TileRemapStitcher

    rng = np.random.default_rng(0)
    b, k, o = 2, 3, 41
    st = TileRemapStitcher(
        n_classes=k, slide_width=200, slide_height=200, slide_patch_size=82,
        slide_halo_size=10, slide_mpp=0.25, model_mpp=0.5,
        transfer_dtype="float32",  # this test checks the math at f32 tolerance
    )
    pred = {
        "nuclei_binary_map": rng.standard_normal((b, 2, o, o)).astype(np.float32),
        "hv_map": rng.standard_normal((b, 2, o, o)).astype(np.float32),
        "nuclei_type_map": rng.standard_normal((b, k, o, o)).astype(np.float32),
    }
    coords = np.array([[0, 0, 82, 82], [82, 82, 82, 82]], np.int64)
    st.accumulate_batch(pred, coords)
    # Written region: coords + halo, clipped; probabilities in [0, 1].
    region = st.np_map[10 : 10 + 82, 10 : 10 + 82]
    assert region.any()
    assert (st.np_map >= 0).all() and (st.np_map <= 1).all()
    tp_sum = st.tp_map.sum(axis=2)
    written = tp_sum > 0
    np.testing.assert_allclose(tp_sum[written], 1.0, atol=1e-7)
    # HV scaled by model_mpp/slide_mpp = 2.
    assert np.abs(st.hv_map).max() > 1.0


@pytest.mark.slow
def test_cellvit_end_to_end(tmp_path):
    """Full object-based run: patch stage -> CellViT (random weights) ->
    stitcher -> CSV + /polygons write-back."""
    from wsinsight_tpu.engine import run_inference
    from wsinsight_tpu.patchlib import segment_and_patch_one_slide
    from wsinsight_tpu.uri_path import URIPath
    from wsinsight_tpu.wsi.tiff import write_pyramidal_tiff
    from wsinsight_tpu.zoo import load_local_model, make_random_local_model

    img = np.zeros((1024, 1024, 3), np.uint8)
    img[..., 0] = 160
    img[..., 2] = 140
    slide = tmp_path / "mini.tif"
    write_pyramidal_tiff(str(slide), img, tile=(256, 256), compression="deflate", mpp=0.25)

    cfg, weights = make_random_local_model(
        "cellvit-256", 3, tmp_path / "m",
        class_names=["Background", "TypeA", "TypeB"],
        patch_size_pixels=256, spacing_um_px=0.25,
    )
    # Bias the NP head so the random-weight model detects foreground (random
    # init hovers below the 0.5 threshold and would legitimately emit no CSV).
    from wsinsight_tpu.models.convert import load_flax_params, save_flax_params

    params = load_flax_params(weights)
    head = params["nuclei_binary_map_decoder"]["decoder0_header.2"]
    head["bias"] = np.asarray(head["bias"]) + np.array([-3.0, 3.0], np.float32)
    # Zero the HV head: random HV gradients shred the watershed markers (the
    # reference behaves identically); flat HV exercises the fallback marker path.
    hv_head = params["hv_map_decoder"]["decoder0_header.2"]
    hv_head["kernel"] = np.zeros_like(np.asarray(hv_head["kernel"]))
    hv_head["bias"] = np.zeros_like(np.asarray(hv_head["bias"]))
    save_flax_params(params, weights)
    model = load_local_model(cfg, weights)

    results = tmp_path / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=None,
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=256,
        patch_spacing_um_px=0.25,
        halo_size_px=46,
        object_based=True,
        object_detection="end2end",
    )
    with h5py.File(results / "patches" / "mini.h5") as f:
        n_patches = f["/coords"].shape[0]
    assert n_patches > 0

    failed_patching, failed_inference = run_inference(
        wsi_dir=None,
        slide_paths=None,
        results_dir=URIPath(str(results)),
        model_info=model,
        halo_size_px=46,
        batch_size=4,
        num_workers=2,
        object_based=True,
        object_detection="end2end",
        stitch_workers=2,
    )
    assert failed_inference == [], failed_inference
    csv = results / "model-outputs-csv" / "mini.csv"
    assert csv.exists()
    df = pd.read_csv(csv)
    assert list(df.columns[:4]) == ["minx", "miny", "width", "height"]
    assert [c for c in df.columns if c.startswith("prob_")] == [
        "prob_Background", "prob_TypeA", "prob_TypeB",
    ]
    # Random weights -> arbitrary instance count; polygons written back iff any.
    with h5py.File(results / "patches" / "mini.h5") as f:
        if len(df) > 0:
            assert "/polygons" in f
            assert len(f["/polygons/offsets"]) - 1 == len(
                [None for _ in range(len(f["/polygons/offsets"]) - 1)]
            )


@pytest.fixture(scope="module")
def cell_setup(tmp_path_factory):
    """512^2 slide + biased random-weight CellViT-256 + planned halo grid."""
    from wsinsight_tpu.models.convert import load_flax_params, save_flax_params
    from wsinsight_tpu.patchlib import segment_and_patch_one_slide
    from wsinsight_tpu.uri_path import URIPath
    from wsinsight_tpu.wsi.tiff import write_pyramidal_tiff
    from wsinsight_tpu.zoo import load_local_model, make_random_local_model

    d = tmp_path_factory.mktemp("cell_e2e")
    img = np.zeros((512, 512, 3), np.uint8)
    img[..., 0] = 160
    img[..., 2] = 140
    slide = d / "mini.tif"
    write_pyramidal_tiff(str(slide), img, tile=(256, 256), compression="deflate", mpp=0.25)

    cfg, weights = make_random_local_model(
        "cellvit-256", 3, d / "m",
        class_names=["Background", "TypeA", "TypeB"],
        patch_size_pixels=256, spacing_um_px=0.25,
    )
    # Bias the NP head so the random-weight model detects foreground; zero the
    # HV head so random gradients don't shred the watershed markers.
    params = load_flax_params(weights)
    head = params["nuclei_binary_map_decoder"]["decoder0_header.2"]
    head["bias"] = np.asarray(head["bias"]) + np.array([-3.0, 3.0], np.float32)
    hv_head = params["hv_map_decoder"]["decoder0_header.2"]
    hv_head["kernel"] = np.zeros_like(np.asarray(hv_head["kernel"]))
    hv_head["bias"] = np.zeros_like(np.asarray(hv_head["bias"]))
    save_flax_params(params, weights)
    model = load_local_model(cfg, weights)

    results = d / "results"
    segment_and_patch_one_slide(
        slide_path=URIPath(str(slide)),
        save_dir=URIPath(str(results)),
        qupath_detection_dir=None,
        qupath_geojson_detection_dir=None,
        qupath_geojson_annotation_dir=None,
        patch_size_px=256,
        patch_spacing_um_px=0.25,
        halo_size_px=46,
        object_based=True,
        object_detection="end2end",
    )
    return slide, model, results


def _cell_kw(slide, results, **over):
    from wsinsight_tpu.uri_path import URIPath

    kw = dict(
        wsi_path=URIPath(str(slide)),
        patch_path=URIPath(str(results / "patches" / "mini.h5")),
        use_hdf5_images=False,
        slide_width=512,
        slide_height=512,
        mpp=0.25,
        halo_size_px=46,
        batch_size=4,
        num_workers=2,
        stitch_workers=2,
    )
    kw.update(over)
    return kw


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_streaming_engine_dispatch_end_to_end(cell_setup, monkeypatch):
    """WSINSIGHT_STREAM_CELLS=1 routes run_cell_inference through the banded
    streaming engine (engine/stream_cells.py) and produces the same instances
    as the classic host-canvas path on the same slide."""
    from wsinsight_tpu.engine.cells import CellEngine, run_cell_inference

    slide, model, results = cell_setup
    engine = CellEngine(model, max_devices=1)
    kw = _cell_kw(slide, results)
    monkeypatch.setenv("WSINSIGHT_STREAM_CELLS", "0")  # force classic
    classic = run_cell_inference(engine, **kw)
    # the dispatch must actually take the streaming path for this geometry
    from wsinsight_tpu.engine.stream_cells import streaming_fits

    assert streaming_fits(512, 3, 164)
    monkeypatch.delenv("WSINSIGHT_STREAM_CELLS", raising=False)  # default: streaming
    streaming = run_cell_inference(engine, **kw)

    # Same instances (band vs tile processing orders differ; sort by position)
    ci, cp, _ = classic
    si, sp, spoly = streaming
    assert len(si) == len(ci)
    assert len(spoly) == len(si)
    co = np.lexsort((ci[:, 0], ci[:, 1]))
    so = np.lexsort((si[:, 0], si[:, 1]))
    np.testing.assert_array_equal(si[so], ci[co])
    # classic quantizes transfers (uint8 default), streaming keeps bf16 maps
    np.testing.assert_allclose(sp[so], cp[co], atol=0.02)


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_cell_shard_invariance(cell_setup):
    """Same instances and class probabilities whether the CellViT batch
    shards over 1 or 8 CPU devices (the engine's production mesh layout)."""
    from wsinsight_tpu.engine.cells import CellEngine, run_cell_inference

    slide, model, results = cell_setup
    out = {}
    for ndev in (1, 8):
        engine = CellEngine(model, max_devices=ndev)
        assert engine.n_devices == ndev
        out[ndev] = run_cell_inference(engine, **_cell_kw(slide, results))
    i1, p1, poly1 = out[1]
    i8, p8, poly8 = out[8]
    assert len(i8) == len(i1)
    assert len(poly8) == len(poly1)
    o1 = np.lexsort((i1[:, 0], i1[:, 1]))
    o8 = np.lexsort((i8[:, 0], i8[:, 1]))
    np.testing.assert_array_equal(i8[o8], i1[o1])
    np.testing.assert_allclose(p8[o8], p1[o1], atol=1e-5)


def test_bf16_transfer_matches_f32_instances():
    """bfloat16 map transfer (the default) produces the same instances and
    near-identical class probabilities as float32 transfer."""
    from wsinsight_tpu.engine.stitch import TileRemapStitcher

    h = w = 256
    np_map, hv_map, tp_map = _synthetic_nuclei(h, w)
    rng = np.random.default_rng(0)
    # model-space logits whose softmax reproduces the synthetic maps
    eps = 1e-4
    np_logits = np.stack(
        [np.log1p(-np_map + eps), np.log(np_map + eps)], axis=0
    )[None].astype(np.float32)
    tp_logits = np.log(tp_map + eps).transpose(2, 0, 1)[None].astype(np.float32)
    hv = hv_map.transpose(2, 0, 1)[None].astype(np.float32)
    # subpixel noise so the two dtypes actually see quantization
    tp_logits += rng.normal(0, 1e-3, tp_logits.shape).astype(np.float32)

    coords = np.array([[0, 0, w, h]], np.int64)
    results = {}
    for dtype in ("float32", "bfloat16", "quantized"):
        st = TileRemapStitcher(
            n_classes=3, slide_width=w, slide_height=h, slide_patch_size=w,
            slide_halo_size=0, slide_mpp=0.25, model_mpp=0.25,
            transfer_dtype=dtype,
        )
        st.accumulate_batch({"np": np_logits, "hv": hv, "tp": tp_logits}, coords)
        inst, prob, poly = st.finalize(num_workers=1)
        st.close()
        results[dtype] = (np.concatenate(inst), np.concatenate(prob))

    inst32, prob32 = results["float32"]
    for dtype in ("bfloat16", "quantized"):
        inst_c, prob_c = results[dtype]
        assert inst32.shape == inst_c.shape, dtype
        np.testing.assert_array_equal(inst32, inst_c)  # same boxes
        np.testing.assert_allclose(prob_c, prob32, atol=5e-3)  # measured budget


def test_device_separation_energy_matches_cv2():
    """The XLA Sobel/min-max energy stage equals the cv2 path (same taps,
    same REFLECT_101 border), and device-assisted finalize produces the
    same instances."""
    from wsinsight_tpu.ops.hv_device import separation_energy_batched
    from wsinsight_tpu.ops.hv_postproc import raw_separation_energy

    rng = np.random.default_rng(0)
    _, hv1, _ = _synthetic_nuclei(128, 128)
    hv2 = rng.normal(0, 0.4, (128, 128, 2)).astype(np.float32)
    batch = np.stack([hv1, hv2])
    got = separation_energy_batched(batch)
    for i, hv in enumerate((hv1, hv2)):
        np.testing.assert_allclose(got[i], raw_separation_energy(hv), atol=2e-4)


def test_finalize_device_ridge_same_instances(monkeypatch):
    """WSINSIGHT_DEVICE_RIDGE=1 finalize yields the same boxes as CPU."""
    from wsinsight_tpu.engine.stitch import TileRemapStitcher

    np_map, hv_map, tp_map = _synthetic_nuclei(256, 256)

    def run(env: str):
        monkeypatch.setenv("WSINSIGHT_DEVICE_RIDGE", env)
        st = TileRemapStitcher(
            n_classes=3, slide_width=256, slide_height=256, slide_patch_size=128,
            slide_halo_size=0, slide_mpp=0.25, model_mpp=0.25,
        )
        st.np_map[:] = np_map
        st.hv_map[:] = hv_map
        st.tp_map[:] = tp_map
        inst, prob, _ = st.finalize(tile_size=128, padding_size=32, num_workers=1)
        st.close()
        return np.concatenate(inst), np.concatenate(prob)

    i_cpu, p_cpu = run("0")
    i_dev, p_dev = run("1")
    np.testing.assert_array_equal(i_cpu, i_dev)
    np.testing.assert_allclose(p_cpu, p_dev, atol=1e-5)


def test_streaming_banded_stitcher_matches_classic(monkeypatch):
    """The banded streaming engine (maps stay in HBM, labels round-trip for
    device class sums) produces the same instances as the classic
    host-canvas path with matching transfer settings."""
    from wsinsight_tpu.engine.stitch import TileRemapStitcher
    from wsinsight_tpu.engine.stream_cells import BandedCellStitcher

    rng = np.random.default_rng(0)
    h = w = 512
    s, k = 64, 3  # slide patch 64 px, 3 classes; bands/tiles of 128

    # synthetic model outputs per patch: logits whose softmax paints nuclei
    eps = 1e-4
    grid = range(0, 512, s)
    coords, preds = [], []
    for y0 in grid:
        for x0 in grid:
            np_map = np.zeros((s, s), np.float32)
            hv = np.zeros((2, s, s), np.float32)
            if (x0 // s + y0 // s) % 2 == 0:  # one nucleus on alternating tiles
                yy, xx = np.mgrid[:s, :s].astype(np.float32)
                d = np.hypot(yy - 32, xx - 32)
                inside = d < 14
                np_map[inside] = 1.0
                hv[0][inside] = ((xx - 32) / 14)[inside]
                hv[1][inside] = ((yy - 32) / 14)[inside]
            np_logits = np.stack([np.log1p(-np_map + eps), np.log(np_map + eps)])
            tp = np.zeros((k, s, s), np.float32)
            tp[0] = 1.0 - np_map
            tp[1] = np_map * 0.7
            tp[2] = np_map * 0.3
            tp_logits = np.log(tp + eps) + rng.normal(0, 1e-3, (k, s, s)).astype(np.float32)
            coords.append([x0, y0, s, s])
            preds.append((np_logits, hv, tp_logits))

    coords = np.asarray(coords, np.int64)
    order = np.lexsort((coords[:, 0], coords[:, 1]))

    def feed(st):
        bs = 4
        for i0 in range(0, len(order), bs):
            sel = order[i0 : i0 + bs]
            batch = {
                "np": np.stack([preds[i][0] for i in sel]),
                "hv": np.stack([preds[i][1] for i in sel]),
                "tp": np.stack([preds[i][2] for i in sel]),
            }
            st.accumulate_batch(batch, coords[sel])

    common = dict(
        n_classes=k, slide_width=w, slide_height=h, slide_patch_size=s,
        slide_halo_size=0, slide_mpp=0.25, model_mpp=0.25, min_object_size=20,
    )
    monkeypatch.setenv("WSINSIGHT_DEVICE_RIDGE", "1")
    classic = TileRemapStitcher(transfer_dtype="quantized", **common)
    feed(classic)
    ci, cp, cpoly = classic.finalize(tile_size=128, padding_size=32, num_workers=1)
    classic.close()

    streaming = BandedCellStitcher(tile_size=128, padding_size=32, **common)
    feed(streaming)
    si, sp, spoly = streaming.finalize()
    streaming.close()

    assert len(ci) == len(si) > 0
    c_boxes = np.concatenate(ci)
    s_boxes = np.concatenate(si)
    c_order = np.lexsort((c_boxes[:, 0], c_boxes[:, 1]))
    s_order = np.lexsort((s_boxes[:, 0], s_boxes[:, 1]))
    np.testing.assert_array_equal(c_boxes[c_order], s_boxes[s_order])
    np.testing.assert_allclose(
        np.concatenate(cp)[c_order], np.concatenate(sp)[s_order], atol=5e-3
    )
    for a, b in zip(c_order, s_order):
        np.testing.assert_array_equal(cpoly[a], spoly[b])


def test_streaming_sparse_window_transfer_is_identical(monkeypatch):
    """The sparse window transfer ([bitmask | fg-gathered u8 energy], plus
    empty-window skip) is a pure transfer-layer change: instances, class
    probabilities, and polygons are bit-identical to the dense fused plane.
    The empty-window skip is exercised by the all-background tiles."""
    from wsinsight_tpu.engine.stream_cells import BandedCellStitcher

    rng = np.random.default_rng(1)
    h = w = 512
    s, k = 64, 3
    eps = 1e-4
    grid = range(0, 512, s)
    coords, preds = [], []
    for y0 in grid:
        for x0 in grid:
            np_map = np.zeros((s, s), np.float32)
            hv = np.zeros((2, s, s), np.float32)
            # leave the bottom band of tiles empty: those windows must be
            # skipped by the sparse path without changing anything
            if y0 < 256 and (x0 // s + y0 // s) % 2 == 0:
                yy, xx = np.mgrid[:s, :s].astype(np.float32)
                d = np.hypot(yy - 32, xx - 32)
                inside = d < 14
                np_map[inside] = 1.0
                hv[0][inside] = ((xx - 32) / 14)[inside]
                hv[1][inside] = ((yy - 32) / 14)[inside]
            np_logits = np.stack([np.log1p(-np_map + eps), np.log(np_map + eps)])
            tp = np.zeros((k, s, s), np.float32)
            tp[0] = 1.0 - np_map
            tp[1] = np_map * 0.7
            tp[2] = np_map * 0.3
            tp_logits = np.log(tp + eps) + rng.normal(0, 1e-3, (k, s, s)).astype(
                np.float32
            )
            coords.append([x0, y0, s, s])
            preds.append((np_logits, hv, tp_logits))

    coords = np.asarray(coords, np.int64)
    order = np.lexsort((coords[:, 0], coords[:, 1]))

    def run(sparse: bool):
        monkeypatch.setenv("WSINSIGHT_STREAM_SPARSE", "1" if sparse else "0")
        st = BandedCellStitcher(
            n_classes=k, slide_width=w, slide_height=h, slide_patch_size=s,
            slide_halo_size=0, slide_mpp=0.25, model_mpp=0.25, min_object_size=20,
            tile_size=128, padding_size=32,
        )
        assert st._sparse_windows is sparse
        bs = 4
        for i0 in range(0, len(order), bs):
            sel = order[i0 : i0 + bs]
            batch = {
                "np": np.stack([preds[i][0] for i in sel]),
                "hv": np.stack([preds[i][1] for i in sel]),
                "tp": np.stack([preds[i][2] for i in sel]),
            }
            st.accumulate_batch(batch, coords[sel])
        out = st.finalize()
        st.close()
        return out

    di, dp, dpoly = run(sparse=False)
    si, sp, spoly = run(sparse=True)
    assert len(di) == len(si) > 0
    np.testing.assert_array_equal(np.concatenate(di), np.concatenate(si))
    np.testing.assert_array_equal(np.concatenate(dp), np.concatenate(sp))
    for a, b in zip(dpoly, spoly):
        np.testing.assert_array_equal(a, b)


def test_device_basin_proposal_is_identical(monkeypatch):
    """The device marker proposal (fg + boundary bitmasks + integer basin
    computed in the window kernel) is bit-identical to the host integer
    tail: both evaluate the same integer convolution (exact in f32), so
    instances, class probabilities and polygons match exactly."""
    from wsinsight_tpu.engine.stream_cells import BandedCellStitcher

    rng = np.random.default_rng(7)
    h = w = 512
    s, k = 64, 3
    eps = 1e-4
    coords, preds = [], []
    for y0 in range(0, h, s):
        for x0 in range(0, w, s):
            np_map = np.zeros((s, s), np.float32)
            hv = np.zeros((2, s, s), np.float32)
            # two touching nuclei per tile so the boundary/basin actually
            # drives the split (not just connected components)
            yy, xx = np.mgrid[:s, :s].astype(np.float32)
            for cy, cx in ((26, 26), (26, 44)):
                d = np.hypot(yy - cy, xx - cx)
                inside = d < 12
                np_map[inside] = 1.0
                hv[0][inside] = ((xx - cx) / 12)[inside]
                hv[1][inside] = ((yy - cy) / 12)[inside]
            np_logits = np.stack([np.log1p(-np_map + eps), np.log(np_map + eps)])
            tp = np.zeros((k, s, s), np.float32)
            tp[0] = 1.0 - np_map
            tp[1] = np_map * 0.6
            tp[2] = np_map * 0.4
            tp_logits = np.log(tp + eps) + rng.normal(0, 1e-3, (k, s, s)).astype(
                np.float32
            )
            coords.append([x0, y0, s, s])
            preds.append((np_logits, hv, tp_logits))
    coords = np.asarray(coords, np.int64)

    def run(mode: str):
        monkeypatch.setenv("WSINSIGHT_STREAM_BASIN", mode)
        st = BandedCellStitcher(
            n_classes=k, slide_width=w, slide_height=h, slide_patch_size=s,
            slide_halo_size=0, slide_mpp=0.25, model_mpp=0.25, min_object_size=20,
            tile_size=128, padding_size=32,
        )
        assert st._basin_device is (mode == "device")
        bs = 4
        for i0 in range(0, len(coords), bs):
            sel = slice(i0, i0 + bs)
            batch = {
                "np": np.stack([p[0] for p in preds[sel]]),
                "hv": np.stack([p[1] for p in preds[sel]]),
                "tp": np.stack([p[2] for p in preds[sel]]),
            }
            st.accumulate_batch(batch, coords[sel])
        out = st.finalize()
        st.close()
        return out

    hi_, hp, hpoly = run("host")
    di, dp, dpoly = run("device")
    assert len(hi_) == len(di) > 0
    # two nuclei per 64px tile across 8x8 tiles => the split worked
    assert len(di) == 128
    np.testing.assert_array_equal(np.concatenate(hi_), np.concatenate(di))
    np.testing.assert_array_equal(np.concatenate(hp), np.concatenate(dp))
    for a, b in zip(hpoly, dpoly):
        np.testing.assert_array_equal(a, b)


def test_sparse_window_backend_fallback_is_silent_and_identical(monkeypatch):
    """If the sparse window kernel fails at runtime (backend quirk), the
    flusher falls back to dense windows mid-band and the results match."""
    from wsinsight_tpu.engine.stream_cells import BandedCellStitcher

    s, k, w, h = 64, 3, 256, 256
    eps = 1e-4
    np_map = np.zeros((s, s), np.float32)
    yy, xx = np.mgrid[:s, :s].astype(np.float32)
    d = np.hypot(yy - 32, xx - 32)
    inside = d < 14
    np_map[inside] = 1.0
    hv = np.zeros((2, s, s), np.float32)
    hv[0][inside] = ((xx - 32) / 14)[inside]
    hv[1][inside] = ((yy - 32) / 14)[inside]
    np_logits = np.stack([np.log1p(-np_map + eps), np.log(np_map + eps)])
    tp = np.zeros((k, s, s), np.float32)
    tp[0], tp[1] = 1.0 - np_map, np_map
    tp_logits = np.log(tp + eps)
    coords = np.array(
        [[x0, y0, s, s] for y0 in range(0, h, s) for x0 in range(0, w, s)], np.int64
    )
    batch = {
        "np": np.repeat(np_logits[None], len(coords), 0),
        "hv": np.repeat(hv[None], len(coords), 0),
        "tp": np.repeat(tp_logits[None], len(coords), 0),
    }
    common = dict(
        n_classes=k, slide_width=w, slide_height=h, slide_patch_size=s,
        slide_halo_size=0, slide_mpp=0.25, model_mpp=0.25, min_object_size=20,
        tile_size=128, padding_size=32,
    )

    def run(broken: bool):
        st = BandedCellStitcher(**common)
        assert st._sparse_windows
        if broken:
            def boom(*a, **kw):
                raise RuntimeError("no nonzero on this backend")
            st._window_stage_sparse = boom
            st._window_stage_proposal = boom  # device basin falls back first
        st.accumulate_batch(batch, coords)
        out = st.finalize()
        st.close()
        if broken:
            assert st._basin_device is False  # host basin fallback engaged
            assert st._sparse_windows is False  # fell back and stayed dense
        return out

    gi, gp, gpoly = run(broken=False)
    bi, bp, bpoly = run(broken=True)
    assert len(gi) == len(bi) > 0
    np.testing.assert_array_equal(np.concatenate(gi), np.concatenate(bi))
    np.testing.assert_array_equal(np.concatenate(gp), np.concatenate(bp))
    for a, b in zip(gpoly, bpoly):
        np.testing.assert_array_equal(a, b)


def test_class_sums_from_fg_kernel_matches_packed_upload():
    """The id-only class-sums kernel equals the packed (index, id) kernel for
    both id dtypes (u16 fast path, i32 overflow path)."""
    import jax.numpy as jnp

    from wsinsight_tpu.engine.stream_cells import _cached_kernels

    (_, _, sums_packed, _, _, sums_from_fg, _) = _cached_kernels(8, 3, 1.0, "u8")
    rng = np.random.default_rng(3)
    buf_h, buf_w, k = 24, 32, 3
    np_b = jnp.asarray(rng.random((buf_h, buf_w), np.float32) > 0.7, jnp.bfloat16)
    tp_b = jnp.asarray(rng.random((buf_h, buf_w, k), np.float32), jnp.bfloat16)
    interior = (4, 4, 16, 24)  # off_r, off_c, ih, iw
    off_r, off_c, ih, iw = interior

    fg = np.asarray(
        np.round(np.asarray(np_b, np.float32) * 255).astype(np.uint8) >= 128
    )[off_r : off_r + ih, off_c : off_c + iw]
    fy, fx = np.nonzero(fg)
    ids = (rng.integers(0, 5, size=fy.size)).astype(np.int32)  # some id 0

    # packed reference: linear buffer index + id
    cap = 256
    pix = np.zeros((2, cap), np.int32)
    pix[0, : fy.size] = (fy + off_r) * buf_w + (fx + off_c)
    pix[1, : fy.size] = ids
    ref_sums, ref_counts = sums_packed(tp_b, jnp.asarray(pix), 8)

    for dtype in (np.uint16, np.int32):
        ids_up = np.zeros((cap,), dtype)
        ids_up[: fy.size] = ids.astype(dtype)
        got_sums, got_counts = sums_from_fg(
            tp_b, np_b, jnp.asarray(ids_up), interior, 8
        )
        np.testing.assert_allclose(
            np.asarray(got_sums)[1:], np.asarray(ref_sums)[1:], rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(got_counts)[1:], np.asarray(ref_counts)[1:]
        )


def test_streaming_flusher_error_surfaces_on_main_thread():
    """An exception in the background band flusher (e.g. the per-band
    instance cap) is re-raised to the caller, not swallowed."""
    from wsinsight_tpu.engine.stream_cells import BandedCellStitcher

    st = BandedCellStitcher(
        n_classes=3, slide_width=256, slide_height=256, slide_patch_size=64,
        slide_halo_size=0, slide_mpp=0.25, model_mpp=0.25,
        tile_size=128, padding_size=32,
    )
    try:
        boom = RuntimeError("flush boom")

        def bad_flush(b, bufs, counts_dev=None):
            raise boom

        st._flush_band = bad_flush
        s, k, eps = 64, 3, 1e-4
        np_map = np.ones((s, s), np.float32) * 0.9
        pred = {
            "np": np.stack([np.log1p(-np_map + eps), np.log(np_map + eps)])[None],
            "hv": np.zeros((1, 2, s, s), np.float32),
            "tp": np.log(np.full((1, k, s, s), 1.0 / k, np.float32)),
        }
        st.accumulate_batch(pred, np.array([[0, 0, s, s]], np.int64))
        with pytest.raises(RuntimeError, match="flush boom"):
            st.finalize()
    finally:
        st.close()


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_streaming_capacity_error_falls_back_to_classic(cell_setup, monkeypatch):
    """When a band exceeds the streaming engine's instance cap, the slide is
    rerun on the classic host-canvas path instead of failing."""
    import wsinsight_tpu.engine.stream_cells as sc
    from wsinsight_tpu.engine.cells import CellEngine, run_cell_inference

    slide, model, results = cell_setup
    engine = CellEngine(model, max_devices=1)
    kw = _cell_kw(slide, results)

    monkeypatch.setenv("WSINSIGHT_STREAM_CELLS", "0")
    classic = run_cell_inference(engine, **kw)
    assert len(classic[0]) > 0

    monkeypatch.delenv("WSINSIGHT_STREAM_CELLS", raising=False)
    monkeypatch.setattr(sc, "_MAX_IDS", 2)  # force the cap on any real band
    out = run_cell_inference(engine, **kw)

    ci, _, _ = classic
    si, _, spoly = out
    assert len(si) == len(ci) and len(spoly) == len(si)
    co = np.lexsort((ci[:, 0], ci[:, 1]))
    so = np.lexsort((si[:, 0], si[:, 1]))
    np.testing.assert_array_equal(si[so], ci[co])


def test_fill_holes_matches_scipy():
    """cv2 border-flood hole fill == ndi.binary_fill_holes on blobby masks.

    The flusher's seed stage replaced scipy's fill (its most expensive call)
    with a single cv2.floodFill from the border; semantics must be identical,
    including holes, border-touching blobs, and bays open to the border.
    """
    from scipy import ndimage as ndi

    from wsinsight_tpu.ops.hv_postproc import _fill_holes

    rng = np.random.default_rng(7)
    for trial in range(8):
        noise = ndi.gaussian_filter(rng.normal(size=(97, 143)), 3.0)
        mask = noise > np.quantile(noise, 0.7)
        got = _fill_holes(mask.astype(np.uint8)).astype(bool)
        want = ndi.binary_fill_holes(mask)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")
    # explicit edge cases: donut (hole), C-shape open to the border,
    # blob touching the border with an interior hole
    donut = np.zeros((20, 20), np.uint8)
    donut[4:16, 4:16] = 1
    donut[8:12, 8:12] = 0
    got = _fill_holes(donut).astype(bool)
    assert got[9, 9] and got.sum() == 12 * 12
    cshape = np.zeros((20, 20), np.uint8)
    cshape[2:18, 2:18] = 1
    cshape[6:14, 10:20] = 0  # mouth open to the right border
    np.testing.assert_array_equal(
        _fill_holes(cshape).astype(bool), ndi.binary_fill_holes(cshape > 0)
    )
    border_blob = np.zeros((20, 20), np.uint8)
    border_blob[0:10, 0:10] = 1
    border_blob[3:6, 3:6] = 0
    np.testing.assert_array_equal(
        _fill_holes(border_blob).astype(bool), ndi.binary_fill_holes(border_blob > 0)
    )


def test_label_small_filtered_matches_ndi():
    """cv2 CC(4-conn)+area filter == ndi.label + remove_small_labels."""
    from scipy import ndimage as ndi

    from wsinsight_tpu.ops.hv_postproc import _label_small_filtered

    rng = np.random.default_rng(11)
    for trial in range(8):
        noise = ndi.gaussian_filter(rng.normal(size=(80, 120)), 1.5)
        mask = (noise > np.quantile(noise, 0.75)).astype(np.uint8)
        got = _label_small_filtered(mask, 10)
        want, n = ndi.label(mask)
        want = remove_small_labels(want.astype(np.int32), 10)
        # label ids may differ between the two labelers; compare the
        # partition: same surviving foreground and same component sets
        np.testing.assert_array_equal(got > 0, want > 0, err_msg=f"trial {trial}")
        for lab in np.unique(got[got > 0]):
            ref_ids = np.unique(want[got == lab])
            assert len(ref_ids) == 1, f"trial {trial}: component split/merged"


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_cell_engine_yuv420_wire(tmp_path):
    """CellEngine consumes rank-3 YUV-wire batches (device reconstruction)
    and the prediction maps stay close to the exact RGB wire. The half-scale
    decode is classifier-only — cell sources pin decode_scale=1."""
    import cv2

    from wsinsight_tpu.engine.cells import CellEngine, _cell_wire
    from wsinsight_tpu.native import rgb_to_yuv420
    from wsinsight_tpu.zoo import load_local_model, make_random_local_model

    cfg, weights = make_random_local_model(
        "hovernet-fast", 3, tmp_path, patch_size_pixels=96
    )
    engine = CellEngine(load_local_model(cfg, weights), max_devices=1)

    rng = np.random.default_rng(5)
    imgs = []
    for _ in range(2):
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
    batch = np.stack(imgs)

    rgb_maps = engine.run_batch(batch)
    yuv_maps = engine.run_batch(rgb_to_yuv420(batch))
    assert set(yuv_maps) == set(rgb_maps)
    for key in rgb_maps:
        a, b = np.asarray(rgb_maps[key]), np.asarray(yuv_maps[key])
        assert a.shape == b.shape
        # random-weight logit maps on near-identical pixels: tight-ish bound
        assert np.abs(a - b).max() < 0.5 * (np.abs(a).max() + 1e-6)

    import os

    os.environ["WSINSIGHT_WIRE"] = "yuv420"
    try:
        assert _cell_wire() == "yuv420"
    finally:
        del os.environ["WSINSIGHT_WIRE"]
    assert _cell_wire() is None
