"""Auxiliary subsystem tests: worker sizing, SBU export, StarDist, HoVer-Net."""

import gzip
import json

import numpy as np
import pandas as pd
import pytest


def test_pick_workers_safe_bounds():
    from wsinsight_tpu.utils.workers import pick_workers_safe

    n = pick_workers_safe(max_workers=4, min_workers=2, sample_interval_sec=0.01)
    assert 2 <= n <= 4
    n = pick_workers_safe(
        max_workers=8, min_workers=1, memory_per_worker_bytes=1 << 20,
        sample_interval_sec=0.01,
    )
    assert 1 <= n <= 8


def test_throttle_returns_quickly_when_idle():
    from wsinsight_tpu.utils.workers import throttle_when_busy

    throttle_when_busy(target_cpu_util=1.01, target_mem_util=1.01, reserve_mem_bytes=0)


def test_governed_workers_clamps(monkeypatch):
    """governed_workers = min(requested, pick_workers_safe): a hot host
    shrinks the pool, never grows past the caller's explicit knob, and a
    governor failure falls back to the static request."""
    import wsinsight_tpu.utils.workers as W

    monkeypatch.setattr(W, "pick_workers_safe", lambda **kw: 2)
    assert W.governed_workers(8) == 2  # host headroom clamps the request
    assert W.governed_workers(1) == 1  # request stays the hard cap
    monkeypatch.setattr(W, "pick_workers_safe", lambda **kw: 64)
    assert W.governed_workers(8) == 8  # never exceeds the request
    def boom(**kw):
        raise RuntimeError("psutil down")
    monkeypatch.setattr(W, "pick_workers_safe", boom)
    assert W.governed_workers(6) == 6  # degraded mode: static request
    assert W.governed_workers(0) == 1  # pools reject max_workers=0


def test_governed_workers_wired_into_export_pools(monkeypatch, tmp_path):
    """write_geojsons consults the governor before sizing its process pool
    (reference behavior: write_geojson.py:459 + num_worker_optimizer.py)."""
    import wsinsight_tpu.utils.workers as W
    from wsinsight_tpu.writers import geojson as gj

    seen = {}

    def fake_pick(**kw):
        seen["called"] = True
        return 1

    monkeypatch.setattr(W, "pick_workers_safe", fake_pick)
    csv = tmp_path / "model-outputs-csv" / "s1.csv"
    csv.parent.mkdir(parents=True)
    pd.DataFrame(
        {"minx": [0], "miny": [0], "width": [10], "height": [10],
         "prob_tumor": [0.9]}
    ).to_csv(csv, index=False)
    gj.write_geojsons(
        [csv], results_dir=tmp_path, overlap=0.0,
        output_dir=__import__("pathlib").Path("model-outputs-geojson"),
        num_workers=4, show_progress=False,
    )
    assert seen.get("called"), "export pool did not consult the governor"
    assert (tmp_path / "model-outputs-geojson" / "s1.geojson").exists()


def test_stardist_ray_candidates_and_nms():
    from wsinsight_tpu.models.stardist import _nms, _ray_candidates, _rays_to_polys

    prob = np.zeros((64, 64), np.float32)
    prob[20, 20] = 0.95
    prob[20, 22] = 0.8  # overlapping duplicate, should be suppressed
    prob[50, 50] = 0.9
    dist = np.full((64, 64, 32), 5.0, np.float32)
    scores, centers, rays = _ray_candidates(prob, dist, 0.5, grid=1)
    assert len(scores) == 3
    kept = _nms(scores, centers, rays, nms_thresh=0.4)
    assert len(kept) == 2
    # polygons have 32 vertices around their centers
    polys = _rays_to_polys(centers[kept], rays[kept])
    assert polys.shape == (2, 32, 2)
    np.testing.assert_allclose(polys[0].mean(axis=0), centers[kept[0]], atol=1e-4)


def test_stardist_binned_nms_matches_allpairs_greedy():
    """The spatially binned NMS makes the same decisions as the O(N^2)
    all-pairs greedy scan on a dense random candidate set."""
    from wsinsight_tpu.models.stardist import _nms

    rng = np.random.default_rng(0)
    n = 600
    centers = rng.uniform(0, 400, size=(n, 2)).astype(np.float32)
    rays = rng.uniform(3.0, 14.0, size=(n, 32)).astype(np.float32)
    scores = rng.uniform(0.5, 1.0, size=n).astype(np.float32)

    def nms_allpairs(scores, centers, rays, nms_thresh=0.4):
        order = np.argsort(-scores, kind="stable")
        mean_r = np.maximum(rays.mean(axis=1), 1.0)
        kept = []
        for i in order:
            c, r = centers[i], mean_r[i]
            if all(
                np.hypot(c[0] - centers[j, 0], c[1] - centers[j, 1])
                >= nms_thresh * (r + mean_r[j])
                for j in kept
            ):
                kept.append(int(i))
        return kept

    assert _nms(scores, centers, rays) == nms_allpairs(scores, centers, rays)


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_stardist_predict_instances_big_random_weights():
    import jax

    from wsinsight_tpu.models.stardist import StarDist2D, StarDistUNet, normalize_percentile

    model = StarDistUNet()
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    sd = StarDist2D(params=params, prob_thresh=0.99)  # high threshold -> few/no dets
    img = np.random.default_rng(0).integers(0, 255, (160, 160, 3)).astype(np.float32)
    polys = sd.predict_instances_big(normalize_percentile(img, 1, 99.8), block_size=128, context=16)
    assert isinstance(polys, list)
    for p in polys:
        assert p.shape == (32, 2)


def test_stardist_missing_weights_error():
    from wsinsight_tpu.models.stardist import StarDist2D
    from wsinsight_tpu.zoo import WeightsNotFoundError

    with pytest.raises(WeightsNotFoundError):
        StarDist2D(params=None)


def test_tosbu_exports(tmp_path, purple_slide):
    from click.testing import CliRunner

    from wsinsight_tpu.cli.convert_csv_to_sbubmi import tosbu

    results = tmp_path / "results"
    (results / "model-outputs-csv").mkdir(parents=True)
    df = pd.DataFrame(
        {
            "minx": [0, 350],
            "miny": [0, 0],
            "width": [350, 350],
            "height": [350, 350],
            "prob_Other": [0.9, 0.2],
            "prob_Tumor": [0.1, 0.8],
        }
    )
    df.to_csv(results / "model-outputs-csv" / "purple.csv", index=False)
    meta = {
        "timestamp": "2026-01-01T00:00:00",
        "model_config": {"class_names": ["Other", "Tumor"]},
        "model_weights": {"weights_file": None, "weights_sha256": None, "weights_url": None},
        "runtime": {"git": None},
    }
    (results / "run_metadata_x.json").rename if False else None
    (results / "infer_metadata_20260101T000000.json").write_text(json.dumps(meta))

    out = tmp_path / "sbu"
    runner = CliRunner()
    res = runner.invoke(
        tosbu,
        [
            str(results), str(out),
            "--wsi-dir", str(purple_slide.parent),
            "--execution-id", "exec1",
            "--study-id", "TCGA-TEST",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    # Multi-class layout: per-class dirs.
    hm = out / "heatmap_json" / "Tumor" / "heatmap_purple.json"
    assert hm.exists()
    lines = hm.read_text().splitlines()
    assert len(lines) == 2
    feat = json.loads(lines[0])
    assert feat["type"] == "Feature"
    assert feat["properties"]["multiheat_param"]["heatname_array"] == ["Tumor"]
    assert 0 <= feat["x"] <= 1 and 0 <= feat["y"] <= 1
    pred = out / "heatmap_txt" / "Tumor" / "prediction-purple"
    body = pred.read_text().splitlines()
    assert body[0] == "x_loc y_loc Tumor"
    assert (out / "heatmap_json" / "Tumor" / "meta_purple.json").exists()


# ---------------------------------------------------------------------------
# StarDist Keras->flax conversion (the 2D_versatile_he real-weights path)
# ---------------------------------------------------------------------------

_SD_LAYERS = [
    # (keras layer name, kernel shape or None for weightless layers)
    ("input", None),
    ("conv2d", (3, 3, 3, 32)),
    ("conv2d_1", (3, 3, 32, 32)),
    ("max_pooling2d", None),
    ("down_level_0_no_0", (3, 3, 32, 32)),
    ("down_level_0_no_1", (3, 3, 32, 32)),
    ("max_0", None),
    ("down_level_1_no_0", (3, 3, 32, 64)),
    ("down_level_1_no_1", (3, 3, 64, 64)),
    ("max_1", None),
    ("down_level_2_no_0", (3, 3, 64, 128)),
    ("down_level_2_no_1", (3, 3, 128, 128)),
    ("max_2", None),
    ("middle_0", (3, 3, 128, 256)),
    ("middle_1", (3, 3, 256, 128)),
    ("up_sampling2d", None),
    ("concatenate", None),
    ("up_level_2_no_0", (3, 3, 256, 128)),
    ("up_level_2_no_1", (3, 3, 128, 64)),
    ("up_sampling2d_1", None),
    ("concatenate_1", None),
    ("up_level_1_no_0", (3, 3, 128, 64)),
    ("up_level_1_no_1", (3, 3, 64, 32)),
    ("up_sampling2d_2", None),
    ("concatenate_2", None),
    ("up_level_0_no_0", (3, 3, 64, 32)),
    ("up_level_0_no_1", (3, 3, 32, 32)),
    ("features", (3, 3, 32, 128)),
    ("prob", (1, 1, 128, 1)),
    ("dist", (1, 1, 128, 32)),
]


def _write_fake_keras_h5(path, rng):
    """Author an h5 in the exact layout Keras save_weights produces for the
    released 2D_versatile_he graph (anonymous grid-stem convs included)."""
    import h5py

    weights = {}
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n, _ in _SD_LAYERS])
        for name, kshape in _SD_LAYERS:
            g = f.create_group(name)
            if kshape is None:
                g.attrs["weight_names"] = np.array([], dtype="S1")
                continue
            k = rng.normal(0, 0.1, size=kshape).astype(np.float32)
            b = rng.normal(0, 0.05, size=kshape[-1]).astype(np.float32)
            g.attrs["weight_names"] = np.array(
                [f"{name}/kernel:0".encode(), f"{name}/bias:0".encode()]
            )
            g.create_dataset(f"{name}/kernel:0", data=k)
            g.create_dataset(f"{name}/bias:0", data=b)
            weights[name] = (k, b)
    return weights


def _keras_graph_oracle(weights, x):
    """Independent forward of the 2D_versatile_he Keras graph (SAME convs,
    valid 2x2 maxpool, nearest upsample, concat [up, skip]) using raw lax —
    validates the converter's topology/ordering, not just tensor shapes."""
    import jax.numpy as jnp
    from jax import lax

    def conv(name, h, act="relu"):
        k, b = weights[name]
        y = lax.conv_general_dilated(
            h, jnp.asarray(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        ) + jnp.asarray(b)
        if act == "relu":
            return jnp.maximum(y, 0)
        if act == "sigmoid":
            return 1 / (1 + jnp.exp(-y))
        return y

    def pool(h):
        return lax.reduce_window(
            h, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    def up(h):
        return jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)

    h = conv("conv2d", x)
    h = conv("conv2d_1", h)
    h = pool(h)
    skips = []
    for n in range(3):
        h = conv(f"down_level_{n}_no_0", h)
        h = conv(f"down_level_{n}_no_1", h)
        skips.append(h)
        h = pool(h)
    h = conv("middle_0", h)
    h = conv("middle_1", h)
    for n in (2, 1, 0):
        h = jnp.concatenate([up(h), skips[n]], axis=-1)
        h = conv(f"up_level_{n}_no_0", h)
        h = conv(f"up_level_{n}_no_1", h)
    feat = conv("features", h)
    return conv("prob", feat, act="sigmoid"), conv("dist", feat, act="linear")


@pytest.mark.slow  # full-gate: heavy CPU compile/e2e; fast tier keeps a representative
def test_stardist_keras_conversion_matches_oracle(tmp_path):
    import jax
    import jax.numpy as jnp

    from wsinsight_tpu.models.convert import convert_stardist_keras_h5
    from wsinsight_tpu.models.stardist import StarDistUNet

    rng = np.random.default_rng(3)
    h5 = tmp_path / "weights_best.h5"
    weights = _write_fake_keras_h5(h5, rng)
    params = convert_stardist_keras_h5(h5)

    model = StarDistUNet()
    ref_tree = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    assert set(ref_tree) == set(params)
    for name in ref_tree:
        for leaf in ref_tree[name]:
            assert np.shape(params[name][leaf]) == np.shape(ref_tree[name][leaf]), name

    x = rng.normal(0, 1, size=(1, 32, 32, 3)).astype(np.float32)
    with jax.default_matmul_precision("float32"):
        prob, dist = model.apply({"params": params}, jnp.asarray(x))
        oprob, odist = _keras_graph_oracle(weights, jnp.asarray(x))
    assert prob.shape == (1, 16, 16, 1) and dist.shape == (1, 16, 16, 32)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(oprob), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(odist), atol=2e-5)


def test_stardist_keras_conversion_rejects_bad_files(tmp_path):
    import h5py

    from wsinsight_tpu.models.convert import convert_stardist_keras_h5

    rng = np.random.default_rng(4)
    h5 = tmp_path / "truncated.h5"
    _write_fake_keras_h5(h5, rng)
    with h5py.File(h5, "a") as f:
        del f["features"]
        names = [n for n, _ in _SD_LAYERS if n != "features"]
        f.attrs["layer_names"] = np.array([n.encode() for n in names])
    with pytest.raises(ValueError, match="missing"):
        convert_stardist_keras_h5(h5)


def test_stardist_weights_autoload_from_model_dir(tmp_path, monkeypatch):
    """The pipeline's StarDist mode loads a converted .h5 straight from
    WSINSIGHT_MODEL_DIR — the real-weights path end to end."""
    from wsinsight_tpu.models.stardist import StarDist2D

    rng = np.random.default_rng(5)
    _write_fake_keras_h5(tmp_path / "stardist_2D_versatile_he.h5", rng)
    monkeypatch.setenv("WSINSIGHT_MODEL_DIR", str(tmp_path))
    sd = StarDist2D(prob_thresh=0.99)
    img = rng.integers(0, 255, (96, 96, 3)).astype(np.float32)
    from wsinsight_tpu.models.stardist import normalize_percentile

    polys = sd.predict_instances_big(
        normalize_percentile(img, 1, 99.8), block_size=64, context=16
    )
    assert isinstance(polys, list)
