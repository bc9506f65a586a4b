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
    scores, centers, rays = _ray_candidates(prob, dist, 0.5)
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
