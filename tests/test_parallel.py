"""Mesh/multihost helper tests (SURVEY.md §2.8 parallelism inventory)."""

import numpy as np
import pytest

from wsinsight_tpu.parallel import multihost
from wsinsight_tpu.parallel.mesh import (
    batch_sharding,
    device_batch_size,
    get_data_mesh,
    pad_to_multiple,
)


def test_shard_slides_round_robin(monkeypatch):
    monkeypatch.setattr(multihost, "process_info", lambda: (1, 3))
    assert multihost.shard_slides_for_host(list(range(10))) == [1, 4, 7]
    # single process: identity
    monkeypatch.setattr(multihost, "process_info", lambda: (0, 1))
    assert multihost.shard_slides_for_host(list(range(3))) == [0, 1, 2]
    # union over hosts covers every slide exactly once
    shards = []
    for idx in range(3):
        monkeypatch.setattr(multihost, "process_info", lambda idx=idx: (idx, 3))
        shards += multihost.shard_slides_for_host(list(range(10)))
    assert sorted(shards) == list(range(10))


def test_pad_and_device_batch_size():
    assert pad_to_multiple(5, 4) == 8
    assert pad_to_multiple(8, 4) == 8
    mesh = get_data_mesh(max_devices=8)
    assert mesh.devices.size == 8
    assert device_batch_size(30, mesh) == 32


def test_batch_sharding_splits_leading_axis():
    import jax

    mesh = get_data_mesh(max_devices=8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = jax.device_put(x, batch_sharding(mesh))
    assert len(arr.addressable_shards) == 8
    for shard in arr.addressable_shards:
        assert shard.data.shape == (2, 3)  # 16 rows / 8 devices
    np.testing.assert_array_equal(np.asarray(arr), x)


def _launch_dcn_infer(i, n, port, results, cfg, weights, wsi_dir, extra_env=None):
    """One jax.distributed CPU process running the REAL infer CLI."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES=str(n),
        JAX_PROCESS_ID=str(i),
    )
    if extra_env:
        env.update(extra_env)
    code = (
        "import sys; sys.path.insert(0, '.');\n"
        "from wsinsight_tpu.parallel.multihost import process_info\n"
        "from click.testing import CliRunner\n"
        "from wsinsight_tpu.cli.cli import cli\n"
        f"res = CliRunner().invoke(cli, ['infer', '-i', {str(wsi_dir)!r}, "
        f"'-o', {str(results)!r}, '--config', {str(cfg)!r}, "
        f"'--model-path', {str(weights)!r}, '-b', '8'], catch_exceptions=False)\n"
        "assert res.exit_code == 0, res.output\n"
        "print('PROC', process_info()[0], 'of', process_info()[1], 'OK')\n"
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        env=env,
        cwd=".",
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


@pytest.mark.slow
def test_two_process_dcn_cohort(tmp_path):
    """REAL multi-process DCN run (VERDICT r2 #7): two jax.distributed CPU
    processes share one results dir; slides shard round-robin with no
    double-writes, and the merged CSVs equal the single-process run."""
    import shutil

    from click.testing import CliRunner

    from wsinsight_tpu.cli.cli import cli
    from wsinsight_tpu.wsi.tiff import write_pyramidal_tiff
    from wsinsight_tpu.zoo import make_random_local_model

    wsi_dir = tmp_path / "slides"
    wsi_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("s_a", "s_b", "s_c", "s_d"):
        img = np.full((512, 512, 3), 140, np.uint8)
        img += rng.integers(0, 40, size=img.shape, dtype=np.uint8)
        write_pyramidal_tiff(
            str(wsi_dir / f"{name}.tif"), img, tile=(256, 256),
            compression="deflate", mpp=0.25,
        )

    cfg, weights = make_random_local_model(
        "resnet34", 2, tmp_path, class_names=["Other", "Tumor"],
        patch_size_pixels=128, resize_size=64,
    )

    # patch once (single process), then clone the patched results dir
    results = tmp_path / "results"
    res = CliRunner().invoke(
        cli,
        ["patch", "-i", str(wsi_dir), "-o", str(results), "--config", str(cfg),
         "--model-path", str(weights)],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    results_dcn = tmp_path / "results_dcn"
    shutil.copytree(results, results_dcn)

    # reference: single-process infer
    res = CliRunner().invoke(
        cli,
        ["infer", "-i", str(wsi_dir), "-o", str(results), "--config", str(cfg),
         "--model-path", str(weights), "-b", "8"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output

    # distributed: 2 real processes, one coordinator, shared results dir
    port = 53431
    procs = [
        _launch_dcn_infer(i, 2, port, results_dcn, cfg, weights, wsi_dir)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"stdout:{out[-1500:]} stderr:{err[-1500:]}"
        outs.append(out)
    assert "PROC 0 of 2 OK" in outs[0]
    assert "PROC 1 of 2 OK" in outs[1]

    # every slide produced exactly one CSV, identical to the single-proc run
    import pandas as pd

    ref_dir = results / "model-outputs-csv"
    dcn_dir = results_dcn / "model-outputs-csv"
    ref_csvs = sorted(p.name for p in ref_dir.iterdir())
    dcn_csvs = sorted(p.name for p in dcn_dir.iterdir())
    assert dcn_csvs == ref_csvs and len(dcn_csvs) == 4
    for name in ref_csvs:
        a = pd.read_csv(ref_dir / name)
        b = pd.read_csv(dcn_dir / name)
        pd.testing.assert_frame_equal(a, b)
