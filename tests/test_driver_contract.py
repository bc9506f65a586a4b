"""Guards for the external driver contract: bench JSON line and graft entry."""

import json
import subprocess
import sys

import numpy as np
import pytest


def test_graft_entry_single_chip():
    """entry() returns a jittable fn + example args (driver compile check)."""
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import entry

    fn, args = entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (args[1].shape[0], 2)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_graft_entry_multichip_dryrun():
    """dryrun_multichip(8) — EXACTLY the driver's call, no env adaptation."""
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_multichip_dryrun_default_platform():
    """Reproduce the DRIVER's environment: default platform left alone, no
    forced host device count — so jax sees 1 default device (< 8) and the
    dryrun must self-heal via the pinned-CPU subprocess re-exec
    (MULTICHIP_r01/r02 both failed exactly here)."""
    import os

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "_WSINSIGHT_DRYRUN_CHILD")
    }
    res = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, '.'); "
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=".",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "inference + DGI train step OK" in res.stdout


@pytest.mark.slow
def test_bench_emits_single_json_line():
    """bench.py prints exactly one JSON object with the required keys."""
    env = dict(
        PATH="/usr/bin:/bin:/usr/local/bin",
        HOME="/root",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        WSINSIGHT_BENCH_FAST="1",
        WSINSIGHT_BENCH_AUX="0",  # schema guard only; aux benches have their own path
    )
    res = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True, timeout=1200, env=env
    )
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0


@pytest.mark.slow
def test_bench_last_combined_line_is_headline_with_aux():
    """The driver parses the LAST line of COMBINED stdout+stderr.

    Reproduces the BENCH_r04 failure exactly: aux enabled with a spent
    budget, so every aux bench prints an `aux-bench ... skipped` message to
    stderr AFTER the early headline print. The final combined line must
    still be the 4-key headline JSON (bench.py re-prints it last and
    _exits). RESERVED is emptied so the guaranteed slide_sim slot does not
    slow this contract check down.
    """
    env = dict(
        PATH="/usr/bin:/bin:/usr/local/bin",
        HOME="/root",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        WSINSIGHT_BENCH_FAST="1",
        WSINSIGHT_BENCH_AUX="1",
        WSINSIGHT_BENCH_BUDGET_SEC="0.001",  # every aux bench -> skip message
        WSINSIGHT_BENCH_RESERVED="",
    )
    res = subprocess.run(
        [sys.executable, "bench.py"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,  # the driver's combined-stream view
        text=True,
        timeout=1200,
        env=env,
    )
    assert res.returncode == 0, res.stdout[-2000:]
    combined = res.stdout.strip().splitlines()
    assert any("skipped" in ln for ln in combined), combined[-10:]
    payload = json.loads(combined[-1])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
