"""Test configuration: force CPU jax with 8 virtual devices for sharding tests."""

import os

# Force CPU with 8 virtual devices for sharding tests. The environment may
# pre-register a TPU platform and override JAX_PLATFORMS, so set the config
# explicitly after import as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import importlib.util

import numpy as np
import pytest

# Torch is a TEST-ONLY dependency (parity references). When it is absent the
# torch-dependent modules must skip at collection, not explode with
# ModuleNotFoundError — otherwise a torch-less environment cannot even run
# the fast tier (ADVICE r4 high: CI collected these and went red).
if importlib.util.find_spec("torch") is None:
    collect_ignore = [
        "torch_refs.py",
        "torch_refs_cells.py",
        "test_model_parity.py",
        "test_e2e_torch_parity.py",
        "test_stitch_parity.py",
    ]


@pytest.fixture(scope="session")
def purple_slide(tmp_path_factory):
    """4096x4096 solid-purple tiled TIFF at 0.25 um/px.

    Mirrors the reference's synthetic fixture (reference:
    tests/test_all.py:260-276) written with our own TIFF writer.
    """
    from wsinsight_tpu.wsi.tiff import write_pyramidal_tiff

    d = tmp_path_factory.mktemp("slides")
    path = d / "purple.tif"
    img = np.zeros((4096, 4096, 3), dtype=np.uint8)
    img[..., 0] = 128  # R
    img[..., 1] = 0  # G
    img[..., 2] = 128  # B
    write_pyramidal_tiff(str(path), img, tile=(256, 256), compression="deflate", mpp=0.25)
    return path
