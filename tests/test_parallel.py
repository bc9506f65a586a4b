"""Mesh/multihost helper tests (SURVEY.md §2.8 parallelism inventory)."""

import numpy as np

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
