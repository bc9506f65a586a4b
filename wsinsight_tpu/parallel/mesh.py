"""Device mesh and sharding helpers.

The reference's only parallelism over accelerators is torch DataParallel
(reference: wsinsight/modellib/run_inference.py:173-174). The TPU-native
equivalent is a 1-D "data" mesh with batch-dimension sharding under jit;
XLA inserts any needed collectives over ICI (SURVEY.md §2.8).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def force_cpu_if_requested() -> None:
    """Honor WSINFER_FORCE_CPU (reference: run_inference.py:151-160)."""
    if os.getenv("WSINFER_FORCE_CPU", "0").lower() not in {"0", "f", "false"}:
        jax.config.update("jax_platforms", "cpu")


_cache_enabled = False


def enable_compilation_cache() -> None:
    """Persist XLA compilations across processes.

    One-shot CLI runs would otherwise pay the full compile every invocation
    (minutes for the larger models). Cache dir: $WSINSIGHT_COMPILE_CACHE or
    ~/.cache/wsinsight_tpu/jax_cache; disable with WSINSIGHT_COMPILE_CACHE=0.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    loc = os.getenv("WSINSIGHT_COMPILE_CACHE")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "wsinsight_tpu", "jax_cache"
        )
        # Partition the default cache by host CPU identity: XLA:CPU AOT
        # entries bake in the compile machine's vector features, and a shared
        # home directory (or a remote-compile server writing entries) makes
        # another machine's executables load with machine-feature mismatch
        # warnings and a SIGILL risk (observed: +amx-fp16 entries on a host
        # without it). TPU executables key on the platform instead.
        import hashlib

        try:
            with open("/proc/cpuinfo") as fh:
                lines = fh.read().splitlines()
            ident = ";".join(
                sorted({ln for ln in lines if ln.startswith(("model name", "flags"))})
            )
            loc = os.path.join(loc, hashlib.sha1(ident.encode()).hexdigest()[:12])
        except OSError:
            pass
    try:
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:
        pass


def get_data_mesh(max_devices: int | None = None) -> Mesh:
    """1-D mesh over all LOCAL devices, axis name 'data'.

    Local, not global: the multi-host design shards SLIDES across processes
    (parallel/multihost.py) with each host running independent per-slide
    programs — a global-device mesh would demand lockstep multi-controller
    SPMD across hosts and deadlock the per-slide fan-out.
    """
    devices = jax.local_devices()
    if max_devices:
        devices = devices[:max_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m


def device_batch_size(batch_size: int, mesh: Mesh) -> int:
    """Round batch size up so it divides evenly across the mesh."""
    d = mesh.devices.size
    return pad_to_multiple(batch_size, d)
