"""Adaptive worker sizing and host-pressure throttling.

Re-creation of the reference's pool governor (reference:
wsinsight/num_worker_optimizer.py:74-165): EWMA-smoothed CPU/RAM headroom
sizing with optional per-worker memory probing, and exponential-backoff
sleeping while the host is hot. The NVML GPU-utilization backoff becomes an
accelerator-agnostic hook (TPU work is dispatched async by the engine, so the
host-side pools are the contended resource).
"""

from __future__ import annotations

import math
import os
import time
from typing import Callable, Optional

import psutil

_cpu_ewma: Optional[float] = None
_mem_ewma: Optional[float] = None


def _cpu_count_physical_or_logical() -> int:
    phys = psutil.cpu_count(logical=False)
    return phys if phys and phys > 0 else (os.cpu_count() or 1)


def _ewma(prev: Optional[float], new: float, alpha: float = 0.5) -> float:
    return new if prev is None else (alpha * new + (1 - alpha) * prev)


def _cpu_util_sample(sample_interval: float = 0.30) -> float:
    return psutil.cpu_percent(interval=sample_interval) / 100.0


def _mem_util_sample() -> tuple[float, int, int]:
    vm = psutil.virtual_memory()
    return vm.percent / 100.0, vm.available, vm.total


def _probe_memory_per_worker_bytes(
    probe_fn: Optional[Callable[[], None]] = None, warmup_seconds: float = 0.1
) -> Optional[int]:
    """Estimate per-worker RSS by running one representative unit of work."""
    if probe_fn is None:
        return None
    proc = psutil.Process(os.getpid())
    before = proc.memory_info().rss
    t0 = time.time()
    try:
        probe_fn()
    except Exception:
        pass
    finally:
        dt = time.time() - t0
        if dt < warmup_seconds:
            time.sleep(warmup_seconds - dt)
    after = proc.memory_info().rss
    delta = max(0, after - before)
    return int(delta * 1.5) if delta > 0 else None


def pick_workers_safe(
    target_cpu_util: float = 0.60,
    target_mem_util: float = 0.75,
    max_workers: int = 32,
    min_workers: int = 2,
    *,
    memory_per_worker_bytes: Optional[int] = None,
    reserve_mem_bytes: int = 512 * 1024 * 1024,
    cpu_core_reserve: int = 1,
    sample_interval_sec: float = 0.30,
    ewma_alpha: float = 0.5,
    dynamic_probe_fn: Optional[Callable[[], None]] = None,
) -> int:
    """Choose a worker count from CPU and RAM headroom (EWMA-smoothed)."""
    global _cpu_ewma, _mem_ewma

    max_workers = max(1, int(max_workers))
    cores_total = _cpu_count_physical_or_logical()
    cores_usable = max(1, cores_total - cpu_core_reserve)

    cpu_now = _cpu_util_sample(sample_interval=sample_interval_sec)
    mem_now, mem_avail, _ = _mem_util_sample()
    _cpu_ewma = _ewma(_cpu_ewma, cpu_now, ewma_alpha)
    _mem_ewma = _ewma(_mem_ewma, mem_now, ewma_alpha)

    cpu_headroom = max(0.0, target_cpu_util - _cpu_ewma)
    cpu_guess = int(cpu_headroom * cores_usable)

    mpw = memory_per_worker_bytes
    if mpw is None:
        mpw = _probe_memory_per_worker_bytes(dynamic_probe_fn)
    if mpw:
        avail_for_us = max(0, mem_avail - reserve_mem_bytes)
        mem_guess = int(avail_for_us // mpw)
    else:
        mem_headroom = max(0.0, target_mem_util - _mem_ewma)
        mem_guess = min(cores_usable, int(math.floor(mem_headroom * max_workers)))

    guess = min(cpu_guess, mem_guess, cores_usable, max_workers)
    if guess <= 0:
        if mpw:
            hard_cap = int(max(0, (mem_avail - reserve_mem_bytes)) // mpw)
            return max(0, min(hard_cap, min_workers))
        return min_workers
    return max(min_workers, guess)


def throttle_when_busy(
    target_cpu_util: float = 0.80,
    target_mem_util: float = 0.90,
    *,
    reserve_mem_bytes: int = 512 * 1024 * 1024,
    min_sleep: float = 0.25,
    max_sleep: float = 2.0,
    backoff_multiplier: float = 1.5,
) -> None:
    """Sleep with exponential backoff while the host is hot."""
    sleep_dur = min_sleep
    while True:
        cpu_now = _cpu_util_sample(sample_interval=0.20)
        mem_now, mem_avail, _ = _mem_util_sample()
        cpu_ok = cpu_now <= target_cpu_util
        mem_ok = (mem_now <= target_mem_util) and (mem_avail >= reserve_mem_bytes)
        if cpu_ok and mem_ok:
            return
        time.sleep(sleep_dur)
        sleep_dur = min(max_sleep, sleep_dur * backoff_multiplier)
