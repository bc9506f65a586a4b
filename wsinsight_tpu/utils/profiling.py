"""Tracing and per-stage timing.

The reference ships no profiling (SURVEY.md §5 "Tracing / profiling: none");
the rebuild adds:

* `stage_timer` — wall-clock per pipeline stage, collected into the run
  metadata JSON,
* `maybe_trace` — a jax.profiler trace around a stage when
  WSINSIGHT_PROFILE=<dir> is set (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator

_STAGE_TIMINGS: dict[str, float] = {}


@contextlib.contextmanager
def stage_timer(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _STAGE_TIMINGS[name] = _STAGE_TIMINGS.get(name, 0.0) + (time.perf_counter() - t0)


def stage_timings() -> dict[str, float]:
    return {k: round(v, 3) for k, v in _STAGE_TIMINGS.items()}


def reset_stage_timings() -> None:
    _STAGE_TIMINGS.clear()


# -- fine-grained hot-loop stage profiling (WSINSIGHT_STREAM_PROFILE=1) ------
# Used by the streaming cell engine and the HV post-processing tail: one
# perf_counter pair per stage call when enabled, zero work when not (the
# flag is read once at import). Thread-safe — the flusher runs on worker
# threads concurrently with the forward loop.

import threading as _threading

_PROF_ENABLED = os.getenv("WSINSIGHT_STREAM_PROFILE", "0") not in ("0", "")
_PROF: dict[str, float] = {}
_PROF_LOCK = _threading.Lock()


class hot_stage:
    """Context manager accumulating wall seconds under `name` when enabled."""

    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        if _PROF_ENABLED:
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if _PROF_ENABLED:
            dt = time.perf_counter() - self.t0
            with _PROF_LOCK:
                _PROF[self.name] = _PROF.get(self.name, 0.0) + dt
        return False


def hot_stage_report(reset: bool = True) -> dict[str, float]:
    """Cumulative stage seconds since the last reset (empty unless enabled)."""
    with _PROF_LOCK:
        out = dict(sorted(_PROF.items(), key=lambda kv: -kv[1]))
        if reset:
            _PROF.clear()
    return out


@contextlib.contextmanager
def maybe_trace(stage: str) -> Iterator[None]:
    """jax.profiler trace when WSINSIGHT_PROFILE is set to a directory."""
    trace_dir = os.getenv("WSINSIGHT_PROFILE")
    if not trace_dir:
        with stage_timer(stage):
            yield
        return
    import jax

    out = os.path.join(trace_dir, stage)
    os.makedirs(out, exist_ok=True)
    jax.profiler.start_trace(out)
    try:
        with stage_timer(stage):
            yield
    finally:
        jax.profiler.stop_trace()
