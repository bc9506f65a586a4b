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
