"""Headline benchmark: ResNet34@224 patch-classification throughput per chip.

Measures the production inference step — uint8 350px patches -> fused
on-device PIL-exact resize to 224 -> ResNet34 forward (float32-precision
passes, the engine's parity default) -> softmax — at steady state over
device-resident batches (a prefetching input pipeline keeps transfer
overlapped with compute in production; this harness reaches the chip through
a loopback relay whose host->device path would otherwise dominate and measure
the tunnel, not the engine).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md: "published": {});
vs_baseline anchors on a nominal 1000 patches/sec/chip initial target
(value / 1000). The driver records the raw value.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from wsinsight_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _build_forward

    forward, params = _build_forward()

    def step(params, batch):
        with jax.default_matmul_precision("float32"):
            return forward(params, batch)

    step = jax.jit(step)

    import os

    # WSINSIGHT_BENCH_FAST shrinks shapes for CI smoke runs (CPU).
    fast = os.getenv("WSINSIGHT_BENCH_FAST", "0") not in ("0", "")
    batch_size = 16 if fast else 512
    rng = np.random.default_rng(0)
    pool = [
        jax.device_put(rng.integers(0, 256, size=(batch_size, 350, 350, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    params = jax.device_put(params)

    # Warm up: compile + two steady-state iterations.
    _ = np.asarray(step(params, pool[0]))
    _ = np.asarray(step(params, pool[1]))

    n_iters = 3 if fast else 20
    t0 = time.perf_counter()
    out = None
    for i in range(n_iters):
        out = step(params, pool[i % len(pool)])
    _ = np.asarray(out)  # fetch forces full pipeline sync
    dt = time.perf_counter() - t0

    patches_per_sec = n_iters * batch_size / dt
    print(
        json.dumps(
            {
                "metric": "resnet34_224_patches_per_sec_per_chip",
                "value": round(patches_per_sec, 2),
                "unit": "patches/s",
                "vs_baseline": round(patches_per_sec / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
