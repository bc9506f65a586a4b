"""Raw MXU throughput ladder on the attached TPU.

Measures achieved TFLOP/s for the exact matmul shapes CellViT-SAM-H executes
(qkv/proj/MLP on 2048- and 6272-token batches, attention contractions with
head_dim 80) plus reference square shapes, in f32-in/default precision and
bf16-in. Distinguishes "the model is inefficient" from "these shapes cannot
run faster on this chip" for the SAM-H roofline (docs/design.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(m, k, n, dtype, batch=1, reps=3, chain=32):
    rng = np.random.default_rng(0)
    shape_a = (batch, m, k) if batch > 1 else (m, k)
    shape_b = (batch, k, n) if batch > 1 else (k, n)
    a = jax.device_put(jnp.asarray(rng.normal(0, 1, shape_a), dtype))
    b = jax.device_put(jnp.asarray(rng.normal(0, 1, shape_b), dtype))

    @jax.jit
    def f(a, b):
        with jax.default_matmul_precision("default"):
            if batch > 1:
                out = jnp.einsum("bmk,bkn->bmn", a, b, preferred_element_type=jnp.float32)
            else:
                out = jnp.dot(a, b, preferred_element_type=jnp.float32)
        return jnp.sum(out)

    _ = np.asarray(f(a, b))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = f(a, b)
        _ = np.asarray(out)
        ts.append((time.perf_counter() - t0) / chain)
    t = float(np.median(ts))
    flops = 2.0 * batch * m * k * n
    print(
        json.dumps(
            {
                "shape": f"{'%dx' % batch if batch > 1 else ''}{m}x{k}x{n}",
                "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
                "ms": round(t * 1e3, 3),
                "achieved_tflops": round(flops / t / 1e12, 1),
            }
        ),
        flush=True,
    )


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        # square references
        probe(4096, 4096, 4096, dtype)
        probe(2048, 2048, 2048, dtype)
        # SAM-H MLP / qkv / proj shapes (256-token grid, batch 8)
        probe(2048, 1280, 5120, dtype)   # fc1
        probe(2048, 5120, 1280, dtype)   # fc2
        probe(6272, 1280, 3840, dtype)   # windowed qkv (784 padded tokens x 8)
        probe(6272, 1280, 1280, dtype)   # windowed proj
        # attention contractions: batch = 32 windows*16 heads, head_dim 80
        probe(196, 80, 196, dtype, batch=512)   # q k^T per window-head
        probe(196, 196, 80, dtype, batch=512)   # attn v
        probe(256, 80, 256, dtype, batch=128)   # global blocks
    print(json.dumps({"device": str(jax.devices()[0].device_kind)}), flush=True)


if __name__ == "__main__":
    main()
