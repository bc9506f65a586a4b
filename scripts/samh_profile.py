"""Stage-level roofline profile for CellViT-SAM-H (VERDICT r4 #2).

Times the bf16-matmul forward (the bench's production cell config) and a
bf16-activation variant, then isolates encoder / decoder / per-block-type
costs so the binding stage is named with numbers, not guesses. Prints one
JSON line per measurement.

Run on the TPU:  python scripts/samh_profile.py
CPU smoke:       PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                   python scripts/samh_profile.py --fast
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def med_time(fn, args, reps: int, warm: int = 2) -> float:
    """Median wall-clock of a jitted call, synced by materializing a scalar.

    The tunneled TPU backend's block_until_ready can return before the
    computation actually runs (measured: 6.8 TFLOP "in" 0.66 ms), so every
    profiled fn is wrapped to reduce its outputs to one scalar and the timer
    waits on np.asarray of that scalar — a 4-byte D2H that cannot complete
    before the compute does.
    """
    for _ in range(warm):
        out = fn(*args)
    _ = np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scalarize(fn):
    """Wrap fn so it returns the sum of all its output leaves (negligible
    extra FLOPs; forces full execution before the scalar exists)."""
    import jax.tree_util as jtu

    def wrapped(*args):
        out = fn(*args)
        return sum(
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jtu.tree_leaves(out)
        )

    return jax.jit(wrapped)


def flops_of(fn, args) -> float:
    try:
        a = fn.lower(*args).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return 0.0


def peak() -> float:
    import sys

    sys.path.insert(0, ".")
    from bench import _peak_flops_per_chip

    return _peak_flops_per_chip() or float("nan")


def report(tag: str, t: float, f: float, pk: float) -> None:
    print(
        json.dumps(
            {
                "stage": tag,
                "ms": round(t * 1e3, 2),
                "gflops": round(f / 1e9, 1),
                "achieved_tflops": round(f / t / 1e12, 1),
                "mfu_vs_bf16_peak": round(f / t / pk, 4) if pk == pk else None,
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="tiny shapes, CPU smoke")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from wsinsight_tpu.models import create_model
    from wsinsight_tpu.models.vit import SAM_VIT_H, Block, ViTEncoder
    from wsinsight_tpu.ops.preprocess import TransformSpec, make_preprocess_fn

    pk = peak()
    batch = 2 if args.fast else 8
    px = 256
    depth_note = "full"

    spec = TransformSpec(size=None, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), to_tensor=True)
    preprocess = make_preprocess_fn(spec)
    rng = np.random.default_rng(0)
    batch_u8 = jax.device_put(
        rng.integers(0, 256, size=(batch, px, px, 3), dtype=np.uint8)
    )

    cfg = SAM_VIT_H
    if args.fast:
        from dataclasses import replace

        cfg = replace(cfg, depth=4, global_attn_indexes=(3,), extract_layers=(1, 2, 3, 4))
        depth_note = "depth4-smoke"

    for acts in ("f32", "bf16"):
        dt = jnp.float32 if acts == "f32" else jnp.bfloat16
        model = create_model("cellvit-sam-h", 6, dtype=dt)
        model = model.clone(halo_size=46)
        if args.fast:
            model = model.clone(config_override=cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, px, px, 3), jnp.float32)
        )["params"]
        params = jax.device_put(params)

        def full(params, b):
            with jax.default_matmul_precision("default"):
                return model.apply({"params": params}, preprocess(b))

        jfull = scalarize(full)
        t = med_time(jfull, (params, batch_u8), args.reps)
        report(f"full_forward[{acts}]", t, flops_of(jfull, (params, batch_u8)), pk)

        # encoder only
        enc = ViTEncoder(cfg, dtype=dt)

        def enc_only(p, b):
            with jax.default_matmul_precision("default"):
                return enc.apply({"params": p}, preprocess(b))

        jenc = scalarize(enc_only)
        ep = params["encoder"]
        t = med_time(jenc, (ep, batch_u8), args.reps)
        report(f"encoder[{acts}]", t, flops_of(jenc, (ep, batch_u8)), pk)

        # single blocks: windowed (block 0) and global (first global index)
        grid = jnp.asarray(
            rng.normal(0, 1, size=(batch, px // 16, px // 16, cfg.embed_dim)), dt
        )
        for tag, idx, window in (
            ("windowed_block", 0, cfg.window_size),
            ("global_block", cfg.global_attn_indexes[0], 0),
        ):
            blk = Block(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, window, cfg.use_rel_pos,
                mlp_naming=cfg.mlp_naming, dtype=dt,
            )
            bp = ep[f"blocks.{idx}"]

            def one(p, g, _blk=blk):
                with jax.default_matmul_precision("default"):
                    return _blk.apply({"params": p}, g)

            jone = scalarize(one)
            t = med_time(jone, (bp, grid), args.reps)
            report(f"{tag}[{acts}]", t, flops_of(jone, (bp, grid)), pk)

        # decoder-only: run full model but with a frozen-encoder closure is
        # awkward; instead time the three branches on random skips.
        from wsinsight_tpu.models.cellvit import UpsamplingBranch

        g = px // 16
        skips = [
            jnp.asarray(rng.normal(0, 1, size=(batch, g, g, cfg.embed_dim)), dt)
            for _ in range(4)
        ]
        img = jnp.asarray(rng.normal(0, 1, size=(batch, px, px, 3)), dt)
        branch = UpsamplingBranch(2, cfg.embed_dim, dtype=dt)
        bp = params["nuclei_binary_map_decoder"]

        def dec(p, i, z1, z2, z3, z4):
            with jax.default_matmul_precision("default"):
                return branch.apply({"params": p}, i, z1, z2, z3, z4)

        jdec = scalarize(dec)
        t = med_time(jdec, (bp, img, *skips), args.reps)
        report(f"decoder_branch_x1[{acts}]", t, flops_of(jdec, (bp, img, *skips)), pk)

    print(json.dumps({"note": f"batch={batch}, px={px}, cfg={depth_note}"}), flush=True)


if __name__ == "__main__":
    main()
