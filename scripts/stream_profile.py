"""Stage profile of the streaming cell engine's host tail.

Drives the banded stitcher exactly like bench.py's stream-only pass
(controlled-density synthetic maps, no model forward) with
WSINSIGHT_STREAM_PROFILE forced on, and prints the cumulative per-stage
seconds ledger: flush.* (window transfer machinery) and hv.* (the
foreground/seeds/watershed/polygon tail). This is the measurement that
decides which stage moves on device next (VERDICT r3 #10).

Usage: python scripts/stream_profile.py [--side 4100] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ["WSINSIGHT_STREAM_PROFILE"] = "1"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--side", type=int, default=4100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from wsinsight_tpu.engine.stream_cells import (
        BandedCellStitcher,
        stream_profile_report,
    )

    patch_px, halo_px, n_classes, mpp = 256, 46, 6, 0.25
    s = patch_px - 2 * halo_px
    batch_size = 32
    n_grid = args.side // s
    n_patches = n_grid * n_grid

    # Controlled-density nuclei (same construction as bench.py's streaming
    # bench): ~5 nuclei per 164px patch, radius 11, clean HV cones.
    eps = 1e-4
    np_map = np.zeros((s, s), np.float32)
    hv = np.zeros((2, s, s), np.float32)
    yy, xx = np.mgrid[:s, :s].astype(np.float32)
    for cy in range(20, s - 15, 60):
        for cx in range(20, s - 15, 60):
            d = np.hypot(yy - cy, xx - cx)
            inside = d < 11
            np_map[inside] = 1.0
            hv[0][inside] = ((xx - cx) / 11)[inside]
            hv[1][inside] = ((yy - cy) / 11)[inside]
    np_logits = np.stack([np.log1p(-np_map + eps), np.log(np_map + eps)])[None]
    tp = np.full((n_classes, s, s), eps, np.float32)
    tp[0] = 1.0 - np_map
    tp[1] = np_map
    tp_logits = np.log(tp + eps)[None]
    pred = jax.device_put(
        {
            "np": np.repeat(np_logits, batch_size, 0),
            "hv": np.repeat(hv[None], batch_size, 0),
            "tp": np.repeat(tp_logits, batch_size, 0),
        }
    )
    gy, gx = np.mgrid[0:n_grid, 0:n_grid]
    coords = np.stack([gx.ravel() * s - halo_px, gy.ravel() * s - halo_px], 1).astype(np.int64)
    coords = np.concatenate([coords, np.full((len(coords), 2), patch_px, np.int64)], 1)

    def run_once():
        st = BandedCellStitcher(
            n_classes=n_classes, slide_width=args.side, slide_height=args.side,
            slide_patch_size=s, slide_halo_size=halo_px, slide_mpp=mpp, model_mpp=mpp,
        )
        for i0 in range(0, n_patches, batch_size):
            sel = coords[i0 : i0 + batch_size]
            st.accumulate_batch(pred, sel, n_valid=len(sel))
        inst, probs, polys = st.finalize()
        st.close()
        return len(inst)

    n = run_once()  # warm compiles
    stream_profile_report()  # discard warm-pass ledger
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        n = run_once()
        times.append(time.perf_counter() - t0)
    prof = stream_profile_report()
    total = sum(prof.values())
    out = {
        "cells": n,
        "wall_sec_per_pass": [round(t, 3) for t in times],
        "cells_per_sec_median": round(n / float(np.median(times)), 1),
        "stage_sec_cumulative": {k: round(v, 3) for k, v in prof.items()},
        "stage_share": {k: round(v / total, 3) for k, v in prof.items()},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
