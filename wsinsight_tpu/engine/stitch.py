"""Slide-scale canvas stitcher for single-cell models.

TPU re-design of the reference TileRemapStitcher (reference:
wsinsight/modellib/tilefuse.py:179-415):

* the per-batch GPU half (softmax, 164->S bilinear resize, HV scaling by
  model_mpp/slide_mpp, per-pixel TP renormalization) becomes one jitted XLA
  step; a single host transfer lands in the numpy canvases,
* the CPU half (tiled watershed instance extraction with 64px context) runs
  on a thread pool using the native C++ watershed.

Memory note: the canvases are (H, W) f32 + (H, W, 2) f32 + (H, W, K) f32 —
the reference OOMs when this ~(12+4K) bytes/px exceeds host RAM
(tilefuse.py:204-206); above WSINSIGHT_CANVAS_MEMMAP_BYTES they are backed by
disk memmaps so tiled finalize pages bands in and out.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

from ..ops.hv_postproc import extract_instances


def make_map_postprocess(slide_patch_size: int, alpha: float):
    """Shared device half of the cell map pipeline (traceable core).

    (B,2,h,w) NP logits, (B,2,h,w) HV, (B,K,h,w) TP logits — the model's
    channel-first output contract (reference: tilefuse.py:222) — to
    channel-LAST float32 slide-space maps: NP (B,s,s), HV (B,s,s,2) scaled by
    alpha = model_mpp/slide_mpp, TP (B,s,s,K) renormalised per pixel.

    Both the classic host-canvas stitcher and the banded streaming engine
    build on this one function, so their numerics cannot drift apart (their
    parity is asserted in tests/test_cells.py).
    """
    import jax
    import jax.numpy as jnp

    s = slide_patch_size

    def core(np_logits, hv, tp_logits):
        np_prob = jax.nn.softmax(np_logits, axis=1)[:, 1, :, :]  # (B,h,w)
        tp_prob = jax.nn.softmax(tp_logits, axis=1)

        def resize(x, ch_shape):
            # bilinear with half-pixel centers == F.interpolate(align_corners=False)
            return jax.image.resize(x, ch_shape, method="bilinear")

        b = np_prob.shape[0]
        k = tp_prob.shape[1]
        np_res = resize(np_prob, (b, s, s))
        hv_res = jnp.transpose(resize(hv, (b, 2, s, s)) * alpha, (0, 2, 3, 1))
        tp_res = resize(tp_prob, (b, k, s, s))
        tp_res = jnp.transpose(
            tp_res / (tp_res.sum(axis=1, keepdims=True) + 1e-8), (0, 2, 3, 1)
        )
        return np_res, hv_res, tp_res

    return core


class TileRemapStitcher:
    """Accumulate per-patch prediction maps into slide canvases, then extract
    nucleus instances tile by tile."""

    def __init__(
        self,
        n_classes: int,
        slide_width: int,
        slide_height: int,
        slide_patch_size: int,
        slide_halo_size: int,
        slide_mpp: float,
        model_mpp: float,
        min_object_size: int = 20,
        memmap_above_bytes: int | None = None,
        transfer_dtype: str | None = None,
    ):
        # Map-transfer dtype. The resized prediction maps are the cell path's
        # dominant device->host traffic ((3+K) channels x patch^2 x 4B each).
        # Default "quantized": probabilities cross as uint8 (step 1/255 —
        # the same order as bf16's relative error on [0,1] and far below the
        # 0.5 NP threshold's noise floor) and HV as bf16 for the downstream
        # Sobel; ~4.5x fewer bytes than f32 at K=6. Also accepted:
        # "bfloat16" (2x) and "float32" (exact); override with
        # WSINSIGHT_CELL_TRANSFER. Parity asserted in tests/test_cells.py.
        if transfer_dtype is None:
            transfer_dtype = os.getenv("WSINSIGHT_CELL_TRANSFER", "quantized")
        self.transfer_dtype = transfer_dtype
        self.n_classes = n_classes
        self.slide_width = slide_width
        self.slide_height = slide_height
        self.slide_patch_size = slide_patch_size
        self.slide_halo_size = slide_halo_size
        self.alpha = model_mpp / slide_mpp
        self.min_object_size = int(min_object_size)
        # Canvas memory: (12 + 4K) bytes/px. The reference would OOM on slides
        # where this exceeds host RAM (tilefuse.py:204-206); above the
        # threshold we back the canvases with disk memmaps so the OS pages
        # bands in and out (tile-local access keeps the working set small).
        if memmap_above_bytes is None:
            memmap_above_bytes = int(
                os.getenv("WSINSIGHT_CANVAS_MEMMAP_BYTES", 32 * (1 << 30))
            )
        total_bytes = slide_height * slide_width * (12 + 4 * n_classes)
        self._tmpdir = None
        if total_bytes > memmap_above_bytes:
            import tempfile

            self._tmpdir = tempfile.mkdtemp(prefix="wsinsight_canvas_")

            def alloc(name, shape):
                return np.memmap(
                    os.path.join(self._tmpdir, name), dtype=np.float32, mode="w+",
                    shape=shape,
                )

            self.np_map = alloc("np.dat", (slide_height, slide_width))
            self.hv_map = alloc("hv.dat", (slide_height, slide_width, 2))
            self.tp_map = alloc("tp.dat", (slide_height, slide_width, n_classes))
        else:
            self.np_map = np.zeros((slide_height, slide_width), dtype=np.float32)
            self.hv_map = np.zeros((slide_height, slide_width, 2), dtype=np.float32)
            self.tp_map = np.zeros((slide_height, slide_width, n_classes), dtype=np.float32)
        self._device_step = None

    def close(self) -> None:
        """Release memmap backing files, if any."""
        if self._tmpdir is not None:
            import shutil

            self.np_map = self.hv_map = self.tp_map = None  # type: ignore[assignment]
            shutil.rmtree(self._tmpdir, ignore_errors=True)
            self._tmpdir = None

    # ------------------------------------------------------------------
    def _build_device_step(self):
        import jax
        import jax.numpy as jnp

        core = make_map_postprocess(self.slide_patch_size, self.alpha)

        def step(np_logits, hv, tp_logits):
            np_res, hv_res, tp_res = core(np_logits, hv, tp_logits)
            if self.transfer_dtype == "quantized":
                # Probabilities cross as uint8 (quantization step 1/255 —
                # same order as bf16's relative error on [0,1]); HV keeps
                # bf16 for the downstream Sobel. (3+K) x 4B per pixel
                # becomes (1+K) x 1B + 2 x 2B.
                return (
                    jnp.round(np_res * 255.0).astype(jnp.uint8),
                    hv_res.astype(jnp.bfloat16),
                    jnp.round(tp_res * 255.0).astype(jnp.uint8),
                )
            out_dt = jnp.bfloat16 if self.transfer_dtype == "bfloat16" else jnp.float32
            return (np_res.astype(out_dt), hv_res.astype(out_dt), tp_res.astype(out_dt))

        self._device_step = jax.jit(step)

    def device_postprocess(self, pred_dict: dict):
        """Dispatch the jitted device half (softmax / resize / HV scale).

        pred_dict accepts both key conventions (reference: tilefuse.py:225-230):
        {np, hv, tp} or {nuclei_binary_map, hv_map, nuclei_type_map}; values
        are (B, C, h, w) arrays (device or host). Returns DEVICE arrays — the
        call is asynchronous, so the caller can overlap the next forward with
        this batch's host scatter (see engine/cells.py pipeline).
        """
        np_logits = pred_dict.get("np", pred_dict.get("nuclei_binary_map"))
        hv = pred_dict.get("hv", pred_dict.get("hv_map"))
        tp_logits = pred_dict.get("tp", pred_dict.get("nuclei_type_map"))
        assert np_logits is not None and hv is not None and tp_logits is not None

        if self._device_step is None:
            self._build_device_step()
        return self._device_step(np_logits, hv, tp_logits)

    def scatter(self, maps, batch_coords: np.ndarray, n_valid: int | None = None) -> None:
        """Fetch one post-processed batch and write it into the host canvases.

        batch_coords is (B, 4) [minx, miny, w, h] in slide coordinates.
        """
        np_res, hv_res, tp_res = maps
        np_res = np.asarray(np_res)
        tp_res = np.asarray(tp_res)
        if np_res.dtype == np.uint8:  # quantized transfer: dequantize on host
            np_res = np_res.astype(np.float32) / 255.0
            tp_res = tp_res.astype(np.float32) / 255.0
        else:
            np_res = np_res.astype(np.float32)
            tp_res = tp_res.astype(np.float32)
        hv_res = np.asarray(hv_res).astype(np.float32)

        s = self.slide_patch_size
        coords = np.asarray(batch_coords, dtype=np.int64)[:, :2] + self.slide_halo_size
        n = np_res.shape[0] if n_valid is None else min(n_valid, np_res.shape[0])
        for i in range(n):
            x0, y0 = int(coords[i, 0]), int(coords[i, 1])
            x1, y1 = x0 + s, y0 + s
            cx0, cy0 = max(0, x0), max(0, y0)
            cx1, cy1 = min(self.slide_width, x1), min(self.slide_height, y1)
            if cx1 <= cx0 or cy1 <= cy0:
                continue
            tx0, ty0 = cx0 - x0, cy0 - y0
            tx1, ty1 = tx0 + (cx1 - cx0), ty0 + (cy1 - cy0)
            self.np_map[cy0:cy1, cx0:cx1] = np_res[i, ty0:ty1, tx0:tx1]
            self.hv_map[cy0:cy1, cx0:cx1, :] = hv_res[i, ty0:ty1, tx0:tx1, :]
            self.tp_map[cy0:cy1, cx0:cx1, :] = tp_res[i, ty0:ty1, tx0:tx1, :]

    def accumulate_batch(
        self, pred_dict: dict, batch_coords: np.ndarray, n_valid: int | None = None
    ) -> None:
        """Device post-process one batch and scatter it (synchronous form)."""
        self.scatter(self.device_postprocess(pred_dict), batch_coords, n_valid)

    # ------------------------------------------------------------------
    def finalize(
        self,
        tile_size: int = 2048,
        padding_size: int = 64,
        pbar=None,
        num_workers: Optional[int] = None,
    ) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
        """Tile the canvases (with context padding) and extract instances."""
        h, w = self.slide_height, self.slide_width
        if h <= 0 or w <= 0:
            return [], [], []

        jobs: List[tuple] = []
        for interior_y0 in range(0, h, tile_size):
            for interior_x0 in range(0, w, tile_size):
                interior_y1 = min(interior_y0 + tile_size, h)
                interior_x1 = min(interior_x0 + tile_size, w)
                pad_y0 = max(0, interior_y0 - padding_size)
                pad_y1 = min(interior_y1 + padding_size, h)
                pad_x0 = max(0, interior_x0 - padding_size)
                pad_x1 = min(interior_x1 + padding_size, w)
                inner_y0 = interior_y0 - pad_y0
                inner_x0 = interior_x0 - pad_x0
                inner_y1 = inner_y0 + (interior_y1 - interior_y0)
                inner_x1 = inner_x0 + (interior_x1 - interior_x0)
                jobs.append(
                    (pad_y0, pad_y1, pad_x0, pad_x1, interior_y0, interior_x0,
                     inner_y0, inner_y1, inner_x0, inner_x1)
                )
        if not jobs:
            return [], [], []

        # Optional device half of post-processing: the wide-Sobel separation
        # energy (the dense, expensive stage) computed batched on the
        # accelerator for all full-size tiles (WSINSIGHT_DEVICE_RIDGE=1).
        # Edge tiles with irregular shapes keep the CPU path so per-tile
        # min-max normalization is untouched.
        energy_for_job: dict[int, np.ndarray] = {}
        if os.getenv("WSINSIGHT_DEVICE_RIDGE", "0") not in ("0", ""):
            from ..ops.hv_device import separation_energy_batched

            shapes = [(j[1] - j[0], j[3] - j[2]) for j in jobs]
            full = max(set(shapes), key=shapes.count)
            batch_idx = [i for i, s in enumerate(shapes) if s == full]
            chunk = min(8, len(batch_idx))
            for c0 in range(0, len(batch_idx), chunk):
                sel = batch_idx[c0 : c0 + chunk]
                hv_batch = np.stack(
                    [
                        np.ascontiguousarray(
                            self.hv_map[jobs[i][0] : jobs[i][1], jobs[i][2] : jobs[i][3], :]
                        )
                        for i in sel
                    ]
                )
                if len(sel) < chunk:  # pad the tail so one compile serves all
                    hv_batch = np.concatenate(
                        [hv_batch, np.zeros((chunk - len(sel), *hv_batch.shape[1:]), hv_batch.dtype)]
                    )
                for i, e in zip(sel, separation_energy_batched(hv_batch)):
                    energy_for_job[i] = e

        if num_workers is None or num_workers <= 0:
            # Adaptive sizing from CPU/RAM headroom (utils/workers.py), capped
            # at cpu-2 like the reference (tilefuse.py:346-347).
            from ..utils.workers import pick_workers_safe

            num_workers = pick_workers_safe(
                max_workers=max(1, (os.cpu_count() or 1) - 2), min_workers=1
            )

        inst_all: List[np.ndarray] = []
        prob_all: List[np.ndarray] = []
        poly_all: List[np.ndarray] = []
        merge_lock = threading.Lock()
        q: queue.Queue = queue.Queue()
        for ji, j in enumerate(jobs):
            q.put((ji, j))
        for _ in range(num_workers):
            q.put(None)

        def worker() -> None:
            local: list[tuple] = []
            while True:
                item = q.get()
                if item is None:
                    break
                ji, job = item
                (pad_y0, pad_y1, pad_x0, pad_x1, interior_y0, interior_x0,
                 inner_y0, inner_y1, inner_x0, inner_x1) = job
                np_tile = np.ascontiguousarray(self.np_map[pad_y0:pad_y1, pad_x0:pad_x1])
                hv_tile = np.ascontiguousarray(self.hv_map[pad_y0:pad_y1, pad_x0:pad_x1, :])
                tp_tile = np.ascontiguousarray(self.tp_map[pad_y0:pad_y1, pad_x0:pad_x1, :])
                ins, prb, ply = extract_instances(
                    np_tile,
                    hv_tile,
                    tp_tile,
                    interior_y0,
                    interior_x0,
                    (slice(inner_y0, inner_y1), slice(inner_x0, inner_x1)),
                    self.min_object_size,
                    raw_energy=energy_for_job.get(ji),
                )
                if ins:
                    local.append((ins, prb, ply))
                if pbar is not None:
                    pbar.update(1)
            if local:
                with merge_lock:
                    for ins, prb, ply in local:
                        inst_all.extend(ins)
                        prob_all.extend(prb)
                        poly_all.extend(ply)

        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            futs = [ex.submit(worker) for _ in range(num_workers)]
            for f in futs:
                f.result()

        return inst_all, prob_all, poly_all
