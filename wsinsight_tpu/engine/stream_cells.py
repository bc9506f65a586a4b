"""Streaming banded cell inference: prediction maps never leave HBM wholesale.

The classic path (engine/cells.py + engine/stitch.py) transfers every
resized map channel to host canvases and post-processes from there. On the
hosts that run this framework the device->host link is the cell path's
bottleneck, and most of those bytes — the (K-channel) type maps — exist only
to produce K numbers per instance. This engine keeps the maps in
device-resident slide-space BANDS and moves per-pixel data across the link
only where the host genuinely needs it:

  down per band:  NP probability (uint8) + separation energy (f32),
                  per watershed tile window — 2 of the (3+K) channels
  up   per band:  the watershed label image (int32)
  down per band:  per-instance type-prob sums + pixel counts (tiny)

Pipeline per band (bands are one watershed-tile row high, aligned with the
classic finalize tiling so the per-tile math is IDENTICAL to the classic
device-ridge path):

  1. the jitted model step's maps scatter into the band buffers on device
     (lax.fori_loop of dynamic_update_slice; buffers are donated),
  2. when the sorted patch stream passes the band, the wide-Sobel separation
     energy is computed on device per tile window and fetched with the NP
     window,
  3. host threads run the sequential tail (threshold, seeds, watershed,
     contours) exactly as ops/hv_postproc does,
  4. the label image returns to the device, where a segment-sum against the
     still-resident type maps yields per-instance class means.

Falls back to the classic path when the band buffers would not fit in HBM
(see run_streaming_cell_inference).
"""

from __future__ import annotations

import functools as _functools
import logging
from typing import List, NamedTuple

import numpy as np

from ..ops.hv_postproc import (
    extract_instance_labels,
    extract_instance_labels_from_proposal,
)
from ..uri_path import URIPath
from ..utils.workers import governed_workers
from .data import PatchBatchSource

logger = logging.getLogger(__name__)

# One tiling geometry, shared by the stitcher, the HBM admission check, and
# the engine dispatch — these must describe the SAME buffers.
STREAM_TILE = 2048
STREAM_PAD = 64

# Per-band instance cap for the device segment-sum buffer ((cap, K) f32 —
# 24 MB at K=6). ~1M instances per 2048-row band is beyond any real tissue
# density; if it is ever hit, StreamingCapacityError reroutes the slide to
# the classic host-canvas path (engine/cells.py).
_MAX_IDS = 1 << 20


class StreamingCapacityError(RuntimeError):
    """The banded engine's static capacity was exceeded for this slide."""


@_functools.lru_cache(maxsize=1)
def _d2h_mbps() -> float:
    """Effective device->host bandwidth (MB/s), probed once per process.

    Decides the default basin mode: the device marker proposal ships ~2x
    the window bytes of the sparse-energy wire but removes the host's
    integer-basin stage (~17 ms/window). On a fat PCIe link the extra MBs
    are sub-millisecond and device mode wins (host CPU is the contended
    resource on multi-chip hosts); on a thin/tunneled link the bytes
    dominate and the host basin wins. Crossover is ~100 MB/s; the probe
    fetches one 4 MB array (~0.1 s worst case, cached for the process).
    """
    import time

    import jax.numpy as jnp

    try:
        x = jnp.zeros((4 << 20,), jnp.uint8)
        np.asarray(x + 1)  # compile + first-touch outside the timed fetch
        t0 = time.perf_counter()
        np.asarray(x + 2)
        dt = time.perf_counter() - t0
        return (4 << 20) / 1e6 / max(dt, 1e-6)
    except Exception:  # pragma: no cover - probe must never break inference
        return float("inf")


def _bucket(n: int, floor: int, step: int = 4) -> int:
    """Smallest floor * step^j >= n (static-shape bucketing for jit reuse)."""
    cap = floor
    while cap < n:
        cap *= step
    return cap


# -- optional stage profiling (WSINSIGHT_STREAM_PROFILE=1) -------------------
# Cumulative per-stage seconds across all stitcher instances/threads; read
# with stream_profile_report(). The machinery lives in utils.profiling so
# the HV post-processing tail (ops/hv_postproc.py) can report its substages
# into the same ledger without importing the engine package.
from ..utils.profiling import hot_stage as _stage
from ..utils.profiling import hot_stage_report as stream_profile_report


class _PendingBand(NamedTuple):
    """One flushed band awaiting its deferred class-sums D2H (see finalize)."""

    sums: object       # device (id_cap, K) f32, copy_to_host_async in flight
    counts: object     # device (id_cap,) f32
    local_next: int    # 1 + number of band-local instance ids
    records: list      # (local_id, box[4] int64, poly (M,2) int64) per cell


class BandedCellStitcher:
    """Device-banded accumulate + streaming finalize."""

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
        tile_size: int = STREAM_TILE,
        padding_size: int = STREAM_PAD,
        num_flushers: int = 1,
    ):
        import jax
        import jax.numpy as jnp

        self.k = n_classes
        self.w = slide_width
        self.h = slide_height
        self.s = slide_patch_size
        self.halo = slide_halo_size
        self.alpha = model_mpp / slide_mpp
        self.min_object_size = int(min_object_size)
        self.tile = int(tile_size)
        self.pad = int(padding_size)

        s, m = self.s, self.pad
        # buffer rows cover [y0 - pad - s, y0 + band_h + pad + s) so every
        # patch that intersects the banded context fits without clipping;
        # cols cover [-s, W + s) for the same reason.
        self.band_h = self.tile
        self.buf_h = self.band_h + 2 * m + 2 * s
        self.buf_w = self.w + 2 * s

        self._bands: dict[int, tuple] = {}  # band index -> (np, hv, tp) device bufs
        # band index -> [(box, mean, poly), ...]; filled by the flusher thread
        self._band_results: dict[int, list] = {}
        self._jax = jax
        self._jnp = jnp
        # Background flushers overlap the sequential host tail (threshold,
        # seeds, watershed, contours) with the main thread's forward/scatter
        # dispatch — without them every band flush stalls the device. Results
        # stay deterministic regardless of thread count: each band is flushed
        # by exactly one worker into its own _band_results slot and bands are
        # merged in index order at finalize. The bounded queue is the HBM
        # backpressure: at most (num_flushers + queue size) popped band
        # buffers are alive beyond the active set (see streaming_fits).
        import queue
        import threading

        self.num_flushers = max(1, int(num_flushers))
        self._flush_q: "queue.Queue[tuple[int, tuple] | None]" = queue.Queue(
            maxsize=self.num_flushers + 1
        )
        self._flush_err: list[BaseException] = []
        self._closing = False
        self._flushers = [
            threading.Thread(target=self._flush_worker, daemon=True)
            for _ in range(self.num_flushers)
        ]
        for t in self._flushers:
            t.start()
        self._build_kernels()
        self._warm_kernels_async()

    # -- devices kernels ----------------------------------------------------
    def _build_kernels(self):
        import os

        mode = os.getenv("WSINSIGHT_STREAM_ENERGY", "u8")
        if mode not in ("u8", "u16", "f32"):
            mode = "u8"
        self._energy_mode = mode
        # Sparse window transfer: ship the u8 energy only at FOREGROUND
        # raster positions (the host reconstructs positions from the bitmask
        # it gets anyway), cutting window D2H from ~1.125 B/px to
        # ~0.125 + fg_fraction B/px. Bit-identical downstream: the host
        # zeroes background energy regardless (_separation_energy).
        self._sparse_windows = mode == "u8" and os.getenv(
            "WSINSIGHT_STREAM_SPARSE", "1"
        ) not in ("0", "")
        # Device marker proposal (VERDICT r3 #10): the window kernel ships
        # fg + boundary bitmasks and the integer watershed basin instead of
        # raw energy, removing the host's energy/basin stage entirely. Only
        # meaningful with the integer tail (it IS the integer basin) and the
        # sparse transfer (the basin gather needs the fg count cap). The
        # unset default is picked by a one-shot link probe (_d2h_mbps):
        # device mode on fat links, the wire-lean host basin on thin ones.
        basin = os.getenv("WSINSIGHT_STREAM_BASIN", "")
        if basin not in ("host", "device"):
            basin = "device" if _d2h_mbps() >= 250.0 else "host"
        self._basin_device = (
            self._sparse_windows
            and basin == "device"
            and os.getenv("WSINSIGHT_HV_BASIN", "int")
            not in ("f32", "float32", "float")
        )
        (
            self._scatter_fused,
            self._window_stage,
            self._class_sums_sparse,
            self._window_counts,
            self._window_stage_sparse,
            self._class_sums_from_fg,
            self._window_stage_proposal,
        ) = _cached_kernels(self.s, self.k, float(self.alpha), mode)

    def _warm_kernels_async(self) -> None:
        """Compile the flush-path kernels while the forward stream warms up.

        The first band flush pays one jit compile per window-shape/cap
        variant; serially that stalls the whole pipeline for the first slide
        (measured: compile dominates the first pass, WSINSIGHT_STREAM_PROFILE).
        Band 0 cannot flush before the sorted stream passes it — typically
        many forward batches in — so a daemon thread warms the common
        variants (interior + right-edge window shapes at the floor cap, the
        dense fallback, and the per-band window_counts) against a throwaway
        zero buffer in the meantime. Purely a compile-cache warm-up: results
        are discarded, numerics untouched. Disable: WSINSIGHT_STREAM_WARMUP=0.
        """
        import os
        import threading

        if os.getenv("WSINSIGHT_STREAM_WARMUP", "1") in ("0", ""):
            return

        def work():
            try:
                jnp = self._jnp
                np_b = jnp.zeros((self.buf_h, self.buf_w), jnp.bfloat16)
                hv_b = jnp.zeros((self.buf_h, self.buf_w, 2), jnp.bfloat16)
                # Band 0's window geometry, exactly as _flush_band computes it
                # (interior bands share it; the last band row differs only
                # when h % band_h != 0 and compiles on first use as before).
                y0, y1 = 0, min(self.band_h, self.h)
                wy0, wy1 = max(0, y0 - self.pad), min(self.h, y1 + self.pad)
                wh = wy1 - wy0
                sizes = []
                for x0 in range(0, self.w, self.tile):
                    x1 = min(x0 + self.tile, self.w)
                    wx0, wx1 = max(0, x0 - self.pad), min(self.w, x1 + self.pad)
                    sizes.append((wh, wx1 - wx0))
                if self._sparse_windows:
                    starts = np.zeros((len(sizes) + 1, 2), np.int32)
                    self._window_counts(
                        np_b,
                        jnp.asarray(starts),
                        tuple(sizes) + ((y1 - y0, self.w),),
                    )
                for wh_, ww_ in dict.fromkeys(sizes):  # unique, order kept
                    if self._basin_device:
                        self._window_stage_proposal(
                            np_b, hv_b, 0, 0, int(wh_), int(ww_), 4096
                        )
                    elif self._sparse_windows:
                        self._window_stage_sparse(
                            np_b, hv_b, 0, 0, int(wh_), int(ww_), 4096
                        )
                    else:
                        self._window_stage(np_b, hv_b, 0, 0, int(wh_), int(ww_))
            except Exception:  # warm-up must never surface failures
                pass

        threading.Thread(target=work, daemon=True, name="stream-warmup").start()

    # -- banding ------------------------------------------------------------
    def _band_origin(self, b: int) -> int:
        return b * self.band_h

    def _buffer_top(self, b: int) -> int:
        return self._band_origin(b) - self.pad - self.s

    def _bands_for_patch(self, y_w: int) -> list[int]:
        """Bands whose READ region [y0 - pad, y1 + pad) the patch overlaps.

        Restricting assignment to the read region (tile windows + class-sum
        interior) keeps every buffer write offset strictly inside the
        buffer, so dynamic_update_slice never clamps.
        """
        out = []
        lo = max(0, (y_w - self.pad) // self.band_h - 1)
        hi = min(self._n_bands(), (y_w + self.s + self.pad) // self.band_h + 1)
        for b in range(lo, hi):
            y0 = self._band_origin(b)
            y1 = min(y0 + self.band_h, self.h)
            if y_w + self.s > y0 - self.pad and y_w < y1 + self.pad:
                out.append(b)
        return out

    def _n_bands(self) -> int:
        return max(1, -(-self.h // self.band_h))

    def _get_band(self, b: int):
        if b not in self._bands:
            jnp = self._jnp
            self._bands[b] = (
                jnp.zeros((self.buf_h, self.buf_w), jnp.bfloat16),
                jnp.zeros((self.buf_h, self.buf_w, 2), jnp.bfloat16),
                jnp.zeros((self.buf_h, self.buf_w, self.k), jnp.bfloat16),
            )
        return self._bands[b]

    # -- accumulate ---------------------------------------------------------
    def accumulate_batch(self, pred_dict: dict, batch_coords: np.ndarray, n_valid=None):
        np_logits = pred_dict.get("np", pred_dict.get("nuclei_binary_map"))
        hv = pred_dict.get("hv", pred_dict.get("hv_map"))
        tp_logits = pred_dict.get("tp", pred_dict.get("nuclei_type_map"))

        coords = np.asarray(batch_coords, np.int64)[:, :2] + self.halo
        n = len(coords) if n_valid is None else min(int(n_valid), len(coords))

        # group patches by destination band
        groups: dict[int, list[int]] = {}
        max_y = -1
        for i in range(n):
            y_w, x_w = int(coords[i, 1]), int(coords[i, 0])
            max_y = max(max_y, y_w)
            if x_w < -self.s or x_w > self.w or y_w < -self.s or y_w > self.h:
                logger.warning(f"patch at ({x_w},{y_w}) outside the banded range; skipped")
                continue
            for b in self._bands_for_patch(y_w):
                groups.setdefault(b, []).append(i)

        bsz = len(coords)
        for b, idxs in sorted(groups.items()):
            # one packed (3, B) upload per dispatch — rows / cols / valid as
            # separate arrays would each pay their own H2D on a high-latency
            # link
            rcv = np.zeros((3, bsz), np.int32)
            top = self._buffer_top(b)
            for i in idxs:
                rcv[0, i] = int(coords[i, 1]) - top
                rcv[1, i] = int(coords[i, 0]) + self.s
                rcv[2, i] = 1
            bufs = self._get_band(b)
            # One fused dispatch per destination band (softmax/resize + the
            # scatter fori_loop in a single program): on a thin host the jit
            # dispatch itself is the accumulate cost, so fewer, fatter calls
            # win even though a band-boundary batch recomputes the postprocess
            # (device FLOPs are free next to a second dispatch + tunnel RTT).
            with _stage("accumulate.scatter_dispatch"):
                self._bands[b] = self._scatter_fused(
                    *bufs, np_logits, hv, tp_logits, rcv
                )

        # hand bands the sorted stream has fully passed to the flusher thread
        for b in sorted(self._bands):
            if self._buffer_top(b) + self.buf_h <= max_y:
                self._enqueue_flush(b)

    # -- streaming finalize ---------------------------------------------------
    def _window_specs(self, b: int) -> tuple[list, np.ndarray, tuple]:
        """Tile-window geometry for band b: (specs, starts, sizes).

        One spec per tile: (x0, x1, wy0, wx0, r0, c0, wh, ww) — context-
        padded and clipped like the classic path. `starts`/`sizes` append
        the band-INTERIOR row used by the sparse count fetch.
        """
        y0 = self._band_origin(b)
        y1 = min(y0 + self.band_h, self.h)
        top = self._buffer_top(b)
        specs = []
        for x0 in range(0, self.w, self.tile):
            x1 = min(x0 + self.tile, self.w)
            wy0, wy1 = max(0, y0 - self.pad), min(self.h, y1 + self.pad)
            wx0, wx1 = max(0, x0 - self.pad), min(self.w, x1 + self.pad)
            specs.append(
                (x0, x1, wy0, wx0, wy0 - top, wx0 + self.s, wy1 - wy0, wx1 - wx0)
            )
        interior = (y0 - top, self.s, y1 - y0, self.w)
        sizes = tuple((sp[6], sp[7]) for sp in specs) + ((interior[2], interior[3]),)
        starts = np.array(
            [(sp[4], sp[5]) for sp in specs] + [(interior[0], interior[1])], np.int32
        )
        return specs, starts, sizes

    def _enqueue_flush(self, b: int) -> None:
        if self._flush_err:
            raise self._flush_err[0]
        bufs = self._bands.pop(b)
        # Dispatch the band's sparse foreground-count fetch NOW, on the main
        # thread, and start its D2H in the background: by the time a flusher
        # picks the band up the tiny counts array has usually landed, where a
        # synchronous fetch on the flusher thread used to put a full device
        # round-trip (dispatch + compute + D2H) on the tail's critical path
        # (measured 17% of the stage ledger on the tunnel-linked bench host).
        counts_dev = None
        if self._sparse_windows and self._band_origin(b) < self.h:
            _, starts, sizes = self._window_specs(b)
            with _stage("flush.counts_dispatch"):
                try:
                    counts_dev = self._window_counts(
                        bufs[0], self._jnp.asarray(starts), sizes
                    )
                    try:
                        counts_dev.copy_to_host_async()
                    except Exception:
                        pass
                except Exception:  # backend without nonzero/packbits support
                    logger.warning(
                        "sparse window transfer unavailable on this backend; "
                        "falling back to dense windows"
                    )
                    self._sparse_windows = False
                    counts_dev = None
        self._flush_q.put((b, bufs, counts_dev))

    def _flush_worker(self) -> None:
        while True:
            job = self._flush_q.get()
            try:
                if job is None:
                    return
                if not self._closing:  # close() abandons queued work
                    self._flush_band(*job)
            except BaseException as e:  # surfaced on the main thread
                self._flush_err.append(e)
            finally:
                self._flush_q.task_done()

    def _flush_band(self, b: int, bufs: tuple, counts_dev=None) -> None:
        np_b, hv_b, tp_b = bufs
        jnp = self._jnp
        y0 = self._band_origin(b)
        y1 = min(y0 + self.band_h, self.h)
        if y1 <= y0:
            return
        top = self._buffer_top(b)

        band_labels = np.zeros((y1 - y0, self.w), np.int32)
        band_records: list[tuple] = []  # (local_id, box, poly)
        local_next = 1

        # Dispatch tile windows a few ahead of the watershed loop and start
        # their D2H copies asynchronously, so transfers of tiles i+1..i+d
        # stream over the link while the host watersheds tile i (the
        # sequential tail is the band's wall-clock; before this the link
        # idled during it). Depth is bounded so giant-W slides don't pin
        # O(n_tiles) window temps in HBM/host RAM.
        from collections import deque

        specs, _, _ = self._window_specs(b)

        # Sparse mode: one tiny count fetch per band — (n_tiles) padded-window
        # counts decide each window's static gather cap (and let empty
        # windows skip their dispatch AND fetch entirely), and a final
        # band-INTERIOR count sizes the class-sums id upload below. The
        # fetch itself was dispatched at enqueue time on the main thread
        # (_enqueue_flush); here we only resolve it.
        fg_counts = None
        band_fg = None
        if self._sparse_windows and counts_dev is not None:
            with _stage("flush.window_counts"):
                try:
                    fg_counts = np.asarray(counts_dev)
                except Exception:  # backend quirk surfaced at fetch time
                    logger.warning(
                        "sparse window counts fetch failed; "
                        "falling back to dense windows"
                    )
                    self._sparse_windows = False
            # Assembled from the window bitmask interiors as they land: the
            # SAME foreground definition the device recomputes, so the id
            # upload below can ride fg raster order with no index lane.
            if fg_counts is not None:
                band_fg = np.zeros((y1 - y0, self.w), bool)

        def dispatch_window(i):
            x0, x1, wy0, wx0, r0, c0, wh, ww = specs[i]
            with _stage("flush.window_dispatch"):
                staged = None
                if fg_counts is not None and self._sparse_windows:
                    cnt = int(fg_counts[i])
                    if cnt == 0:  # no foreground: skip dispatch AND fetch
                        return (x0, x1, wy0, wx0, "empty", None)
                    cap = _bucket(cnt, 4096, step=2)
                    if self._basin_device:
                        try:
                            staged = (
                                "proposal",
                                (
                                    self._window_stage_proposal(
                                        np_b, hv_b, r0, c0, int(wh), int(ww), cap
                                    ),
                                ),
                            )
                        except Exception:  # backend quirk: host basin instead
                            logger.warning(
                                "device basin proposal failed; "
                                "falling back to the host integer basin"
                            )
                            self._basin_device = False
                    if staged is None:
                        try:
                            staged = (
                                "sparse",
                                (
                                    self._window_stage_sparse(
                                        np_b, hv_b, r0, c0, int(wh), int(ww), cap
                                    ),
                                ),
                            )
                        except Exception:  # backend quirk: revert to dense
                            logger.warning(
                                "sparse window stage failed; falling back to dense"
                            )
                            self._sparse_windows = False
                if staged is None:
                    dense = self._window_stage(np_b, hv_b, r0, c0, int(wh), int(ww))
                    if not isinstance(dense, tuple):
                        dense = (dense,)
                    staged = ("dense", dense)
                for arr in staged[1]:
                    try:
                        arr.copy_to_host_async()
                    except Exception:
                        pass
            return (x0, x1, wy0, wx0, staged[0], staged[1])

        tile_idx = deque(range(len(specs)))
        windows: deque = deque()
        while tile_idx and len(windows) < 4:
            windows.append(dispatch_window(tile_idx.popleft()))

        while windows:
            x0, x1, wy0, wx0, kind, staged = windows.popleft()
            if tile_idx:
                windows.append(dispatch_window(tile_idx.popleft()))
            if kind == "empty":  # no foreground (sparse mode): nothing to do
                continue
            wh = min(self.h, y1 + self.pad) - wy0
            ww = min(self.w, x1 + self.pad) - wx0
            with _stage("flush.window_fetch_d2h"):
                boundary_win = basin_win = None
                if kind == "proposal":
                    # [fg bits | boundary bits | basin lo | basin hi @ fg]:
                    # the device already ran energy -> boundary -> integer
                    # basin; the host only unpacks and scatters.
                    buf = np.asarray(staged[0])
                    pw = (ww + 7) // 8
                    nb = wh * pw
                    np_win = np.unpackbits(buf[:nb].reshape(wh, pw), axis=1)[
                        :, :ww
                    ].astype(bool)
                    boundary_win = np.unpackbits(
                        buf[nb : 2 * nb].reshape(wh, pw), axis=1
                    )[:, :ww].astype(bool)
                    pos = np.flatnonzero(np_win)
                    cap = (buf.size - 2 * nb) // 2
                    lo = buf[2 * nb : 2 * nb + pos.size].astype(np.int32)
                    hi = buf[2 * nb + cap : 2 * nb + cap + pos.size].astype(np.int32)
                    basin_win = np.zeros((wh, ww), np.float32)
                    basin_win.ravel()[pos] = -(lo | (hi << 8)).astype(np.float32)
                elif kind == "sparse":  # sparse: [bitmask rows | fg energy]
                    buf = np.asarray(staged[0])
                    pw = (ww + 7) // 8
                    np_win = np.unpackbits(
                        buf[: wh * pw].reshape(wh, pw), axis=1
                    )[:, :ww].astype(bool)
                    pos = np.flatnonzero(np_win)
                    # u8 fixed-point straight through: the integer tail
                    # (ops/hv_postproc) consumes e*255 natively, so no /255
                    # float conversion pass over a multi-megapixel window.
                    energy_win = np.zeros((wh, ww), np.uint8)
                    energy_win.ravel()[pos] = buf[wh * pw : wh * pw + pos.size]
                elif len(staged) == 1:  # fused u8 plane: [bitmask | energy]
                    fused = np.asarray(staged[0])
                    pack_w = fused.shape[1] - ww
                    energy_win = np.ascontiguousarray(fused[:, pack_w:])
                    np_win = np.unpackbits(fused[:, :pack_w], axis=1)[:, :ww].astype(bool)
                else:
                    np_u8, energy = staged
                    energy_win = np.asarray(energy)
                    if energy_win.dtype == np.uint16:
                        energy_win = energy_win.astype(np.float32) / 65535.0
                    ww = energy_win.shape[1]
                    # bool foreground from the packed device bitmask; the
                    # downstream threshold (>= 0.5) is an identity on bools
                    np_win = np.unpackbits(np.asarray(np_u8), axis=1)[:, :ww].astype(bool)

            interior = (slice(y0 - wy0, y1 - wy0), slice(x0 - wx0, x1 - wx0))
            if band_fg is not None:  # fg raster map for the id-only upload
                band_fg[:, x0:x1] = np_win[interior]
            with _stage("flush.extract_instances"):
                if kind == "proposal":
                    labels, ids, boxes, polys = extract_instance_labels_from_proposal(
                        np_win, boundary_win, basin_win, interior,
                        self.min_object_size,
                    )
                else:
                    labels, ids, boxes, polys = extract_instance_labels(
                        np_win, energy_win, interior, self.min_object_size
                    )
            if ids.size == 0:
                continue
            # relabel tile-locals into band-locals, drop degenerate contours
            with _stage("flush.remap_records"):
                keep = np.array([p is not None for p in polys], bool)
                n_keep = int(keep.sum())
                remap = np.zeros(int(labels.max()) + 1, np.int32)
                new_ids = np.arange(local_next, local_next + n_keep, dtype=np.int64)
                remap[ids[keep]] = new_ids
                boxes_k = boxes[keep].astype(np.int64)
                boxes_k[:, 0] += x0
                boxes_k[:, 1] += y0
                shift = np.array([x0, y0], np.int64)
                for j, i in enumerate(np.flatnonzero(keep)):
                    band_records.append(
                        (int(new_ids[j]), boxes_k[j], polys[i].astype(np.int64) + shift)
                    )
                local_next += n_keep
                band_labels[y0 - y0 : y1 - y0, x0:x1] = remap[labels]

        if not band_records:
            return
        if local_next >= _MAX_IDS:
            raise StreamingCapacityError(
                f"band {b}: {local_next} instances exceeds the device segment cap"
            )

        # Per-instance class means from the device-resident type maps.
        # Only the FOREGROUND pixels go up, bucketed to a static shape; only
        # (id_cap, K) sums come down — versus the full (band_h, W) int32
        # label image and the (_MAX_IDS, K) buffer before.
        with _stage("flush.class_sums"):
            id_cap = min(_bucket(local_next, 1024), _MAX_IDS)
            sums = counts = None
            if band_fg is not None and fg_counts is not None:
                # Id-ONLY upload: the device recomputes the interior fg
                # positions from its own NP band (same u8>=128 definition as
                # the window bitmasks the host assembled band_fg from), so
                # the upload is just the band-local id per fg pixel in
                # raster order — u16 when they fit, 2-4 B/px instead of the
                # 8 B/px packed (index, id) lanes. Unlabeled fg pixels carry
                # id 0, whose sums/counts row is discarded like background.
                n_fg = int(fg_counts[-1])
                fg_ids = band_labels[band_fg]
                if fg_ids.size != n_fg:  # definitions drifted: fail loudly
                    raise RuntimeError(
                        f"band {b}: host fg {fg_ids.size} != device fg {n_fg}"
                    )
                cap = _bucket(max(n_fg, 1), 4096, step=2)
                dtype = np.uint16 if local_next <= 0xFFFF else np.int32
                ids_up = np.zeros((cap,), dtype)
                ids_up[:n_fg] = fg_ids.astype(dtype)
                try:
                    sums, counts = self._class_sums_from_fg(
                        tp_b,
                        np_b,
                        jnp.asarray(ids_up),
                        (y0 - top, self.s, y1 - y0, self.w),
                        id_cap,
                    )
                except Exception:  # backend quirk: packed-upload fallback
                    logger.warning(
                        "id-only class sums failed; falling back to packed upload"
                    )
                    self._sparse_windows = False
            if sums is None:
                fg_y, fg_x = np.nonzero(band_labels)
                fg_ids = band_labels[fg_y, fg_x].astype(np.int32)
                n_fg = fg_y.size
                cap = _bucket(n_fg, 4096)
                # Packed upload: ONE (2, cap) i32 array — row 0 the linear
                # buffer index, row 1 the band-local id (8 B/px, one H2D).
                # Padding needs no weight lane — it points at id 0 / pixel
                # (0,0), and row 0 of sums/counts is discarded below, exactly
                # like real background pixels. i32 holds the linear index:
                # buf_h * buf_w stays well under 2^31 for any admissible band
                # (streaming_fits caps it).
                pix = np.zeros((2, cap), np.int32)
                pix[0, :n_fg] = (fg_y + (y0 - top)).astype(np.int64) * self.buf_w + (
                    fg_x + self.s
                )
                pix[1, :n_fg] = fg_ids
                sums, counts = self._class_sums_sparse(tp_b, jnp.asarray(pix), id_cap)
            # Do NOT fetch here: a synchronous np.array() per band puts a
            # full link round-trip on the flusher's critical path. Start the
            # D2H in the background and defer assembly to finalize(), when
            # every band's transfer has long since landed.
            for arr in (sums, counts):
                try:
                    arr.copy_to_host_async()
                except Exception:
                    pass
        self._band_results.setdefault(b, []).append(
            _PendingBand(sums, counts, local_next, band_records)
        )

    @staticmethod
    def _assemble_band(pending: "_PendingBand"):
        """Resolve one band's deferred class sums into per-cell rows."""
        sums = np.array(pending.sums)[1 : pending.local_next]
        counts = np.array(pending.counts)[1 : pending.local_next]
        counts[counts == 0] = 1.0
        means = (sums / counts[:, None]).astype(np.float32)
        for local_id, box, poly in pending.records:
            yield (
                np.array([box[0], box[1], box[2], box[3]], np.int32).reshape(1, -1),
                means[local_id - 1].reshape(1, -1),
                poly.astype(np.int32),
            )

    def finalize(self) -> tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
        for b in sorted(self._bands):
            self._enqueue_flush(b)
        self._flush_q.join()
        if self._flush_err:
            raise self._flush_err[0]
        results = [
            r
            for b in sorted(self._band_results)
            for pending in self._band_results[b]
            for r in self._assemble_band(pending)
        ]
        if not results:
            return [], [], []
        inst, probs, polys = zip(*results)
        return list(inst), list(probs), list(polys)

    def close(self) -> None:
        self._closing = True  # workers drop queued jobs instead of flushing
        self._bands.clear()
        for t in self._flushers:
            if t.is_alive():
                self._flush_q.put(None)
        for t in self._flushers:
            t.join(timeout=30)



@_functools.lru_cache(maxsize=16)
def _cached_kernels(s: int, k: int, alpha: float, energy_mode: str):
    """Jitted device kernels, cached across stitcher instances.

    One stitcher is built per slide (and per bench pass); without this cache
    every slide would retrace + recompile the scatter/window/sums programs
    because jax.jit keys on function identity.
    """
    import jax
    import jax.numpy as jnp

    from .stitch import make_map_postprocess

    core = make_map_postprocess(s, alpha)

    def postprocess(np_logits, hv, tp_logits):
        np_res, hv_res, tp_res = core(np_logits, hv, tp_logits)
        # bands store bf16: half the HBM of f32 at ~1e-3 relative error
        return (
            np_res.astype(jnp.bfloat16),
            hv_res.astype(jnp.bfloat16),
            tp_res.astype(jnp.bfloat16),
        )

    def scatter(np_b, hv_b, tp_b, np_p, hv_p, tp_p, rcv):
        rows, cols, valid = rcv[0], rcv[1], rcv[2].astype(bool)

        def body(i, bufs):
            nb, hb, tb = bufs
            r, c = rows[i], cols[i]
            cur_n = jax.lax.dynamic_slice(nb, (r, c), (s, s))
            cur_h = jax.lax.dynamic_slice(hb, (r, c, 0), (s, s, 2))
            cur_t = jax.lax.dynamic_slice(tb, (r, c, 0), (s, s, k))
            nb = jax.lax.dynamic_update_slice(
                nb, jnp.where(valid[i], np_p[i], cur_n), (r, c)
            )
            hb = jax.lax.dynamic_update_slice(
                hb, jnp.where(valid[i], hv_p[i], cur_h), (r, c, 0)
            )
            tb = jax.lax.dynamic_update_slice(
                tb, jnp.where(valid[i], tp_p[i], cur_t), (r, c, 0)
            )
            return nb, hb, tb

        return jax.lax.fori_loop(0, rows.shape[0], body, (np_b, hv_b, tp_b))

    def scatter_fused(np_b, hv_b, tp_b, np_logits, hv, tp_logits, rcv):
        """postprocess + scatter in ONE program: one dispatch per batch-band."""
        return scatter(np_b, hv_b, tp_b, *postprocess(np_logits, hv, tp_logits), rcv)

    # per-window energy + NP fetch (window shape is static per jit cache);
    # the energy math is the shared numerically-pinned core so the
    # streaming and classic device-ridge paths cannot drift apart.
    # Energy lives in [0, 1] by construction (hv_device.make_energy_core:
    # max of 1 - unit(.)), so it crosses the link as uint8 fixed-point by
    # default — order-preserving to 1/255, and the host re-smooths it with a
    # float Gaussian before the watershed so the quantisation plateaus do
    # not survive into the basin. WSINSIGHT_STREAM_ENERGY=u16/f32 restores
    # the finer encodings (the downstream seed threshold 0.4 = 102/255 sits
    # exactly on a u8 level, so the seed carve is bit-stable across modes).
    from ..ops.hv_device import make_energy_core

    energy_core = make_energy_core(21)

    def window_stage(np_b, hv_b, r0, c0, wh, ww):
        np_win = jax.lax.dynamic_slice(np_b, (r0, c0), (wh, ww)).astype(jnp.float32)
        hv_win = jax.lax.dynamic_slice(hv_b, (r0, c0, 0), (wh, ww, 2)).astype(
            jnp.float32
        )
        energy = energy_core(hv_win)
        if energy_mode == "u8":
            energy = jnp.round(jnp.clip(energy, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        elif energy_mode == "u16":
            energy = jnp.round(jnp.clip(energy, 0.0, 1.0) * 65535.0).astype(
                jnp.uint16
            )
        # The host only ever THRESHOLDS the NP probability (at 0.5, i.e.
        # u8 >= 128 after the shared round-to-u8 quantisation — the same
        # comparison the classic uint8-transfer path makes), so ship a
        # packed bitmask: 1 bit/px instead of 1 byte/px. With u8 energy
        # that cuts window D2H from 2 B/px to 1.125 B/px.
        np_u8 = jnp.round(np_win * 255.0).astype(jnp.uint8)
        np_bits = jnp.packbits(np_u8 >= 128, axis=1)
        if energy_mode == "u8":
            # One D2H buffer per window instead of two: over a tunneled or
            # otherwise high-latency link each fetch pays a round trip, and
            # the flusher fetches every window — halve the count by packing
            # [bitmask | energy] side by side in the same u8 plane.
            return jnp.concatenate([np_bits, energy], axis=1)
        return np_bits, energy

    # Sparse per-instance class sums: the host sends only FOREGROUND
    # pixels, packed as (u32 linear buffer index, i32 local id) — 8 B/px —
    # instead of the full band label image; nuclei cover a small fraction
    # of a band, so the uplink bytes drop by ~the background ratio.
    # Padding entries point at id 0 (background), whose sums/counts row the
    # caller discards, so no weight lane is needed. id_cap and the pixel
    # count are static (bucketed by _bucket), so a handful of compiled
    # variants cover every band.
    def class_sums_sparse(tp_b, pix, id_cap):
        idx_, ids_ = pix[0], pix[1]
        tp_flat = tp_b.reshape(-1, k)
        tp_vals = tp_flat[idx_].astype(jnp.float32)  # (N, K) gather
        sums = jnp.zeros((id_cap, k), jnp.float32).at[ids_].add(tp_vals)
        counts = jnp.zeros((id_cap,), jnp.float32).at[ids_].add(1.0)
        return sums, counts

    def _fg(np_win_bf16):
        # The shared foreground definition: u8-quantised NP prob >= 128,
        # exactly the comparison the host makes after unpacking the bitmask.
        np_u8 = jnp.round(np_win_bf16.astype(jnp.float32) * 255.0).astype(jnp.uint8)
        return np_u8 >= 128

    def _compact_indices(flat_mask, cap):
        # Raster-order indices of True entries, zero-padded to the static
        # cap — jnp.nonzero(size=cap) semantics via cumsum + drop-scatter,
        # which the TPU backend runs ~1.4x faster than its nonzero lowering.
        pos = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
        src = jnp.arange(flat_mask.shape[0], dtype=jnp.int32)
        tgt = jnp.where(flat_mask, pos, cap)
        return jnp.zeros((cap,), jnp.int32).at[tgt].set(src, mode="drop")

    def window_counts(np_b, starts, sizes):
        """Per-window foreground pixel counts ((n,) i32, one tiny D2H)."""
        outs = []
        for i, (wh, ww) in enumerate(sizes):
            win = jax.lax.dynamic_slice(np_b, (starts[i, 0], starts[i, 1]), (wh, ww))
            outs.append(jnp.sum(_fg(win), dtype=jnp.int32))
        return jnp.stack(outs)

    def window_stage_sparse(np_b, hv_b, r0, c0, wh, ww, cap):
        """[packed fg bitmask rows | u8 energy at fg raster positions].

        The host reconstructs the fg positions from the bitmask it needs
        anyway, so only ~(0.125 + fg_fraction) B/px cross the link instead
        of the dense 1.125 B/px — identical downstream numbers because the
        host zeroes background energy regardless (_separation_energy).
        """
        np_win = jax.lax.dynamic_slice(np_b, (r0, c0), (wh, ww))
        hv_win = jax.lax.dynamic_slice(hv_b, (r0, c0, 0), (wh, ww, 2)).astype(
            jnp.float32
        )
        energy = energy_core(hv_win)
        e_u8 = jnp.round(jnp.clip(energy, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        fg = _fg(np_win)
        np_bits = jnp.packbits(fg, axis=1)
        idx = _compact_indices(fg.reshape(-1), cap)
        vals = e_u8.reshape(-1)[idx]
        return jnp.concatenate([np_bits.reshape(-1), vals])

    def window_stage_proposal(np_b, hv_b, r0, c0, wh, ww, cap):
        """[fg bits | boundary bits | basin u16 lo | basin u16 hi @ fg].

        The full device-side marker proposal (VERDICT r3 #10): threshold
        foreground, boundary mask (e_u8 >= 102 = the 0.4 cutoff) and the
        integer watershed basin, all computed on the accelerator. Every
        value is an exact integer <= 4080 (exact in f32), so the host tail
        — reduced to component filtering, seed carving and the watershed —
        is BIT-IDENTICAL to the host integer path
        (ops/hv_postproc._integer_basin). Wire: 0.25 B/px of bitmasks plus
        2 B per foreground pixel.
        """
        from ..ops.hv_device import make_blur3_core

        blur3 = make_blur3_core()
        np_win = jax.lax.dynamic_slice(np_b, (r0, c0), (wh, ww))
        hv_win = jax.lax.dynamic_slice(hv_b, (r0, c0, 0), (wh, ww, 2)).astype(
            jnp.float32
        )
        energy = energy_core(hv_win)
        fg = _fg(np_win)
        e_u8 = jnp.where(
            fg, jnp.round(jnp.clip(energy, 0.0, 1.0) * 255.0), 0.0
        )  # f32 integers 0..255, background zeroed (the canonical u8 plane)
        boundary = e_u8 >= 102.0
        blur = blur3(jnp.where(fg, 255.0 - e_u8, 0.0))  # integers 0..4080
        idx = _compact_indices(fg.reshape(-1), cap)
        vals = blur.reshape(-1)[idx].astype(jnp.int32)
        lo = (vals & 255).astype(jnp.uint8)
        hi = (vals >> 8).astype(jnp.uint8)
        fg_bits = jnp.packbits(fg, axis=1)
        b_bits = jnp.packbits(boundary, axis=1)
        return jnp.concatenate([fg_bits.reshape(-1), b_bits.reshape(-1), lo, hi])

    def class_sums_from_fg(tp_b, np_b, ids, interior, id_cap):
        """Per-instance class sums with an id-ONLY upload.

        `ids` carries the band-local instance id per interior-fg pixel in
        raster order (u16 or i32, zero-padded to its static cap); the fg
        positions themselves are recomputed here from the NP band with the
        SAME u8>=128 definition the host's bitmask used, so no index lane
        crosses the link. Padded entries and unlabeled fg pixels carry id 0,
        whose sums/counts row the caller discards like background.
        """
        off_r, off_c, ih, iw = interior
        fg = _fg(jax.lax.dynamic_slice(np_b, (off_r, off_c), (ih, iw)))
        cap = ids.shape[0]
        idx = _compact_indices(fg.reshape(-1), cap)
        rows = idx // iw + off_r
        cols = idx % iw + off_c
        tp_vals = tp_b[rows, cols, :].astype(jnp.float32)  # (cap, K) gather
        ids32 = ids.astype(jnp.int32)
        sums = jnp.zeros((id_cap, k), jnp.float32).at[ids32].add(tp_vals)
        counts = jnp.zeros((id_cap,), jnp.float32).at[ids32].add(1.0)
        return sums, counts

    return (
        jax.jit(scatter_fused, donate_argnums=(0, 1, 2)),
        jax.jit(window_stage, static_argnums=(4, 5)),
        jax.jit(class_sums_sparse, static_argnums=(2,)),
        jax.jit(window_counts, static_argnums=(2,)),
        jax.jit(window_stage_sparse, static_argnums=(4, 5, 6)),
        jax.jit(class_sums_from_fg, static_argnums=(3, 4)),
        jax.jit(window_stage_proposal, static_argnums=(4, 5, 6)),
    )

def run_streaming_cell_inference(
    engine,
    *,
    wsi_path: URIPath,
    patch_path: URIPath,
    use_hdf5_images: bool,
    slide_width: int,
    slide_height: int,
    mpp: float,
    halo_size_px: int,
    batch_size: int,
    num_workers: int,
    min_object_size: int = 20,
    stitch_workers: int | None = None,
) -> tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
    """Banded streaming counterpart of engine.cells.run_cell_inference."""
    import tqdm

    cfg = engine.config
    model_output_size_px = cfg.patch_size_pixels - 2 * halo_size_px
    slide_patch_size = int(round(model_output_size_px * cfg.spacing_um_px / mpp))
    slide_halo_size = int(round(halo_size_px * cfg.spacing_um_px / mpp))

    stitcher = BandedCellStitcher(
        n_classes=cfg.num_classes,
        slide_width=slide_width,
        slide_height=slide_height,
        slide_patch_size=slide_patch_size,
        slide_halo_size=slide_halo_size,
        slide_mpp=mpp,
        model_mpp=cfg.spacing_um_px,
        min_object_size=min_object_size,
        num_flushers=pick_num_flushers(stitch_workers),
    )
    src = None
    try:
        from .cells import _cell_wire

        src = PatchBatchSource(
            wsi_path=wsi_path,
            patch_path=patch_path,
            use_hdf5_images=use_hdf5_images,
            batch_size=engine.pad_batch(batch_size),
            num_threads=governed_workers(num_workers or 4),
            order_by_y=True,  # banding needs the stream sorted by slide row
            wire=_cell_wire(),
            decode_scale=1,  # cell models take full-res patches (no resize)
        )
        with tqdm.tqdm(
            total=src.num_batches, desc="Inference", position=1, leave=False
        ) as bar:
            for batch in src:
                pred = engine.run_batch(batch.images)
                pred = {k: v for k, v in pred.items() if k != "tissue_types"}
                stitcher.accumulate_batch(pred, batch.coords, n_valid=batch.n_valid)
                bar.update(1)
        inst, probs, polys = stitcher.finalize()
    finally:
        # On any failure (including StreamingCapacityError rerouting to the
        # classic path) the producer thread must stop and the flushers must
        # exit so the HBM band buffers are actually released.
        if src is not None:
            src.close()
        stitcher.close()

    if not inst:
        return np.zeros((0, 4), np.int32), np.zeros((0, cfg.num_classes), np.float32), []
    return np.concatenate(inst, axis=0), np.concatenate(probs, axis=0), polys


def pick_num_flushers(stitch_workers: int | None) -> int:
    """Flusher thread count: the caller's stitch-worker knob, bounded.

    More flushers pin more popped band buffers in HBM (streaming_fits
    accounts for this), so the cap stays small; on a many-core host the
    watershed tail parallelises across bands.
    """
    import os

    if stitch_workers is None:
        return min(4, max(1, (os.cpu_count() or 1) // 2))
    return max(1, min(int(stitch_workers), 8))


def streaming_fits(
    slide_width: int, n_classes: int, slide_patch_size: int,
    tile_size: int = STREAM_TILE, padding: int = STREAM_PAD,
    budget_bytes: int | None = None,
    num_flushers: int = 1,
) -> bool:
    """Whether the engine's peak band working set fits the HBM budget.

    Peak device-resident band buffers = ~3 active bands (the write window of
    the sorted stream) + the flush queue (num_flushers + 1) + num_flushers
    in-flight flushes, all in bf16 channels.
    """
    import os

    if budget_bytes is None:
        budget_bytes = int(os.getenv("WSINSIGHT_STREAM_HBM_BYTES", 6 * (1 << 30)))
    buf_h = tile_size + 2 * padding + 2 * slide_patch_size
    buf_w = slide_width + 2 * slide_patch_size
    per_band = buf_h * buf_w * (3 + n_classes) * 2
    peak_bands = 3 + (num_flushers + 1) + num_flushers
    return peak_bands * per_band <= budget_bytes
