"""Native (C++) runtime components, loaded via ctypes.

Currently: priority-flood watershed + small-label removal for the cell
stitcher (the sequential instance-extraction hot loop the reference delegates
to scikit-image's Cython, reference: wsinsight/modellib/tilefuse.py:102).
The library is compiled on first use if g++ is available; a pure-Python
fallback (ops/watershed.py) covers environments without a toolchain.
"""

from __future__ import annotations

import ctypes
import functools as _ftools
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libwsinsight_native.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        out = subprocess.run(
            ["make", "-C", str(_HERE)], capture_output=True, timeout=120
        )
        if out.returncode != 0:
            logger.debug(f"native build failed: {out.stderr.decode()[:500]}")
            return False
        return _LIB_PATH.exists()
    except Exception as err:
        logger.debug(f"native build error: {err}")
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.watershed_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.watershed_f32.restype = None
            lib.remove_small_labels.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.remove_small_labels.restype = None
            lib.lzw_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            lib.lzw_decode.restype = ctypes.c_int64
            lib.leiden_cluster.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.leiden_cluster.restype = ctypes.c_int64
            lib.wsi_open.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            lib.wsi_open.restype = ctypes.c_int64
            lib.wsi_read_region.argtypes = [
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.wsi_read_region.restype = ctypes.c_int32
            lib.wsi_read_patches.argtypes = [
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.wsi_read_patches.restype = ctypes.c_int32
            lib.wsi_close.argtypes = [ctypes.c_int64]
            lib.wsi_close.restype = None
            lib.pil_resize_u8_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.pil_resize_u8_batch.restype = ctypes.c_int32
            if hasattr(lib, "rgb_to_yuv420_batch"):  # older cached .so lacks it
                lib.rgb_to_yuv420_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_uint8),
                ]
                lib.rgb_to_yuv420_batch.restype = ctypes.c_int32
            _lib = lib
        except Exception as err:
            logger.debug(f"native load error: {err}")
            _lib = None
        return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def lzw_decode_native(data: bytes, expected_size: int) -> bytes | None:
    """Decode TIFF LZW via the native library; None if unavailable/corrupt."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    out = np.empty(expected_size, np.uint8)
    n = lib.lzw_decode(
        _ptr(src, ctypes.c_uint8), len(src), _ptr(out, ctypes.c_uint8), expected_size
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def watershed_native(
    image: np.ndarray, markers: np.ndarray, mask: np.ndarray | None
) -> np.ndarray | None:
    """Run the native watershed; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = image.shape
    image = np.ascontiguousarray(image, np.float32)
    markers = np.ascontiguousarray(markers, np.int32)
    if mask is None:
        mask_arr = np.ones((h, w), np.uint8)
    else:
        mask_arr = np.ascontiguousarray(mask, np.uint8)
    out = np.zeros((h, w), np.int32)
    lib.watershed_f32(
        _ptr(image, ctypes.c_float),
        _ptr(markers, ctypes.c_int32),
        _ptr(mask_arr, ctypes.c_uint8),
        h,
        w,
        _ptr(out, ctypes.c_int32),
    )
    return out


@_ftools.lru_cache(maxsize=64)
def _resize_coeffs_i32(in_size: int, out_size: int) -> np.ndarray:
    """PIL fixed-point (out, in) int32 coefficient matrix (2^22 scale).

    Derived from the SAME cached float table the device path uses
    (ops/preprocess._pil_bilinear_weights), so the native, device, and PIL
    resizes are bit-identical by construction.
    """
    from ..ops.preprocess import _pil_bilinear_weights

    w = _pil_bilinear_weights(in_size, out_size)
    return np.ascontiguousarray(
        np.round(w.astype(np.float64) * (1 << 22)).astype(np.int32)
    )


def pil_resize_native(
    src: np.ndarray, out_hw: tuple[int, int], out: np.ndarray | None = None
) -> np.ndarray | None:
    """PIL-bit-exact bilinear resize of a uint8 batch via the native library.

    src: (n, h, w, c) or (h, w, c) uint8. Returns the resized batch in the
    input's rank, or None when the library is unavailable. The C call
    releases the GIL, so decode threads scale across a batch.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "pil_resize_u8_batch"):
        return None
    squeeze = src.ndim == 3
    batch = src[None] if squeeze else src
    if batch.ndim != 4 or batch.dtype != np.uint8:
        return None
    n, h, w, c = batch.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if c > 8:
        return None
    kh = _resize_coeffs_i32(h, oh)
    kw = _resize_coeffs_i32(w, ow)
    batch = np.ascontiguousarray(batch)
    if out is None:
        out = np.empty((n, oh, ow, c), np.uint8)
    rc = lib.pil_resize_u8_batch(
        _ptr(batch, ctypes.c_uint8),
        n,
        h,
        w,
        c,
        _ptr(kw, ctypes.c_int32),
        ow,
        _ptr(kh, ctypes.c_int32),
        oh,
        _ptr(out, ctypes.c_uint8),
    )
    if rc != 0:
        return None
    return out[0] if squeeze else out


def rgb_to_yuv420(
    src: np.ndarray, out: np.ndarray | None = None
) -> np.ndarray | None:
    """Pack a uint8 RGB batch as planar YUV 4:2:0 (the thin-link wire format).

    src: (n, h, w, 3) or (h, w, 3) uint8 with h, w even. Returns
    (n, h*3/2, w) / (h*3/2, w) uint8 — Y plane rows [0, h), then chroma rows
    holding Cb | Cr side by side at (h/2, w/2) each. BT.601 full range.
    Device inverse: ops/preprocess.make_yuv420_to_rgb. Prefers the GIL-free
    native kernel; falls back to vectorized numpy (same fixed-point math),
    so the wire format never silently changes with library availability.
    Returns None only for invalid geometry (odd h/w, wrong dtype/rank).
    """
    squeeze = src.ndim == 3
    batch = src[None] if squeeze else src
    if batch.ndim != 4 or batch.dtype != np.uint8 or batch.shape[-1] != 3:
        return None
    n, h, w, _ = batch.shape
    if h % 2 or w % 2:
        return None
    if out is None:
        out = np.empty((n, h * 3 // 2, w), np.uint8)
    lib = get_lib()
    if lib is not None and hasattr(lib, "rgb_to_yuv420_batch"):
        batch_c = np.ascontiguousarray(batch)
        rc = lib.rgb_to_yuv420_batch(
            _ptr(batch_c, ctypes.c_uint8), n, h, w, _ptr(out, ctypes.c_uint8)
        )
        if rc == 0:
            return out[0] if squeeze else out
    # numpy fallback: identical fixed-point rounding to the C kernel
    r = batch[..., 0].astype(np.int64)
    g = batch[..., 1].astype(np.int64)
    b = batch[..., 2].astype(np.int64)
    half = 1 << 15
    out[:, :h, :] = ((19595 * r + 38470 * g + 7471 * b + half) >> 16).astype(np.uint8)
    cb = -11056 * r - 21712 * g + 32768 * b
    cr = 32768 * r - 27440 * g - 5328 * b
    for plane, col0 in ((cb, 0), (cr, w // 2)):
        s = (
            plane[:, 0::2, 0::2]
            + plane[:, 0::2, 1::2]
            + plane[:, 1::2, 0::2]
            + plane[:, 1::2, 1::2]
        )
        q = s + 2  # C++ /4 truncates toward zero; emulate for bit-parity
        vals = (np.sign(q) * (np.abs(q) // 4) + (128 << 16) + half) >> 16
        out[:, h:, col0 : col0 + w // 2] = np.clip(vals, 0, 255).astype(np.uint8)
    return out[0] if squeeze else out


class NativeRegionReader:
    """GIL-free tile-decode + patch-assembly engine over one TIFF page.

    Owns its own fd (pread), libjpeg-turbo/zlib/LZW decode, an in-C++ decoded
    tile LRU, and the patch blitting — so one ctypes call decodes a whole
    batch with the GIL released. This replaces the per-tile Python round trip
    (cv2.imdecode + numpy assembly) that made patch decode the pipeline
    bottleneck (the reference's equivalent hot loop: modellib/data.py:270-281).

    Returns None from the factory when the page layout is unsupported; the
    caller must fall back to the Python decode path.
    """

    def __init__(self, handle: int, lib: ctypes.CDLL):
        self._handle = handle
        self._lib = lib

    @classmethod
    def open(
        cls, path: str, page, cache_mb: int = 256, scale_denom: int = 1
    ) -> "NativeRegionReader | None":
        """Create a reader for a TiffPage; None if unsupported/unavailable.

        scale_denom=2 opens a JPEG page in DCT-scaled half-resolution mode:
        every read addresses the page in HALVED pixel coordinates and decode
        runs ~3x faster (4x4 IDCT, quarter the pixels) — the fast-input
        path (WSINSIGHT_DECODE_SCALE). Non-JPEG pages return None.
        """
        lib = get_lib()
        if lib is None or not hasattr(lib, "wsi_open"):
            return None
        if getattr(page, "bits", 8) != 8 or page.offsets is None:
            return None
        offsets = np.ascontiguousarray(np.asarray(page.offsets, np.uint64))
        counts = np.ascontiguousarray(np.asarray(page.bytecounts, np.uint64))
        tables = page.jpeg_tables or b""
        tables_arr = np.frombuffer(tables, np.uint8) if tables else np.zeros(1, np.uint8)
        if page.is_tiled:
            tile_w, tile_h = int(page.tile_width), int(page.tile_height)
        else:
            tile_w, tile_h = int(page.width), int(page.rows_per_strip)
        handle = lib.wsi_open(
            str(path).encode(),
            len(offsets),
            _ptr(offsets, ctypes.c_uint64),
            _ptr(counts, ctypes.c_uint64),
            int(page.compression),
            int(getattr(page, "predictor", 1)),
            int(getattr(page, "samples", 3)),
            1 if page.is_tiled else 0,
            tile_w,
            tile_h,
            int(page.width),
            int(page.height),
            _ptr(tables_arr, ctypes.c_uint8),
            len(tables),
            int(cache_mb),
            int(scale_denom),
        )
        if handle < 0:
            return None
        return cls(handle, lib)

    def read_region(self, location: tuple[int, int], size: tuple[int, int]) -> np.ndarray | None:
        """(h, w, 3) uint8 region at page-level coords; None on decode error."""
        w, h = int(size[0]), int(size[1])
        out = np.empty((h, w, 3), np.uint8)
        rc = self._lib.wsi_read_region(
            self._handle, int(location[0]), int(location[1]), w, h,
            _ptr(out, ctypes.c_uint8),
        )
        return out if rc == 0 else None

    def read_patches(
        self, coords: np.ndarray, size: tuple[int, int], out: np.ndarray | None = None
    ) -> np.ndarray | None:
        """Batch decode: (n, 2) [x, y] coords -> (n, h, w, 3) uint8; None on error.

        `out` (contiguous uint8, n*h*w*3 bytes) lets callers decode into a
        slice of a larger buffer — used to fan one batch across threads.
        """
        w, h = int(size[0]), int(size[1])
        xy = np.ascontiguousarray(np.asarray(coords, np.int64).reshape(-1, 2))
        if out is None:
            out = np.empty((len(xy), h, w, 3), np.uint8)
        rc = self._lib.wsi_read_patches(
            self._handle, len(xy), _ptr(xy, ctypes.c_int64), w, h,
            _ptr(out, ctypes.c_uint8),
        )
        return out if rc == 0 else None

    def close(self) -> None:
        if self._handle >= 0:
            self._lib.wsi_close(self._handle)
            self._handle = -1

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def leiden_native(
    edges: np.ndarray, n_nodes: int, resolution: float, seed: int
) -> tuple[np.ndarray, float] | None:
    """Leiden clustering via the native library; None when unavailable.

    edges: (E, 2) int array of undirected edges (duplicates/self-loops OK).
    Returns (labels int32[n_nodes], gamma=1 modularity). The native call
    releases the GIL, so sweeps can fan out across threads.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "leiden_cluster"):
        return None
    edges = np.ascontiguousarray(np.asarray(edges, np.int64).reshape(-1, 2))
    src = np.ascontiguousarray(edges[:, 0])
    dst = np.ascontiguousarray(edges[:, 1])
    labels = np.zeros(int(n_nodes), np.int32)
    mod = ctypes.c_double(0.0)
    n = lib.leiden_cluster(
        _ptr(src, ctypes.c_int64),
        _ptr(dst, ctypes.c_int64),
        len(edges),
        int(n_nodes),
        float(resolution),
        int(seed) & 0xFFFFFFFFFFFFFFFF,
        _ptr(labels, ctypes.c_int32),
        ctypes.byref(mod),
    )
    if n < 0:
        return None
    return labels, float(mod.value)
