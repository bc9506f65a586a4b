"""Host-side patch pipeline: threaded decode feeding padded uint8 batches.

Replaces the reference's torch Dataset + DataLoader worker processes (reference:
wsinsight/modellib/data.py:149-314, run_inference.py:288-299). Differences by
design:

* patches are decoded by a thread pool into pinned numpy batches (the in-house
  TIFF reader releases the GIL inside zlib/cv2, so threads scale without the
  spawn/pickle overhead of worker processes),
* transform math (resize/normalize/stain) moves to the TPU (ops/preprocess.py),
  so workers only decode uint8 pixels,
* the final batch is padded to full batch size with a validity count so the
  jitted forward sees a single static shape.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator

import h5py
import numpy as np
import numpy.typing as npt

from ..uri_path import URIPath
from ..wsi import get_wsi_cls


def read_patch_coords(path) -> tuple[npt.NDArray[np.int_], npt.NDArray | None, int]:
    """Read /coords + attrs -> ((N,4) [minx,miny,w,h], tile_dim, patch_size).

    Mirrors the reference loader incl. the patch_level==0 assertion
    (reference: modellib/data.py:22-63).
    """
    with h5py.File(path, mode="r") as f:
        coords = f["/coords"][()]
        meta = f["/coords"].attrs
        if "patch_level" not in meta.keys():
            raise KeyError(
                "Could not find required key 'patch_level' in hdf5 of patch coordinates."
            )
        if meta["patch_level"] != 0:
            raise NotImplementedError(
                f"This script is designed for patch_level=0 but got {meta['patch_level']}"
            )
        if coords.ndim != 2 or coords.shape[1] != 2:
            raise ValueError(f"expected (N, 2) coords, got {coords.shape}")
        if "patch_size" not in meta.keys():
            raise KeyError("expected key 'patch_size' in attrs of coords dataset")
        patch_size = int(meta["patch_size"])
        wh = np.full_like(coords, patch_size)
        coords = np.concatenate((coords, wh), axis=1)
        tile_dim = meta["tile_dim"] if "tile_dim" in meta.keys() else None
    return coords, tile_dim, patch_size


@dataclass
class Batch:
    images: npt.NDArray[np.uint8]  # (B, P, P, 3), zero-padded past n_valid
    coords: npt.NDArray[np.int64]  # (B, 4)
    n_valid: int


class PatchBatchSource:
    """Iterate padded uint8 batches for one slide's patch set."""

    def __init__(
        self,
        wsi_path: URIPath | None,
        patch_path: URIPath,
        use_hdf5_images: bool,
        batch_size: int = 32,
        num_threads: int = 8,
        prefetch: int = 2,
        shuffle_seed: int | None = None,
        order_by_y: bool = False,
        host_resize: tuple[int, int] | None = None,
        wire: str | None = None,
        decode_scale: int | None = None,
    ):
        self.patch_path = patch_path
        self.wsi_path = wsi_path
        self.batch_size = batch_size
        self.num_threads = max(1, num_threads)
        self.prefetch = max(1, prefetch)

        self.coords, self.tile_dim, self.patch_size = read_patch_coords(
            patch_path.materialize() if isinstance(patch_path, URIPath) else patch_path
        )
        if self.coords.size == 0:
            raise ValueError(f"No patches were found in {patch_path}")

        self._order = np.arange(len(self.coords))
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(self._order)
        elif order_by_y:
            # banded/streaming consumers need patches in slide-row order
            self._order = np.lexsort((self.coords[:, 0], self.coords[:, 1]))

        # Optional decode-thread resize (PIL bilinear — the reference's own
        # CPU transform, torchvision Resize on PIL images). Only applied when
        # it SHRINKS the patch: the point is to cut host->device bytes on
        # hosts with a thin transfer link (WSINSIGHT_HOST_RESIZE=1); an
        # upscale would inflate them. The device's bit-exact fixed-point
        # resize (ops/preprocess.py) reproduces PIL exactly, so moving the
        # resize here changes WHERE the work runs, not the numbers.
        self._host_resize: tuple[int, int] | None = None
        if host_resize is not None:
            oh, ow = int(host_resize[0]), int(host_resize[1])
            if oh * ow < int(self.patch_size) ** 2:
                self._host_resize = (oh, ow)

        # Optional thin-link wire format: pack batches as planar YUV 4:2:0
        # (1.5 B/px vs RGB's 3 B/px) for hosts whose device link is the
        # pipeline bottleneck (WSINSIGHT_WIRE=yuv420). The jitted step
        # reconstructs on device (ops/preprocess.yuv420_to_rgb, dispatched by
        # array rank). Lossy in chroma, so opt-in; requires even H and W —
        # otherwise this source silently stays on the exact RGB wire.
        self._wire = None
        if wire == "yuv420":
            ih, iw = (
                self._host_resize
                if self._host_resize is not None
                else (int(self.patch_size), int(self.patch_size))
            )
            if ih % 2 == 0 and iw % 2 == 0:
                self._wire = "yuv420"

        self._use_hdf5_images = use_hdf5_images
        self._h5: h5py.File | None = None
        self._images = None
        self._slide = None
        self._h5_lock = threading.Lock()
        self._h5_tls = threading.local()
        self._tls_files: list[h5py.File] = []
        self._stop = threading.Event()
        self._producers: list[threading.Thread] = []
        self._open_sources()

        # Optional DCT half-resolution decode (WSINSIGHT_DECODE_SCALE=2, JPEG
        # slides + YUV wire only): libjpeg decodes tiles at 1/2 via a 4x4
        # IDCT (~3x the decode rate, a quarter of the pixels) and the wire
        # ships (ceil(ps/2) rounded even)^2 planes — the device preprocess
        # resizes from there. Lossy (DCT downsample + the wire's chroma), so
        # strictly opt-in; falls back silently when the page is not JPEG or
        # the native reader is unavailable.
        self._decode_scale = 1
        self._half = None
        if decode_scale is None:
            import os as _os

            try:
                decode_scale = int(_os.getenv("WSINSIGHT_DECODE_SCALE", "1") or 1)
            except ValueError:
                decode_scale = 1
        if (
            decode_scale == 2
            and self._wire == "yuv420"
            and not self._use_hdf5_images
            and self._slide is not None
            and getattr(self._slide, "read_patches_array", None) is not None
        ):
            hs = -(-int(self.patch_size) // 2)
            hs += hs % 2  # even, for the YUV packer
            try:
                probe = self._slide.read_patches_array(
                    self.coords[:1, :2], 0, (hs, hs), scale_denom=2
                )
            except Exception:
                probe = None
            if probe is not None:
                self._decode_scale = 2
                self._half = (hs, hs)
                self._host_resize = None  # decode already shrank the patch

    def _open_sources(self) -> None:
        p = self.patch_path
        local = p.materialize() if isinstance(p, URIPath) else p
        self._h5 = h5py.File(local, "r")
        if self._use_hdf5_images and "/images" in self._h5:
            imgs = self._h5["/images"]
            if imgs.ndim == 4 and imgs.shape[0] == len(self.coords):
                self._images = imgs
            else:
                self._use_hdf5_images = False
        else:
            self._use_hdf5_images = False
        if not self._use_hdf5_images:
            if self.wsi_path is None:
                raise FileNotFoundError("no /images cache and no wsi_path given")
            self._slide = get_wsi_cls()(self.wsi_path)

    def __len__(self) -> int:
        return len(self.coords)

    @property
    def num_batches(self) -> int:
        return -(-len(self.coords) // self.batch_size)

    def _thread_images(self):
        """Per-thread /images dataset (own h5py handle, no shared lock).

        A single shared handle serializes all decode threads on one lock —
        exactly when the /images cache should be fastest. The reference gets
        the same isolation from per-worker handles in worker_init (reference:
        modellib/data.py:198-236).
        """
        tl = self._h5_tls
        ds = getattr(tl, "images", None)
        if ds is None:
            p = self.patch_path
            local = p.materialize() if isinstance(p, URIPath) else p
            f = h5py.File(local, "r")
            ds = f["/images"]
            tl.file = f
            tl.images = ds
            with self._h5_lock:
                self._tls_files.append(f)
        return ds

    def _fetch_one(self, idx: int) -> np.ndarray:
        if self._use_hdf5_images:
            try:
                arr = self._thread_images()[idx]
            except Exception:
                with self._h5_lock:  # fallback: shared handle, serialized
                    arr = self._images[idx]
            if arr.shape[0] == 3 and arr.shape[-1] != 3:
                arr = np.transpose(arr, (1, 2, 0))
            arr = np.ascontiguousarray(arr[:, :, :3], dtype=np.uint8)
            return self._maybe_resize(arr)
        minx, miny, w, h = self.coords[idx]
        if self._decode_scale == 2:
            # Fallback for the half-scale mode (native batch path failed):
            # read the even-snapped full-res window and area-downsample —
            # approximates the DCT half decode (both are antialiased 2x
            # reductions; the mode is lossy by contract).
            import cv2

            hs = self._half[0]
            arr = self._slide.read_region_array(
                (int(minx) & ~1, int(miny) & ~1), 0, (2 * hs, 2 * hs)
            )
            return cv2.resize(arr, (hs, hs), interpolation=cv2.INTER_AREA)
        fast = getattr(self._slide, "read_region_array", None)
        if fast is not None:
            return self._maybe_resize(fast((int(minx), int(miny)), 0, (int(w), int(h))))
        region = self._slide.read_region(
            location=(int(minx), int(miny)), level=0, size=(int(w), int(h))
        )
        return self._maybe_resize(np.asarray(region.convert("RGB"), dtype=np.uint8))

    def _maybe_resize(self, arr: np.ndarray) -> np.ndarray:
        if self._host_resize is None:
            return arr
        oh, ow = self._host_resize
        # Native PIL-bit-exact resize first (GIL-free C, same coefficient
        # tables as the device path); PIL itself is the fallback.
        from ..native import pil_resize_native

        out = pil_resize_native(arr, (oh, ow))
        if out is not None:
            return out
        from PIL import Image

        return np.asarray(Image.fromarray(arr).resize((ow, oh), Image.BILINEAR))

    @property
    def image_hw(self) -> tuple[int, int]:
        """(H, W) of the images this source yields (post host-resize/scale)."""
        if self._half is not None:
            return self._half
        if self._host_resize is not None:
            return self._host_resize
        return (self.patch_size, self.patch_size)

    def _start_batch(self, pool: ThreadPoolExecutor, indices: np.ndarray):
        """Submit one batch's decode work; return a finish() -> Batch closure.

        Splitting submit from collect lets the producer keep TWO batches in
        flight: batch k+1's shards decode (GIL-free) while batch k is being
        assembled / waiting on the bounded queue, so the decode pool never
        idles across the per-batch join barrier.
        """
        native_collect = self._submit_batch_native(pool, indices)
        futures = None
        if native_collect is None and len(indices) > 0:
            futures = [pool.submit(self._fetch_one, i) for i in indices]

        def finish() -> Batch:
            ih, iw = self.image_hw
            native = native_collect() if native_collect is not None else None
            if native is not None and len(indices) == self.batch_size:
                images = native  # full batch decoded straight into its buffer
            else:
                shape = (
                    (self.batch_size, ih * 3 // 2, iw)  # pre-packed shards
                    if native is not None and native.ndim == 3
                    else (self.batch_size, ih, iw, 3)
                )
                images = np.zeros(shape, np.uint8)
                if native is not None:
                    images[: len(indices)] = native
                else:
                    per_patch = (
                        [f.result() for f in futures]
                        if futures is not None
                        else [self._fetch_one(i) for i in indices]
                    )
                    for slot, arr in enumerate(per_patch):
                        images[slot] = arr
            if self._wire is not None and images.ndim == 4:
                from ..native import rgb_to_yuv420

                packed = rgb_to_yuv420(images)
                if packed is not None:
                    images = packed  # (B, H*3/2, W): halves the H2D bytes
            coords = np.zeros((self.batch_size, 4), np.int64)
            coords[: len(indices)] = self.coords[indices]
            return Batch(images=images, coords=coords, n_valid=len(indices))

        return finish

    def _make_batch(self, pool: ThreadPoolExecutor, indices: np.ndarray) -> Batch:
        return self._start_batch(pool, indices)()

    def _submit_batch_native(self, pool: ThreadPoolExecutor, indices: np.ndarray):
        """Submit whole-batch decode via GIL-free native calls, when available.

        The batch is sharded across the decode pool: each native call
        releases the GIL and writes its slice of one contiguous buffer, so
        threads scale on multi-core hosts (the shared C++ tile LRU is
        mutex-protected, decode runs unlocked). Returns a collect() closure
        yielding the decoded (n, h, w, 3) buffer — or None (at submit or
        collect time) when the native path is unavailable/failed and the
        caller should fall back to per-patch fetch.
        """
        if self._use_hdf5_images or self._slide is None:
            return None
        batch_read = getattr(self._slide, "read_patches_array", None)
        if batch_read is None:
            return None
        ps = int(self.patch_size)
        n = len(indices)
        if n == 0:
            return None
        dec_scale = self._decode_scale
        dec_hw = self._half if dec_scale == 2 else (ps, ps)
        out = np.empty((n, dec_hw[0], dec_hw[1], 3), np.uint8)
        coords = self.coords[indices, :2]
        resize_to = self._host_resize
        rgb = out
        if resize_to is not None:
            rgb = np.empty((n, resize_to[0], resize_to[1], 3), np.uint8)
        final = rgb
        if self._wire is not None:
            # pack per shard so the (GIL-free) conversion parallelizes with
            # the decode threads instead of serializing on the producer
            ih, iw = rgb.shape[1], rgb.shape[2]
            final = np.empty((n, ih * 3 // 2, iw), np.uint8)

        def shard(a: int, b: int):
            # decode + (native) resize + wire pack for one slice; the GIL is
            # released inside each native call
            r = batch_read(
                coords[a:b], 0, (dec_hw[1], dec_hw[0]), out[a:b],
                scale_denom=dec_scale,
            )
            if r is None:
                return None
            if resize_to is not None:
                from ..native import pil_resize_native

                rr = pil_resize_native(out[a:b], resize_to, out=rgb[a:b])
                if rr is None:  # no native resize: PIL per patch
                    for i in range(a, b):
                        rgb[i] = self._maybe_resize(out[i])
            if final is not rgb:
                from ..native import rgb_to_yuv420

                if rgb_to_yuv420(rgb[a:b], out=final[a:b]) is None:
                    return None  # bad geometry: fall back to the RGB path
            return True

        n_shards = min(self.num_threads, max(1, n // 4))
        bounds = np.linspace(0, n, n_shards + 1, dtype=int)
        try:
            futures = [
                pool.submit(shard, a, b)
                for a, b in zip(bounds[:-1], bounds[1:])
                if b > a
            ]
        except Exception:
            return None

        def collect() -> np.ndarray | None:
            try:
                results = [f.result() for f in futures]
            except Exception:
                return None
            if any(r is None for r in results):
                return None
            return final

        return collect

    def __iter__(self) -> Iterator[Batch]:
        """Yield batches; decode runs ahead of the consumer by `prefetch`."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        splits = [
            self._order[i : i + self.batch_size]
            for i in range(0, len(self._order), self.batch_size)
        ]

        def put_or_stop(item) -> bool:
            # Bounded put that honors close(): an abandoned iterator (e.g.
            # the one-batch stain sample) must not leave this thread blocked
            # forever — on ANY put, including the terminal None/error.
            while not self._stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                from collections import deque

                with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
                    # Two batches in flight: batch k+1's shards decode while
                    # batch k assembles / waits on the bounded queue.
                    pending: deque = deque()
                    for indices in splits:
                        pending.append(self._start_batch(pool, indices))
                        if len(pending) >= 2 and not put_or_stop(pending.popleft()()):
                            return
                    while pending:
                        if not put_or_stop(pending.popleft()()):
                            return
                put_or_stop(None)
            except BaseException as err:  # propagate to consumer
                put_or_stop(err)

        t = threading.Thread(target=producer, daemon=True)
        self._producers.append(t)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()

    def device_prefetch(
        self, put, depth: int = 2, it: "Iterator[Batch] | None" = None
    ) -> "Iterator[Batch]":
        """Iterate batches whose `.images` are ALREADY in flight to the device.

        `put` is an async host->device transfer (e.g. ClassifierEngine.put /
        jax.device_put); issuing it `depth` batches ahead of the consumer
        keeps transfers streaming while the device computes and the decode
        threads fill the next batch — on thin tunnel links the transfer is
        the dominant per-batch cost, so this overlap sets the pipeline rate
        to max(decode, H2D, compute) instead of their sum.
        """
        from collections import deque

        q: deque = deque()
        if it is None:
            it = iter(self)
        exhausted = False
        while True:
            while not exhausted and len(q) <= max(0, depth):
                b = next(it, None)
                if b is None:
                    exhausted = True
                    break
                q.append(Batch(images=put(b.images), coords=b.coords, n_valid=b.n_valid))
            if not q:
                return
            yield q.popleft()

    def close(self) -> None:
        self._stop.set()
        # Join producers BEFORE closing handles: a decode thread still inside
        # the native reader while close() frees it would be a use-after-free
        # (the C++ side also pins pages per call — belt and braces).
        for t in self._producers:
            if t.is_alive() and t is not threading.current_thread():
                t.join(timeout=30)
        self._producers.clear()
        for f in self._tls_files:
            try:
                f.close()
            except Exception:
                pass
        self._tls_files.clear()
        if self._h5 is not None:
            try:
                self._h5.close()
            except Exception:
                pass
        if self._slide is not None and hasattr(self._slide, "close"):
            self._slide.close()
