"""Native (C++) region decoder vs the pure-Python TIFF path.

The native decoder (native/tiledec.cpp via TpuSlide.read_patches_array) is
the production hot loop feeding the TPU; these tests pin it to the Python
decode path byte-for-byte on lossless codecs and within JPEG-decoder noise
on lossy ones, across tile grids, strip edges, out-of-bounds reads, and
pyramid levels. (The reference leans on torch DataLoader workers around
libtiff for the same loop: wsinsight/modellib/data.py:198-236.)
"""

import numpy as np
import pytest

from wsinsight_tpu.wsi.slide import TpuSlide
from wsinsight_tpu.wsi.tiff import write_pyramidal_tiff


def _checker_image(side: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = rng.integers(40, 215, size=(side, side, 3), dtype=np.uint8)
    yy, xx = np.mgrid[:side, :side]
    img[(yy // 64 + xx // 64) % 2 == 0] //= 2  # structure so LZW/deflate bite
    return img


def _python_read(slide: TpuSlide, location, level, size) -> np.ndarray:
    """Force the pure-Python path regardless of native availability."""
    saved = dict(slide._native)
    slide._native = {lvl: False for lvl in range(len(slide._levels))}
    try:
        return slide.read_region_array(location, level, size)
    finally:
        slide._native = saved


@pytest.mark.parametrize(
    "compression",
    [
        "none",
        "deflate",
        # LZW round-trips through the pure-Python reference codec (minutes on
        # the 1-CPU bench host) — full-gate only; the fast tier still covers
        # the LZW codec itself via test_tiff roundtrips.
        pytest.param("lzw", marks=pytest.mark.slow),
        "jpeg",
    ],
)
def test_native_batch_decode_matches_python(tmp_path, compression):
    img = _checker_image(1024)
    path = tmp_path / f"s_{compression}.tif"
    write_pyramidal_tiff(str(path), img, tile=(256, 256), compression=compression, mpp=0.25)

    with TpuSlide(str(path)) as s:
        coords = np.array(
            [[0, 0], [100, 200], [255, 255], [256, 256], [700, 900], [768, 768]],
            np.int64,
        )
        got = s.read_patches_array(coords, 0, (200, 200))
        if got is None:
            pytest.skip("native decoder unavailable (no toolchain)")
        assert got.shape == (len(coords), 200, 200, 3) and got.dtype == np.uint8
        for i, (x, y) in enumerate(coords):
            ref = _python_read(s, (int(x), int(y)), 0, (200, 200))
            if compression == "jpeg":
                # both sides decode the same stream with libjpeg-turbo-family
                # codecs; allow 1 LSB of IDCT variance between builds
                np.testing.assert_allclose(
                    got[i].astype(np.int16), ref.astype(np.int16), atol=1
                )
            else:
                np.testing.assert_array_equal(got[i], ref)


def test_native_out_of_bounds_zero_pads(tmp_path):
    img = _checker_image(512, seed=1)
    path = tmp_path / "oob.tif"
    write_pyramidal_tiff(str(path), img, tile=(256, 256), compression="deflate", mpp=0.25)

    with TpuSlide(str(path)) as s:
        coords = np.array([[-50, -60], [400, 400], [600, 600]], np.int64)
        got = s.read_patches_array(coords, 0, (180, 180))
        if got is None:
            pytest.skip("native decoder unavailable")
        for i, (x, y) in enumerate(coords):
            ref = _python_read(s, (int(x), int(y)), 0, (180, 180))
            np.testing.assert_array_equal(got[i], ref)
        # fully outside: all zeros
        assert got[2].sum() == 0


def test_native_pyramid_levels_and_out_buffer(tmp_path):
    # deflate (C-speed zlib both sides): this test exercises pyramid-level
    # addressing and the out= contract, not the codec — LZW codec parity is
    # covered by test_native_batch_decode_matches_python[lzw] (slow tier).
    img = _checker_image(1024, seed=2)
    path = tmp_path / "pyr.tif"
    write_pyramidal_tiff(str(path), img, tile=(256, 256), compression="deflate", mpp=0.25, levels=3)

    with TpuSlide(str(path)) as s:
        assert len(s._levels) == 3
        # level-1 read: level-0 coords are downsampled by the slide API
        coords = np.array([[0, 0], [512, 512]], np.int64)
        got = s.read_patches_array(coords, 1, (128, 128))
        if got is None:
            pytest.skip("native decoder unavailable")
        for i, (x, y) in enumerate(coords):
            ref = _python_read(s, (int(x), int(y)), 1, (128, 128))
            np.testing.assert_array_equal(got[i], ref)

        # out= writes into a caller slice (the batch-sharding contract)
        buf = np.zeros((4, 128, 128, 3), np.uint8)
        got2 = s.read_patches_array(coords, 1, (128, 128), out=buf[1:3])
        assert got2 is not None and got2.base is buf
        np.testing.assert_array_equal(buf[1:3], got)
        assert buf[0].sum() == 0 and buf[3].sum() == 0


def test_native_reader_sparse_zero_bytecount_tiles(tmp_path):
    """Zero-bytecount (sparse) tiles decode as blank, matching the Python
    path's contract for sparse OME/philips-style TIFFs."""
    img = _checker_image(512, seed=3)
    path = tmp_path / "sparse.tif"
    write_pyramidal_tiff(str(path), img, tile=(256, 256), compression="deflate", mpp=0.25)

    with TpuSlide(str(path)) as s:
        # Mark tile 0 sparse in the in-memory page BEFORE the lazy native
        # reader opens — it snapshots offsets/bytecounts at open time, so
        # both paths see the same sparse layout.
        page = s._levels[0]
        page.offsets[0] = 0
        page.bytecounts[0] = 0
        got = s.read_patches_array(np.array([[10, 10]], np.int64), 0, (100, 100))
        if got is None:
            pytest.skip("native decoder unavailable")
        ref = _python_read(s, (10, 10), 0, (100, 100))
        np.testing.assert_array_equal(got[0], ref)
        assert got[0].sum() == 0  # the patched tile is blank
