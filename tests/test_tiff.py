"""Round-trip and region-read tests for the in-house TIFF stack."""

import numpy as np
import pytest

from wsinsight_tpu.wsi.tiff import (
    TiffFile,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    write_pyramidal_tiff,
)
from wsinsight_tpu.wsi.slide import TpuSlide


def _rand_img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
def test_roundtrip_lossless(tmp_path, compression):
    img = _rand_img(300, 500)
    path = tmp_path / f"rt_{compression}.tif"
    write_pyramidal_tiff(str(path), img, tile=(128, 128), compression=compression, mpp=0.5)
    with TiffFile(str(path)) as tf:
        out = tf.pages[0].asarray()
        assert tf.mpp() == (0.5, 0.5)
    np.testing.assert_array_equal(out, img)


def test_roundtrip_jpeg(tmp_path):
    img = np.full((256, 256, 3), 200, dtype=np.uint8)
    path = tmp_path / "rt_jpeg.tif"
    write_pyramidal_tiff(str(path), img, tile=(128, 128), compression="jpeg")
    with TiffFile(str(path)) as tf:
        out = tf.pages[0].asarray()
    assert np.abs(out.astype(int) - 200).max() <= 6  # lossy but close


def test_bigtiff_roundtrip(tmp_path):
    img = _rand_img(256, 256, seed=3)
    path = tmp_path / "big.tif"
    from wsinsight_tpu.wsi.tiff import TiffWriter

    with TiffWriter(str(path), bigtiff=True) as tw:
        tw.write(img, tile=(128, 128), compression="deflate")
    with TiffFile(str(path)) as tf:
        assert tf.bigtiff
        np.testing.assert_array_equal(tf.pages[0].asarray(), img)


def test_lzw_codec_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 8, size=5000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data)) == data


def test_packbits():
    # RLE example from the TIFF spec.
    encoded = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    out = packbits_decode(encoded)
    assert out == bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4 + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10)


def _split_jpeg_tables(full: bytes):
    """Split a JPEG stream into (tables stream, abbreviated stream) the way
    SVS files ship tiles: DQT/DHT in the JPEGTables tag, the rest per tile."""
    assert full[:2] == b"\xff\xd8"
    pos = 2
    tables = b""
    body = b""
    while pos < len(full):
        assert full[pos] == 0xFF
        marker = full[pos + 1]
        if marker == 0xD9:  # EOI
            body += full[pos : pos + 2]
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone markers
            body += full[pos : pos + 2]
            pos += 2
            continue
        seglen = int.from_bytes(full[pos + 2 : pos + 4], "big")
        segment = full[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT -> tables
            tables += segment
        else:
            body += segment
        pos += 2 + seglen
        if marker == 0xDA:  # SOS: entropy data until EOI
            end = full.rfind(b"\xff\xd9")
            body += full[pos:end]
            body += b"\xff\xd9"
            break
    return b"\xff\xd8" + tables + b"\xff\xd9", b"\xff\xd8" + body


def test_jpegtables_abbreviated_stream_decode():
    """JPEGTables splicing (reference slides ship abbreviated per-tile JPEG
    streams with shared tables in tag 347)."""
    import cv2

    from wsinsight_tpu.wsi.tiff import TiffPage

    img = _rand_img(128, 128, seed=9)
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    full = enc.tobytes()
    tables, body = _split_jpeg_tables(full)
    # Sanity: the abbreviated body alone lacks tables.
    assert b"\xdb" != body[3:4]

    page = TiffPage.__new__(TiffPage)
    page.jpeg_tables = tables
    decoded = page._jpeg_decode(body)
    reference = cv2.imdecode(np.frombuffer(full, np.uint8), cv2.IMREAD_COLOR)[:, :, ::-1]
    np.testing.assert_array_equal(decoded, reference)


def test_pyramid_levels(tmp_path):
    img = _rand_img(512, 768, seed=2)
    path = tmp_path / "pyr.tif"
    write_pyramidal_tiff(str(path), img, tile=(128, 128), compression="deflate", levels=3)
    slide = TpuSlide(str(path))
    assert slide.level_count == 3
    assert slide.dimensions == (768, 512)
    assert slide.level_dimensions[1] == (384, 256)
    assert slide.level_downsamples[1] == pytest.approx(2.0)


def test_read_region_and_oob_padding(tmp_path):
    img = _rand_img(300, 400, seed=4)
    path = tmp_path / "r.tif"
    write_pyramidal_tiff(str(path), img, tile=(128, 128), compression="deflate")
    slide = TpuSlide(str(path))
    # interior read
    region = slide.read_region_array((37, 53), 0, (100, 90))
    np.testing.assert_array_equal(region, img[53:143, 37:137])
    # out-of-bounds reads are zero-padded (matching tiffslide/openslide RGB behavior,
    # reference: tests/test_all.py:747-765)
    region = slide.read_region_array((350, 250), 0, (100, 100))
    np.testing.assert_array_equal(region[:50, :50], img[250:, 350:])
    assert (region[50:, :] == 0).all()
    assert (region[:, 50:] == 0).all()
    # fully outside
    region = slide.read_region_array((1000, 1000), 0, (64, 64))
    assert (region == 0).all()
    # negative origin
    region = slide.read_region_array((-10, -10), 0, (20, 20))
    assert (region[:10, :10] == 0).all()
    np.testing.assert_array_equal(region[10:, 10:], img[:10, :10])


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
def test_stripped_roundtrip(tmp_path, compression):
    from wsinsight_tpu.wsi.tiff import TiffWriter

    img = _rand_img(200, 300, seed=7)
    path = tmp_path / f"strips_{compression}.tif"
    with TiffWriter(str(path)) as tw:
        tw.write(img, tile=None, rows_per_strip=48, compression=compression)
    with TiffFile(str(path)) as tf:
        page = tf.pages[0]
        assert not page.is_tiled
        np.testing.assert_array_equal(page.asarray(), img)
    # Region reads across strip boundaries.
    slide = TpuSlide(str(path))
    region = slide.read_region_array((10, 40), 0, (60, 60))
    np.testing.assert_array_equal(region, img[40:100, 10:70])


def test_grayscale_page_reads_as_rgb(tmp_path):
    from wsinsight_tpu.wsi.tiff import TiffWriter

    gray = np.random.default_rng(0).integers(0, 255, size=(64, 64), dtype=np.uint8)
    path = tmp_path / "gray.tif"
    with TiffWriter(str(path)) as tw:
        # ndim-2 input is expanded to 3 channels by the writer; craft true
        # single-sample pages via the raw writer path instead:
        tw.write(gray[:, :, None].repeat(1, axis=2), tile=(64, 64), compression="none")
    slide = TpuSlide(str(path))
    region = slide.read_region_array((0, 0), 0, (64, 64))
    assert region.shape == (64, 64, 3)
    np.testing.assert_array_equal(region[:, :, 0], region[:, :, 1])


def test_big_endian_tiff(tmp_path):
    """Hand-built MM (big-endian) classic TIFF, single uncompressed strip."""
    import struct

    img = _rand_img(4, 6, seed=11)
    data = img.tobytes()
    path = tmp_path / "be.tif"

    def entry(tag, dtype, count, value):
        return struct.pack(">HHI4s", tag, dtype, count, value)

    data_off = 8
    ifd_off = data_off + len(data)
    entries = [
        entry(256, 3, 1, struct.pack(">HH", 6, 0)),   # width
        entry(257, 3, 1, struct.pack(">HH", 4, 0)),   # height
        entry(258, 3, 3, struct.pack(">I", ifd_off + 2 + 10 * 12 + 4)),  # bits offset
        entry(259, 3, 1, struct.pack(">HH", 1, 0)),   # compression none
        entry(262, 3, 1, struct.pack(">HH", 2, 0)),   # RGB
        entry(273, 4, 1, struct.pack(">I", data_off)),  # strip offset
        entry(277, 3, 1, struct.pack(">HH", 3, 0)),   # samples
        entry(278, 3, 1, struct.pack(">HH", 4, 0)),   # rows per strip
        entry(279, 4, 1, struct.pack(">I", len(data))),  # strip bytes
        entry(284, 3, 1, struct.pack(">HH", 1, 0)),   # planar contiguous
    ]
    with open(path, "wb") as fh:
        fh.write(b"MM" + struct.pack(">HI", 42, ifd_off))
        fh.write(data)
        fh.write(struct.pack(">H", len(entries)))
        for e in entries:
            fh.write(e)
        fh.write(struct.pack(">I", 0))  # next IFD
        fh.write(struct.pack(">HHH", 8, 8, 8))  # out-of-line BitsPerSample

    with TiffFile(str(path)) as tf:
        assert tf.byteorder == ">"
        np.testing.assert_array_equal(tf.pages[0].asarray(), img)


def test_predictor2_decode():
    """Horizontal-differencing predictor undo on a synthetic segment."""
    import zlib

    from wsinsight_tpu.wsi.tiff import COMPRESSION_DEFLATE_ADOBE, TiffPage

    img = _rand_img(8, 16, seed=12)
    diffed = img.astype(np.int16).copy()
    diffed[:, 1:, :] -= img[:, :-1, :].astype(np.int16)
    raw = zlib.compress(diffed.astype(np.uint8).tobytes())

    page = TiffPage.__new__(TiffPage)
    page.compression = COMPRESSION_DEFLATE_ADOBE
    page.predictor = 2
    page.samples = 3
    page.is_tiled = True
    page.tile_width = 16
    page.tile_height = 8

    class FakeFH:
        def __init__(self, blob):
            self.blob = blob
        def seek(self, off):
            self.off = off
        def read(self, n):
            return self.blob[self.off : self.off + n]

    page.fh = FakeFH(raw)
    page.offsets = np.array([0])
    page.bytecounts = np.array([len(raw)])
    np.testing.assert_array_equal(page.decode_segment(0), img)


def test_thumbnail(purple_slide):
    slide = TpuSlide(str(purple_slide))
    thumb = slide.get_thumbnail((2048, 2048))
    assert thumb.size == (2048, 2048)
    arr = np.asarray(thumb)
    assert (arr[..., 0] == 128).all() and (arr[..., 1] == 0).all()


def test_mpp(purple_slide):
    from wsinsight_tpu.wsi import get_avg_mpp

    assert get_avg_mpp(str(purple_slide)) == pytest.approx(0.25)


def test_svs_style_mpp_description(tmp_path):
    img = _rand_img(64, 64)
    path = tmp_path / "svsish.tif"
    write_pyramidal_tiff(
        str(path), img, tile=(64, 64), compression="none",
        description="Aperio Fake |AppMag = 40|MPP = 0.2527",
    )
    with TiffFile(str(path)) as tf:
        assert tf.mpp() == (0.2527, 0.2527)


def test_svs_like_page_order_keeps_pyramid_levels(tmp_path):
    """Aperio SVS puts a STRIPPED thumbnail at IFD1 between the baseline and
    the tiled 4x/16x levels; level detection must skip it and keep the real
    pyramid (and not misread the thumbnail as a level)."""
    from wsinsight_tpu.wsi.slide import TpuSlide
    from wsinsight_tpu.wsi.tiff import TiffWriter

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (512, 512, 3), np.uint8)
    quarter = base[::2, ::2]
    thumb = base[::4, ::4]

    path = tmp_path / "svslike.tif"
    with TiffWriter(path) as tw:
        tw.write(base, tile=(256, 256), compression="deflate")
        tw.write(thumb, tile=None, compression="deflate")  # stripped thumbnail
        tw.write(quarter, tile=(256, 256), compression="deflate")

    slide = TpuSlide(str(path))
    assert slide.level_count == 2
    assert slide.level_dimensions == ((512, 512), (256, 256))
    region = np.asarray(slide.read_region((0, 0), 1, (64, 64)))
    np.testing.assert_array_equal(region, quarter[:64, :64])


def test_sparse_zero_bytecount_tile_decodes_blank(tmp_path):
    """libtiff writers emit offset=0/bytecount=0 for never-written tiles;
    they must decode as blank instead of a decompressor error."""
    from wsinsight_tpu.wsi.tiff import TiffFile, write_pyramidal_tiff

    img = np.full((512, 512, 3), 200, np.uint8)
    path = tmp_path / "sparse.tif"
    write_pyramidal_tiff(str(path), img, tile=(256, 256), compression="deflate")

    with TiffFile(path) as tf:
        page = tf.pages[0]
        page.bytecounts[0] = 0
        page.offsets[0] = 0
        seg = page.decode_segment(0)
        assert seg.shape == (256, 256, 3)
        assert (seg == 0).all()
        # untouched tiles still decode normally
        assert (page.decode_segment(1) == 200).all()
        full = page.asarray()
        assert (full[:256, :256] == 0).all() and (full[256:, 256:] == 200).all()
