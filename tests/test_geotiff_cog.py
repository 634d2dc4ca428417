"""COG-style GeoTIFF surface (raster/geotiff.py round-4 continuation):
multi-IFD overview pyramids, windowed tile-local reads, PlanarConfig=2,
and JPEG-in-TIFF (compression 7, JPEGTables, YCbCr photometric).

The scale claim under test: an AOI read over a tiled mosaic touches
ONLY the intersecting tiles — proven by corrupting every other tile's
bytes and still decoding the window exactly. Reference parity: GDAL
windowed reads (/root/reference/gistools/raster.py:99-141
ReadAsArray(xoff, yoff, xsize, ysize)) and .ovr overview use.
"""

import ctypes
import os
import struct
import tempfile

import numpy as np
import pytest

from gis_tools_spark.raster import geotiff as G
from gis_tools_spark.raster import jpeg

from test_geotiff import _TIFF, _CI, needs_libtiff  # noqa: F401

GT = (5.0, 0.01, 45.0, 0.01)


def _field(h, w, spp=1, offset=0):
    gy, gx = np.mgrid[0:h, 0:w]
    base = ((gx * 7 + gy * 13 + offset) % 997).astype(np.float32)
    if spp == 1:
        return base
    return np.stack([base + k for k in range(spp)], axis=-1)


def test_cog_pyramid_roundtrip():
    a = _field(300, 280)
    buf = G.encode_cog(a, gt=GT, epsg=4326, nodata=-1.0, tile=64,
                       min_overview=96)
    ov = G.overviews(buf)
    # 300x280 -> 150x140 -> 75x70 (<=96 stops)
    assert [(o["w"], o["h"]) for o in ov] == [(280, 300), (140, 150),
                                              (70, 75)]
    assert ov[0]["tile_w"] == 64 and not ov[0]["reduced"]
    assert ov[1]["reduced"] and ov[2]["reduced"]

    out0, info0 = G.decode(buf)
    assert np.array_equal(out0, a)
    assert info0["epsg"] == 4326 and info0["nodata"] == -1.0
    assert abs(info0["gt_x0"] - GT[0]) < 1e-12

    lvl1 = G._downsample2(a[:, :, None])[:, :, 0]
    out1, info1 = G.decode(buf, ifd=1)
    assert np.array_equal(out1, lvl1)
    # overview georeferencing: same origin, pixels scaled by w0/w1
    assert abs(info1["gt_x0"] - GT[0]) < 1e-12
    assert abs(info1["gt_rx"] - GT[1] * 280 / 140) < 1e-12
    out2, _ = G.decode(buf, ifd=2)
    assert np.array_equal(out2, G._downsample2(lvl1[:, :, None])[:, :, 0])


def test_window_reads_only_its_tiles():
    """Corrupt every tile OUTSIDE the window footprint; the window must
    still decode exactly — the reader cannot have touched those bytes."""
    a = _field(256, 256, offset=11)
    buf = bytearray(G.encode_cog(a, gt=GT, tile=64, min_overview=256))
    bo, big = G._sniff(bytes(buf))
    t = G._read_ifds(bytes(buf), bo, big)[0]
    offs, cnts = t[G._T_TILE_OFF], t[G._T_TILE_CNT]
    row0, col0, nrows, ncols = 70, 130, 60, 100    # tiles ty 1, tx 2..3
    keep = set()
    for ty in range(row0 // 64, (row0 + nrows - 1) // 64 + 1):
        for tx in range(col0 // 64, (col0 + ncols - 1) // 64 + 1):
            keep.add(ty * 4 + tx)
    for i in range(16):
        if i not in keep:
            for p in range(offs[i], offs[i] + cnts[i]):
                buf[p] ^= 0xFF
    win, info = G.decode_window(bytes(buf), row0, col0, nrows, ncols)
    assert np.array_equal(win, a[row0:row0 + nrows, col0:col0 + ncols])
    assert abs(info["gt_x0"] - (GT[0] + col0 * GT[1])) < 1e-12
    assert abs(info["gt_y0"] - (GT[2] - row0 * GT[3])) < 1e-12
    # full decode of the vandalized file must NOT silently succeed
    with pytest.raises(Exception):
        G.decode(bytes(buf))


def test_window_on_strips_and_clipping():
    a = _field(90, 40, offset=3)
    buf = G.encode(a, gt=GT, compression="deflate")   # striped writer
    win, _ = G.decode_window(buf, 20, 5, 50, 30)
    assert np.array_equal(win, a[20:70, 5:35])
    # window clipped at the raster edge
    win, _ = G.decode_window(buf, 80, 30, 50, 50)
    assert np.array_equal(win, a[80:90, 30:40])
    with pytest.raises(ValueError):
        G.decode_window(buf, 95, 0, 5, 5)


def test_decode_bbox_overview_selection():
    a = _field(512, 512, offset=5)
    buf = G.encode_cog(a, gt=GT, tile=64, min_overview=64)
    # bbox = pixel window [rows 64:256, cols 128:384) at full res
    xmin = GT[0] + 128 * GT[1]
    xmax = GT[0] + 384 * GT[1]
    ymax = GT[2] - 64 * GT[3]
    ymin = GT[2] - 256 * GT[3]
    full, info = G.decode_bbox(buf, (xmin, ymin, xmax, ymax))
    assert np.array_equal(full, a[64:256, 128:384])
    assert abs(info["gt_rx"] - GT[1]) < 1e-12
    # budget forces the first level where 192*256/4**k <= max_px
    lvl1 = G._downsample2(a[:, :, None])[:, :, 0]
    got, info = G.decode_bbox(buf, (xmin, ymin, xmax, ymax),
                              max_px=(192 * 256) // 4)
    assert np.array_equal(got, lvl1[32:128, 64:192])
    assert abs(info["gt_rx"] - 2 * GT[1]) < 1e-12
    # impossible budget -> coarsest level rather than an error
    got, _ = G.decode_bbox(buf, (xmin, ymin, xmax, ymax), max_px=1)
    assert got.shape == (24, 32)


def test_jpeg_cog_decode_psnr_and_grayscale():
    rng = np.random.default_rng(7)
    gy, gx = np.mgrid[0:200, 0:240]
    smooth = (96 + 60 * np.sin(gx / 37.0) + 50 * np.cos(gy / 29.0)
              + rng.normal(0, 2, (200, 240)))
    rgb = np.stack([smooth, smooth * 0.8 + 20, 255 - smooth],
                   axis=-1).clip(0, 255).astype(np.uint8)
    buf = G.encode_cog(rgb, gt=GT, tile=64, compression="jpeg",
                       quality=95, subsampling="420", min_overview=128)
    assert G.overviews(buf)[0]["comp"] == 7
    out, info = G.decode(buf)
    assert out.shape == rgb.shape and out.dtype == np.uint8
    err = (out.astype(np.float64) - rgb) ** 2
    psnr = 10 * np.log10(255.0 ** 2 / max(err.mean(), 1e-12))
    assert psnr >= 40, psnr
    assert abs(info["gt_x0"] - GT[0]) < 1e-12
    # windowed JPEG read agrees with the full decode (same tile pixels)
    win, _ = G.decode_window(buf, 50, 70, 80, 90)
    assert np.array_equal(win, out[50:130, 70:160])
    # grayscale photometric 1
    g8 = rgb[:, :, 0]
    bufg = G.encode_cog(g8, tile=64, compression="jpeg", quality=95,
                        min_overview=256)
    outg, _ = G.decode(bufg)
    errg = (outg.astype(np.float64) - g8) ** 2
    assert 10 * np.log10(255.0 ** 2 / max(errg.mean(), 1e-12)) >= 40


def _classic_tiff(tags_and_data):
    """Assemble a minimal classic little-endian TIFF from
    [(tag, type, values)] + trailing chunk blobs appended by caller."""
    tags, chunks = tags_and_data
    tags = sorted(tags, key=lambda e: e[0])
    nifd = len(tags)
    heap_base = 8 + 2 + 12 * nifd + 4
    heap = bytearray()
    entries = [G._entry(tag, typ, vals, heap, heap_base)
               for tag, typ, vals in tags]
    out = bytearray(b"II*\0" + struct.pack("<I", 8))
    out += struct.pack("<H", nifd)
    for e in entries:
        out += e
    out += struct.pack("<I", 0)
    out += heap
    for c in chunks:
        out += c
    return bytes(out), heap_base + len(heap)


def test_jpegtables_abbreviated_streams():
    """TIFF-EP layout: shared DQT/DHT in the JPEGTables tag, strips as
    abbreviated JPEG streams — the layout libjpeg-based writers emit."""
    rng = np.random.default_rng(3)
    arr = (rng.normal(128, 30, (32, 48, 3))).clip(0, 255).astype(np.uint8)
    full = jpeg.encode(arr, 97)
    # split the stream: DQT (FFDB) / DHT (FFC4) -> tables; rest -> strip
    tables = bytearray(b"\xff\xd8")
    strip = bytearray(b"\xff\xd8")
    p = 2
    while p < len(full):
        assert full[p] == 0xFF
        m = full[p + 1]
        if m == 0xD9:
            strip += full[p:]
            break
        if m == 0xDA:          # SOS: entropy data through EOI
            strip += full[p:]
            break
        seg_len = struct.unpack(">H", full[p + 2:p + 4])[0]
        seg = full[p:p + 2 + seg_len]
        (tables if m in (0xDB, 0xC4) else strip).extend(seg)
        p += 2 + seg_len
    tables += b"\xff\xd9"
    base_tags = [
        (G._T_WIDTH, 3, (48,)), (G._T_LENGTH, 3, (32,)),
        (G._T_BPS, 3, (8, 8, 8)), (G._T_COMP, 3, (7,)),
        (G._T_PHOTO, 3, (6,)), (G._T_SPP, 3, (3,)),
        (G._T_PLANAR, 3, (1,)), (G._T_RPS, 3, (32,)),
        (G._T_STRIP_CNT, 4, (len(strip),)),
        (G._T_JPEGTABLES, 7, tuple(tables)),
    ]
    # two-pass: place the strip right after the heap
    _, data0 = _classic_tiff((base_tags + [(G._T_STRIP_OFF, 4, (0,))], []))
    buf, _ = _classic_tiff((base_tags + [(G._T_STRIP_OFF, 4, (data0,))],
                            [bytes(strip)]))
    out, _ = G.decode(buf)
    assert np.array_equal(out, jpeg.decode(full))


@needs_libtiff
def test_planar2_from_libtiff():
    """PlanarConfig=2 (separate planes), written by the reference C
    library, decodes to the interleaved array."""
    a = _field(37, 53, spp=3, offset=9).astype(np.uint16)
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        path = f.name
    try:
        tif = _TIFF.TIFFOpen(path.encode(), b"w")
        assert tif
        t = ctypes.c_void_p(tif)
        _TIFF.TIFFSetField(t, _CI(256), ctypes.c_uint32(53))
        _TIFF.TIFFSetField(t, _CI(257), ctypes.c_uint32(37))
        _TIFF.TIFFSetField(t, _CI(258), _CI(16))
        _TIFF.TIFFSetField(t, _CI(259), _CI(8))       # deflate
        _TIFF.TIFFSetField(t, _CI(262), _CI(2))       # RGB
        _TIFF.TIFFSetField(t, _CI(277), _CI(3))
        _TIFF.TIFFSetField(t, _CI(284), _CI(2))       # separate planes
        _TIFF.TIFFSetField(t, _CI(278), ctypes.c_uint32(37))
        _TIFF.TIFFSetField(t, _CI(339), _CI(1))
        for p in range(3):
            plane = np.ascontiguousarray(a[:, :, p])
            n = _TIFF.TIFFWriteEncodedStrip(
                t, ctypes.c_uint32(p),
                plane.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_ssize_t(plane.nbytes))
            assert n > 0
        _TIFF.TIFFClose(t)
        with open(path, "rb") as f:
            buf = f.read()
        out, _ = G.decode(buf)
        assert np.array_equal(out, a)
        # windowed planar read
        win, _ = G.decode_window(buf, 10, 20, 15, 25)
        assert np.array_equal(win, a[10:25, 20:45])
    finally:
        os.unlink(path)


@needs_libtiff
def test_libtiff_reads_our_jpeg_cog():
    """Writer conformance for the JPEG/YCbCr tiled layout: libtiff's
    RGBA reader reproduces our decoder's pixels to within JPEG noise."""
    if not hasattr(_TIFF, "TIFFReadRGBAImageOriented"):
        pytest.skip("libtiff lacks TIFFReadRGBAImageOriented")
    gy, gx = np.mgrid[0:128, 0:128]
    rgb = np.stack([(gx * 2) % 256, (gy * 2) % 256,
                    (gx + gy) % 256], axis=-1).astype(np.uint8)
    rgb = G._downsample2(G._downsample2(
        np.repeat(np.repeat(rgb, 2, 0), 2, 1)))   # smooth it a little
    buf = G.encode_cog(rgb, tile=64, compression="jpeg", quality=95,
                       subsampling="444", min_overview=128)
    ours, _ = G.decode(buf)
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        f.write(buf)
        path = f.name
    try:
        tif = _TIFF.TIFFOpen(path.encode(), b"r")
        assert tif, "libtiff refused our JPEG COG"
        h, w = rgb.shape[:2]
        raster = (ctypes.c_uint32 * (w * h))()
        _TIFF.TIFFReadRGBAImageOriented.restype = ctypes.c_int
        ok = _TIFF.TIFFReadRGBAImageOriented(
            ctypes.c_void_p(tif), ctypes.c_uint32(w), ctypes.c_uint32(h),
            raster, _CI(1), _CI(0))   # ORIENTATION_TOPLEFT
        _TIFF.TIFFClose(ctypes.c_void_p(tif))
        assert ok == 1
        px = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, w, 4)
        theirs = px[:, :, :3]
        diff = np.abs(theirs.astype(np.int32) - ours.astype(np.int32))
        # two independent IDCT/color paths: allow small per-pixel slack
        assert diff.mean() < 2.0 and diff.max() <= 24, (diff.mean(),
                                                        diff.max())
    finally:
        os.unlink(path)
