"""From-scratch GeoTIFF codec (raster/geotiff.py): dtype x layout x
compression roundtrips, geo-tag goldens, and TWO-WAY conformance
against the system libtiff via ctypes — libtiff reads this writer's
files pixel-exactly, and this reader decodes libtiff-written files
(LZW + predictor, PackBits, tiled layouts the writer never emits).

Reference parity: gis-tools reads every raster through GDAL's GeoTIFF
driver (/root/reference/gistools/raster.py:158-165).
"""

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np
import pytest

from gis_tools_spark.raster import geotiff as G

GT = (5.25, 0.001, 44.75, 0.001)


def _rand(dtype, shape, seed=0):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return rng.normal(100, 30, shape).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(max(info.min, -1000), min(info.max, 1000),
                        shape).astype(dtype)


def test_roundtrip_dtypes_shapes_compressions():
    for comp in ("deflate", "none"):
        for dtype in (np.uint8, np.uint16, np.int16, np.int32,
                      np.float32, np.float64):
            for shape in ((40, 56), (33, 47), (24, 16, 3)):
                a = _rand(dtype, shape, seed=hash((comp, str(dtype))) % 97)
                buf = G.encode(a, gt=GT, epsg=4326, nodata=-999.0,
                               compression=comp)
                out, info = G.decode(buf)
                assert np.array_equal(out, a), (comp, dtype, shape)
                assert info["epsg"] == 4326 and info["nodata"] == -999.0
                assert abs(info["gt_x0"] - GT[0]) < 1e-12
                assert abs(info["gt_ry"] - GT[3]) < 1e-12


def test_projected_epsg_and_bare_tiff():
    a = _rand(np.float32, (16, 16))
    _, info = G.decode(G.encode(a, gt=GT, epsg=32631))
    assert info["epsg"] == 32631
    _, info = G.decode(G.encode(a))
    assert info["epsg"] is None and info["gt_x0"] is None


def test_corrupt_and_unsupported_raise():
    with pytest.raises(ValueError):
        G.decode(b"not a tiff at all")
    a = _rand(np.uint8, (8, 8))
    buf = bytearray(G.encode(a))
    with pytest.raises(ValueError):
        G.decode(bytes(buf[:40]))
    with pytest.raises(ValueError):
        G.decode(b"II+\0" + b"\0" * 40)   # malformed BigTIFF header


# ------------------------------------------------------- libtiff harness

def _libtiff():
    name = ctypes.util.find_library("tiff")
    if not name:
        return None
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    lib.TIFFSetErrorHandler.restype = ctypes.c_void_p
    lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
    lib.TIFFSetWarningHandler(None)       # unknown-tag warnings off
    lib.TIFFReadEncodedStrip.restype = ctypes.c_ssize_t
    lib.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
    lib.TIFFWriteEncodedTile.restype = ctypes.c_ssize_t
    return lib


_TIFF = _libtiff()
needs_libtiff = pytest.mark.skipif(_TIFF is None, reason="libtiff absent")

# libtiff varargs: pass explicitly-typed ctypes values
_CI = ctypes.c_int


@needs_libtiff
def test_libtiff_reads_our_writer():
    """The reference C library opens this writer's files and reproduces
    the pixels — writer conformance, not just self-consistency."""
    for dtype, sfmt in ((np.uint8, 1), (np.int16, 2), (np.float32, 3)):
        a = _rand(dtype, (37, 53), seed=7)
        buf = G.encode(a, gt=GT, epsg=4326, nodata=-5.0,
                       compression="deflate")
        with tempfile.NamedTemporaryFile(suffix=".tif",
                                         delete=False) as f:
            f.write(buf)
            path = f.name
        try:
            tif = _TIFF.TIFFOpen(path.encode(), b"r")
            assert tif, "libtiff refused our file"
            w = ctypes.c_uint32()
            h = ctypes.c_uint32()
            _TIFF.TIFFGetField(ctypes.c_void_p(tif), _CI(256),
                               ctypes.byref(w))
            _TIFF.TIFFGetField(ctypes.c_void_p(tif), _CI(257),
                               ctypes.byref(h))
            assert (w.value, h.value) == (53, 37)
            rows = []
            strip = 0
            got = 0
            while got < 37:
                out = ctypes.create_string_buffer(53 * 37 * a.itemsize)
                n = _TIFF.TIFFReadEncodedStrip(ctypes.c_void_p(tif),
                                               ctypes.c_uint32(strip),
                                               out, ctypes.c_ssize_t(-1))
                assert n > 0
                rows.append(np.frombuffer(out.raw[:n], dtype=dtype))
                got += n // (53 * a.itemsize)
                strip += 1
            dec = np.concatenate(rows).reshape(37, 53)
            assert np.array_equal(dec, a), dtype
            _TIFF.TIFFClose(ctypes.c_void_p(tif))
        finally:
            os.unlink(path)


def _libtiff_write(path, a, comp, predictor=None, tiled=False,
                   bigtiff=False):
    tif = _TIFF.TIFFOpen(path.encode(), b"w8" if bigtiff else b"w")
    assert tif
    t = ctypes.c_void_p(tif)
    h, w = a.shape
    sfmt = {"u": 1, "i": 2, "f": 3}[a.dtype.kind]
    _TIFF.TIFFSetField(t, _CI(256), ctypes.c_uint32(w))
    _TIFF.TIFFSetField(t, _CI(257), ctypes.c_uint32(h))
    _TIFF.TIFFSetField(t, _CI(258), _CI(a.itemsize * 8))
    _TIFF.TIFFSetField(t, _CI(259), _CI(comp))
    _TIFF.TIFFSetField(t, _CI(262), _CI(1))
    _TIFF.TIFFSetField(t, _CI(277), _CI(1))
    _TIFF.TIFFSetField(t, _CI(284), _CI(1))
    _TIFF.TIFFSetField(t, _CI(339), _CI(sfmt))
    if predictor:
        _TIFF.TIFFSetField(t, _CI(317), _CI(predictor))
    if tiled:
        _TIFF.TIFFSetField(t, _CI(322), ctypes.c_uint32(16))
        _TIFF.TIFFSetField(t, _CI(323), ctypes.c_uint32(16))
        ntx, nty = -(-w // 16), -(-h // 16)
        pad = np.zeros((nty * 16, ntx * 16), dtype=a.dtype)
        pad[:h, :w] = a
        i = 0
        for ty in range(nty):
            for tx in range(ntx):
                blk = np.ascontiguousarray(
                    pad[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16])
                n = _TIFF.TIFFWriteEncodedTile(
                    t, ctypes.c_uint32(i), blk.ctypes.data_as(
                        ctypes.c_void_p),
                    ctypes.c_ssize_t(blk.nbytes))
                assert n > 0
                i += 1
    else:
        _TIFF.TIFFSetField(t, _CI(278), ctypes.c_uint32(h))
        buf = np.ascontiguousarray(a)
        n = _TIFF.TIFFWriteEncodedStrip(
            t, ctypes.c_uint32(0),
            buf.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_ssize_t(buf.nbytes))
        assert n > 0
    _TIFF.TIFFClose(t)


@needs_libtiff
@pytest.mark.parametrize("comp,predictor,tiled,dtype", [
    (5, None, False, np.uint8),       # LZW
    (5, 2, False, np.uint16),         # LZW + horizontal predictor
    (8, 2, False, np.int16),          # deflate + predictor
    (8, 3, False, np.float32),        # deflate + float predictor
    (32773, None, False, np.uint8),   # PackBits
    (5, None, True, np.uint8),        # tiled LZW
    (8, 3, True, np.float64),         # tiled deflate float predictor
])
def test_our_reader_decodes_libtiff_files(comp, predictor, tiled, dtype):
    """Reader conformance: files the reference C library writes —
    compressions, predictors and tiled layouts our writer never emits —
    decode pixel-exactly."""
    a = _rand(dtype, (37, 53), seed=comp + (predictor or 0))
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        path = f.name
    try:
        _libtiff_write(path, a, comp, predictor, tiled)
        with open(path, "rb") as f:
            buf = f.read()
        out, _info = G.decode(buf)
        assert out.dtype == a.dtype
        assert np.array_equal(out, a)
    finally:
        os.unlink(path)


def test_bigtiff_roundtrip_self():
    """BigTIFF (43-magic, 8-byte offsets) — the layout huge mosaics
    ship — round-trips through encode(bigtiff=True)/decode with
    georeferencing intact."""
    for dtype in (np.uint8, np.uint16, np.float32):
        a = _rand(dtype, (61, 43), seed=17)
        buf = G.encode(a, gt=GT, epsg=32633, nodata=0.0, bigtiff=True)
        assert buf[:4] == b"II+\0"
        out, info = G.decode(buf)
        assert np.array_equal(out, a)
        assert info["epsg"] == 32633
    info = G.read_info(buf)
    assert (info["w"], info["h"]) == (43, 61)


@needs_libtiff
def test_libtiff_reads_our_bigtiff():
    a = _rand(np.uint16, (37, 53), seed=9)
    buf = G.encode(a, bigtiff=True, compression="deflate")
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        f.write(buf)
        path = f.name
    try:
        tif = _TIFF.TIFFOpen(path.encode(), b"r")
        assert tif, "libtiff refused our BigTIFF"
        out = ctypes.create_string_buffer(53 * 37 * 2)
        rows = []
        strip = 0
        got = 0
        while got < 37:
            n = _TIFF.TIFFReadEncodedStrip(ctypes.c_void_p(tif),
                                           ctypes.c_uint32(strip), out,
                                           ctypes.c_ssize_t(-1))
            assert n > 0
            rows.append(np.frombuffer(out.raw[:n], dtype=np.uint16).copy())
            got += n // (53 * 2)
            strip += 1
        _TIFF.TIFFClose(ctypes.c_void_p(tif))
        assert np.array_equal(np.concatenate(rows).reshape(37, 53), a)
    finally:
        os.unlink(path)


@needs_libtiff
def test_our_reader_decodes_libtiff_bigtiff():
    a = _rand(np.float32, (37, 53), seed=11)
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        path = f.name
    try:
        _libtiff_write(path, a, 8, predictor=3, bigtiff=True)
        with open(path, "rb") as f:
            buf = f.read()
        out, _info = G.decode(buf)
        assert np.array_equal(out, a)
    finally:
        os.unlink(path)
