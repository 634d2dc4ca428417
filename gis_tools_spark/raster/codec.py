"""Image/raster codecs over stdlib only (no PIL/GDAL in sandbox).

Formats:
  'raw'     — uint8 RGB, w*h*3 bytes row-major (images)
  'raw_f32' — float32 single band, w*h*4 bytes (rasters / DEM analog)
  'png'     — real PNG (8-bit RGB, zlib stdlib) — lossless
  'dct'     — REAL lossy codec (8x8 DCT + JPEG-style quantization +
              zlib) — exercises the PSNR≥40dB roundtrip gate for real

phash: 64-bit stable perceptual-ish hash of decoded pixels (mean-split
on an 8x8 downsample), stored int64.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

NO_DATA_F32 = -9999.0


def encode_raw(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_raw(buf: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, 3)


def encode_raw_f32(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype="<f4").tobytes()


def decode_raw_f32(buf: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(bytes(buf), dtype="<f4").reshape(h, w)


def encode_raw_f64(arr: np.ndarray) -> bytes:
    """float64 single band — the accumulation surface for iterative
    passes (cost distance) where a float32 carry would round at every
    tile crossing and break value-level oracle agreement."""
    return np.ascontiguousarray(arr, dtype="<f8").tobytes()


def decode_raw_f64(buf: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(bytes(buf), dtype="<f8").reshape(h, w)


# ----------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit RGB PNG, filter type 0 rows."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _png_unfilter(raw: bytes, pos: int, ph: int, rowbytes: int,
                  bpp: int) -> tuple[np.ndarray, int]:
    """Undo per-scanline filters 0-4 for one (sub)image; returns the
    reconstructed (ph, rowbytes) bytes + new read position.  Sub/Up are
    vectorized (uint8 add.accumulate wraps mod 256); Average/Paeth keep
    their spec-sequential left dependence in a per-lane loop."""
    out = np.zeros((ph, rowbytes), dtype=np.uint8)
    nlanes = rowbytes // bpp
    for y in range(ph):
        if pos >= len(raw):
            raise ValueError("truncated PNG scanlines")
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, rowbytes, pos + 1).copy()
        pos += 1 + rowbytes
        prev = out[y - 1] if y else np.zeros(rowbytes, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:                      # Sub: prefix sum per byte lane
            lanes = line.reshape(nlanes, bpp)
            out[y] = np.add.accumulate(lanes, axis=0,
                                       dtype=np.uint8).reshape(-1)
        elif f == 2:                      # Up
            out[y] = line + prev
        elif f == 3:                      # Average
            cur = out[y]
            up = prev.reshape(nlanes, bpp).astype(np.uint16)
            ln16 = line.reshape(nlanes, bpp).astype(np.uint16)
            left = np.zeros(bpp, dtype=np.uint16)
            dst = cur.reshape(nlanes, bpp)
            for i in range(nlanes):
                left = (ln16[i] + ((left + up[i]) >> 1)) & 0xFF
                dst[i] = left.astype(np.uint8)
        elif f == 4:                      # Paeth
            cur = out[y]
            up = prev.reshape(nlanes, bpp).astype(np.int32)
            ln32 = line.reshape(nlanes, bpp).astype(np.int32)
            dst = cur.reshape(nlanes, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for i in range(nlanes):
                p = left + up[i] - ul
                pa, pb, pc = (np.abs(p - left), np.abs(p - up[i]),
                              np.abs(p - ul))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, up[i], ul))
                left = (ln32[i] + pred) & 0xFF
                dst[i] = left.astype(np.uint8)
                ul = up[i]
        else:
            raise ValueError(f"invalid PNG filter {f}")
    return out, pos


def _png_samples(rows: np.ndarray, pw: int, bit: int, nch: int
                 ) -> np.ndarray:
    """(ph, rowbytes) filtered-out bytes -> (ph, pw, nch) uint8 samples
    (1/2/4-bit unpacked, 16-bit high byte)."""
    ph = rows.shape[0]
    if bit == 8:
        return rows.reshape(ph, -1)[:, :pw * nch].reshape(ph, pw, nch)
    if bit == 16:
        return rows.reshape(ph, -1, 2)[:, :pw * nch, 0].reshape(ph, pw, nch)
    bits = np.unpackbits(rows, axis=1)
    per = bits.shape[1] // bit
    vals = np.zeros((ph, per), dtype=np.uint8)
    for k in range(bit):
        vals = (vals << 1) | bits[:, k::bit][:, :per]
    return vals[:, :pw * nch].reshape(ph, pw, nch)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(buf: bytes) -> np.ndarray:
    """Full-spec PNG decode -> (h, w, 3) uint8 RGB: color types
    0/2/3/4/6, bit depths 1/2/4/8/16 (16 keeps the high byte), filters
    0-4, Adam7 interlace, PLTE expansion, alpha dropped.  Conformance:
    pixel-exact against the JDK's javax.imageio on both directions
    (tests/test_png_full.py)."""
    buf = bytes(buf)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    plte = None
    w = h = bit = ctype = interlace = None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit, ctype, comp, filt, interlace = \
                struct.unpack_from(">IIBBBBB", data)
            if comp != 0 or filt != 0:
                raise ValueError("bad IHDR compression/filter method")
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"invalid color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, nch * bit // 8)
    img = np.zeros((h, w, nch), dtype=np.uint8)
    passes = _ADAM7 if interlace == 1 else ((0, 0, 1, 1),)
    rpos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rowbytes = (pw * nch * bit + 7) // 8
        rows, rpos = _png_unfilter(raw, rpos, ph, rowbytes, bpp)
        img[y0::dy, x0::dx] = _png_samples(rows, pw, bit, nch)
    # sample scaling + color model -> RGB
    if bit < 8 and ctype != 3:
        img = (img.astype(np.uint16) * 255 // ((1 << bit) - 1)) \
            .astype(np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        return plte[img[:, :, 0]]
    if ctype == 0:
        return np.repeat(img, 3, axis=2)
    if ctype == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    if ctype == 6:
        return img[:, :, :3].copy()
    return img


# ----------------------------------------------------------------- dispatch

def decode(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(buf, w, h)
    if fmt == "raw_gray":
        return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w)
    if fmt == "raw_f32":
        return decode_raw_f32(buf, w, h)
    if fmt == "raw_f64":
        return decode_raw_f64(buf, w, h)
    if fmt == "raw_i16be":
        # SRTM .hgt payload layout (sources/dem.py keeps bytes as-is)
        return np.frombuffer(bytes(buf), dtype=">i2").reshape(h, w) \
            .astype(np.int16)
    if fmt == "png":
        return decode_png(buf)
    if fmt == "dct":
        return decode_dct(buf)
    if fmt in ("jpeg", "jpg"):
        from . import jpeg

        return jpeg.decode(buf)
    if fmt == "webp":
        from . import webp

        return webp.decode(buf)
    if fmt in ("geotiff", "tiff", "tif"):
        from . import geotiff

        return geotiff.decode(buf)[0]
    if fmt == "gif":
        from . import gif

        return gif.decode(buf)
    if fmt == "bmp":
        from . import bmp

        return bmp.decode(buf)
    if fmt in ("heic", "avif"):
        from . import native_heif

        if not native_heif.available(
                native_heif.AV1 if fmt == "avif" else native_heif.HEVC):
            raise NotImplementedError(
                f"{fmt}: system libheif (with the codec plugin) is "
                "required — not present in this environment")
        return native_heif.decode(buf)
    raise ValueError(f"unknown fmt {fmt!r}")


def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt in ("raw", "raw_gray"):
        return encode_raw(arr)
    if fmt == "raw_f32":
        return encode_raw_f32(arr)
    if fmt == "raw_f64":
        return encode_raw_f64(arr)
    if fmt == "raw_i16be":
        return np.ascontiguousarray(arr.astype(">i2")).tobytes()
    if fmt == "png":
        return encode_png(arr)
    if fmt == "dct":
        return encode_dct(arr)
    if fmt in ("jpeg", "jpg"):
        from . import jpeg

        return jpeg.encode(arr)
    if fmt == "webp":
        from . import webp

        return webp.encode(arr)
    if fmt in ("geotiff", "tiff", "tif"):
        from . import geotiff

        return geotiff.encode(arr)
    if fmt == "gif":
        from . import gif

        return gif.encode(arr)
    if fmt == "bmp":
        from . import bmp

        return bmp.encode(arr)
    if fmt in ("heic", "avif"):
        from . import native_heif

        if not native_heif.available(
                native_heif.AV1 if fmt == "avif" else native_heif.HEVC,
                encode=True):
            raise NotImplementedError(
                f"{fmt}: system libheif (with the codec plugin) is "
                "required — not present in this environment")
        return native_heif.encode(arr, codec=fmt)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_many(bufs, ws, hs, fmts) -> list:
    """Decode a whole Arrow-batch worth of images; returns a same-length
    list of decoded arrays, with the per-item Exception in place of the
    array for rows that fail (callers decide row-level error policy —
    the Spark kernels mark, never raise).

    JPEG rows are decoded in vectorized lockstep across the batch
    (raster/jpeg.py decode_batch) — entropy decode is the dominant
    kernel of a mostly-JPEG table, and batching across independent
    streams is how a python decoder escapes per-symbol interpreter cost.
    Other formats decode per-row (their decoders are already
    single-pass numpy over the whole buffer)."""
    out: list = [None] * len(bufs)
    jidx = [i for i, f in enumerate(fmts) if f in ("jpeg", "jpg")]
    if jidx:
        from . import jpeg

        for i, r in zip(jidx, jpeg.decode_batch([bufs[i] for i in jidx])):
            out[i] = r
    for i, f in enumerate(fmts):
        if f in ("jpeg", "jpg"):
            continue
        try:
            out[i] = decode(bufs[i], int(ws[i]), int(hs[i]), f)
        except Exception as e:  # noqa: BLE001 — per-row error value
            out[i] = e
    return out


def phash64(arr: np.ndarray) -> int:
    """Stable 64-bit mean-split hash of an 8x8 average-downsample."""
    a = arr.astype(np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    if h % 8 == 0 and w % 8 == 0:
        # vectorized block means (hot path: fixture sizes are 8-divisible)
        grid = a.reshape(8, h // 8, 8, w // 8).swapaxes(1, 2).reshape(8, 8, -1).mean(axis=2)
    else:
        ys = (np.arange(8) * h // 8)
        xs = (np.arange(8) * w // 8)
        ye = np.append(ys[1:], h)
        xe = np.append(xs[1:], w)
        grid = np.array([[a[ys[i]:ye[i], xs[j]:xe[j]].mean() for j in range(8)]
                         for i in range(8)])
    bits = (grid > grid.mean()).ravel()
    weights = np.left_shift(np.uint64(1), np.arange(63, -1, -1, dtype=np.uint64))
    v = int((bits.astype(np.uint64) * weights).sum(dtype=np.uint64))
    return v - (1 << 64) if v >= (1 << 63) else v


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


# ----------------------------------------------------------------- lossy DCT
# A REAL lossy codec in stdlib+numpy ('dct' fmt): 8x8 block DCT-II,
# JPEG-style quantization, int16 + zlib entropy stage. It exercises the
# PSNR>=40dB lossy-roundtrip gate (BASELINE.md) for real — jpeg and webp
# are now ALSO real from-scratch codecs (raster/jpeg.py, raster/webp.py),
# and the engine's lossy plumbing (fmt dispatch, re-encode sinks, verify
# kernels) runs an
# actual rate-distortion codec, not a stub.

_DCT_C = np.array([[np.sqrt((1 if k == 0 else 2) / 8.0)
                    * np.cos(np.pi * (2 * n + 1) * k / 16.0)
                    for n in range(8)] for k in range(8)])

# ITU-T T.81 Annex K luminance quantization table (public spec constants)
_QTAB = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)


def _qscale(quality: int) -> np.ndarray:
    quality = int(np.clip(quality, 1, 100))
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.maximum(np.floor((_QTAB * s + 50) / 100), 1.0)


def encode_dct(arr: np.ndarray, quality: int = 95) -> bytes:
    """uint8 RGB → blocked DCT + quantize + zlib. Header carries
    (h, w, quality) so decode is self-contained."""
    a = np.ascontiguousarray(arr, dtype=np.float64)
    h, w, c = a.shape
    ph, pw = -h % 8, -w % 8
    a = np.pad(a, ((0, ph), (0, pw), (0, 0)), mode="edge") - 128.0
    H, W = a.shape[:2]
    q = _qscale(quality)
    blocks = a.reshape(H // 8, 8, W // 8, 8, c).transpose(0, 2, 4, 1, 3)
    coef = np.einsum("kn,bcznm,ml->bczkl", _DCT_C, blocks, _DCT_C.T)
    qc = np.round(coef / q).astype(np.int16)
    head = struct.pack("<IIBB", h, w, c, quality)
    return head + zlib.compress(qc.tobytes(), 6)


def decode_dct(buf: bytes) -> np.ndarray:
    buf = bytes(buf)
    h, w, c, quality = struct.unpack_from("<IIBB", buf)
    H, W = h + (-h % 8), w + (-w % 8)
    q = _qscale(quality)
    qc = np.frombuffer(zlib.decompress(buf[10:]), dtype=np.int16)
    qc = qc.reshape(H // 8, W // 8, c, 8, 8).astype(np.float64) * q
    blocks = np.einsum("nk,bczkl,lm->bcznm", _DCT_C.T, qc, _DCT_C)
    out = blocks.transpose(0, 3, 1, 4, 2).reshape(H, W, c) + 128.0
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
