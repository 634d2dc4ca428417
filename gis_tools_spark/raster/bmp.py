"""BMP (Windows DIB) codec — the last of the common crawl image
formats next to jpeg/png/webp/gif.

Decode: BITMAPINFOHEADER-family headers (40/52/56/108/124-byte),
bottom-up and top-down rows, bit depths 1/4/8 (palettized) and 16/24/
32 (BI_RGB and BI_BITFIELDS with arbitrary masks), RLE8/RLE4
compression including delta escapes.  Encode: 24-bit BI_RGB.
Conformance third-party: pixel-exact both directions against the
JDK's javax.imageio (tests/test_gif.py::test_bmp_*)."""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def decode(buf: bytes) -> np.ndarray:
    buf = bytes(buf)
    if buf[:2] != b"BM" or len(buf) < 54:
        raise BmpError("not a BMP")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hsz = struct.unpack_from("<I", buf, 14)[0]
    if hsz < 40:
        raise BmpError(f"unsupported DIB header size {hsz}")
    w, h_raw = struct.unpack_from("<ii", buf, 18)
    planes, bpp, comp = struct.unpack_from("<HHI", buf, 26)
    clr_used = struct.unpack_from("<I", buf, 46)[0]
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0 or planes != 1:
        raise BmpError("bad dimensions")
    # palette (BGRA quads) sits after the header (+masks for BI_BITFIELDS
    # in a 40-byte header)
    pal_off = 14 + hsz
    masks = None
    if comp == 3:
        if hsz == 40:
            masks = struct.unpack_from("<III", buf, pal_off)
            pal_off += 12
        else:
            masks = struct.unpack_from("<III", buf, 54)
    elif comp not in (0, 1, 2):
        raise BmpError(f"unsupported compression {comp}")
    palette = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        raw = np.frombuffer(buf, np.uint8, n * 4, pal_off).reshape(n, 4)
        palette = raw[:, 2::-1].copy()          # BGRA -> RGB
    if comp in (1, 2):
        idx = _rle_decode(buf[data_off:], w, h, comp)
        img = palette[np.clip(idx, 0, len(palette) - 1)]
        return img if top_down else img[::-1].copy()
    rowbytes = (w * bpp + 31) // 32 * 4
    need = rowbytes * h
    raw = np.frombuffer(buf, np.uint8, min(need, len(buf) - data_off),
                        data_off)
    if len(raw) < need:
        raise BmpError("truncated pixel data")
    rows = raw.reshape(h, rowbytes)
    if bpp == 24:
        img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
    elif bpp == 32:
        px = rows[:, :w * 4].reshape(h, w, 4)
        if masks:
            v = px.view("<u4")[:, :, 0]
            img = np.stack([_apply_mask(v, m) for m in masks], axis=-1)
        else:
            img = px[:, :, 2::-1]
    elif bpp == 16:
        v = rows[:, :w * 2].reshape(h, w, 2).view("<u2")[:, :, 0]
        r_m, g_m, b_m = masks if masks else (0x7C00, 0x03E0, 0x001F)
        img = np.stack([_apply_mask(v, r_m), _apply_mask(v, g_m),
                        _apply_mask(v, b_m)], axis=-1)
    elif bpp in (1, 4, 8):
        if bpp == 8:
            idx = rows[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)
            per = bits.shape[1] // bpp
            vals = np.zeros((h, per), dtype=np.uint8)
            for k in range(bpp):
                vals = (vals << 1) | bits[:, k::bpp][:, :per]
            idx = vals[:, :w]
        img = palette[np.clip(idx, 0, len(palette) - 1)]
    else:
        raise BmpError(f"unsupported bit depth {bpp}")
    img = np.ascontiguousarray(img.astype(np.uint8))
    return img if top_down else img[::-1].copy()


def _apply_mask(v: np.ndarray, mask: int) -> np.ndarray:
    if mask == 0:
        return np.zeros(v.shape, dtype=np.uint8)
    shift = (mask & -mask).bit_length() - 1
    width = int(mask >> shift).bit_length()
    x = (v.astype(np.uint32) & mask) >> shift
    return (x * 255 // ((1 << width) - 1)).astype(np.uint8)


def _rle_decode(data: bytes, w: int, h: int, comp: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt:                              # encoded run
            if comp == 1:
                vals = [val] * cnt
            else:
                vals = [(val >> 4, val & 15)[i & 1] for i in range(cnt)]
            k = min(cnt, w - x)
            if y < h:
                out[y, x:x + k] = vals[:k]
            x += cnt
        elif val == 0:                       # end of line
            x, y = 0, y + 1
        elif val == 1:                       # end of bitmap
            break
        elif val == 2:                       # delta
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:                                # absolute mode
            if comp == 1:
                vals = list(data[pos:pos + val])
                adv = (val + 1) & ~1
            else:
                bb = data[pos:pos + (val + 1) // 2]
                vals = []
                for i in range(val):
                    b = bb[i // 2]
                    vals.append(b >> 4 if i % 2 == 0 else b & 15)
                adv = ((val + 1) // 2 + 1) & ~1
            k = min(val, w - x)
            if y < h:
                out[y, x:x + k] = vals[:k]
            x += val
            pos += adv
    return out


def encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP (bottom-up)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, _ = a.shape
    rowbytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, rowbytes), dtype=np.uint8)
    rows[:, :w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)
    pix = rows.tobytes()
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                         2835, 2835, 0, 0))
    return hdr + pix
