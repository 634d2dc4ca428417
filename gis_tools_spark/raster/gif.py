"""GIF87a/89a codec, from scratch (LZW + palettes + interlace +
animation), completing the crawl image-format family next to
jpeg/png/webp.

Decode: variable-width LZW (LSB-first codes, CLEAR/EOI, 4096-entry
dict), global/local color tables, the 4-pass interlace, multi-frame
animations with disposal none/keep/restore-background, transparency
via the GCE transparent index (composited over the previous canvas).
Encode: real LZW (dict rebuild on CLEAR at 4096), exact palette when
the image has <= 256 distinct colors, else a uniform 6x7x6 cube
quantization (documented lossy path); animation via per-frame delays.

Conformance is third-party like PNG/JPEG/TIFF/WebP: pixel-exact both
directions against the JDK's javax.imageio (tests/test_gif.py).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


# ------------------------------------------------------------------ LZW

def _lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first variable-width codes."""
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(npix + 4096, dtype=np.uint8)
    n_out = 0
    # bit reader over the concatenated sub-block payload
    acc = 0
    nbits = 0
    pos = 0
    width = min_code + 1
    dict_codes: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    ln = len(data)
    while True:
        while nbits < width:
            if pos >= ln:
                # missing EOI: tolerated in the wild
                return out[:n_out]
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_codes = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            return out[:n_out]
        if prev is None:
            entry = dict_codes[code]
        elif code < len(dict_codes):
            entry = dict_codes[code]
            dict_codes.append(prev + entry[:1])
        elif code == len(dict_codes):
            entry = prev + prev[:1]
            dict_codes.append(entry)
        else:
            raise GifError("corrupt LZW code")
        k = len(entry)
        if n_out + k > len(out):
            raise GifError("LZW output exceeds frame size")
        out[n_out:n_out + k] = np.frombuffer(entry, dtype=np.uint8)
        n_out += k
        prev = entry
        if len(dict_codes) == (1 << width) and width < 12:
            width += 1
        if n_out >= npix:
            return out[:npix]


def _lzw_encode(idx: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear)
    prev = b""
    for v in idx.tobytes():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code + 1
        prev = bytes([v])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------------ decode

_ILACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_frames(buf: bytes):
    """GIF bytes -> (frames (n, h, w, 3) uint8, delays_cs list[int]).
    Any structural corruption raises GifError (never IndexError)."""
    try:
        return _decode_frames(bytes(buf))
    except (IndexError, struct.error) as e:
        raise GifError(f"truncated/corrupt GIF: {e}") from e


def _decode_frames(buf: bytes):
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[_bg] if _bg < len(gct) else 0
    frames = []
    delays = []
    transparent = None
    delay = 0
    disposal = 0
    while pos < len(buf):
        b = buf[pos]
        pos += 1
        if b == 0x3B:                       # trailer
            break
        if b == 0x21:                       # extension
            label = buf[pos]
            pos += 1
            if label == 0xF9:               # graphic control
                sz = buf[pos]
                gflags, delay = struct.unpack_from("<BH", buf, pos + 1)
                ti = buf[pos + 4]
                transparent = ti if gflags & 1 else None
                disposal = (gflags >> 2) & 7
                pos += 1 + sz
            while buf[pos] != 0:            # skip (remaining) sub-blocks
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise GifError(f"unexpected block 0x{b:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise GifError("no color table")
        min_code = buf[pos]
        pos += 1
        blob = bytearray()
        while buf[pos] != 0:
            k = buf[pos]
            blob += buf[pos + 1:pos + 1 + k]
            pos += 1 + k
        pos += 1
        idx = _lzw_decode(bytes(blob), min_code, fw * fh)
        if len(idx) < fw * fh:
            idx = np.pad(idx, (0, fw * fh - len(idx)))
        grid = idx.reshape(fh, fw)
        if iflags & 0x40:                   # interlace
            de = np.empty_like(grid)
            r = 0
            for start, step in _ILACE:
                nr = len(range(start, fh, step))
                de[start::step] = grid[r:r + nr]
                r += nr
            grid = de
        prev_canvas = canvas.copy()
        region = canvas[top:top + fh, left:left + fw]
        rgb = ct[np.clip(grid, 0, len(ct) - 1)]
        if transparent is not None:
            mask = (grid != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:                   # restore background
            canvas[top:top + fh, left:left + fw] = \
                (gct[_bg] if gct is not None and _bg < len(gct) else 0)
        elif disposal == 3:                 # restore previous
            canvas = prev_canvas
    if not frames:
        raise GifError("no image data")
    return np.stack(frames), delays


def decode(buf: bytes) -> np.ndarray:
    """First (or only) frame as (h, w, 3) uint8."""
    return decode_frames(buf)[0][0]


# ------------------------------------------------------------------ encode

def _palette(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n,3), indices (h,w)) — exact when <=256 colors, else
    a uniform 6x7x6 cube (252 colors)."""
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(uniq) <= 256:
        return uniq, inv.reshape(h, w).astype(np.uint16)
    r = np.minimum(flat[:, 0].astype(np.int32) * 6 // 256, 5)
    g = np.minimum(flat[:, 1].astype(np.int32) * 7 // 256, 6)
    b = np.minimum(flat[:, 2].astype(np.int32) * 6 // 256, 5)
    idx = (r * 42 + g * 6 + b).astype(np.uint16)
    rr, gg, bb = np.meshgrid(np.arange(6), np.arange(7), np.arange(6),
                             indexing="ij")
    pal = np.stack([(rr * 255 // 5), (gg * 255 // 6), (bb * 255 // 5)],
                   axis=-1).reshape(-1, 3).astype(np.uint8)
    return pal, idx.reshape(h, w)


def encode(frames: np.ndarray, *, delays_cs=None, loop: bool = True
           ) -> bytes:
    """(h,w,3) or (n,h,w,3) uint8 -> GIF89a bytes (real LZW)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape
    if delays_cs is None:
        delays_cs = [10] * n
    pal, _ = _palette(frames.reshape(n * h, w, 3))   # shared global table
    bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    size = 1 << bits
    gct = np.zeros((size, 3), dtype=np.uint8)
    gct[:len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4)
                       | (bits - 1), 0, 0)
    out += gct.tobytes()
    if n > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    lut = {tuple(c): i for i, c in enumerate(pal)}
    for fi in range(n):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0,
                                             int(delays_cs[fi]), 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        flat = frames[fi].reshape(-1, 3)
        uniq, inv = np.unique(flat, axis=0, return_inverse=True)
        remap = np.array([lut.get(tuple(c), _nearest(pal, c))
                          for c in uniq], dtype=np.uint16)
        idx = remap[inv].astype(np.uint8)
        min_code = max(2, bits)
        out.append(min_code)
        payload = _lzw_encode(idx, min_code)
        for i in range(0, len(payload), 255):
            chunk = payload[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _nearest(pal: np.ndarray, c) -> int:
    d = np.sum((pal.astype(np.int32) - np.asarray(c, dtype=np.int32)) ** 2,
               axis=1)
    return int(np.argmin(d))
