"""From-scratch WebP codec — pure numpy/stdlib.

This module carries the RIFF container plus the VP8L (lossless)
coder; lossy VP8 encode/decode lives in ``raster/vp8.py`` (RFC 6386,
bit-exact with libwebp — see test_vp8.py) and is dispatched from
``decode``/``encode(lossy=True)`` here. Together they close the
reference's webp surface (gistools rasters round-trip through PIL/GDAL
drivers; /root/reference/gistools/raster.py:99-141) without the
PIL/libwebp wheel, the same way ``raster/jpeg.py`` closed JPEG: real
implementations of the public bitstream specs (RFC 9649 container +
VP8L, RFC 6386 VP8).

Encoder — spec-conformant subset chosen for simplicity, not ratio:
  * RIFF/WEBP/VP8L container, 14-bit dims, version 0
  * no transforms, no color cache, single prefix-code group
  * literal-only coding: green/red/blue channels use a flat 8-bit
    canonical prefix code (all 256 symbols length 8 — Kraft-complete),
    emitted through the standard code-length code with repeat-16/18
    runs; constant channels (e.g. alpha=255) use the 1-symbol "simple
    code" form. Any conformant decoder reads these files.

Decoder — the general entropy machinery plus the subset of features a
conformant reader needs for such streams, and then some:
  * simple and full code-length-coded prefix codes (incl. repeat codes
    16/17/18 and the max_symbol early-stop), canonical reconstruction
  * color cache (any size), LZ77 length codes, linear distances
  * subtract-green transform
  * NOT implemented (clearly raised): predictor / color / palette
    transforms and the 120 neighbor-mapped short distances — none are
    emitted by this encoder.

Bit order: LSB-first within bytes (DEFLATE-style); prefix-code bits are
consumed root→leaf, so canonical codes are written MSB-of-code first.
"""

from __future__ import annotations

import struct

import numpy as np

_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


# ------------------------------------------------------------------ bit io

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        """LSB-first: bit i of value becomes the next stream bit."""
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits, MSB of the canonical code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def write_codes(self, codes: np.ndarray, lens: np.ndarray) -> None:
        """Vectorized write_code over arrays: expand every code to its
        MSB-first bits, splice behind the current partial byte, and
        pack LSB-first at numpy rate (bit-identical to the loop —
        pinned by test_webp's stream equality)."""
        codes = np.asarray(codes, dtype=np.int64)
        lens = np.asarray(lens, dtype=np.int64)
        ends = np.cumsum(lens)
        total = int(ends[-1]) if len(ends) else 0
        if not total:
            return
        j = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)
        bits = ((np.repeat(codes, lens)
                 >> (np.repeat(lens, lens) - 1 - j)) & 1).astype(np.uint8)
        pre = np.frombuffer(bytes([self.acc & 0xFF]), dtype=np.uint8)
        pre_bits = np.unpackbits(pre, bitorder="little")[:self.n]
        allbits = np.concatenate([pre_bits, bits])
        nfull = len(allbits) // 8
        self.buf += np.packbits(allbits[:nfull * 8],
                                bitorder="little").tobytes()
        rem = allbits[nfull * 8:]
        self.acc = int(np.packbits(rem, bitorder="little")[0]) if len(rem) \
            else 0
        self.n = len(rem)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


class _BitReader:
    """LSB-first reader over precomputed little-endian 64-bit words
    (one per byte offset): any read of ≤57 bits is one list index +
    shift/mask — no per-bit loop (round-4 LUT rewrite, the same
    technique as the JPEG entropy decoder)."""

    __slots__ = ("words", "pos")

    def __init__(self, data: bytes):
        d = np.frombuffer(bytes(data), dtype=np.uint8)
        v = np.concatenate([d, np.zeros(8, dtype=np.uint8)]).astype(np.uint64)
        w = v[:-7].copy()
        for k in range(1, 8):
            w |= v[k:len(v) - 7 + k] << np.uint64(8 * k)
        self.words = w.tolist()
        self.pos = 0          # bit position

    def read(self, nbits: int) -> int:
        p = self.pos
        v = (self.words[p >> 3] >> (p & 7)) & ((1 << nbits) - 1)
        self.pos = p + nbits
        return v

    def read_bit(self) -> int:
        p = self.pos
        b = (self.words[p >> 3] >> (p & 7)) & 1
        self.pos = p + 1
        return b


# ------------------------------------------------------------ prefix codes

def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (by length, then symbol)."""
    syms = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in syms:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _Decoder:
    """Table-driven canonical prefix decoder: one 15-bit peek resolves
    (symbol, code length) from a 32768-entry LUT (codes enter the
    stream MSB-first inside LSB-first packing, so each code's bits are
    REVERSED to form the peek index — zlib-style). Handles the 0-bit
    single-symbol code."""

    __slots__ = ("single", "lut", "mask")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.lut = None
            return
        self.single = None
        maxlen = max(l for l, _ in nz)
        if maxlen > 15:
            raise ValueError("prefix code length > 15")
        # LUT sized to the actual max code length: building 2^15
        # entries per code costs more than decoding a small image
        lut = np.zeros(1 << maxlen, dtype=np.int32)
        self.mask = (1 << maxlen) - 1
        code = 0
        prev = 0
        for l, s in sorted(nz):
            code <<= (l - prev)
            prev = l
            rev = int(f"{code:0{l}b}"[::-1], 2)
            lut[rev::1 << l] = (l << 12) | s
            code += 1
        self.lut = lut.tolist()

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        p = br.pos
        e = self.lut[(br.words[p >> 3] >> (p & 7)) & self.mask]
        if e == 0:
            raise ValueError("invalid prefix code in stream")
        br.pos = p + (e >> 12)
        return e & 0xFFF


def _write_flat_code(bw: _BitWriter, alphabet_size: int) -> None:
    """Emit the code-length code for 'first 256 symbols all length 8,
    rest 0' through the standard machinery (repeat-16 runs + repeat-18
    zero fill)."""
    bw.write(0, 1)                       # not simple
    # code-length-code: lengths for symbols {8:1, 16:2, 18:2}
    # kOrder positions: 17@0 18@1 0@2 1@3 2@4 3@5 4@6 5@7 16@8 6@9 7@10 8@11
    bw.write(12 - 4, 4)                  # num_code_lengths = 12
    cl_len = {8: 1, 16: 2, 18: 2}
    for sym in _ORDER[:12]:
        bw.write(cl_len.get(sym, 0), 3)
    cl_codes = _canonical_codes(
        [cl_len.get(s, 0) for s in range(19)])
    bw.write(0, 1)                       # no max_symbol early stop

    def emit(sym: int, extra: tuple[int, int] | None = None):
        c, l = cl_codes[sym]
        bw.write_code(c, l)
        if extra is not None:
            bw.write(extra[0], extra[1])

    emit(8)                              # symbol 0: length 8
    remaining = 255                      # symbols 1..255: repeat prev
    while remaining > 0:
        r = min(6, remaining)
        if remaining - r in (1, 2):      # keep final run >= 3
            r = remaining - 3
        emit(16, (r - 3, 2))
        remaining -= r
    zeros = alphabet_size - 256          # trailing zero lengths
    while zeros > 0:
        r = min(138, zeros)
        if 0 < zeros - r < 11:
            r = zeros - 11
        emit(18, (r - 11, 7))
        zeros -= r


def _write_simple_code(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)                       # simple
    bw.write(0, 1)                       # 1 symbol
    bw.write(1, 1)                       # 8-bit symbol
    bw.write(symbol, 8)


def _read_code(br: _BitReader, alphabet_size: int) -> _Decoder:
    if br.read_bit():                    # simple
        nsym = br.read_bit() + 1
        if br.read_bit():
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        lengths = [0] * alphabet_size
        if nsym == 1:
            lengths[s0] = 1               # single-symbol: 0-bit read path
            d = _Decoder.__new__(_Decoder)
            d.single = s0
            d.lut = None
            return d
        s1 = br.read(8)
        lengths[s0] = 1
        lengths[s1] = 1
        if s0 == s1:
            raise ValueError("degenerate simple code")
        return _Decoder(lengths)
    # full: code-length code
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_ORDER[i]] = br.read(3)
    cl_dec = _Decoder(cl_lengths)
    if br.read_bit():                    # max_symbol early stop
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_dec.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = min(3 + br.read(2), alphabet_size - sym)
            lengths[sym:sym + rep] = [prev] * rep
            sym += rep
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _Decoder(lengths)


# ------------------------------------------------------------------ encode

def encode(arr: np.ndarray, lossy: bool = False,
           quality: float = 85.0) -> bytes:
    """(h,w) or (h,w,3) uint8 → WebP bytes.

    Default is the from-scratch pure-python VP8L lossless stream;
    ``lossy=True`` emits a from-scratch VP8 keyframe stream
    (raster/vp8.py — quality maps ~linearly onto the VP8 quantizer
    index; libwebp-conformance pinned in test_vp8.py)."""
    if lossy:
        from . import vp8

        q_index = int(round((100.0 - min(100.0, max(0.0, quality))) * 1.27))
        payload = vp8.encode(np.asarray(arr, dtype=np.uint8),
                             q_index=max(0, min(127, q_index)))
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        riff = b"WEBP" + chunk
        return b"RIFF" + struct.pack("<I", len(riff)) + riff
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        r = g = b = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    else:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w = r.shape
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError("dims out of VP8L 14-bit range")

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                       # alpha hint
    bw.write(0, 3)                       # version
    bw.write(0, 1)                       # no transforms
    bw.write(0, 1)                       # no color cache
    bw.write(0, 1)                       # no meta prefix image

    gr_f, rr_f, bb_f = g.ravel(), r.ravel(), b.ravel()
    chans = []                           # (flat values, codes dict or None)
    for vals, alphabet in ((gr_f, 280), (rr_f, 256), (bb_f, 256)):
        uniq = np.unique(vals)
        if len(uniq) == 1:
            _write_simple_code(bw, int(uniq[0]))
            chans.append((vals, None))
        else:
            _write_flat_code(bw, alphabet)
            chans.append((vals, "flat"))
    _write_simple_code(bw, 255)          # alpha: constant 255
    _write_simple_code(bw, 0)            # distance: never used
    chans.append((None, None))

    # flat canonical: code == symbol, always 8 bits; simple-code
    # channels write nothing.  One interleaved vector pack per image.
    cols = [v for v, k in chans[:3] if k]
    if cols:
        seq = np.stack(cols, axis=1).ravel().astype(np.int64)
        bw.write_codes(seq, np.full(len(seq), 8, dtype=np.int64))
    # alpha + distance are 0-bit simple codes

    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ------------------------------------------------------------------ decode

def _lz77_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def decode(buf: bytes) -> np.ndarray:
    """WebP bytes → (h,w,3) uint8 RGB.

    Lossless VP8L: the entropy-coded image with any prefix codes,
    color cache, LZ77 with linear distances, and the subtract-green
    transform; predictor/color/palette transforms and neighbor-mapped
    distances raise NotImplementedError (never produced by
    ``encode``) and fall back to libwebp when present.
    Lossy VP8: full from-scratch keyframe decode (raster/vp8.py,
    bit-exact with libwebp). VP8X extended containers decode purely
    when they carry no ALPH chunk; alpha routes to libwebp."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    has_alpha = False
    vp8_payload = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        if tag == b"VP8L":
            payload = buf[pos + 8:pos + 8 + size]
            break
        if tag == b"VP8 " and vp8_payload is None:
            vp8_payload = buf[pos + 8:pos + 8 + size]
        elif tag == b"ALPH":
            has_alpha = True
        pos += 8 + size + (size & 1)
    if vp8_payload is not None and payload is None:
        if has_alpha:
            # alpha plane handling stays with libwebp (RGBA output)
            from . import native_webp

            if native_webp.available():
                return native_webp.decode(buf)
            raise NotImplementedError(
                "WebP alpha (ALPH chunk) requires libwebp (absent)")
        from . import vp8

        return vp8.decode(vp8_payload)
    if payload is None:
        raise ValueError("no VP8/VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    try:
        return _decode_vp8l(payload)
    except NotImplementedError:
        # stream uses VP8L features outside the from-scratch subset
        # (predictor/color/palette transforms, short distances): fall
        # back to the system libwebp when present
        from . import native_webp

        if native_webp.available():
            return native_webp.decode(buf)
        raise


def is_lossy(buf: bytes) -> bool:
    """True when the container's image chunk is lossy VP8 (sniffed, no
    decode) — fmt='webp' alone cannot distinguish lossy from lossless."""
    buf = bytes(buf)
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        if tag == b"VP8 ":
            return True
        if tag == b"VP8L":
            return False
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        pos += 8 + size + (size & 1)
    return False


def _decode_vp8l(payload: bytes) -> np.ndarray:
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                           # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")

    subtract_green = False
    while br.read_bit():                 # transforms
        ttype = br.read(2)
        if ttype == 2:                   # subtract-green
            subtract_green = True
            continue
        raise NotImplementedError(
            f"VP8L transform type {ttype} (predictor/color/palette) not "
            "implemented in this from-scratch decoder")

    cache_bits = 0
    cache = None
    if br.read_bit():                    # color cache
        cache_bits = br.read(4)
        cache = np.zeros(1 << cache_bits, dtype=np.uint32)
    if br.read_bit():
        raise NotImplementedError("meta prefix-code image not implemented")

    green_dec = _read_code(br, 256 + 24 + (1 << cache_bits if cache_bits else 0))
    red_dec = _read_code(br, 256)
    blue_dec = _read_code(br, 256)
    alpha_dec = _read_code(br, 256)
    dist_dec = _read_code(br, 40)

    n = w * h
    argb = [0] * n
    cacheL = cache.tolist() if cache is not None else None
    shift = 32 - cache_bits if cache_bits else 0
    # hot loop: decoder LUTs, words and bit position hoisted to locals;
    # every symbol is one list index, every raw-bit read one shift
    words = br.words
    p = br.pos
    gl, gs = green_dec.lut, green_dec.single
    rl, rs = red_dec.lut, red_dec.single
    bl, bs = blue_dec.lut, blue_dec.single
    al, as_ = alpha_dec.lut, alpha_dec.single
    dl, ds = dist_dec.lut, dist_dec.single
    gm = green_dec.mask if gl is not None else 0
    rm = red_dec.mask if rl is not None else 0
    bm = blue_dec.mask if bl is not None else 0
    am = alpha_dec.mask if al is not None else 0
    dm = dist_dec.mask if dl is not None else 0
    i = 0
    while i < n:
        if gl is None:
            s = gs
        else:
            e = gl[(words[p >> 3] >> (p & 7)) & gm]
            if e == 0:
                raise ValueError("invalid prefix code in stream")
            s = e & 0xFFF
            p += e >> 12
        if s < 256:                      # literal
            if rl is None:
                r = rs
            else:
                e = rl[(words[p >> 3] >> (p & 7)) & rm]
                r = e & 0xFFF
                p += e >> 12
            if bl is None:
                b = bs
            else:
                e = bl[(words[p >> 3] >> (p & 7)) & bm]
                b = e & 0xFFF
                p += e >> 12
            if al is None:
                a = as_
            else:
                e = al[(words[p >> 3] >> (p & 7)) & am]
                a = e & 0xFFF
                p += e >> 12
            px = (a << 24) | (r << 16) | (s << 8) | b
            argb[i] = px
            i += 1
            if cacheL is not None:
                cacheL[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
        elif s < 280:                    # LZ77 backref
            code = s - 256
            if code < 4:
                length = code + 1
            else:
                nb = (code - 2) >> 1
                length = (((2 + (code & 1)) << nb)
                          + ((words[p >> 3] >> (p & 7)) & ((1 << nb) - 1)) + 1)
                p += nb
            if dl is None:
                dcode = ds
            else:
                e = dl[(words[p >> 3] >> (p & 7)) & dm]
                dcode = e & 0xFFF
                p += e >> 12
            if dcode < 4:
                plane = dcode + 1
            else:
                nb = (dcode - 2) >> 1
                plane = (((2 + (dcode & 1)) << nb)
                         + ((words[p >> 3] >> (p & 7)) & ((1 << nb) - 1)) + 1)
                p += nb
            if plane <= 120:
                raise NotImplementedError(
                    "neighbor-mapped short distances not implemented")
            dist = plane - 120
            length = min(length, n - i)
            if cacheL is None and dist >= length:
                # non-overlapping copy, no cache bookkeeping: one slice
                argb[i:i + length] = argb[i - dist:i - dist + length]
                i += length
            else:
                for _ in range(length):
                    px = argb[i - dist]
                    argb[i] = px
                    if cacheL is not None:
                        cacheL[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
                    i += 1
        else:                            # color cache
            px = cacheL[s - 280]
            argb[i] = px
            i += 1
    br.pos = p

    argb = np.array(argb, dtype=np.uint32).reshape(h, w)
    r = ((argb >> 16) & 0xFF).astype(np.int64)
    g = ((argb >> 8) & 0xFF).astype(np.int64)
    b = (argb & 0xFF).astype(np.int64)
    if subtract_green:
        r = (r + g) & 0xFF
        b = (b + g) & 0xFF
    return np.stack([r, g, b], axis=2).astype(np.uint8)
