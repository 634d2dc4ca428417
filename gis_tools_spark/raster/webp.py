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

Decoder — spec-complete VP8L (round-4 continuation-8):
  * simple and full code-length-coded prefix codes (incl. repeat codes
    16/17/18 and the max_symbol early-stop), canonical reconstruction
  * color cache (any size), LZ77 with linear AND the 120
    neighbor-mapped short distances, meta prefix-code groups
  * all four transforms: predictor (14 modes), color, subtract-green,
    color-indexing (incl. sub-byte bundled indices)
  * conformance: libwebp-lossless-encoded files round-trip
    pixel-exactly (test_webp.py), no fallback needed.

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

    Lossless VP8L: spec-complete (all transforms, meta prefix
    groups, short distances). Lossy VP8: full from-scratch keyframe
    decode (raster/vp8.py, bit-exact with libwebp). VP8X extended
    containers decode purely; a lossy ALPH alpha plane does not
    affect RGB and is ignored (decode_alpha_vp8l exposes the plane)."""
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
        # ALPH (when present) carries a separate alpha plane that does
        # not affect the RGB samples — the engine's (h,w,3) contract
        # ignores it, exactly like the libwebp RGBA path's [:, :, :3].
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
    """Spec-complete VP8L decode (RFC 9649): all four transforms
    (predictor, color, subtract-green, color-indexing incl. bundled
    sub-byte indices), color cache, meta prefix-code groups, and the
    full LZ77 distance mapping (linear + the 120 neighbor-mapped short
    codes). Conformance: libwebp-lossless-encoded files round-trip
    pixel-exactly (test_webp.py)."""
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                           # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = _decode_transformed(br, w, h)
    a = np.array(argb, dtype=np.uint32).reshape(h, w)
    r = ((a >> 16) & 0xFF).astype(np.uint8)
    g = ((a >> 8) & 0xFF).astype(np.uint8)
    b = (a & 0xFF).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def decode_alpha_vp8l(data: bytes, w: int, h: int) -> np.ndarray:
    """Headerless VP8L stream of an ALPH chunk (compression method 1):
    the alpha plane coded as the green channel of a w×h image."""
    br = _BitReader(data)
    argb = _decode_transformed(br, w, h)
    return ((np.array(argb, dtype=np.uint32) >> 8) & 0xFF) \
        .astype(np.uint8).reshape(h, w)


def _decode_transformed(br: _BitReader, w: int, h: int) -> list:
    """Transform list + entropy image + inverse transforms → flat ARGB
    (python ints, row-major)."""
    transforms = []
    seen = set()
    xsize = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("repeated VP8L transform")
        seen.add(ttype)
        if ttype in (0, 1):              # predictor / color
            bits = br.read(3) + 2
            bw = (xsize + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, bw, bh, allow_meta=False)
            transforms.append((ttype, bits, sub, xsize))
        elif ttype == 2:                 # subtract green
            transforms.append((2, 0, None, xsize))
        else:                            # color indexing (palette)
            n_colors = br.read(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, allow_meta=False)
            # palette entries are per-channel delta-coded
            acc = 0
            palette = []
            for px in pal:
                acc = ((((acc >> 24) + (px >> 24)) & 0xFF) << 24) | \
                      ((((acc >> 16) + (px >> 16)) & 0xFF) << 16) | \
                      ((((acc >> 8) + (px >> 8)) & 0xFF) << 8) | \
                      (((acc + px)) & 0xFF)
                palette.append(acc)
            if n_colors <= 2:
                wb = 3
            elif n_colors <= 4:
                wb = 2
            elif n_colors <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append((3, wb, palette, xsize))
            xsize = (xsize + (1 << wb) - 1) >> wb
    argb = _decode_entropy_image(br, xsize, h, allow_meta=True)

    for ttype, bits, data, tx in reversed(transforms):
        if ttype == 3:
            argb = _inv_palette(argb, data, bits, xsize, tx, h)
            xsize = tx
        elif ttype == 2:
            argb = _inv_subtract_green(argb)
        elif ttype == 1:
            argb = _inv_color_transform(argb, data, bits, xsize, h)
        else:
            argb = _inv_predictor(argb, data, bits, xsize, h)
    return argb


def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          allow_meta: bool) -> list:
    """One entropy-coded image (RFC 9649 §5): color cache, optional
    meta prefix-code groups (top level only), 5 prefix codes per
    group, literals / LZ77 / cache references. Returns flat ARGB."""
    cache_bits = br.read(4) if br.read_bit() else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0

    group_of = None
    mbits = 0
    ngroups = 1
    if allow_meta and br.read_bit():
        mbits = br.read(3) + 2
        mw = (w + (1 << mbits) - 1) >> mbits
        mh = (h + (1 << mbits) - 1) >> mbits
        meta = _decode_entropy_image(br, mw, mh, allow_meta=False)
        group_of = [((px >> 8) & 0xFFFF) for px in meta]
        ngroups = max(group_of) + 1 if group_of else 1

    groups = []
    nlit = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    for _ in range(ngroups):
        groups.append((_read_code(br, nlit), _read_code(br, 256),
                       _read_code(br, 256), _read_code(br, 256),
                       _read_code(br, 40)))

    n = w * h
    argb = [0] * n
    i = 0
    words = br.words
    mw_row = (w + (1 << mbits) - 1) >> mbits if group_of else 0
    gsel = -1
    gdec = rdec = bdec = adec = ddec = None
    x = 0
    y = 0
    while i < n:
        if group_of is not None:
            gi = group_of[(y >> mbits) * mw_row + (x >> mbits)]
        else:
            gi = 0
        if gi != gsel:
            gdec, rdec, bdec, adec, ddec = groups[gi]
            gsel = gi
        p = br.pos
        if gdec.single is not None:
            s = gdec.single
        else:
            e = gdec.lut[(words[p >> 3] >> (p & 7)) & gdec.mask]
            if e == 0:
                raise ValueError("invalid prefix code in stream")
            s = e & 0xFFF
            p += e >> 12
        if s < 256:                      # literal
            if rdec.single is not None:
                r = rdec.single
            else:
                e = rdec.lut[(words[p >> 3] >> (p & 7)) & rdec.mask]
                r = e & 0xFFF
                p += e >> 12
            if bdec.single is not None:
                b = bdec.single
            else:
                e = bdec.lut[(words[p >> 3] >> (p & 7)) & bdec.mask]
                b = e & 0xFFF
                p += e >> 12
            if adec.single is not None:
                a = adec.single
            else:
                e = adec.lut[(words[p >> 3] >> (p & 7)) & adec.mask]
                a = e & 0xFFF
                p += e >> 12
            br.pos = p
            px = (a << 24) | (r << 16) | (s << 8) | b
            argb[i] = px
            i += 1
            x += 1
            if x == w:
                x = 0
                y += 1
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
        elif s < 280:                    # LZ77 backref
            code = s - 256
            if code < 4:
                length = code + 1
            else:
                nb = (code - 2) >> 1
                length = (((2 + (code & 1)) << nb)
                          + ((words[p >> 3] >> (p & 7)) & ((1 << nb) - 1))
                          + 1)
                p += nb
            if ddec.single is not None:
                dcode = ddec.single
            else:
                e = ddec.lut[(words[p >> 3] >> (p & 7)) & ddec.mask]
                dcode = e & 0xFFF
                p += e >> 12
            if dcode < 4:
                plane = dcode + 1
            else:
                nb = (dcode - 2) >> 1
                plane = (((2 + (dcode & 1)) << nb)
                         + ((words[p >> 3] >> (p & 7)) & ((1 << nb) - 1))
                         + 1)
                p += nb
            br.pos = p
            if plane > 120:
                dist = plane - 120
            else:
                c = _CODE_TO_PLANE[plane - 1]
                dist = (c >> 4) * w + (8 - (c & 0xF))
                if dist < 1:
                    dist = 1
            if dist > i:
                raise ValueError("VP8L backref before image start")
            length = min(length, n - i)
            if cache is None and group_of is None and dist >= length:
                argb[i:i + length] = argb[i - dist:i - dist + length]
                i += length
                x += length
                y += x // w
                x %= w
            else:
                for _ in range(length):
                    px = argb[i - dist]
                    argb[i] = px
                    if cache is not None:
                        cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
                    i += 1
                    x += 1
                    if x == w:
                        x = 0
                        y += 1
        else:                            # color cache reference
            br.pos = p
            argb[i] = cache[s - 280]
            i += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return argb


# RFC 9649 §5.2.2 short-distance neighbor map: entry = (dy<<4)|(8-dx)
_CODE_TO_PLANE = (
    24, 7, 23, 25, 40, 6, 39, 41, 22, 26, 38, 42, 56, 5, 55, 57, 21, 27,
    54, 58, 37, 43, 72, 4, 71, 73, 20, 28, 53, 59, 70, 74, 36, 44, 88,
    69, 75, 52, 60, 3, 87, 89, 19, 29, 86, 90, 35, 45, 68, 76, 85, 91,
    51, 61, 104, 2, 103, 105, 18, 30, 102, 106, 34, 46, 84, 92, 67, 77,
    101, 107, 50, 62, 120, 1, 119, 121, 83, 93, 17, 31, 100, 108, 66,
    78, 118, 122, 33, 47, 117, 123, 49, 63, 99, 109, 82, 94, 0, 116,
    124, 65, 79, 16, 32, 98, 110, 48, 115, 125, 81, 95, 64, 114, 126,
    97, 111, 80, 113, 127, 96, 112)


# ------------------------------------------------------ inverse transforms

def _inv_subtract_green(argb: list) -> list:
    a = np.array(argb, dtype=np.uint32)
    g = (a >> 8) & 0xFF
    r = (((a >> 16) & 0xFF) + g) & 0xFF
    b = ((a & 0xFF) + g) & 0xFF
    return ((a & 0xFF00FF00) | (r << 16) | b).tolist()


def _inv_palette(argb: list, palette: list, wb: int, cur_w: int,
                 orig_w: int, h: int) -> list:
    """Color-indexing inverse: green channel holds palette indices,
    sub-byte-bundled when the palette is small."""
    npal = len(palette)
    out = [0] * (orig_w * h)
    if wb == 0:
        for i, px in enumerate(argb):
            idx = (px >> 8) & 0xFF
            out[i] = palette[idx] if idx < npal else 0
        return out
    per = 1 << wb              # pixels per bundled byte
    ibits = 8 >> wb            # bits per index
    imask = (1 << ibits) - 1
    for y in range(h):
        row = y * cur_w
        orow = y * orig_w
        for cx in range(cur_w):
            bundle = (argb[row + cx] >> 8) & 0xFF
            base = cx * per
            for k in range(per):
                ox = base + k
                if ox >= orig_w:
                    break
                idx = (bundle >> (k * ibits)) & imask
                out[orow + ox] = palette[idx] if idx < npal else 0
    return out


def _inv_color_transform(argb: list, sub: list, bits: int, w: int,
                         h: int) -> list:
    """Per-block color transform inverse (RFC 9649 §4.2.1): the
    sub-image pixel's blue/green/red bytes carry green_to_red,
    green_to_blue, red_to_blue as signed 3.5 fixed-point factors."""
    bw = (w + (1 << bits) - 1) >> bits
    out = [0] * len(argb)
    for y in range(h):
        srow = (y >> bits) * bw
        row = y * w
        for x in range(w):
            px = argb[row + x]
            cte = sub[srow + (x >> bits)]
            g2r = (cte & 0xFF) - 256 if (cte & 0xFF) > 127 else cte & 0xFF
            t = (cte >> 8) & 0xFF
            g2b = t - 256 if t > 127 else t
            t = (cte >> 16) & 0xFF
            r2b = t - 256 if t > 127 else t
            g = (px >> 8) & 0xFF
            gs = g - 256 if g > 127 else g
            r = ((px >> 16) & 0xFF) + ((g2r * gs) >> 5)
            rs = (r & 0xFF)
            rs = rs - 256 if rs > 127 else rs
            b = (px & 0xFF) + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)
            out[row + x] = (px & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)
    return out


def _avg2_px(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _inv_predictor(argb: list, sub: list, bits: int, w: int,
                   h: int) -> list:
    """Spatial predictor inverse (RFC 9649 §4.2.2): 14 modes, applied
    per 2^bits block; row 0 is forced to mode 1 (left), column 0 to
    mode 2 (top), pixel (0,0) to opaque black. Sequential by data
    dependence (reconstructed neighbors feed the next prediction)."""
    bw = (w + (1 << bits) - 1) >> bits
    out = argb  # in place: residual + prediction per pixel
    for i in range(len(out)):
        y, x = divmod(i, w)
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = out[i - 1]
        elif x == 0:
            pred = out[i - w]
        else:
            mode = (sub[(y >> bits) * bw + (x >> bits)] >> 8) & 0xFF
            L = out[i - 1]
            T = out[i - w]
            TR = out[i - w + 1]   # x==w-1 wraps to row start (spec quirk)
            TL = out[i - w - 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2_px(_avg2_px(L, TR), T)
            elif mode == 6:
                pred = _avg2_px(L, TL)
            elif mode == 7:
                pred = _avg2_px(L, T)
            elif mode == 8:
                pred = _avg2_px(TL, T)
            elif mode == 9:
                pred = _avg2_px(T, TR)
            elif mode == 10:
                pred = _avg2_px(_avg2_px(L, TL), _avg2_px(T, TR))
            elif mode == 11:
                pab = 0
                for sh in (24, 16, 8, 0):
                    tc = (T >> sh) & 0xFF
                    lc = (L >> sh) & 0xFF
                    tlc = (TL >> sh) & 0xFF
                    pab += abs(lc - tlc) - abs(tc - tlc)
                pred = T if pab <= 0 else L
            elif mode == 12:
                pred = 0
                for sh in (24, 16, 8, 0):
                    v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) \
                        - ((TL >> sh) & 0xFF)
                    pred |= (0 if v < 0 else (255 if v > 255 else v)) << sh
            else:  # mode 13
                av = _avg2_px(L, T)
                pred = 0
                for sh in (24, 16, 8, 0):
                    a = (av >> sh) & 0xFF
                    d = a - ((TL >> sh) & 0xFF)
                    v = a + (d // 2 if d >= 0 else -((-d) // 2))
                    pred |= (0 if v < 0 else (255 if v > 255 else v)) << sh
        px = out[i]
        out[i] = ((((px >> 24) + (pred >> 24)) & 0xFF) << 24) | \
                 ((((px >> 16) + (pred >> 16)) & 0xFF) << 16) | \
                 ((((px >> 8) + (pred >> 8)) & 0xFF) << 8) | \
                 ((px + pred) & 0xFF)
    return out
