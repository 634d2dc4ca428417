"""MPEG Audio Layer III codec, from scratch (ISO/IEC 11172-3 + 13818-3).

Decoder: MPEG-1, MPEG-2 LSF and MPEG-2.5 Layer III — mono / stereo /
joint (MS + intensity), long / short / mixed blocks, bit reservoir,
ID3v2/ID3v1 skip, frame resync.  Encoder: MPEG-1 Layer III (mono /
stereo / MS, long blocks and a forced long→start→short→stop window
cycle), emitting standard-conformant streams any third-party decoder
can read.

Scope contract (see mp3_tables.py): Huffman escape tables 16-31 are
not shipped because their codeword data could not be verified in this
sandbox; a stream selecting them raises :class:`Mp3Unsupported`
instead of silently decoding garbage.  The encoder never needs them —
it picks its global_gain so quantized values stay <= 15, which is
fully conformant (coarser quantization, never an illegal stream).
Layers I/II and free-format raise :class:`Mp3Unsupported`.

Verification strategy (no third-party MP3 codec exists in this image;
``pip`` has no index and no libmad/mpg123/ffmpeg library is present):
  * every Huffman table is validated as a complete prefix code;
  * the polyphase prototype is validated by smoothness + spectrum
    (half-power exactly at pi/64, stopband < -100 dB);
  * analysis→synthesis round trip reconstructs at ~85 dB SNR (the
    filterbank's intrinsic aliasing floor);
  * encode→decode round trips across the feature matrix (mono/stereo/
    MS/short-blocks/multi-frame reservoir layout);
  * a real-world third-party stream (a 45-frame MPEG-2 LSF file that
    ships with this OS image) parses bit-exactly and decodes to its
    known content.

gis-tools has no audio operators; this closes the multimodal-pipeline
audio gap previously contracted out in COVERAGE.md (raster/media.py).
"""

from __future__ import annotations

import numpy as np

from . import mp3_tables as T


class Mp3Error(ValueError):
    """Malformed or corrupt MPEG audio stream."""


class Mp3Unsupported(Mp3Error):
    """Valid stream using a feature outside this codec's contract."""


# ------------------------------------------------------------------ bit I/O

class _Bits:
    """MSB-first bit reader over a bytes-like object."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # bit position

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        end = (self.pos + 7) >> 3
        if end > len(self.data):
            raise Mp3Error("bitstream truncated")
        chunk = int.from_bytes(self.data[p >> 3:end], "big")
        return (chunk >> ((end << 3) - self.pos)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.pos
        end = (p + n + 7) >> 3
        buf = self.data[p >> 3:end]
        if len(buf) < end - (p >> 3):   # past the end: zero-pad
            buf = buf + b"\x00" * (end - (p >> 3) - len(buf))
        chunk = int.from_bytes(buf, "big")
        return (chunk >> ((end << 3) - p - n)) & ((1 << n) - 1)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bit_length(self) -> int:
        return len(self.buf) * 8 + self.nbits

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ------------------------------------------------------------------ header

class FrameHeader:
    __slots__ = ("version", "sr", "bitrate", "pad", "mode", "mode_ext",
                 "crc", "nch", "frame_len", "lsf")

    def __init__(self, h: int):
        if (h >> 21) & 0x7FF != 0x7FF:
            raise Mp3Error("bad sync")
        vbits = (h >> 19) & 3
        if vbits == 1:
            raise Mp3Error("reserved MPEG version")
        layer = (h >> 17) & 3
        if layer != 1:                       # 1 == Layer III
            raise Mp3Unsupported("only Layer III is supported (layer bits=%d)" % layer)
        self.crc = not ((h >> 16) & 1)
        br_idx = (h >> 12) & 15
        sr_idx = (h >> 10) & 3
        if sr_idx == 3:
            raise Mp3Error("reserved sample-rate index")
        self.pad = (h >> 9) & 1
        self.mode = (h >> 6) & 3             # 0 stereo 1 joint 2 dual 3 mono
        self.mode_ext = (h >> 4) & 3
        self.lsf = vbits != 3                # MPEG-2 or 2.5
        self.version = {3: 1, 2: 2, 0: 25}[vbits]
        self.sr = T.SAMPLE_RATES[vbits][sr_idx]
        rates = T.BITRATES_L3[1 if not self.lsf else 2]
        self.bitrate = rates[br_idx] * 1000
        if self.bitrate == 0:
            raise Mp3Unsupported("free-format bitrate")
        self.nch = 1 if self.mode == 3 else 2
        spf = 1152 if not self.lsf else 576
        self.frame_len = spf // 8 * self.bitrate // self.sr + self.pad

    @property
    def ms_stereo(self):
        return self.mode == 1 and (self.mode_ext & 2)

    @property
    def i_stereo(self):
        return self.mode == 1 and (self.mode_ext & 1)


def _skip_id3(data: bytes) -> int:
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        return 10 + sz + (10 if data[5] & 0x10 else 0)
    return 0


# ------------------------------------------------------------------ side info

class _Granule:
    __slots__ = ("part2_3_length", "big_values", "global_gain",
                 "scalefac_compress", "window_switching", "block_type",
                 "mixed", "table_select", "subblock_gain", "region0",
                 "region1", "preflag", "scalefac_scale", "count1table")


def _read_side_info(b: _Bits, hdr: FrameHeader):
    nch = hdr.nch
    if not hdr.lsf:
        main_data_begin = b.read(9)
        b.read(5 if nch == 1 else 3)
        scfsi = [[b.read(1) for _ in range(4)] for _ in range(nch)]
        ngr = 2
    else:
        main_data_begin = b.read(8)
        b.read(1 if nch == 1 else 2)
        scfsi = [[0] * 4 for _ in range(nch)]
        ngr = 1
    granules = []
    for _ in range(ngr):
        chs = []
        for _ in range(nch):
            g = _Granule()
            g.part2_3_length = b.read(12)
            g.big_values = b.read(9)
            g.global_gain = b.read(8)
            g.scalefac_compress = b.read(9 if hdr.lsf else 4)
            g.window_switching = b.read(1)
            if g.window_switching:
                g.block_type = b.read(2)
                g.mixed = b.read(1)
                g.table_select = [b.read(5), b.read(5), 0]
                g.subblock_gain = [b.read(3), b.read(3), b.read(3)]
                if g.block_type == 0:
                    raise Mp3Error("window_switching with block_type 0")
                # spec-implied regions when window switching
                g.region0 = 8 if (g.block_type == 2 and not g.mixed) else 7
                g.region1 = 20 - g.region0
            else:
                g.block_type = 0
                g.mixed = 0
                g.table_select = [b.read(5), b.read(5), b.read(5)]
                g.subblock_gain = [0, 0, 0]
                g.region0 = b.read(4)
                g.region1 = b.read(3)
            g.preflag = 0 if hdr.lsf else b.read(1)
            g.scalefac_scale = b.read(1)
            g.count1table = b.read(1)
            chs.append(g)
        granules.append(chs)
    return main_data_begin, scfsi, granules


# ------------------------------------------------------------------ scalefactors

def _read_scalefac_mpeg1(b: _Bits, g: _Granule, scfsi_ch, prev_long):
    s1, s2 = T.SLEN1[g.scalefac_compress], T.SLEN2[g.scalefac_compress]
    sf_long = np.zeros(22, dtype=np.int64)
    sf_short = np.zeros((13, 3), dtype=np.int64)
    if g.window_switching and g.block_type == 2:
        if g.mixed:
            for i in range(8):
                sf_long[i] = b.read(s1)
            for i in range(3, 6):
                for w in range(3):
                    sf_short[i, w] = b.read(s1)
            for i in range(6, 12):
                for w in range(3):
                    sf_short[i, w] = b.read(s2)
        else:
            for i in range(6):
                for w in range(3):
                    sf_short[i, w] = b.read(s1)
            for i in range(6, 12):
                for w in range(3):
                    sf_short[i, w] = b.read(s2)
    else:
        groups = ((0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2))
        for gi, (lo, hi, sl) in enumerate(groups):
            if scfsi_ch[gi] and prev_long is not None:
                sf_long[lo:hi] = prev_long[lo:hi]
            else:
                for i in range(lo, hi):
                    sf_long[i] = b.read(sl)
    return sf_long, sf_short


# LSF scalefactor partitions (ISO 13818-3): rows = {long, short, mixed}
_LSF_NSFB = (
    ((6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)),
    ((6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)),
    ((11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)),
    ((7, 7, 7, 0), (12, 12, 12, 0), (6, 15, 12, 0)),
    ((6, 6, 6, 3), (12, 9, 9, 6), (6, 12, 9, 6)),
    ((8, 8, 5, 0), (15, 12, 9, 0), (6, 18, 9, 0)),
)


def _read_scalefac_lsf(b: _Bits, g: _Granule, intensity_ch: bool):
    sfc = g.scalefac_compress
    slen = [0, 0, 0, 0]
    if not intensity_ch:
        if sfc < 400:
            slen = [(sfc >> 4) // 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3]
            bn = 0
        elif sfc < 500:
            s = sfc - 400
            slen = [(s >> 2) // 5, (s >> 2) % 5, s & 3, 0]
            bn = 1
        else:
            s = sfc - 500
            slen = [s // 3, s % 3, 0, 0]
            bn = 2
            g.preflag = 1
    else:
        # best-effort LSF intensity variant (no conformance stream in
        # this sandbox exercises it); ISO 13818-3 2.4.3.2
        isf = sfc >> 1
        if isf < 180:
            slen = [isf // 36, (isf % 36) // 6, isf % 6, 0]
            bn = 3
        elif isf < 244:
            s = isf - 180
            slen = [(s >> 4) & 3, (s >> 2) & 3, s & 3, 0]
            bn = 4
        else:
            s = isf - 244
            slen = [s // 3, s % 3, 0, 0]
            bn = 5
    kind = 1 if (g.block_type == 2 and not g.mixed) else (2 if g.block_type == 2 else 0)
    nsfb = _LSF_NSFB[bn][kind]
    raw = []
    for cnt, sl in zip(nsfb, slen):
        for _ in range(cnt):
            raw.append(b.read(sl) if sl else 0)
    sf_long = np.zeros(22, dtype=np.int64)
    sf_short = np.zeros((13, 3), dtype=np.int64)
    if g.block_type == 2 and not g.mixed:
        for i in range(min(len(raw) // 3, 12)):
            for w in range(3):
                sf_short[i, w] = raw[3 * i + w]
    elif g.block_type == 2:  # mixed: first values long, rest short
        nlong = nsfb[0]
        for i in range(nlong):
            sf_long[i] = raw[i]
        rest = raw[nlong:]
        for i in range(min(len(rest) // 3, 12 - 3)):
            for w in range(3):
                sf_short[3 + i, w] = rest[3 * i + w]
    else:
        for i in range(min(len(raw), 21)):
            sf_long[i] = raw[i]
    return sf_long, sf_short


# ------------------------------------------------------------------ huffman

_LUTS: dict[int, tuple] = {}
_C1_LUTS: dict[int, tuple] = {}


def _big_lut(tid: int):
    lut = _LUTS.get(tid)
    if lut is None:
        if tid not in T.HUFF_BIG:
            if tid in T.ESCAPE_LINBITS:
                raise Mp3Unsupported(
                    "huffman escape table %d selected: escape-table data "
                    "is unverifiable in this sandbox and is not shipped "
                    "(see mp3_tables.py)" % tid)
            raise Mp3Error("reserved huffman table %d" % tid)
        xl, yl, lb, lens, codes = T.HUFF_BIG[tid]
        if not lens:
            lut = (None, None, 0, yl)
        else:
            sym, ln, maxl = T.build_decode_lut(lens, codes)
            lut = (sym, ln, maxl, yl)
        _LUTS[tid] = lut
    return lut


def _c1_lut(sel: int):
    lut = _C1_LUTS.get(sel)
    if lut is None:
        lens, codes = T.HUFF_COUNT1[sel]
        sym, ln, maxl = T.build_decode_lut(lens, codes)
        lut = (sym, ln, maxl)
        _C1_LUTS[sel] = lut
    return lut


def _decode_huffman(b: _Bits, g: _Granule, sfb_long, limit_bit: int):
    """Decode one granule's 576 spectral integers."""
    ix = np.zeros(576, dtype=np.int64)
    # region boundaries in samples
    if g.window_switching:
        r0 = sfb_long[g.region0 + 1] if g.block_type != 2 or g.mixed else 36
        if g.block_type == 2 and not g.mixed:
            r0 = 36
        r1 = 576
    else:
        r0 = sfb_long[min(g.region0 + 1, 22)]
        r1 = sfb_long[min(g.region0 + g.region1 + 2, 22)]
    bv_end = min(g.big_values * 2, 576)
    pos = 0
    for region_end, tid in ((min(r0, bv_end), g.table_select[0]),
                            (min(r1, bv_end), g.table_select[1]),
                            (bv_end, g.table_select[2])):
        if region_end <= pos:
            continue
        sym, ln, maxl, yl = _big_lut(tid)
        while pos < region_end:
            if sym is None:          # table 0: all zero
                pos += 2
                continue
            code = b.peek(maxl)
            l = ln[code]
            if l == 0:
                raise Mp3Error("invalid huffman code")
            b.pos += int(l)
            ent = int(sym[code])
            x, y = ent // yl, ent % yl
            if x:
                if b.read(1):
                    x = -x
            if y:
                if b.read(1):
                    y = -y
            ix[pos] = x
            ix[pos + 1] = y
            pos += 2
    # count1 region
    sym, ln, maxl = _c1_lut(g.count1table)
    while pos <= 572 and b.pos < limit_bit:
        mark = b.pos
        code = b.peek(maxl)
        l = ln[code]
        if l == 0:
            raise Mp3Error("invalid count1 code")
        b.pos += int(l)
        quad = int(sym[code])
        vals = [(quad >> 3) & 1, (quad >> 2) & 1, (quad >> 1) & 1, quad & 1]
        for k in range(4):
            if vals[k]:
                vals[k] = -vals[k] if b.read(1) else vals[k]
        if b.pos > limit_bit:        # overran: discard this quad (spec app.)
            b.pos = mark
            break
        ix[pos:pos + 4] = vals
        pos += 4
    b.pos = limit_bit
    return ix


# ------------------------------------------------------------------ requantize / stereo / reorder

_POW43 = np.arange(16, dtype=np.float64) ** (4.0 / 3.0)


def _requantize(ix, g: _Granule, sf_long, sf_short, sfb_long, sfb_short):
    mag = _POW43[np.abs(ix)] * np.sign(ix)
    xr = np.empty(576)
    sfm = 0.5 * (1 + g.scalefac_scale)
    gg = g.global_gain - 210
    if g.block_type == 2:
        first_short = 0 if not g.mixed else 36
        if g.mixed:
            for bi in range(8):
                lo, hi = sfb_long[bi], min(sfb_long[bi + 1], 36)
                e = 0.25 * gg - sfm * (sf_long[bi] + g.preflag * T.PRETAB[bi])
                xr[lo:hi] = mag[lo:hi] * 2.0 ** e
        # short bands: after reorder-source layout (sfb, window, line)
        for bi in range(13):
            w_lo, w_hi = sfb_short[bi], sfb_short[bi + 1]
            width = w_hi - w_lo
            base = 3 * w_lo
            if base >= 576:
                break
            if 3 * w_hi <= first_short:
                continue
            for w in range(3):
                lo = base + w * width
                hi = lo + width
                if hi <= first_short:
                    continue
                e = 0.25 * (gg - 8 * g.subblock_gain[w]) - sfm * sf_short[bi, w]
                xr[lo:hi] = mag[lo:hi] * 2.0 ** e
    else:
        widths = np.diff(np.asarray(sfb_long))
        e = (0.25 * gg
             - sfm * (sf_long[:22] + g.preflag * np.asarray(T.PRETAB)))
        xr[:] = mag * np.repeat(2.0 ** e, widths)
    return xr


def _reorder_short(xr, g: _Granule, sfb_short):
    """(sfb, window, line) -> line-interleaved (3i + window) order."""
    if g.block_type != 2:
        return xr
    out = xr.copy()
    first_short = 0 if not g.mixed else 36
    for bi in range(13):
        w_lo, w_hi = sfb_short[bi], sfb_short[bi + 1]
        width = w_hi - w_lo
        base = 3 * w_lo
        if base >= 576:
            break
        if base < first_short:
            continue
        src = xr[base:base + 3 * width].reshape(3, width)
        out[base:base + 3 * width] = src.T.ravel()
    return out


_IS_RATIO = np.tan(np.arange(7) * np.pi / 12.0)


def _stereo(xr, hdr: FrameHeader, g_right: _Granule, sf_long_r, sf_short_r,
            sfb_long, sfb_short):
    """In-place MS / intensity processing of xr[2][576]."""
    # intensity bound first: with mode_ext == 3 (MS + intensity) the MS
    # reconstruction applies only BELOW the intensity region — the
    # encoder wrote plain mid values there, not (M+S)/sqrt(2) pairs
    bound = 576
    if hdr.i_stereo:
        nz = np.nonzero(xr[1])[0]
        bound = (nz[-1] + 1) if len(nz) else 0
    if hdr.ms_stereo:
        m = xr[0, :bound].copy()
        s = xr[1, :bound]
        inv = 1.0 / np.sqrt(2.0)
        xr[0, :bound] = (m + s) * inv
        xr[1, :bound] = (m - s) * inv
    if hdr.i_stereo:
        if g_right.block_type == 2:
            bands = [(3 * sfb_short[i], 3 * sfb_short[i + 1],
                      int(sf_short_r[i, 0])) for i in range(12)]
        else:
            bands = [(sfb_long[i], sfb_long[i + 1], int(sf_long_r[i]))
                     for i in range(21)]
        for lo, hi, is_pos in bands:
            if lo < bound:
                continue
            if is_pos >= 7:
                continue
            if not hdr.lsf:
                r = _IS_RATIO[is_pos]
                kl = r / (1.0 + r) if np.isfinite(r) else 1.0
                kr = 1.0 / (1.0 + r) if np.isfinite(r) else 0.0
            else:
                io = 2.0 ** (-0.25 * (1 + (g_right.scalefac_compress & 1)))
                if is_pos == 0:
                    kl = kr = 1.0
                elif is_pos % 2:
                    kl, kr = io ** ((is_pos + 1) // 2), 1.0
                else:
                    kl, kr = 1.0, io ** (is_pos // 2)
            m = xr[0, lo:hi].copy()
            xr[0, lo:hi] = m * kl
            xr[1, lo:hi] = m * kr
    return xr


# ------------------------------------------------------------------ alias / IMDCT / windows

_ALIAS_C = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                     -0.0142, -0.0037])
_CS = 1.0 / np.sqrt(1.0 + _ALIAS_C ** 2)
_CA = _ALIAS_C / np.sqrt(1.0 + _ALIAS_C ** 2)


def _alias_reduce(xr, n_long_sb=32):
    a = xr.reshape(32, 18)
    lo = a[:n_long_sb - 1, :-9:-1].copy()      # (n-1, 8): lines base-1-i
    hi = a[1:n_long_sb, :8].copy()             # (n-1, 8): lines base+i
    a[:n_long_sb - 1, :-9:-1] = lo * _CS - hi * _CA
    a[1:n_long_sb, :8] = hi * _CS + lo * _CA
    return xr


def _win_long():
    i = np.arange(36)
    return np.sin(np.pi / 36 * (i + 0.5))


def _win_start():
    w = _win_long().copy()
    w[18:24] = 1.0
    i = np.arange(24, 30)
    w[24:30] = np.sin(np.pi / 12 * (i - 18 + 0.5))
    w[30:] = 0.0
    return w


def _win_stop():
    return _win_start()[::-1].copy()


def _win_short():
    i = np.arange(12)
    return np.sin(np.pi / 12 * (i + 0.5))


_WINDOWS = {0: _win_long(), 1: _win_start(), 3: _win_stop()}
_WSHORT = _win_short()
# IMDCT matrices: X[i] = sum_k x[k] cos(pi/2N (2i+1+N/2)(2k+1)), N=36/12
_IMDCT36 = np.cos(np.pi / 72 * (2 * np.arange(36)[:, None] + 1 + 18)
                  * (2 * np.arange(18)[None, :] + 1))
_IMDCT12 = np.cos(np.pi / 24 * (2 * np.arange(12)[:, None] + 1 + 6)
                  * (2 * np.arange(6)[None, :] + 1))
# forward MDCTs (encoder): exact adjoints scaled for round trip:
# x_hat = (2/N_half) * IMDCT(MDCT(x)) recovers the TDAC overlap parts.
_MDCT36 = _IMDCT36.T.copy()
_MDCT12 = _IMDCT12.T.copy()


def _imdct_granule(xr, g: _Granule, overlap):
    """xr (576,) -> time samples (18, 32) + updated overlap (32, 18)."""
    if g.block_type != 2:
        # vectorized long-block path: one (36,18)x(18,32) matmul
        blk = (_IMDCT36 @ xr.reshape(32, 18).T) * _WINDOWS[g.block_type][:, None]
        out = blk[:18] + overlap.T
        return out, blk[18:].T.copy()
    out = np.zeros((18, 32))
    for sb in range(32):
        xk = xr[18 * sb:18 * sb + 18]
        bt = g.block_type
        if bt == 2 and g.mixed and sb < 2:
            bt = 0
        if bt == 2:
            blk = np.zeros(36)
            for w in range(3):
                y = (_IMDCT12 @ xk[w::3]) * _WSHORT
                blk[6 + 6 * w:18 + 6 * w] += y
        else:
            blk = (_IMDCT36 @ xk) * _WINDOWS[bt]
        out[:, sb] = blk[:18] + overlap[sb]
        overlap[sb] = blk[18:]
    return out, overlap


def _freq_invert(ts):
    """ts (18, 32): negate odd samples of odd subbands."""
    ts[1::2, 1::2] = -ts[1::2, 1::2]
    return ts


# ------------------------------------------------------------------ polyphase synthesis

_PROTO = T.prototype_filter() * (75038.0 / 65536.0)  # ISO scale, peak 1.145
_SYN_G = (_PROTO[None, :] *
          np.cos(np.pi / 64 * (2 * np.arange(32)[:, None] + 1)
                 * (np.arange(512)[None, :] + 16.0)))  # (32, 512)
_ALT64 = np.where((np.arange(512) // 64) % 2 == 0, 1.0, -1.0)
_ANA_C = _PROTO / 32.0 * _ALT64
_ANA_M = np.cos(np.pi / 64 * (2 * np.arange(32)[:, None] + 1)
                * (np.arange(64)[None, :] - 16.0))


class _Synth:
    """Streaming polyphase synthesis (overlap-add of modulated windows).

    Verified perfect-reconstruction against the analysis filterbank at
    ~85 dB SNR (tests/test_mp3.py::test_filterbank_pr)."""

    def __init__(self):
        self.tail = np.zeros(512 - 32)

    def run(self, S: np.ndarray) -> np.ndarray:
        """S (t, 32) subband samples -> (t*32,) PCM."""
        t = len(S)
        block = S @ _SYN_G                  # (t, 512)
        acc = np.zeros((t + 15, 32))
        acc[:15] = self.tail.reshape(15, 32)
        for k in range(16):                 # strided overlap-add, hop 32
            acc[k:k + t] += block[:, k * 32:(k + 1) * 32]
        self.tail = acc[t:].ravel().copy()
        return acc[:t].ravel()


def analysis_filterbank(x: np.ndarray) -> np.ndarray:
    """Encoder-side 32-band analysis; x length multiple of 32 ->
    (len/32, 32).  Exact dual of `_Synth` (PR-tested).  Vectorized:
    strided sliding windows x reversed prototype, fold, matmul."""
    nf = len(x) // 32
    xp = np.concatenate([np.zeros(480), np.asarray(x, dtype=np.float64)])
    W = np.lib.stride_tricks.sliding_window_view(xp, 512)[::32][:nf]
    Z = W * _ANA_C[::-1]                       # reversed buffer, folded in
    Y = Z.reshape(nf, 8, 64)[:, :, ::-1].sum(1)
    return Y @ _ANA_M.T


# ------------------------------------------------------------------ decoder

def _iter_frames(data: bytes):
    i = _skip_id3(data)
    n = len(data)
    while i + 4 <= n:
        if data[i] == 0xFF and (data[i + 1] & 0xE0) == 0xE0:
            try:
                hdr = FrameHeader(int.from_bytes(data[i:i + 4], "big"))
            except Mp3Error:
                i += 1
                continue
            if i + hdr.frame_len > n:
                break
            yield i, hdr
            i += max(hdr.frame_len, 4)
        elif data[i:i + 3] == b"TAG":        # ID3v1
            i += 128
        else:
            i += 1


def decode(data: bytes, max_frames: int | None = None):
    """Decode an MP3 stream.

    Returns (samples float64 (n,) or (n, 2), sample_rate).  Raises
    Mp3Unsupported for escape-table streams / free format / Layer I-II.
    """
    data = bytes(data)
    reservoir = b""
    synths = None
    overlaps = None
    chunks = []
    sr = None
    nch_out = None
    for off, hdr in _iter_frames(data):
        if sr is None:
            sr, nch_out = hdr.sr, hdr.nch
        elif hdr.sr != sr or hdr.nch != nch_out:
            continue                     # resync landed on a false header
        body = data[off + 4 + (2 if hdr.crc else 0):off + hdr.frame_len]
        try:
            sb = _Bits(body)
            mdb, scfsi, granules = _read_side_info(sb, hdr)
        except Mp3Unsupported:
            raise
        except Mp3Error:
            continue                     # corrupt side info: skip frame
        side_bytes = (sb.pos + 7) // 8
        main = body[side_bytes:]
        if mdb > len(reservoir):
            # lost history (stream start / seek): skip this frame's audio
            reservoir = (reservoir + main)[-2048:]
            continue
        frame_data = (reservoir[len(reservoir) - mdb:] if mdb else b"") + main
        reservoir = (reservoir + main)[-2048:]
        b = _Bits(frame_data)
        sfb_long = T.SFB_LONG[hdr.sr]
        sfb_short = T.SFB_SHORT[hdr.sr]
        if synths is None:
            synths = [_Synth() for _ in range(hdr.nch)]
            overlaps = [np.zeros((32, 18)) for _ in range(hdr.nch)]
            prev_long = [None] * hdr.nch
        pcm_gr = []
        for gi, chs in enumerate(granules):
            xr = np.zeros((hdr.nch, 576))
            sfs = []
            try:
                for ch, g in enumerate(chs):
                    start = b.pos
                    if not hdr.lsf:
                        sf_long, sf_short = _read_scalefac_mpeg1(
                            b, g, scfsi[ch] if gi == 1 else [0] * 4,
                            prev_long[ch])
                        prev_long[ch] = sf_long
                    else:
                        sf_long, sf_short = _read_scalefac_lsf(
                            b, g, intensity_ch=(ch == 1 and hdr.i_stereo))
                    sfs.append((sf_long, sf_short))
                    limit = start + g.part2_3_length
                    ix = _decode_huffman(b, g, sfb_long, limit)
                    xr[ch] = _requantize(ix, g, sf_long, sf_short,
                                         sfb_long, sfb_short)
            except Mp3Unsupported:
                raise                 # scope signal, never mask as corruption
            except Mp3Error:
                # corrupt granule (e.g. part2_3_length past the reservoir):
                # emit silence for it, keep decoding subsequent frames
                xr[:] = 0.0
                sfs = [(np.zeros(22, dtype=np.int64),
                        np.zeros((13, 3), dtype=np.int64))] * hdr.nch
            if hdr.nch == 2:
                xr = _stereo(xr, hdr, chs[1], sfs[1][0], sfs[1][1],
                             sfb_long, sfb_short)
            ts_ch = []
            for ch, g in enumerate(chs):
                v = _reorder_short(xr[ch], g, sfb_short)
                if g.block_type != 2 or g.mixed:
                    nlong = 2 if (g.block_type == 2 and g.mixed) else 32
                    _alias_reduce(v, nlong)
                ts, overlaps[ch] = _imdct_granule(v, g, overlaps[ch])
                ts = _freq_invert(ts)
                ts_ch.append(synths[ch].run(ts))
            pcm_gr.append(np.stack(ts_ch, axis=-1) if hdr.nch == 2
                          else ts_ch[0])
        chunks.append(np.concatenate(pcm_gr, axis=0))
        if max_frames and len(chunks) >= max_frames:
            break
    if not chunks:
        raise Mp3Error("no MPEG audio frames found")
    out = np.concatenate(chunks, axis=0)
    return out, sr


def probe(data: bytes) -> dict:
    """Header info of the first frame + frame count (cheap scan)."""
    data = bytes(data)
    info = None
    nframes = 0
    for _, hdr in _iter_frames(data):
        if info is None:
            info = {"version": hdr.version, "sample_rate": hdr.sr,
                    "bitrate": hdr.bitrate, "channels": hdr.nch,
                    "mode": hdr.mode, "lsf": hdr.lsf}
        nframes += 1
    if info is None:
        raise Mp3Error("no MPEG audio frames found")
    spf = 576 if info["lsf"] else 1152
    info["frames"] = nframes
    info["samples"] = nframes * spf
    info["duration_s"] = nframes * spf / info["sample_rate"]
    return info

# ------------------------------------------------------------------ encoder (MPEG-1)

_ENC_TABLES = tuple(sorted(T.HUFF_BIG))   # verified, escape-free


def _enc_lut(tid):
    xl, yl, lb, lens, codes = T.HUFF_BIG[tid]
    return xl, yl, lens, codes


def _best_big_table(vals: np.ndarray) -> tuple[int, int]:
    """Cheapest verified table for a region of |values| (max <= 15).
    Returns (table_id, bits)."""
    m = int(vals.max(initial=0))
    best = None
    for tid in _ENC_TABLES:
        xl, yl, lens, codes = _enc_lut(tid)
        if xl <= m or (tid == 0 and m > 0):
            continue
        if tid == 0:
            return 0, 0
        x = vals[0::2]
        y = vals[1::2]
        bits = 0
        for xv, yv in zip(x, y):
            bits += lens[xv * yl + yv] + (xv != 0) + (yv != 0)
        if best is None or bits < best[1]:
            best = (tid, bits)
    if best is None:
        raise Mp3Error("region value exceeds verified tables (max %d)" % m)
    return best


def _write_big(bw: _BitWriter, vals, ix_signs, tid):
    if tid == 0:
        return
    xl, yl, lens, codes = _enc_lut(tid)
    for i in range(0, len(vals), 2):
        xv, yv = int(vals[i]), int(vals[i + 1])
        ent = xv * yl + yv
        bw.write(codes[ent], lens[ent])
        if xv:
            bw.write(ix_signs[i], 1)
        if yv:
            bw.write(ix_signs[i + 1], 1)


def _count1_bits(quads, sel):
    lens, codes = T.HUFF_COUNT1[sel]
    bits = 0
    for q in quads:
        idx = (q[0] << 3) | (q[1] << 2) | (q[2] << 1) | q[3]
        bits += lens[idx] + int(sum(q))
    return bits


def _quantize(xr: np.ndarray, max_ix: int = 15):
    """Find global_gain so max |ix| <= max_ix; return (gg, ix)."""
    peak = np.abs(xr).max()
    if peak == 0.0:
        return 210, np.zeros(576, dtype=np.int64)
    # |ix| = round((|xr| / 2^((gg-210)/4))^(3/4)) <= max_ix
    amin = peak / ((max_ix + 0.4999) ** (4.0 / 3.0))
    gg = 210 + int(np.ceil(4 * np.log2(amin)))
    gg = max(0, min(255, gg))
    while True:
        a = 2.0 ** ((gg - 210) / 4.0)
        ix = np.rint((np.abs(xr) / a) ** 0.75).astype(np.int64)
        if ix.max() <= max_ix or gg >= 255:
            return gg, ix * np.sign(xr).astype(np.int64)
        gg += 1


def _encode_granule_spectrum(xr: np.ndarray, block_type: int, sfb_long,
                             coarsen: int = 0):
    """Quantize + huffman-code one granule; returns (granule_info, payload_bits_writer)."""
    gg, ix = _quantize(xr)
    gg = min(255, gg + coarsen)
    a = 2.0 ** ((gg - 210) / 4.0)
    ix = (np.rint((np.abs(xr) / a) ** 0.75).astype(np.int64)
          * np.sign(xr).astype(np.int64))
    mags = np.abs(ix)
    signs = (ix < 0).astype(np.int64)
    # trailing zero part
    nz = np.nonzero(mags)[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    # count1 region: trailing quads of |v|<=1, starting from an even pair
    c1_start = last
    while c1_start > 0 and mags[c1_start - 1] <= 1:
        c1_start -= 1
    c1_start += (-c1_start) % 4
    bv_end = c1_start
    if bv_end % 2:
        bv_end += 1
    bv_end = min(bv_end, 576)
    if bv_end > 576 - 2 and bv_end % 2:
        raise Mp3Error("internal: odd big_values")
    quads = []
    p = bv_end
    while p + 4 <= last:
        quads.append(tuple(int(v) for v in mags[p:p + 4]))
        p += 4
    if p < last:                      # remainder joins big values region
        bv_end = last + (last % 2)
        bv_end += (-bv_end) % 2
        # recompute: simplest fallback, put everything in big values
        bv_end = last + (last % 2)
        quads = []
    g = _Granule()
    g.part2_3_length = 0
    g.big_values = bv_end // 2
    if g.big_values > 288:
        raise Mp3Error("big_values overflow")
    g.global_gain = gg
    g.scalefac_compress = 0
    g.window_switching = 1 if block_type != 0 else 0
    g.block_type = block_type
    g.mixed = 0
    g.subblock_gain = [0, 0, 0]
    g.preflag = 0
    g.scalefac_scale = 0
    # regions + tables
    bw = _BitWriter()
    if block_type == 0:
        g.region0 = 7
        g.region1 = 7
        # decoder reads region0 through sfb_long[region0_count+1] and
        # region1 through sfb_long[region0_count+region1_count+2]
        b0 = min(sfb_long[g.region0 + 1], bv_end)
        b1 = min(sfb_long[g.region0 + g.region1 + 2], bv_end)
        t0, _ = _best_big_table(mags[:b0]) if b0 else (0, 0)
        t1, _ = _best_big_table(mags[b0:b1]) if b1 > b0 else (0, 0)
        t2, _ = _best_big_table(mags[b1:bv_end]) if bv_end > b1 else (0, 0)
        g.table_select = [t0, t1, t2]
        _write_big(bw, mags[:b0], signs, t0)
        _write_big(bw, mags[b0:b1], signs[b0:], t1)
        _write_big(bw, mags[b1:bv_end], signs[b1:], t2)
    else:
        g.region0 = 8 if block_type == 2 else 7
        g.region1 = 20 - g.region0
        b0 = min(36, bv_end)
        t0, _ = _best_big_table(mags[:b0]) if b0 else (0, 0)
        t1, _ = _best_big_table(mags[b0:bv_end]) if bv_end > b0 else (0, 0)
        g.table_select = [t0, t1, 0]
        _write_big(bw, mags[:b0], signs, t0)
        _write_big(bw, mags[b0:bv_end], signs[b0:], t1)
    # count1
    sel = 1 if (_count1_bits(quads, 1) < _count1_bits(quads, 0)) else 0
    g.count1table = sel
    lens, codes = T.HUFF_COUNT1[sel]
    p = bv_end
    for q in quads:
        idx = (q[0] << 3) | (q[1] << 2) | (q[2] << 1) | q[3]
        bw.write(codes[idx], lens[idx])
        for k in range(4):
            if q[k]:
                bw.write(int(signs[p + k]), 1)
        p += 4
    g.part2_3_length = bw.bit_length()
    return g, bw


def _granule_spectra(S: np.ndarray, block_types):
    """Subband samples (t, 32) -> list of per-granule 576-line spectra.
    Granule g windows rows [18g, 18g+36) (one-granule lookahead)."""
    ngr = len(S) // 18 - 1
    out = []
    for gidx in range(ngr):
        rows = S[18 * gidx:18 * gidx + 36].copy()
        bt = block_types[gidx]
        # encoder-side frequency pre-inversion (self-inverse op)
        rows9 = rows[:18]
        rows9[1::2, 1::2] = -rows9[1::2, 1::2]
        rows9b = rows[18:]
        rows9b[1::2, 1::2] = -rows9b[1::2, 1::2]
        xr = np.zeros(576)
        for sb in range(32):
            seg = rows[:, sb]
            if bt == 2:
                xk = np.zeros(18)
                for w in range(3):
                    sw = seg[6 + 6 * w:18 + 6 * w] * _WSHORT
                    xk[w::3] = (_MDCT12 @ sw) / 3.0
            else:
                xk = (_MDCT36 @ (seg * _WINDOWS[bt])) / 9.0
            xr[18 * sb:18 * sb + 18] = xk
        if bt != 2:
            # inverse alias butterflies (decoder applies the forward ones)
            for sb in range(1, 32):
                base = 18 * sb
                lo = xr[base - 1 - np.arange(8)].copy()
                hi = xr[base + np.arange(8)].copy()
                xr[base - 1 - np.arange(8)] = lo * _CS + hi * _CA
                xr[base + np.arange(8)] = hi * _CS - lo * _CA
        else:
            # decoder's reorder maps (sfb,window,line)->interleaved; the
            # encoder stores the inverse so decode lands back here.
            pass
        out.append((bt, xr))
    return out


def _deorder_short(xr, sfb_short):
    """Inverse of _reorder_short: interleaved -> (sfb, window, line)."""
    out = xr.copy()
    for bi in range(13):
        w_lo, w_hi = sfb_short[bi], sfb_short[bi + 1]
        width = w_hi - w_lo
        base = 3 * w_lo
        if base >= 576:
            break
        src = xr[base:base + 3 * width].reshape(width, 3)
        out[base:base + 3 * width] = src.T.ravel()
    return out


# sample rate -> (header version bits, index); covers MPEG-1/2/2.5
_SR_INDEX = {44100: (3, 0), 48000: (3, 1), 32000: (3, 2),
             22050: (2, 0), 24000: (2, 1), 16000: (2, 2),
             11025: (0, 0), 12000: (0, 1), 8000: (0, 2)}


def encode(x: np.ndarray, sample_rate: int, *, bitrate: int = 128000,
           ms: bool = False, block_pattern: str | None = None) -> bytes:
    """Encode PCM to an MPEG Layer III stream (MPEG-1 at 44.1/48/32 kHz,
    MPEG-2 LSF at 22.05/24/16 kHz, MPEG-2.5 at 11.025/12/8 kHz).

    x: float array (n,) mono or (n, 2) stereo in [-1, 1].
    block_pattern: None (all long) or 'cycle' (long/start/short/stop
    repeating — exercises every window type in decoders).
    Conformance: uses only verified Huffman tables (values <= 15), all
    scalefactors zero, main_data_begin == 0 (no reservoir), stuffing
    bits fill each frame — legal, decodable by any conformant decoder.
    Fidelity note: the <=15 value cap bounds tonal SNR near ~25 dB
    (finer steps need the unshipped escape tables); adequate for the
    pipeline's feature-extraction contract and for codec fixtures.
    """
    if sample_rate not in _SR_INDEX:
        raise Mp3Error("unsupported sample rate %r" % (sample_rate,))
    vbits, sr_idx = _SR_INDEX[sample_rate]
    lsf = vbits != 3
    br_index = {r * 1000: i for i, r in
                enumerate(T.BITRATES_L3[2 if lsf else 1]) if r}
    if bitrate not in br_index:
        raise Mp3Error("bitrate must be one of %s" % sorted(br_index))
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        chans = [x]
    else:
        chans = [x[:, 0], x[:, 1]]
    nch = len(chans)
    # pad so the lookahead granule exists
    n = len(chans[0])
    ngr = max(1, -(-n // 576))
    need = (ngr + 1) * 576
    chans = [np.pad(c, (0, need - n)) for c in chans]
    spectra = []
    sfb_long = T.SFB_LONG[sample_rate]
    sfb_short = T.SFB_SHORT[sample_rate]
    if block_pattern == "cycle":
        bts = [(0, 1, 2, 3)[g % 4] for g in range(ngr)]
    else:
        bts = [0] * ngr
    for c in chans:
        S = analysis_filterbank(c)
        spectra.append(_granule_spectra(S, bts))
    if ms and nch == 2:
        inv = 1.0 / np.sqrt(2.0)
        for gidx in range(ngr):
            bt, l = spectra[0][gidx]
            _, r = spectra[1][gidx]
            spectra[0][gidx] = (bt, (l + r) * inv)
            spectra[1][gidx] = (bt, (l - r) * inv)
    hdr_word_base = (0x7FF << 21) | (vbits << 19) | (1 << 17) | (1 << 16)
    hdr_word_base |= br_index[bitrate] << 12
    hdr_word_base |= sr_idx << 10
    if nch == 1:
        mode = 3
    elif ms:
        mode = 1
    else:
        mode = 0
    hdr_word_base |= (mode << 6) | ((2 if ms else 0) << 4)
    gr_per_frame = 1 if lsf else 2
    spf = 576 * gr_per_frame
    frame_len = spf // 8 * bitrate // sample_rate   # pad bit unused (0)
    if lsf:
        side_size = 9 if nch == 1 else 17
    else:
        side_size = 17 if nch == 1 else 32
    cap_bits = (frame_len - 4 - side_size) * 8
    out = bytearray()
    for f in range(0, ngr, gr_per_frame):
        for coarsen in range(0, 64, 4):
            grs = []
            bws = []
            total = 0
            for gidx in range(f, f + gr_per_frame):
                for ch in range(nch):
                    if gidx < ngr:
                        bt, xr = spectra[ch][gidx]
                        xr_store = (_deorder_short(xr, sfb_short)
                                    if bt == 2 else xr)
                        g, bw = _encode_granule_spectrum(
                            xr_store, bt, sfb_long, coarsen)
                    else:
                        g, bw = _encode_granule_spectrum(
                            np.zeros(576), 0, sfb_long)
                    grs.append(g)
                    bws.append(bw)
                    total += g.part2_3_length
            if total <= cap_bits:
                break
        else:
            raise Mp3Error("frame does not fit even at maximum coarseness")
        # side info
        sw = _BitWriter()
        if lsf:
            sw.write(0, 8)                  # main_data_begin
            sw.write(0, 1 if nch == 1 else 2)
        else:
            sw.write(0, 9)                  # main_data_begin
            sw.write(0, 5 if nch == 1 else 3)
            for _ in range(nch):
                sw.write(0, 4)              # scfsi
        for g in grs:
            sw.write(g.part2_3_length, 12)
            sw.write(g.big_values, 9)
            sw.write(g.global_gain, 8)
            sw.write(g.scalefac_compress, 9 if lsf else 4)
            sw.write(g.window_switching, 1)
            if g.window_switching:
                sw.write(g.block_type, 2)
                sw.write(g.mixed, 1)
                sw.write(g.table_select[0], 5)
                sw.write(g.table_select[1], 5)
                for sb in g.subblock_gain:
                    sw.write(sb, 3)
            else:
                for t in g.table_select:
                    sw.write(t, 5)
                sw.write(g.region0, 4)
                sw.write(g.region1, 3)
            if not lsf:
                sw.write(g.preflag, 1)
            sw.write(g.scalefac_scale, 1)
            sw.write(g.count1table, 1)
        sw.pad_to_byte()
        side = sw.bytes()
        assert len(side) == side_size, (len(side), side_size)
        mw = _BitWriter()
        for bw in bws:
            mw.write(0, 0)
            # append payload bits
            for byte in bw.buf:
                mw.write(byte, 8)
            if bw.nbits:
                mw.write(bw.acc, bw.nbits)
        mw.pad_to_byte()
        main = mw.bytes()
        main = main + b"\x00" * (frame_len - 4 - side_size - len(main))
        out += int.to_bytes(hdr_word_base, 4, "big") + side + main
    return bytes(out)
