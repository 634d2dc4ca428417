"""From-scratch VP8L lossless codec (raster/webp.py): bit-exact
roundtrips, container structure, hand-computed header golden, decoder
feature paths (simple + full prefix codes, LZ77, cache guards)."""

import struct

import numpy as np
import pytest

from gis_tools_spark.raster import codec, webp
from gis_tools_spark.raster.webp import (_BitReader, _BitWriter, _Decoder,
                                         _canonical_codes, decode, encode)


def test_bit_io_roundtrip():
    bw = _BitWriter()
    vals = [(5, 3), (1, 1), (1023, 10), (0, 7), (77, 8)]
    for v, n in vals:
        bw.write(v, n)
    br = _BitReader(bw.bytes())
    for v, n in vals:
        assert br.read(n) == v


def test_canonical_codes_flat_is_identity():
    codes = _canonical_codes([8] * 256)
    assert codes[0] == (0, 8) and codes[255] == (255, 8) and codes[17] == (17, 8)


def test_prefix_code_roundtrip_mixed_lengths():
    lengths = [0] * 16
    lengths[3], lengths[7], lengths[9], lengths[12] = 1, 2, 3, 3
    codes = _canonical_codes(lengths)
    bw = _BitWriter()
    seq = [3, 9, 7, 12, 3, 3, 12, 9]
    for s in seq:
        c, l = codes[s]
        bw.write_code(c, l)
    dec = _Decoder(lengths)
    br = _BitReader(bw.bytes())
    assert [dec.read(br) for _ in seq] == seq


def test_rgb_roundtrip_bit_exact():
    rng = np.random.default_rng(42)
    a = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    buf = encode(a)
    out = decode(buf)
    assert out.dtype == np.uint8 and (out == a).all()


def test_gray_and_constant_roundtrip():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    out = decode(encode(g))
    assert (out == np.stack([g, g, g], axis=2)).all()
    # constant image exercises the all-simple-code path
    c = np.full((8, 8, 3), 123, dtype=np.uint8)
    assert (decode(encode(c)) == c).all()
    one = np.array([[7]], dtype=np.uint8)
    assert (decode(encode(one)) == 7).all()


def test_container_structure_and_header_bits():
    a = np.zeros((3, 5, 3), dtype=np.uint8)  # w=5, h=3
    buf = encode(a)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP" and buf[12:16] == b"VP8L"
    size = struct.unpack("<I", buf[4:8])[0]
    assert size == len(buf) - 8 - (len(buf) & 1)
    payload = buf[20:]
    assert payload[0] == 0x2F
    # hand-decode the LSB-first header: 14 bits (w-1)=4, 14 bits (h-1)=2
    br = _BitReader(payload[1:])
    assert br.read(14) == 4
    assert br.read(14) == 2
    assert br.read(1) == 0      # alpha hint
    assert br.read(3) == 0      # version
    assert br.read(1) == 0      # no transform
    assert br.read(1) == 0      # no color cache
    assert br.read(1) == 0      # no meta prefix


def test_codec_dispatch_and_phash_gate():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    buf = codec.encode(a, "webp")
    out = codec.decode(buf, 32, 32, "webp")
    assert (out == a).all()
    assert codec.psnr(a, out) == float("inf")
    assert codec.phash64(out.mean(axis=2)) == codec.phash64(a.mean(axis=2))


def test_decoder_rejects_unsupported_paths():
    with pytest.raises(ValueError):
        decode(b"nope")
    # empty lossy VP8 chunk: a clean ValueError from the pure VP8
    # decoder — never a garbage parse
    fake = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        decode(fake)


def _pure_only(monkeypatch):
    """Disable the libwebp fallback so decode() must be pure."""
    from gis_tools_spark.raster import native_webp

    monkeypatch.setattr(native_webp, "_lib", None)
    monkeypatch.setattr(native_webp, "_tried", True)


@pytest.mark.parametrize("kind", ["photo", "palette", "bundled2",
                                  "bundled16", "gradient", "noise"])
def test_full_vp8l_decodes_libwebp_lossless_exactly(kind, monkeypatch):
    """Spec-complete VP8L conformance: files from the reference
    encoder (libwebp, WebPEncodeLosslessRGB) — which uses predictor /
    color / subtract-green / color-indexing transforms, meta prefix
    groups, color cache and short-distance LZ77 — decode pixel-exactly
    through the pure decoder, with the fallback disabled."""
    from gis_tools_spark.raster import native_webp

    if not native_webp.available():
        pytest.skip("libwebp absent")
    rng = np.random.default_rng(hash(kind) % 2**31)
    h, w = 57, 83
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    if kind == "photo":
        base = (127 + 70 * np.sin(x * 0.11) * np.cos(y * 0.07)
                + rng.normal(0, 4, (h, w))).clip(0, 255)
        img = np.stack([base, base * 0.8, 255 - base], axis=2)
        img = img.astype(np.uint8)
    elif kind == "palette":
        pal = rng.integers(0, 256, (23, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 23, (h, w))]
    elif kind == "bundled2":
        pal = rng.integers(0, 256, (2, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 2, (h, w))]
    elif kind == "bundled16":
        pal = rng.integers(0, 256, (14, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 14, (h, w))]
    elif kind == "gradient":
        img = np.stack([(x * 7 + y * 3) % 256, (x + y) % 256,
                        (x * 2) % 256], axis=2).astype(np.uint8)
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = native_webp.encode(img, lossless=True)
    _pure_only(monkeypatch)
    assert np.array_equal(decode(buf), img)


def test_decode_alpha_vp8l_plane():
    """ALPH compression method 1 reuses the headerless VP8L coder:
    round-trip an alpha plane through encode's green channel."""
    rng = np.random.default_rng(4)
    plane = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    # build a headerless stream by encoding a gray image and stripping
    # the 5-byte VP8L header (sig byte + 14+14+1+3 header bits = the
    # signature byte plus 4 bytes)
    img = np.stack([plane] * 3, axis=2)
    buf = encode(img)
    payload = buf[20:]  # RIFF(12) + VP8L chunk header(8) → payload
    # strip: payload[0]=0x2f signature, then 32 bits of dims/flags
    out = webp.decode_alpha_vp8l(payload[5:], 13, 9)
    assert np.array_equal(out, plane)


def test_decoder_lz77_and_cache_paths():
    """Hand-author a stream with a color cache + LZ77 backref (linear
    distance) to exercise decoder paths our encoder never emits."""
    bw = _BitWriter()
    w, h = 130, 2
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)            # no transform
    bw.write(1, 1)            # color cache ON
    cache_bits = 4
    bw.write(cache_bits, 4)
    bw.write(0, 1)            # no meta
    # FULL green code with nonzero lengths only for {60 (literal),
    # 256 (LZ77 len-1)}: declared over the 280+cache alphabet through
    # the code-length code {0:len1, 1:len2, 17:len2}
    alpha = 256 + 24 + (1 << cache_bits)
    bw.write(0, 1)            # not simple
    bw.write(12 - 4, 4)       # num_code_lengths = 12 (cover 17,18,0,1)
    cl_len = {17: 2, 0: 1, 1: 2}
    for sym in webp._ORDER[:12]:
        bw.write(cl_len.get(sym, 0), 3)
    clc = _canonical_codes([cl_len.get(s, 0) for s in range(19)])
    bw.write(0, 1)            # no max_symbol

    def emit(sym, extra=None):
        c, l = clc[sym]
        bw.write_code(c, l)
        if extra:
            bw.write(extra[0], extra[1])

    # 60 zeros: 17(10)x6 = 60
    for _ in range(6):
        emit(17, (10 - 3, 3))
    emit(1)                   # sym 60: length 1
    # zeros 61..255 = 195 zeros: 17 max is 10 → use many; 195 = 19*10+5
    for _ in range(19):
        emit(17, (10 - 3, 3))
    emit(17, (5 - 3, 3))
    emit(1)                   # sym 256: length 1
    # remaining zeros: let the loop run out via exact fill
    rest = alpha - 257
    while rest > 0:
        r = min(10, rest)
        if 0 < rest - r < 3:
            r = rest - 3
        emit(17, (r - 3, 3))
        rest -= r
    green = _canonical_codes([1 if s in (60, 256) else 0 for s in range(alpha)])
    # red/blue/alpha: simple single-symbol codes
    for val in (200, 100, 255):
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(val, 8)
    # distance code: simple single symbol 15 (0-bit reads); with 6
    # extra bits 57 it decodes to plane 192 + 57 + 1 = 250 → linear
    # distance 250 - 120 = 130 = one full row back
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(15, 8)
    # data: 130 literals fill row 0, then 130 length-1 backrefs (green
    # code 256 → LZ77 length 1) each copying argb[i-130]
    c60, l60 = green[60]
    for _ in range(w):
        bw.write_code(c60, l60)
    c256, l256 = green[256]
    for _ in range(w):
        bw.write_code(c256, l256)
        bw.write(57, 6)
    data = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    buf = b"RIFF" + struct.pack("<I", len(riff)) + riff

    out = decode(buf)
    assert out.shape == (2, 130, 3)
    # every pixel is the same literal: (r,g,b) = (200,60,100)
    assert (out[:, :, 0] == 200).all()
    assert (out[:, :, 1] == 60).all()
    assert (out[:, :, 2] == 100).all()


def test_decoder_lz77_uses_distance_code_15():
    """The hand stream above uses distance code 15 (plane 250 = dist
    120+130): verify the mapping helper directly too."""
    bw = _BitWriter()
    bw.write(57, 6)
    br = _BitReader(bw.bytes())
    assert webp._lz77_value(15, br) == 250


def test_webp_roundtrip_fuzz():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1),
           st.sampled_from(["rgb", "gray", "const"]))
    def _case(w, h, seed, kind):
        rng = np.random.default_rng(seed)
        if kind == "rgb":
            a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == "gray":
            a = rng.integers(0, 256, (h, w), dtype=np.uint8)
        else:
            a = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
        out = decode(encode(a))
        want = a if a.ndim == 3 else np.stack([a, a, a], axis=2)
        assert (out == want).all()

    _case()
