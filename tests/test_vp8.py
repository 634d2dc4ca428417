"""From-scratch VP8 (lossy WebP) codec conformance (raster/vp8.py).

Two independent evidence directions against the reference C
implementation (system libwebp via raster/native_webp.py ctypes):

1. DECODE conformance: libwebp-ENCODED streams — real-world encoder
   output with probability updates, segment/filter headers, B_PRED
   mode mixes, in-loop deblocking — decode to BIT-EXACT YUV planes
   (WebPDecodeYUV) and BIT-EXACT RGB (WebPDecodeRGB, fancy
   upsampling) through the pure decoder.
2. ENCODE conformance: libwebp DECODES the from-scratch encoder's
   streams to exactly the same planes as the pure decoder — over all
   16x16 luma modes, random per-sub-block B_PRED grids (every
   kf_bmode context row), nonzero loop-filter levels (normal and
   simple), and odd frame dims.

Plus library-free self checks (round-trip determinism, PSNR, the
engine's fmt='webp' dispatch) that hold in any environment.

Reference parity: gis-tools reads imagery via PIL/GDAL
(/root/reference/gistools/raster.py:99-141), which delegate WebP to
the same libwebp this test pins against.
"""

import numpy as np
import pytest

from gis_tools_spark.raster import codec, native_webp, vp8, webp

HAVE_LIB = native_webp.available()
needs_lib = pytest.mark.skipif(not HAVE_LIB, reason="libwebp absent")


def _photo(h, w, seed=0):
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    base = (127 + 55 * np.sin(x * 0.11 + seed) * np.cos(y * 0.08)
            + rng.normal(0, 5, (h, w))).clip(0, 255)
    return np.stack([base, base * 0.82 + 12, base * 0.6 + 35],
                    axis=2).astype(np.uint8)


def _vp8_payload(buf: bytes) -> bytes:
    import struct
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        if tag == b"VP8 ":
            return buf[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


# ---------------------------------------------------------------- decode

@needs_lib
@pytest.mark.parametrize("dims", [(16, 16), (32, 48), (33, 47), (21, 13),
                                  (64, 64), (80, 56)])
@pytest.mark.parametrize("q", [20, 50, 75, 90])
def test_decode_libwebp_streams_yuv_bit_exact(dims, q):
    h, w = dims
    buf = native_webp.encode(_photo(h, w, seed=h + q), quality=q)
    ly, lu, lv = native_webp.decode_yuv(buf)
    my, mu, mv = vp8.decode_planes(_vp8_payload(buf))
    assert np.array_equal(ly, my)
    assert np.array_equal(lu, mu)
    assert np.array_equal(lv, mv)


@needs_lib
@pytest.mark.parametrize("dims", [(32, 48), (33, 47), (21, 13)])
def test_decode_libwebp_streams_rgb_bit_exact(dims):
    """The chroma fancy-upsampler and fixed-point YUV→RGB conversion
    reproduce libwebp's RGB output exactly, so the pure and ctypes
    decode paths are interchangeable."""
    h, w = dims
    buf = native_webp.encode(_photo(h, w, seed=w), quality=75)
    lrgb = native_webp.decode_rgb(buf)
    mrgb = vp8.decode(_vp8_payload(buf))
    assert np.array_equal(lrgb, mrgb)


# ---------------------------------------------------------------- encode

@needs_lib
@pytest.mark.parametrize("ymode", [vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED,
                                   vp8.TM_PRED])
def test_libwebp_decodes_pure_16x16_streams_exactly(ymode):
    img = _photo(32, 48, seed=ymode)
    payload = vp8.encode(img, q_index=30, ymode=ymode)
    buf = webp.encode(img, lossy=True)  # container check below uses this
    ly, lu, lv = native_webp.decode_yuv(
        b"RIFF" + (len(payload) + 12 + (len(payload) & 1)).to_bytes(4, "little")
        + b"WEBPVP8 " + len(payload).to_bytes(4, "little") + payload
        + (b"\x00" if len(payload) & 1 else b""))
    my, mu, mv = vp8.decode_planes(payload)
    assert np.array_equal(ly, my)
    assert np.array_equal(lu, mu)
    assert np.array_equal(lv, mv)
    assert buf[12:16] == b"VP8 "


@needs_lib
@pytest.mark.parametrize("seed", range(4))
def test_libwebp_decodes_pure_bpred_streams_exactly(seed):
    """Random per-sub-block mode grids drive every kf_bmode context
    row and all ten 4x4 predictors through BOTH implementations."""
    rng = np.random.default_rng(seed)
    img = _photo(48, 48, seed=seed + 20)
    grid = rng.integers(0, 10, (12, 12))
    payload = vp8.encode(img, q_index=25, ymode=vp8.B_PRED,
                         bmode_grid=grid)
    wrapped = (b"RIFF"
               + (len(payload) + 12 + (len(payload) & 1)).to_bytes(4, "little")
               + b"WEBPVP8 " + len(payload).to_bytes(4, "little")
               + payload + (b"\x00" if len(payload) & 1 else b""))
    ly, lu, lv = native_webp.decode_yuv(wrapped)
    my, mu, mv = vp8.decode_planes(payload)
    assert np.array_equal(ly, my)
    assert np.array_equal(lu, mu)
    assert np.array_equal(lv, mv)


@needs_lib
@pytest.mark.parametrize("simple,level", [(0, 18), (0, 45), (1, 24)])
def test_loop_filter_cross_checked_on_own_streams(simple, level):
    """Nonzero filter levels: both decoders run their in-loop deblock
    (normal wide/narrow taps + hev, or the simple filter) over the
    same reconstruction — outputs must stay bit-exact."""
    img = _photo(48, 32, seed=level)
    payload = vp8.encode_planes(*vp8.rgb_to_yuv420(img), 32, 48,
                                q_index=60, filter_level=level,
                                filter_simple=simple)
    wrapped = (b"RIFF"
               + (len(payload) + 12 + (len(payload) & 1)).to_bytes(4, "little")
               + b"WEBPVP8 " + len(payload).to_bytes(4, "little")
               + payload + (b"\x00" if len(payload) & 1 else b""))
    ly, lu, lv = native_webp.decode_yuv(wrapped)
    my, mu, mv = vp8.decode_planes(payload)
    assert np.array_equal(ly, my)
    assert np.array_equal(lu, mu)
    assert np.array_equal(lv, mv)


# ------------------------------------------------------------ lib-free

def test_roundtrip_psnr_and_determinism():
    img = _photo(40, 56, seed=3)
    buf = webp.encode(img, lossy=True, quality=90)
    assert buf == webp.encode(img, lossy=True, quality=90)
    out = webp.decode(buf)
    assert out.shape == img.shape
    assert codec.psnr(img, out) >= 30.0
    # finer quantizer → better fidelity (north-rule PSNR>=40 band)
    hi = webp.decode(webp.encode(img, lossy=True, quality=100))
    assert codec.psnr(img, hi) >= 40.0


def test_codec_dispatch_handles_lossy_without_libwebp(monkeypatch):
    monkeypatch.setattr(native_webp, "_lib", None)
    monkeypatch.setattr(native_webp, "_tried", True)
    img = _photo(24, 24, seed=7)
    buf = webp.encode(img, lossy=True, quality=85)
    assert webp.is_lossy(buf)
    out = codec.decode(buf, 24, 24, "webp")
    assert codec.psnr(img, out) >= 28.0


def test_corrupt_vp8_payload_raises():
    with pytest.raises(ValueError):
        vp8.decode_planes(b"\x00" * 8)
    with pytest.raises(ValueError):
        vp8.decode_planes(b"\x01" + b"\x00" * 40)   # interframe tag
    img = _photo(16, 16, seed=1)
    payload = _vp8_payload(webp.encode(img, lossy=True))
    with pytest.raises(ValueError):
        vp8.decode_planes(payload[:8])


def test_odd_dims_crop():
    img = _photo(17, 19, seed=5)
    out = webp.decode(webp.encode(img, lossy=True, quality=95))
    assert out.shape == (17, 19, 3)
    assert codec.psnr(img, out) >= 32.0


def test_fixture_webp_rows_mix_lossy_and_lossless():
    from gis_tools_spark import fixtures

    df = fixtures.gen_images(120, seed=11)
    wd = df[df.fmt == "webp"]
    kinds = {webp.is_lossy(b) for b in wd["bytes"]}
    assert kinds == {True, False}
    for _, r in wd.iterrows():
        arr = codec.decode(r["bytes"], r["w"], r["h"], "webp")
        assert codec.phash64(arr) == r["phash"]
