"""Lossy VP8 WebP via the system libwebp ctypes binding
(raster/native_webp.py) — the real-world-dominant webp variant the
from-scratch VP8L codec cannot cover — plus the conformance evidence it
buys: libwebp decodes the pure-python VP8L encoder's output bit-exactly,
an independent check of the from-scratch bitstream against the
reference implementation.

Reference parity: gis-tools reads imagery via PIL/GDAL drivers
(/root/reference/gistools/raster.py:99-141), which delegate WebP to the
same libwebp.
"""

import numpy as np
import pytest

from gis_tools_spark.raster import codec, native_webp, webp

pytestmark = pytest.mark.skipif(not native_webp.available(),
                                reason="libwebp absent")


def _photo(h, w, seed=0):
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    base = (127 + 60 * np.sin(x * 0.13 + seed) * np.cos(y * 0.07)
            + rng.normal(0, 4, (h, w))).clip(0, 255)
    return np.stack([base, base * 0.8, base * 0.6], axis=2).astype(np.uint8)


def test_lossy_roundtrip_shapes_and_psnr():
    for (h, w) in ((16, 16), (48, 64), (33, 57)):
        img = _photo(h, w, seed=h)
        buf = webp.encode(img, lossy=True, quality=90)
        assert buf[12:16] == b"VP8 "          # real lossy VP8 chunk
        out = webp.decode(buf)                # public path routes native
        assert out.shape == (h, w, 3)
        assert codec.psnr(img, out) >= 25.0   # lossy, photo-like content


def test_native_decodes_pure_vp8l_bit_exact():
    """THE conformance check: the reference C implementation reads the
    from-scratch VP8L encoder's stream and reproduces the pixels
    exactly — the encoder is spec-conformant, not just self-consistent."""
    for seed in range(4):
        img = _photo(24, 40, seed=seed)
        assert np.array_equal(native_webp.decode(webp.encode(img)), img)
    gray = _photo(17, 23, seed=9)[:, :, 0]
    out = native_webp.decode(webp.encode(gray))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))


def test_native_lossless_matches_pure_encoder_pixels():
    """Native lossless encode → native decode is exact too (sanity on
    the binding's stride/layout handling)."""
    img = _photo(21, 35, seed=3)
    assert np.array_equal(native_webp.decode(
        native_webp.encode(img, lossless=True)), img)


def test_is_lossy_sniff():
    img = _photo(16, 16, seed=1)
    assert webp.is_lossy(webp.encode(img, lossy=True))
    assert not webp.is_lossy(webp.encode(img))


def test_corrupt_lossy_raises_valueerror():
    buf = webp.encode(_photo(16, 16, seed=2), lossy=True)
    with pytest.raises(ValueError):
        native_webp.decode(buf[:20])


def test_decode_many_routes_lossy_webp():
    img = _photo(32, 32, seed=5)
    lossy = webp.encode(img, lossy=True, quality=85)
    lossless = webp.encode(img)
    out = codec.decode_many([lossy, lossless, b"corrupt"],
                            [32, 32, 32], [32, 32, 32],
                            ["webp", "webp", "webp"])
    assert codec.psnr(img, out[0]) >= 25.0
    assert np.array_equal(out[1], img)
    assert isinstance(out[2], Exception)


def test_absent_library_is_no_longer_needed_for_lossy(monkeypatch):
    """With libwebp gone, BOTH lossy encode and VP8 decode still work
    through the from-scratch codec (raster/vp8.py) — the round-4
    closure of the last format-realism gap. Corrupt VP8 payloads raise
    ValueError, never silent wrong output."""
    monkeypatch.setattr(native_webp, "_lib", None)
    monkeypatch.setattr(native_webp, "_tried", True)
    img = _photo(16, 16, seed=4)
    buf = webp.encode(img)                    # pure lossless path
    assert np.array_equal(webp.decode(buf), img)
    lossy = webp.encode(img, lossy=True)      # pure lossy path
    assert codec.psnr(img, webp.decode(lossy)) >= 25.0
    fake_vp8 = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 "
                + (8).to_bytes(4, "little") + b"\x00" * 8)
    with pytest.raises(ValueError):
        webp.decode(fake_vp8)


def test_fixture_mix_contains_lossy_and_phash_holds():
    from gis_tools_spark import fixtures

    df = fixtures.gen_images(120, seed=11)
    wd = df[df.fmt == "webp"]
    kinds = {webp.is_lossy(b) for b in wd["bytes"]}
    assert kinds == {True, False}             # both variants sampled
    for _, r in wd.iterrows():
        arr = codec.decode(r["bytes"], r["w"], r["h"], "webp")
        assert codec.phash64(arr) == r["phash"]
