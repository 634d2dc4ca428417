"""HEIC/AVIF still-image codec through the system libheif binding
(raster/native_heif.py) — the two ISO-BMFF formats a 2020s web crawl
carries on top of the JPEG bulk (iPhone HEIC, AVIF <img> payloads).

Reference parity: gis-tools reads imagery via PIL/GDAL drivers
(/root/reference/gistools/raster.py:99-141), which delegate these
container formats to the platform codec libraries; we bind the same
public C API directly. All tests skip cleanly when libheif (or a codec
plugin) is absent — the engine then raises its honest
NotImplementedError instead (asserted below without skipping).
"""

import numpy as np
import pytest

from gis_tools_spark.raster import codec, native_heif

HAVE_HEVC = (native_heif.available(native_heif.HEVC)
             and native_heif.available(native_heif.HEVC, encode=True))
HAVE_AV1 = (native_heif.available(native_heif.AV1)
            and native_heif.available(native_heif.AV1, encode=True))


def _photo(h, w, seed=0):
    """Smooth photo-like RGB content (same shape as fixtures' lossy
    rows) so the lossy roundtrip PSNR is meaningful."""
    prng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    base = np.full((h, w), 127.0)
    for amp in (55.0, 30.0, 15.0):
        fx, fy = prng.uniform(0.05, 0.6, 2)
        px, py = prng.uniform(0.0, 6.28, 2)
        base = base + amp * np.sin(fx * x + px) * np.cos(fy * y + py)
    cb = 25.0 * np.sin(0.05 * x)
    cr = 25.0 * np.cos(0.04 * y)
    arr = np.stack([base + 1.4 * cr, base - 0.34 * cb - 0.71 * cr,
                    base + 1.77 * cb], axis=2)
    return np.clip(arr, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("fmt,have", [("heic", HAVE_HEVC),
                                      ("avif", HAVE_AV1)])
@pytest.mark.parametrize("h,w", [(32, 32), (64, 96), (17, 23)])
def test_roundtrip_psnr(fmt, have, h, w):
    if not have:
        pytest.skip(f"libheif {fmt} plugin absent")
    arr = _photo(h, w, seed=h * 100 + w)
    buf = codec.encode(arr, fmt)
    dec = codec.decode(buf, w, h, fmt)
    assert dec.shape == (h, w, 3) and dec.dtype == np.uint8
    assert codec.psnr(arr, dec) >= 45.0


@pytest.mark.parametrize("fmt,have", [("heic", HAVE_HEVC),
                                      ("avif", HAVE_AV1)])
def test_gray_input_promoted(fmt, have):
    if not have:
        pytest.skip(f"libheif {fmt} plugin absent")
    arr = _photo(32, 48, seed=5)[:, :, 0]
    buf = codec.encode(arr, fmt)
    dec = codec.decode(buf, 48, 32, fmt)
    assert dec.shape == (32, 48, 3)
    # gray → replicated channels: decoded channels stay near-equal
    assert float(np.abs(dec.astype(int) - dec[:, :, :1].astype(int))
                 .max()) <= 6
    assert codec.psnr(np.repeat(arr[:, :, None], 3, axis=2), dec) >= 45.0


def test_probe_brands():
    if HAVE_HEVC:
        assert native_heif.probe(codec.encode(_photo(16, 16), "heic")) \
            == "heic"
    if HAVE_AV1:
        assert native_heif.probe(codec.encode(_photo(16, 16), "avif")) \
            == "avif"
    assert native_heif.probe(b"\xff\xd8\xff\xe0" + b"\0" * 16) is None
    assert native_heif.probe(b"") is None
    # mp4 video brand is NOT a still image
    assert native_heif.probe(
        b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2") is None


def test_corrupt_raises_valueerror_not_crash():
    if not (HAVE_HEVC or HAVE_AV1):
        pytest.skip("libheif absent")
    fmt = "heic" if HAVE_HEVC else "avif"
    good = bytearray(codec.encode(_photo(32, 32), fmt))
    # truncation and mid-stream corruption must surface as ValueError
    with pytest.raises(ValueError):
        native_heif.decode(bytes(good[: len(good) // 3]))
    bad = bytearray(good)
    for i in range(len(bad) // 2, min(len(bad) // 2 + 40, len(bad))):
        bad[i] ^= 0xA5
    try:
        native_heif.decode(bytes(bad))
    except ValueError:
        pass  # either outcome is fine as long as the worker survives


def test_unavailable_contract(monkeypatch):
    """When libheif is missing the codec dispatch raises the honest
    NotImplementedError (never returns wrong pixels)."""
    monkeypatch.setattr(native_heif, "available",
                        lambda *a, **k: False)
    with pytest.raises(NotImplementedError):
        codec.decode(b"\x00" * 32, 4, 4, "heic")
    with pytest.raises(NotImplementedError):
        codec.encode(np.zeros((4, 4), np.uint8), "avif")


@pytest.mark.skipif(not (HAVE_HEVC and HAVE_AV1),
                    reason="libheif plugins absent")
def test_fixture_rows_pass_verify_kernel(spark):
    """heic/avif fixture rows (FMT_MIX) carry a phash of the DECODED
    pixels and pass the real Arrow verify kernel end-to-end."""
    from pyspark.sql import functions as F

    from gis_tools_spark import fixtures
    from gis_tools_spark.raster.kernels import verify_images_arrow

    pdf = fixtures.gen_images(400, seed=99)
    assert {"heic", "avif"} <= set(pdf.fmt), "mix must include both"

    df = spark.createDataFrame(pdf).withColumn("fmt2", F.col("fmt"))
    out = verify_images_arrow(df, passthrough=["fmt2"])
    agg = {r["fmt2"]: (r["n"], r["n_ok"]) for r in
           out.groupBy("fmt2").agg(
               F.count("*").alias("n"),
               F.sum(F.col("ok").cast("int")).alias("n_ok")).collect()}
    for f in ("heic", "avif"):
        n, n_ok = agg[f]
        assert n > 0 and n_ok == n, (f, n, n_ok)


@pytest.mark.skipif(not HAVE_HEVC, reason="libheif HEVC plugin absent")
def test_wds_sniffer_heic():
    from gis_tools_spark.sources.webdataset import sniff_image_format

    assert sniff_image_format(codec.encode(_photo(16, 16), "heic")) \
        == "heic"
    if HAVE_AV1:
        assert sniff_image_format(codec.encode(_photo(16, 16), "avif")) \
            == "avif"
