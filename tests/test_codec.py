"""Image codec invariants (BASELINE.json input_hint: decoded pixels
allclose, PSNR ≥ 40 dB for lossy; captions byte-equal)."""

import numpy as np
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.raster import codec


def test_png_roundtrip_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (32, 16, 3), dtype=np.uint8)
    assert (codec.decode_png(codec.encode_png(a)) == a).all()


def test_raw_roundtrips():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert (codec.decode_raw(codec.encode_raw(a), 8, 8) == a).all()
    f = rng.normal(0, 1, (8, 8)).astype(np.float32)
    assert (codec.decode_raw_f32(codec.encode_raw_f32(f), 8, 8) == f).all()
    # raw_f64 (the cost-distance accumulation surface): bit-exact incl.
    # the inf/NaN sentinels the sweep loop stores, via dispatch too
    d = rng.normal(0, 1, (8, 8))
    d[0, 0], d[0, 1], d[0, 2] = np.inf, -np.inf, np.nan
    back = codec.decode_raw_f64(codec.encode_raw_f64(d), 8, 8)
    assert np.array_equal(back, d, equal_nan=True)
    assert back.dtype == np.float64
    assert np.array_equal(codec.decode(codec.encode(d, "raw_f64"), 8, 8,
                                       "raw_f64"), d, equal_nan=True)


def test_psnr_gate():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert codec.psnr(a, a) == float("inf")
    noisy = np.clip(a.astype(int) + rng.integers(-2, 3, a.shape), 0, 255).astype(np.uint8)
    assert codec.psnr(a, noisy) >= 40.0


def test_phash_stability_and_sensitivity():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert codec.phash64(a) == codec.phash64(a.copy())
    b = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert codec.phash64(a) != codec.phash64(b)


def test_real_codecs_reject_garbage():
    # jpeg (raster/jpeg.py) and webp (raster/webp.py) are both REAL
    # from-scratch codecs now; garbage payloads are parse errors
    with pytest.raises(ValueError):
        codec.decode(b"x", 1, 1, "webp")
    with pytest.raises(ValueError):
        codec.decode(b"x", 1, 1, "jpeg")


def test_fixture_images_decode_and_captions():
    imgs = fixtures.gen_images(30)
    for _, r in imgs.iterrows():
        arr = codec.decode(r["bytes"], r["w"], r["h"], r["fmt"])
        assert arr.shape == (r["h"], r["w"], 3)
        assert codec.phash64(arr) == r["phash"]
        assert r["caption"].startswith("caption for img")


def test_fixture_determinism():
    assert fixtures.gen_images(20).equals(fixtures.gen_images(20))


def test_verify_kernels_agree(spark):
    from pyspark.sql import functions as F

    from gis_tools_spark.raster.kernels import verify_images_arrow, verify_images_udf

    images = fixtures.gen_images_spark(spark, 400)
    n_arrow = verify_images_arrow(images).where("ok").count()
    n_pandas = images.select(verify_images_udf()(
        "bytes", "w", "h", "fmt", "phash", "caption", "image_id").alias("ok")
    ).where("ok").count()
    assert n_arrow == n_pandas == 400


def test_verify_arrow_detects_corruption(spark):
    from pyspark.sql import functions as F

    from gis_tools_spark.raster.kernels import verify_images_arrow

    images = fixtures.gen_images_spark(spark, 50).withColumn(
        "phash", F.col("phash") + 1)  # corrupt the stored hash
    assert verify_images_arrow(images).where("ok").count() == 0


# --------------------------------------------------------- round-2: lossy DCT

def test_dct_lossy_roundtrip_psnr():
    import numpy as np
    from gis_tools_spark.raster import codec

    rng = np.random.default_rng(0)
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    smooth = (127 + 80 * np.sin(x * 0.2) * np.cos(y * 0.15)
              + rng.normal(0, 4, (48, 64))).clip(0, 255)
    img = np.stack([smooth, smooth * 0.8, smooth * 0.6], axis=2).astype(np.uint8)
    buf = codec.encode(img, "dct")
    rt = codec.decode(buf, 64, 48, "dct")
    assert rt.shape == img.shape
    p = codec.psnr(img, rt)
    assert p >= 40.0, p                  # the BASELINE.md lossy gate
    assert p != float("inf")             # and it IS lossy
    assert len(buf) < img.size           # and it compresses
    # requantization is near-idempotent: second generation ≥ 55 dB
    rt2 = codec.decode(codec.encode(rt, "dct"), 64, 48, "dct")
    assert codec.psnr(rt, rt2) >= 55.0


def test_dct_odd_sizes_pad():
    import numpy as np
    from gis_tools_spark.raster import codec

    img = np.arange(13 * 11 * 3, dtype=np.uint8).reshape(13, 11, 3)
    rt = codec.decode(codec.encode(img, "dct"), 11, 13, "dct")
    assert rt.shape == (13, 11, 3)


def test_verify_images_arrow_dct_lossy_gate(spark):
    """End-to-end lossy path through the Arrow verify kernel: dct rows
    pass the phash + PSNR>=40 roundtrip gate (BASELINE.md); a corrupted
    row fails it."""
    import numpy as np
    import pandas as pd
    from gis_tools_spark.raster import codec
    from gis_tools_spark.raster.kernels import verify_images_arrow

    rng = np.random.default_rng(5)
    rows = []
    for i in range(20):
        x, yy = np.meshgrid(np.arange(32), np.arange(32))
        base = (127 + 70 * np.sin(x * 0.2 + i) * np.cos(yy * 0.17)).clip(0, 255)
        img = np.stack([base, base * 0.9, base * 0.7], 2).astype(np.uint8)
        buf = codec.encode(img, "dct")
        dec = codec.decode(buf, 32, 32, "dct")   # store phash of DECODED
        rows.append((f"img{i:09d}", bytearray(buf), 32, 32, "dct",
                     f"caption for img{i:09d}", codec.phash64(dec)))
    # one corrupted payload
    bad = bytearray(rows[0][1]); bad[-20:] = b"\x00" * 20
    rows.append(("img_bad", bad, 32, 32, "dct", "caption for img_bad", 0))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    out = {r["image_id"]: r["ok"] for r in verify_images_arrow(df).collect()}
    assert all(out[f"img{i:09d}"] for i in range(20))
    assert not out["img_bad"]
