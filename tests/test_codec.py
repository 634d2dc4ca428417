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


def test_lossy_stub_raises():
    with pytest.raises(NotImplementedError):
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
