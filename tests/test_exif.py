"""EXIF geotag codec + Spark extraction operators.

Oracle strategy: the codec round-trip is proven exact at microdegree
resolution over hemisphere corners and random draws; the Spark ops are
checked against the per-row pure-Python parse and for decode
invariance (APP1 insertion must not change a single decoded pixel).
"""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.raster import exif as X
from gis_tools_spark.raster import jpeg as J


def _jpeg(seed: int = 0, side: int = 24) -> bytes:
    a = (np.random.RandomState(seed).rand(side, side, 3) * 255)
    return J.encode(a.astype(np.uint8), quality=88)


def test_roundtrip_exact_microdegrees():
    buf = _jpeg()
    rng = np.random.RandomState(7)
    cases = [(48_858_370, 2_294_481), (-33_868_820, 151_209_290),
             (0, 0), (89_999_999, -179_999_999), (-89_999_999, 180_000_000)]
    cases += [(int(rng.randint(-90_000_000, 90_000_001)),
               int(rng.randint(-180_000_000, 180_000_001)))
              for _ in range(200)]
    for lat_u, lon_u in cases:
        p = X.parse_exif(X.geotag(buf, lat_udeg=lat_u, lon_udeg=lon_u))
        assert int(np.floor(p["lat"] * 1e6 + 0.5)) == lat_u
        assert int(np.floor(p["lon"] * 1e6 + 0.5)) == lon_u


def test_fields_roundtrip_and_decode_invariance():
    buf = _jpeg(3)
    g = X.geotag(buf, lat_udeg=1_500_000, lon_udeg=-2_250_000,
                 alt_mm=-12_345, dt="2026:01/bad", orientation=8)
    p = X.parse_exif(g)
    assert p["orientation"] == 8
    assert p["dt"] == "2026:01/bad"
    assert abs(p["alt_m"] - (-12.345)) < 1e-12
    assert np.array_equal(J.decode(g), J.decode(buf))


def test_partial_exif():
    buf = _jpeg(4)
    only_ori = X.insert_app1(buf, X.build_exif(orientation=3))
    p = X.parse_exif(only_ori)
    assert p["orientation"] == 3 and p["lat"] is None
    only_gps = X.insert_app1(
        buf, X.build_exif(lat_udeg=10, lon_udeg=-10))
    p = X.parse_exif(only_gps)
    assert p["orientation"] is None
    assert int(np.floor(p["lat"] * 1e6 + 0.5)) == 10
    assert int(np.floor(p["lon"] * 1e6 + 0.5)) == -10


def test_malformed_inputs_never_raise():
    buf = _jpeg(5)
    g = X.geotag(buf, lat_udeg=1, lon_udeg=1)
    for b in (b"", b"\xff", b"\xff\xd8", buf, b"PNG" * 10,
              g[:40], g[:2] + b"\xff\xe1\x00\x04Ex", bytes(64)):
        out = X.parse_exif(b)
        assert set(out) == {"lat", "lon", "alt_m", "dt", "orientation"}
    # truncations of a valid geotagged stream
    for cut in range(2, min(len(g), 220), 7):
        X.parse_exif(g[:cut])


def test_app1_after_app0_is_found():
    """Real cameras put APP1 after JFIF's APP0 — the walk must skip
    over APP0 (and any other marker segment) to find it."""
    buf = _jpeg(6)
    app1 = X.build_exif(lat_udeg=777, lon_udeg=-777)
    assert buf[2:4] == b"\xff\xe0"  # encoder emits JFIF APP0 first
    spliced = buf[:20] + app1 + buf[20:]  # after the 18-byte APP0
    p = X.parse_exif(spliced)
    assert int(np.floor(p["lat"] * 1e6 + 0.5)) == 777


def test_spark_exif_gps_matches_pure_python(spark):  # noqa: F811
    from gis_tools_spark.operators.imgmeta import exif_gps

    base = _jpeg(8)
    rows = []
    for i in range(60):
        lat_u = (i * 9973 % 180_000_001) - 90_000_000
        lon_u = (i * 7919 % 360_000_001) - 180_000_000
        if i % 5 == 0:
            rows.append((f"img{i}", base, lat_u, lon_u))  # no EXIF
        elif i % 7 == 0:
            rows.append((f"img{i}", b"not a jpeg", lat_u, lon_u))
        else:
            rows.append((f"img{i}",
                         X.geotag(base, lat_udeg=lat_u, lon_udeg=lon_u,
                                  orientation=1 + i % 8),
                         lat_u, lon_u))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "lu", "lo"]))
    out = exif_gps(df).toPandas().set_index("image_id")
    for iid, buf, lu, lo in rows:
        r = out.loc[iid]
        if iid in out.index and r["has_gps"]:
            assert int(np.floor(r["lat"] * 1e6 + 0.5)) == lu
            assert int(np.floor(r["lon"] * 1e6 + 0.5)) == lo
        else:
            assert pd.isna(r["lat"])
    n_gps = sum(1 for i in range(60) if i % 5 and i % 7)
    assert int(out["has_gps"].sum()) == n_gps


def test_spark_geotag_images_roundtrip(spark):  # noqa: F811
    from gis_tools_spark.operators.imgmeta import exif_gps, geotag_images

    base = _jpeg(9)
    pdf = pd.DataFrame({
        "image_id": [f"i{k}" for k in range(20)],
        "bytes": [base if k % 4 else b"RAWW" for k in range(20)],
        "lat_udeg": [k * 1_000_003 - 10_000_000 for k in range(20)],
        "lon_udeg": [k * 2_000_003 - 20_000_000 for k in range(20)],
        "ori": [1 + k % 8 for k in range(20)],
    })
    df = spark.createDataFrame(pdf)
    stamped = geotag_images(df, orientation="ori")
    assert stamped.columns == df.columns
    out = exif_gps(stamped).toPandas().set_index("image_id")
    for _, row in pdf.iterrows():
        r = out.loc[row["image_id"]]
        if row["bytes"][:2] == b"\xff\xd8":
            assert int(np.floor(r["lat"] * 1e6 + 0.5)) == row["lat_udeg"]
            assert int(np.floor(r["lon"] * 1e6 + 0.5)) == row["lon_udeg"]
            assert r["orientation"] == row["ori"]
        else:
            assert not r["has_gps"]


@pytest.mark.parametrize("alt_mm,want", [(0, 0.0), (8_848_860, 8848.86),
                                         (-430_500, -430.5)])
def test_altitude_ref(alt_mm, want):
    p = X.parse_exif(X.geotag(_jpeg(10), lat_udeg=1, lon_udeg=1,
                              alt_mm=alt_mm))
    assert abs(p["alt_m"] - want) < 1e-9
