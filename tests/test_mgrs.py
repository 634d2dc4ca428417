"""MGRS encode/decode (functions/mgrs.py)."""

import numpy as np
import pytest

from gis_tools_spark.functions import mgrs as M


def test_known_square_ids():
    """Latitude band + 100 km square letters of famous locations
    (public, widely published)."""
    assert M.encode(-77.0353, 38.8894, 5)[:6] == "18SUJ2"
    assert M.encode(2.2945, 48.8583, 5)[:5] == "31UDQ"
    assert M.encode(151.2153, -33.8568, 5)[:5] == "56HLH"
    assert M.encode(-0.1278, 51.5074, 5)[:5] == "30UXC"   # London
    assert M.encode(139.6917, 35.6895, 5)[:5] == "54SUE"  # Tokyo


def test_roundtrip_random():
    rng = np.random.RandomState(2)
    for _ in range(300):
        lon = float(rng.uniform(-179.9, 179.9))
        lat = float(rng.uniform(-79.9, 83.9))
        for p in (5, 3, 2):
            ref = M.encode(lon, lat, p)
            lo, la = M.decode(ref)
            step_m = 10 ** (5 - p)
            # SW corner is within one cell of the input
            assert abs(la - lat) < step_m / 100_000.0 * 1.2 + 1e-6
            # re-encoding a point just inside the square reproduces it
            eps = step_m * 4e-6
            assert M.encode(lo + eps, la + eps, p) == ref


def test_utm_consistency():
    """MGRS digits equal the UTM easting/northing mod 100 km."""
    from gis_tools_spark.functions.crs import _to_utm

    lon, lat = 11.07, 49.45                 # Nuremberg, zone 32U
    ref = M.encode(lon, lat, 5)
    e, n = _to_utm(np.array([lon]), np.array([lat]), 32)
    assert ref[:3] == "32U"
    assert int(ref[5:10]) == int(e[0] % 100_000)
    assert int(ref[10:15]) == int(n[0] % 100_000)


def test_norway_svalbard_exceptions():
    assert M.encode(5.0, 60.0, 1).startswith("32V")   # Norway: 31->32
    assert M.encode(8.0, 75.0, 1).startswith("31X")
    assert M.encode(15.0, 78.0, 1).startswith("33X")  # Svalbard
    assert M.encode(30.0, 79.0, 1).startswith("35X")


def test_band_edges_and_errors():
    assert M.encode(0.0, 83.9, 1).startswith("31X")   # X band is 12°
    with pytest.raises(ValueError):
        M.encode(0.0, 85.0)                            # UPS range
    with pytest.raises(ValueError):
        M.encode(0.0, -81.0)
    with pytest.raises(ValueError):
        M.decode("99ZZZ11")
    with pytest.raises(ValueError):
        M.decode("18SUJ123")                           # odd digits


def test_spark_column(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({
        "lon": [2.2945, 0.0], "lat": [48.8583, 89.0]}))
    out = df.select(M.mgrs_column(3)(F.col("lon"), F.col("lat"))
                    .alias("m")).collect()
    assert out[0]["m"].startswith("31UDQ")
    assert out[1]["m"] is None                         # polar → null
