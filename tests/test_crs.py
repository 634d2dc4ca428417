"""CRS transforms: WGS84 ↔ WebMercator / UTM (closed-form kernels)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_tools_spark.functions.crs import reproject_udf, transform_xy
from gis_tools_spark.geom import wkb


def test_mercator_known_value_and_roundtrip():
    x, y = transform_xy(np.array([7.0]), np.array([43.0]), "4326", "3857")
    assert x[0] == pytest.approx(779236.4355529901, abs=1e-4)
    lon, lat = transform_xy(x, y, "3857", "4326")
    assert lon[0] == pytest.approx(7, abs=1e-10)
    assert lat[0] == pytest.approx(43, abs=1e-10)


def test_utm_reference_points():
    # central meridian, equator → false easting exactly
    x, y = transform_xy(np.array([9.0]), np.array([0.0]), "4326", "utm:32")
    assert x[0] == pytest.approx(500000, abs=1e-3)
    assert y[0] == pytest.approx(0, abs=1e-3)
    # central meridian at 45N: northing = meridian arc(45°)=4984944.378m × k0
    x2, y2 = transform_xy(np.array([9.0]), np.array([45.0]), "4326", "utm:32")
    assert y2[0] == pytest.approx(4984944.378 * 0.9996, abs=0.01)


def test_utm_roundtrip_bulk():
    rng = np.random.default_rng(0)
    lons = rng.uniform(6.5, 11.5, 100)
    lats = rng.uniform(-75, 75, 100)
    ux, uy = transform_xy(lons.copy(), lats.copy(), "4326", "utm:32")
    lo, la = transform_xy(ux, uy, "utm:32", "4326")
    assert np.abs(lo - lons).max() < 1e-8
    assert np.abs(la - lats).max() < 1e-8


def test_unsupported_crs_raises():
    with pytest.raises(NotImplementedError):
        transform_xy(np.array([0.0]), np.array([0.0]), "4326", "2154")


def test_reproject_udf_polygon(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"gid": [1], "geometry_wkb": [wkb.box(7, 43, 7.1, 43.1)]}))
    out = df.withColumn("m", reproject_udf("4326", "3857")(F.col("geometry_wkb"))).toPandas()
    g = wkb.decode(out["m"].iloc[0])
    xs = g["rings"][0][:, 0]
    want_x, _ = transform_xy(np.array([7.0, 7.1]), np.array([43.0, 43.0]), "4326", "3857")
    assert xs.min() == pytest.approx(want_x[0]) and xs.max() == pytest.approx(want_x[1])
