"""Great-circle slerp interpolation: endpoint exactness, midpoint
symmetry, distance proportionality, antimeridian behavior."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gis_tools_spark.functions.geodesy import (
    great_circle_interpolate, great_circle_meters)


def _frame(spark, n=200, seed=3):
    rng = np.random.RandomState(seed)
    return spark.createDataFrame(pd.DataFrame({
        "lon1": rng.uniform(-179, 179, n),
        "lat1": rng.uniform(-80, 80, n),
        "lon2": rng.uniform(-179, 179, n),
        "lat2": rng.uniform(-80, 80, n),
    }))


def test_endpoints_exact(spark):
    df = _frame(spark)
    for frac, la, lo in ((0.0, "lat1", "lon1"), (1.0, "lat2", "lon2")):
        ln, lt = great_circle_interpolate(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"),
            frac)
        out = df.select(ln.alias("ln"), lt.alias("lt"), la, lo).toPandas()
        dl = np.abs((out["ln"] - out[lo] + 180) % 360 - 180)
        assert dl.max() < 1e-9
        assert np.abs(out["lt"] - out[la]).max() < 1e-9


def test_distance_proportional(spark):
    df = _frame(spark)
    ln, lt = great_circle_interpolate(
        F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), 0.25)
    out = df.select(
        great_circle_meters(F.col("lon1"), F.col("lat1"),
                            ln, lt).alias("d_part"),
        great_circle_meters(F.col("lon1"), F.col("lat1"),
                            F.col("lon2"), F.col("lat2")).alias("d_full"),
    ).toPandas()
    assert np.allclose(out["d_part"], 0.25 * out["d_full"], rtol=1e-9)


def test_midpoint_symmetry(spark):
    df = _frame(spark)
    ln, lt = great_circle_interpolate(
        F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), 0.5)
    # swapping endpoints leaves the midpoint fixed
    ln2, lt2 = great_circle_interpolate(
        F.col("lon2"), F.col("lat2"), F.col("lon1"), F.col("lat1"), 0.5)
    out = df.select(ln.alias("a"), lt.alias("b"),
                    ln2.alias("c"), lt2.alias("d")).toPandas()
    dl = np.abs((out["a"] - out["c"] + 180) % 360 - 180)
    assert dl.max() < 1e-9
    assert np.abs(out["b"] - out["d"]).max() < 1e-9


def test_antimeridian_shortest_path(spark):
    # midpoint of (170E, 0) -> (170W, 0) crosses the date line, not
    # the prime meridian
    df = spark.createDataFrame(pd.DataFrame(
        {"lon1": [170.0], "lat1": [0.0], "lon2": [-170.0], "lat2": [0.0]}))
    ln, lt = great_circle_interpolate(
        F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), 0.5)
    r = df.select(ln.alias("ln"), lt.alias("lt")).first()
    assert abs(abs(r["ln"]) - 180.0) < 1e-9
    assert abs(r["lt"]) < 1e-9


def test_degenerate_same_point(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"lon1": [12.5], "lat1": [-33.0], "lon2": [12.5], "lat2": [-33.0]}))
    ln, lt = great_circle_interpolate(
        F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), 0.7)
    r = df.select(ln.alias("ln"), lt.alias("lt")).first()
    assert abs(r["ln"] - 12.5) < 1e-12 and abs(r["lt"] + 33.0) < 1e-12
