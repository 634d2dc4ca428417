"""Vincenty direct (ellipsoidal destination): round-trip against the
independently-coded Vincenty inverse, published meridian/equator
closed forms, and spherical-limit agreement."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gis_tools_spark.functions.geodesy import (
    geodesic_destination, geodesic_meters, great_circle_destination)


def test_roundtrip_vs_inverse(spark):
    rng = np.random.RandomState(21)
    n = 300
    pdf = pd.DataFrame({
        "lon1": rng.uniform(-170, 170, n),
        "lat1": rng.uniform(-80, 80, n),
        "brg": rng.uniform(0, 360, n),
        "d": rng.uniform(10.0, 5e6, n),
    })
    df = spark.createDataFrame(pdf)
    dest = geodesic_destination()(F.col("lon1"), F.col("lat1"),
                                  F.col("brg"), F.col("d"))
    out = df.select("*", dest.alias("dst")) \
        .select("*", F.col("dst.lon").alias("lon2"),
                F.col("dst.lat").alias("lat2")) \
        .withColumn("d2", geodesic_meters()(
            F.col("lon1"), F.col("lat1"),
            F.col("lon2"), F.col("lat2"))) \
        .toPandas()
    # direct then inverse reproduces the distance to sub-mm
    assert np.abs(out["d2"] - out["d"]).max() < 1e-3
    assert (np.abs(out["lat2"]) <= 90.0).all()


def test_meridian_and_equator_closed_forms(spark):
    # quarter meridian: equator -> pole along bearing 0 (public WGS84
    # constant 10 001 965.729 m); equator run: arc = s / a exactly
    A = 6378137.0
    QM = 10_001_965.729
    pdf = pd.DataFrame({
        "lon1": [7.0, 0.0], "lat1": [0.0, 0.0],
        "brg": [0.0, 90.0], "d": [QM, np.pi / 2 * A]})
    df = spark.createDataFrame(pdf)
    dest = geodesic_destination()(F.col("lon1"), F.col("lat1"),
                                  F.col("brg"), F.col("d"))
    out = df.select(dest.alias("dst")) \
        .select(F.col("dst.lon").alias("lon2"),
                F.col("dst.lat").alias("lat2")).toPandas()
    assert abs(out["lat2"][0] - 90.0) < 1e-5          # pole, sub-meter
    # along the equator the geodesic stays on it and Δlon = s/a
    assert abs(out["lat2"][1]) < 1e-9
    assert abs(out["lon2"][1] - 90.0) < 1e-9


def test_spherical_limit(spark):
    # ellipsoidal and spherical destinations agree to ~0.5% of the
    # distance (flattening-scale), directions agree
    rng = np.random.RandomState(4)
    n = 100
    pdf = pd.DataFrame({
        "lon1": rng.uniform(-170, 170, n),
        "lat1": rng.uniform(-70, 70, n),
        "brg": rng.uniform(0, 360, n),
        "d": rng.uniform(1e4, 2e6, n)})
    df = spark.createDataFrame(pdf)
    dest = geodesic_destination()(F.col("lon1"), F.col("lat1"),
                                  F.col("brg"), F.col("d"))
    slon, slat = great_circle_destination(F.col("lon1"), F.col("lat1"),
                                          F.col("brg"), F.col("d"))
    out = df.select(dest.alias("dst"), slon.alias("slon"),
                    slat.alias("slat"), "d") \
        .select(F.col("dst.lon").alias("elon"),
                F.col("dst.lat").alias("elat"), "slon", "slat", "d") \
        .toPandas()
    dlat = np.abs(out["elat"] - out["slat"]) * 111_000
    dlon = np.abs((out["elon"] - out["slon"] + 180) % 360 - 180) * 111_000
    assert (dlat < 0.7e-2 * out["d"] + 30_000).all()
    assert (dlon < 0.7e-2 * out["d"] + 30_000).all()


def test_back_azimuth_reverses(spark):
    rng = np.random.RandomState(8)
    n = 120
    pdf = pd.DataFrame({
        "lon1": rng.uniform(-170, 170, n),
        "lat1": rng.uniform(-75, 75, n),
        "brg": rng.uniform(0, 360, n),
        "d": rng.uniform(1e3, 3e6, n)})
    df = spark.createDataFrame(pdf)
    dest = geodesic_destination()(F.col("lon1"), F.col("lat1"),
                                  F.col("brg"), F.col("d"))
    step1 = df.select("*", dest.alias("dst"))
    # travel back along the reversed final azimuth: land on the start
    back = geodesic_destination()(
        F.col("dst.lon"), F.col("dst.lat"),
        (F.col("dst.az2_deg") + F.lit(180.0)) % F.lit(360.0), F.col("d"))
    out = step1.select("lon1", "lat1", back.alias("b")) \
        .select("lon1", "lat1", F.col("b.lon").alias("blon"),
                F.col("b.lat").alias("blat")).toPandas()
    assert np.abs(out["blat"] - out["lat1"]).max() < 1e-8
    dlon = np.abs((out["blon"] - out["lon1"] + 180) % 360 - 180)
    assert dlon.max() < 1e-8
