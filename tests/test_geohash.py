"""geohash_decode (cells) — inverse of the existing geohash encode
(encode itself is pinned in test_cells.py against published vectors)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gis_tools_spark.cells import (geohash, geohash_column,
                                   geohash_decode)


def test_decode_center_within_cell(spark):
    rng = np.random.RandomState(17)
    pdf = pd.DataFrame({
        "lon": rng.uniform(-180, 180, 120),
        "lat": rng.uniform(-90, 90, 120),
    })
    df = spark.createDataFrame(pdf)
    for p, tol_lon, tol_lat in ((5, 360 / 2**13, 180 / 2**12),
                                (9, 360 / 2**23, 180 / 2**22)):
        enc = df.select("lon", "lat",
                        geohash_column(F.col("lon"), F.col("lat"), p)
                        .alias("g"))
        dlon, dlat = geohash_decode(F.col("g"))
        out = enc.select("lon", "lat", dlon.alias("dlon"),
                         dlat.alias("dlat")).toPandas()
        assert (np.abs(out["lon"] - out["dlon"]) <= tol_lon / 2 + 1e-12).all()
        assert (np.abs(out["lat"] - out["dlat"]) <= tol_lat / 2 + 1e-12).all()


def test_mixed_lengths_reencode_stable(spark):
    pdf = pd.DataFrame({"g": ["u", "u4", "u4pruydqqvj", "ezs42", "s",
                              "7zzzzzzzzzzz"]})
    df = spark.createDataFrame(pdf)
    dlon, dlat = geohash_decode(F.col("g"))
    out = df.select("g", dlon.alias("lon"), dlat.alias("lat")).toPandas()
    for _, r in out.iterrows():
        # re-encoding the decoded center at the same precision must
        # reproduce the geohash exactly (center is strictly interior)
        assert geohash(r["lon"], r["lat"], len(r["g"])) == r["g"]


def test_unsupported_length_null(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["", "0123456789bcd"]}))
    dlon, dlat = geohash_decode(F.col("g"))
    out = df.select(dlon.alias("lon"), dlat.alias("lat")).toPandas()
    assert out["lon"].isna().all() and out["lat"].isna().all()


def test_decode_plan_is_pure_codegen(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["ezs42"]}))
    dlon, dlat = geohash_decode(F.col("g"))
    plan = df.select(dlon, dlat)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
