"""Cell-index encoders as Spark SQL scalar functions: values equal the
Column/numpy paths, and the plan stays pure codegen (the whole point
of CREATE FUNCTION … RETURN over udf.register)."""
import numpy as np
import pandas as pd
import pytest

from gis_tools_spark import cells as CC
from gis_tools_spark.cells import slippy as SL
from gis_tools_spark.functions.sql_api import register_cell_sql_functions


@pytest.fixture(scope="module")
def sqlcells(spark):
    names = register_cell_sql_functions(spark)
    rng = np.random.RandomState(2)
    pdf = pd.DataFrame({"k": np.arange(500),
                        "lon": rng.uniform(-179, 179, 500),
                        "lat": rng.uniform(-84, 84, 500)})
    spark.createDataFrame(pdf).createOrReplaceTempView("__cellpts")
    return names, pdf


def test_registered_names(sqlcells):
    names, _ = sqlcells
    assert set(names) == {"st_qcell", "st_morton", "st_geohash",
                          "st_tile_x", "st_tile_y", "st_quadkey"}


def test_values_match_kernels(spark, sqlcells):
    _, pdf = sqlcells
    out = spark.sql("""
        SELECT k, st_qcell(lon, lat) AS qc, st_morton(lon, lat) AS mo,
               st_geohash(lon, lat) AS gh, st_tile_x(lon, lat) AS tx,
               st_tile_y(lon, lat) AS ty, st_quadkey(lon, lat) AS qk
        FROM __cellpts ORDER BY k""").toPandas()
    lon, lat = pdf["lon"].to_numpy(), pdf["lat"].to_numpy()
    assert (out["qc"].to_numpy()
            == CC.latlng_to_cell(lon, lat, 16)).all()
    assert (out["mo"].to_numpy() == CC.morton_key(lon, lat, 16)).all()
    assert (out["gh"].to_numpy() == CC.geohash(lon, lat, 8)).all()
    tx, ty = SL.tile_xy(lon, lat, 14)
    assert (out["tx"].to_numpy() == tx).all()
    assert (out["ty"].to_numpy() == ty).all()
    assert (out["qk"].to_numpy() == SL.quadkey(lon, lat, 8)).all()


def test_plan_pure_codegen(spark, sqlcells):
    plan = spark.sql(
        "SELECT st_geohash(lon, lat), st_quadkey(lon, lat),"
        " st_morton(lon, lat) FROM __cellpts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "pythonudf" not in plan.lower()


def test_london_worked_examples(spark, sqlcells):
    r = spark.sql("SELECT st_geohash(-0.1278, 51.5074) AS gh").first()
    assert r["gh"] == "gcpvj0du"  # published London geohash
