"""Cell index tests incl. the Spark-SQL/DuckDB/numpy triple equivalence."""

import duckdb
import numpy as np

from gis_tools_spark import cells as C
from gis_tools_spark.geom import wkb


def test_encode_bounds_roundtrip():
    c = C.latlng_to_cell(7.5, 42.5, 14)
    mnx, mny, mxx, mxy = C.cell_to_bounds(c)
    assert mnx <= 7.5 < mxx and mny <= 42.5 < mxy
    assert int(C.cell_res(c)) == 14


def test_hierarchy():
    c = C.latlng_to_cell(7.5, 42.5, 14)
    p = C.parent(c, 10)
    assert p == C.latlng_to_cell(7.5, 42.5, 10)
    kids = C.children(p)
    assert len(kids) == 4 and len(set(kids.tolist())) == 4


def test_disk_and_ring():
    c = C.latlng_to_cell(7.5, 42.5, 14)
    assert len(C.grid_disk(c, 1)) == 9
    assert len(C.grid_ring(c, 1)) == 8
    assert len(C.grid_ring(c, 0)) == 1


def test_polygon_cover():
    cov = C.polygon_to_cells(wkb.decode(wkb.box(7.49, 42.49, 7.51, 42.51)), 14)
    assert int(C.latlng_to_cell(7.5, 42.5, 14)) in cov.tolist()


def test_adaptive_res_bounds():
    assert C.adaptive_res(7.0, 42.0, 7.001, 42.001) == C.RES_MAX
    assert C.adaptive_res(-180, -90, 180, 90) == C.RES_MIN


def test_sql_equivalence_with_duckdb():
    rng = np.random.default_rng(7)
    lons = rng.uniform(-179, 179, 200)
    lats = rng.uniform(-89, 89, 200)
    for res in (10, 14, 16):
        want = C.latlng_to_cell(lons, lats, res)
        rows = duckdb.sql(
            "SELECT " + C.cell_sql("lon", "lat", res) + " AS c FROM df"
        ).fetchall() if False else None
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lon": lons, "lat": lats}))
        got = con.execute(
            "SELECT " + C.cell_sql("lon", "lat", res) + " FROM pts").fetchnumpy()
        key = list(got.keys())[0]
        assert (got[key] == want).all()


def test_geohash_published_examples_and_parity(spark):
    """Published geohash worked examples (ezs42; u4pruydqqvj for
    57.64911,10.40744) plus three-way agreement: numpy == pure-codegen
    Spark Column == generated SQL (all built from the same bit plan)."""
    import numpy as np
    from pyspark.sql import functions as F

    from gis_tools_spark.cells import geohash, geohash_column

    assert geohash(-5.6, 42.6, 5) == "ezs42"
    assert geohash(10.40744, 57.64911, 11) == "u4pruydqqvj"

    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    want = list(geohash(lon, lat, 8))
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)],
        "lon double, lat double")
    sel = df.select(geohash_column(F.col("lon"), F.col("lat"), 8)
                    .alias("gh"))
    assert [r.gh for r in sel.collect()] == want
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
