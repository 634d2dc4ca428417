"""Slippy XYZ tiles / quadkeys: numpy vs Spark vs DuckDB agreement
(one shared SQL text), published worked examples, hierarchy and
bounds properties."""
import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_tools_spark.cells import slippy as SL


@pytest.fixture(scope="module")
def pts():
    rng = np.random.RandomState(9)
    n = 3000
    return pd.DataFrame({
        "k": np.arange(n),
        "lon": rng.uniform(-180.0, 180.0, n),
        "lat": rng.uniform(-85.0, 85.0, n),
    })


def test_published_examples():
    # z=0 is one tile; (0,0) center of the map
    assert SL.tile_xy(0.0, 0.0, 0) == (0, 0)
    assert SL.tile_xy(0.0, 0.0, 1) == (1, 1)
    # the Bing Maps tile-system doc's worked example (Seattle, z=3)
    assert SL.quadkey(-122.33, 47.61, 3) == "021"
    # OSM wiki example: lat 51.5167 lon 0.0 (London) at z=10 is within
    # tile x=512 and y in the 340 area
    tx, ty = SL.tile_xy(0.0, 51.5167, 10)
    assert tx == 512 and ty == 340


def test_three_engines_agree(spark, pts):
    for z in (1, 7, 14, 22):
        tx, ty = SL.tile_xy(pts["lon"].to_numpy(), pts["lat"].to_numpy(), z)
        df = spark.createDataFrame(pts)
        cx, cy = SL.tile_columns("lon", "lat", z)
        got = df.select("k", cx.alias("tx"), cy.alias("ty")) \
            .orderBy("k").toPandas()
        assert (got["tx"].to_numpy() == tx).all()
        assert (got["ty"].to_numpy() == ty).all()
        sx, sy = SL.tile_sql("p.lon", "p.lat", z)
        duck = duckdb.sql(
            f"SELECT {sx} AS tx, {sy} AS ty FROM pts p ORDER BY p.k").df()
        assert (duck["tx"].to_numpy() == tx).all()
        assert (duck["ty"].to_numpy() == ty).all()


def test_quadkey_three_engines(spark, pts):
    z = 9
    qk = SL.quadkey(pts["lon"].to_numpy(), pts["lat"].to_numpy(), z)
    df = spark.createDataFrame(pts)
    got = df.select("k", SL.quadkey_column("lon", "lat", z).alias("qk")) \
        .orderBy("k").toPandas()["qk"].to_numpy()
    assert (got == qk).all()
    duck = duckdb.sql(
        f"SELECT {SL.quadkey_sql('p.lon', 'p.lat', z)} AS qk "
        f"FROM pts p ORDER BY p.k").df()["qk"].to_numpy()
    assert (duck == qk).all()


def test_plan_pure_codegen(spark, pts):
    df = spark.createDataFrame(pts)
    cx, cy = SL.tile_columns("lon", "lat", 12)
    plan = df.select(cx.alias("tx"), cy.alias("ty"),
                     SL.quadkey_column("lon", "lat", 6).alias("qk")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "pythonudf" not in plan.lower()


def test_quadkey_roundtrip(pts):
    z = 11
    lon, lat = pts["lon"].to_numpy(), pts["lat"].to_numpy()
    tx, ty = SL.tile_xy(lon, lat, z)
    qks = SL.quadkey(lon, lat, z)
    for i in range(0, 200):
        zz, bx, by = SL.quadkey_to_tile(qks[i])
        assert (zz, bx, by) == (z, int(tx[i]), int(ty[i]))
    with pytest.raises(ValueError):
        SL.quadkey_to_tile("0124")


def test_bounds_contain_and_tile(pts):
    z = 8
    lon = pts["lon"].to_numpy()
    lat = np.clip(pts["lat"].to_numpy(), -SL.MAX_LAT + 1e-6,
                  SL.MAX_LAT - 1e-6)
    tx, ty = SL.tile_xy(lon, lat, z)
    w, s, e, n = SL.tile_bounds(tx, ty, z)
    assert (w <= lon).all() and (lon <= e).all()
    assert (s <= lat + 1e-9).all() and (lat <= n + 1e-9).all()
    # bounds of the west/east edges tile the world
    w0, s0, e0, n0 = SL.tile_bounds(0, 0, 0)
    assert w0 == -180.0 and e0 == 180.0
    assert abs(n0 - SL.MAX_LAT) < 1e-6 and abs(s0 + SL.MAX_LAT) < 1e-6


def test_parent_children(pts):
    z = 10
    lon, lat = pts["lon"].to_numpy(), pts["lat"].to_numpy()
    tx, ty = SL.tile_xy(lon, lat, z)
    px, py = SL.tile_parent(tx, ty, z, z - 2)
    dx, dy = SL.tile_xy(lon, lat, z - 2)
    assert (px == dx).all() and (py == dy).all()
    ch = SL.tile_children(3, 5)
    assert len(set(ch)) == 4
    for cx, cy in ch:
        ppx, ppy = SL.tile_parent(cx, cy, 4, 3)
        assert (int(ppx), int(ppy)) == (3, 5)
    with pytest.raises(ValueError):
        SL.tile_parent(tx, ty, 3, 5)


def test_quadkey_prefix_is_parent(pts):
    # the quadkey of the parent tile is the child's prefix — the
    # property that makes prefix range scans hierarchical
    lon, lat = pts["lon"].to_numpy()[:300], pts["lat"].to_numpy()[:300]
    q12 = SL.quadkey(lon, lat, 12)
    q8 = SL.quadkey(lon, lat, 8)
    assert all(a.startswith(b) for a, b in zip(q12, q8))


def test_polar_clamp_and_guards():
    txn, tyn = SL.tile_xy(12.0, 89.9, 5)
    txc, tyc = SL.tile_xy(12.0, SL.MAX_LAT, 5)
    assert (txn, tyn) == (txc, tyc)
    assert tyn == 0
    _, tys = SL.tile_xy(12.0, -89.9, 5)
    assert tys == 31
    with pytest.raises(ValueError):
        SL.tile_xy(0.0, 0.0, 23)
    with pytest.raises(ValueError):
        SL.tile_sql("lon", "lat", -1)
