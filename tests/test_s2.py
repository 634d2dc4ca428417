"""S2-analog cube-sphere cell index: numpy kernel vs Spark column vs
DuckDB SQL (all three must agree bit-exactly), hierarchy and Hilbert
properties, and the codegen-purity contract."""
import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_tools_spark.cells import s2


@pytest.fixture(scope="module")
def pts():
    rng = np.random.RandomState(42)
    n = 4000
    return pd.DataFrame({
        "k": np.arange(n),
        "lon": rng.uniform(-180.0, 180.0, n),
        "lat": rng.uniform(-89.99, 89.99, n),
    })


def test_three_engines_agree(spark, pts):
    for level in (1, 5, 12, 16):
        exp = s2.s2_encode(pts["lon"].to_numpy(), pts["lat"].to_numpy(),
                           level)
        df = spark.createDataFrame(pts)
        got = s2.with_s2_cell(df, level=level).orderBy("k") \
            .toPandas()["s2_cell"].to_numpy()
        assert (got == exp).all(), f"spark != numpy at level {level}"
        q = (f"SELECT {s2.s2_sql('p.lon', 'p.lat', level)} AS c "
             f"FROM pts p ORDER BY p.k")
        duck = duckdb.sql(q).df()["c"].to_numpy()
        assert (duck == exp).all(), f"duckdb != numpy at level {level}"


def test_plan_is_pure_codegen(spark, pts):
    df = spark.createDataFrame(pts)
    plan = s2.with_s2_cell(df, level=12)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "pythonudf" not in plan.lower()


def test_shielded_column_names(spark, pts):
    # lon/lat columns named after layer variables must not be rewritten
    df = spark.createDataFrame(pts).withColumnRenamed("lon", "x") \
        .withColumnRenamed("lat", "y")
    got = s2.with_s2_cell(df, lon="x", lat="y", level=7).orderBy("k") \
        .toPandas()["s2_cell"].to_numpy()
    exp = s2.s2_encode(pts["lon"].to_numpy(), pts["lat"].to_numpy(), 7)
    assert (got == exp).all()


def test_center_roundtrip(pts):
    for level in (3, 9, 14, 20, 29):
        ids = s2.s2_encode(pts["lon"].to_numpy(), pts["lat"].to_numpy(),
                           level)
        clon, clat = s2.s2_center(ids)
        assert (s2.s2_encode(clon, clat, level) == ids).all()
        assert (np.abs(clat) <= 90.0 + 1e-12).all()


def test_level_face_recovery(pts):
    lon, lat = pts["lon"].to_numpy(), pts["lat"].to_numpy()
    for level in (0, 1, 13, 29):
        ids = s2.s2_encode(lon, lat, level)
        assert (s2.s2_level(ids) == level).all()
        assert ((s2.s2_face(ids) >= 0) & (s2.s2_face(ids) <= 5)).all()
    assert set(np.unique(s2.s2_face(s2.s2_encode(lon, lat, 2)))) \
        == set(range(6))


def test_face_cardinal_points():
    # the six axis directions land on six distinct faces
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    faces = s2.s2_face(s2.s2_encode(lon, lat, 4))
    assert sorted(faces.tolist()) == [0, 1, 2, 3, 4, 5]
    # +x axis is face 0, +z (north pole) face 2, -z face 5
    assert faces[0] == 0 and faces[2] == 2 and faces[5] == 5


def test_parent_prefix_property(pts):
    lon, lat = pts["lon"].to_numpy(), pts["lat"].to_numpy()
    ids16 = s2.s2_encode(lon, lat, 16)
    for p in (15, 12, 4, 0):
        assert (s2.s2_parent(ids16, p) == s2.s2_encode(lon, lat, p)).all()
    with pytest.raises(ValueError):
        s2.s2_parent(s2.s2_encode(lon, lat, 3), 5)


def test_children(pts):
    ids = s2.s2_encode(pts["lon"].to_numpy()[:50],
                       pts["lat"].to_numpy()[:50], 10)
    for c in ids.tolist():
        ch = s2.s2_children(c)
        assert len(np.unique(ch)) == 4
        assert (s2.s2_parent(ch, 10) == c).all()
        assert (s2.s2_level(ch) == 11).all()
        # each child's center re-encodes to the child, and the parent
        # id of the center at level 10 is the original cell
        clon, clat = s2.s2_center(ch)
        assert (s2.s2_encode(clon, clat, 11) == ch).all()
        assert (s2.s2_encode(clon, clat, 10) == c).all()


def test_hilbert_locality_exhaustive():
    # consecutive positions at a level are edge-adjacent (the property
    # that makes id-range sharding spatially compact); inverse exact
    for L in (1, 2, 5, 8):
        d = np.arange(4 ** L, dtype=np.int64)
        x, y = s2._hilbert_xy(d, L)
        assert (np.abs(np.diff(x)) + np.abs(np.diff(y)) == 1).all()
        assert (s2._hilbert_d(x, y, L) == d).all()
        # bijective onto the grid
        assert len(np.unique(x * (1 << L) + y)) == 4 ** L


def test_area_uniformity_vs_latlon_grid():
    # the quadratic cube projection bounds true cell-area variation;
    # estimate per-cell solid angle by uniform-on-sphere sampling
    rng = np.random.RandomState(1)
    n = 400_000
    z = rng.uniform(-1, 1, n)
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(z))
    ids = s2.s2_encode(lon, lat, 3)
    _, counts = np.unique(ids, return_counts=True)
    assert len(counts) == 6 * 4 ** 3
    ratio = counts.max() / counts.min()
    assert ratio < 2.7  # quadratic-projection bound ~2.08 + noise


def test_downstream_patterns(spark, pts):
    # the two supported multi-branch consumption patterns over the id
    # column (a bare self-join would hit Catalyst's alias-substitution
    # blowup — see with_s2_cell docstring): window aggregate, and
    # persist-barrier + self-join.  Both must agree.
    from pyspark.sql import Window

    df = spark.createDataFrame(pts)
    enc = s2.with_s2_cell(df, level=4)
    win = enc.select(
        "k", "s2_cell",
        F.count("*").over(Window.partitionBy("s2_cell")).alias("cnt")) \
        .orderBy("k").toPandas()
    barrier = enc.persist()
    barrier.count()
    try:
        counts = barrier.groupBy("s2_cell").agg(F.count("*").alias("cnt"))
        joined = barrier.join(counts, "s2_cell") \
            .select("k", "s2_cell", "cnt").orderBy("k").toPandas()
    finally:
        barrier.unpersist()
    assert (win["s2_cell"].to_numpy() == joined["s2_cell"].to_numpy()).all()
    assert (win["cnt"].to_numpy() == joined["cnt"].to_numpy()).all()


def test_tokens_roundtrip(pts):
    lon, lat = pts["lon"].to_numpy(), pts["lat"].to_numpy()
    for level in (0, 7, 16, 29):
        ids = s2.s2_encode(lon, lat, level)
        toks = s2.s2_token(ids)
        assert (s2.s2_from_token(toks) == ids).all()
        # canonical: no trailing zeros (except the bare '0')
        assert all(t == "0" or not t.endswith("0") for t in toks)
    assert s2.s2_token(np.int64(0)) == "0"
    with pytest.raises(ValueError):
        s2.s2_from_token("")
    with pytest.raises(ValueError):
        s2.s2_from_token("0" * 17)


def test_level_guards(pts):
    with pytest.raises(ValueError):
        s2.s2_encode(pts["lon"], pts["lat"], 30)
    with pytest.raises(ValueError):
        s2.s2_sql("lon", "lat", 17)
    with pytest.raises(ValueError):
        s2.s2_encode(pts["lon"], pts["lat"], -1)
