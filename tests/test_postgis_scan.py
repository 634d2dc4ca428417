"""PostGIS JDBC scan composition (sources/postgis.py) — parity with
reference database.py:73-115 (table_to_layer), testable without a
server: the pushed SQL is a pure function, its bbox-overlap semantics
replay on DuckDB, and the JDBC option assembly is captured by a fake
reader (no driver jar exists in this sandbox)."""

from __future__ import annotations

from types import SimpleNamespace

import duckdb
import numpy as np
import pytest

from gis_tools_spark.sources.postgis import pushdown_query, read_postgis


def test_pushdown_sql_bounds_form():
    """Mirrors database.py:86-88: SELECT * FROM "schema"."table" WHERE
    geom && ST_MakeEnvelope(xmin, ymin, xmax, ymax) — plus the WKB
    projection this engine's pipeline consumes."""
    q = pushdown_query("roads", schema="gis", bounds=(1.0, 2.0, 3.5, 4.0))
    assert q == ('SELECT *, ST_AsBinary("geom") AS geometry_wkb '
                 'FROM "gis"."roads" '
                 'WHERE "geom" && ST_MakeEnvelope(1.0, 2.0, 3.5, 4.0)')


def test_pushdown_sql_polygon_form():
    """Mirrors database.py:89-91: WHERE ST_Within(geom, <polygon>)."""
    q = pushdown_query("parcels", polygon_extent="POLYGON ((0 0, 1 0, 1 1, 0 0))")
    assert q == ('SELECT *, ST_AsBinary("geom") AS geometry_wkb '
                 'FROM "public"."parcels" WHERE ST_Within("geom", '
                 "ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 0))'))")


def test_pushdown_sql_plain_columns_srid():
    q = pushdown_query("zones")
    assert q == ('SELECT *, ST_AsBinary("geom") AS geometry_wkb '
                 'FROM "public"."zones"')
    q = pushdown_query("zones", columns=["gid", "nom"], geom="the_geom",
                       bounds=(0, 0, 1, 1), srid=4326)
    assert q == ('SELECT "gid", "nom", ST_AsBinary("the_geom") AS '
                 'geometry_wkb FROM "public"."zones" WHERE "the_geom" '
                 '&& ST_MakeEnvelope(0.0, 0.0, 1.0, 1.0, 4326)')


def test_pushdown_rejects_both_filters_and_bad_bounds():
    with pytest.raises(ValueError, match="not both"):
        pushdown_query("t", bounds=(0, 0, 1, 1), polygon_extent="POINT (0 0)")
    with pytest.raises(ValueError, match="non-finite"):
        pushdown_query("t", bounds=(0, 0, float("nan"), 1))


def test_pushdown_quotes_wkt_literal():
    # single quotes in the WKT (can't inject out of the literal)
    q = pushdown_query("t", polygon_extent="POLYGON' --")
    assert "ST_GeomFromText('POLYGON'' --')" in q


def test_bbox_overlap_semantics_duckdb():
    """The `&&` predicate the reference pushes is bbox OVERLAP,
    inclusive of boundary touch. Replay the composed filter on DuckDB
    with && expanded to its documented semantics and compare the
    selected row set against a numpy brute force."""
    rng = np.random.default_rng(42)
    n = 500
    x0 = rng.uniform(0, 10, n)
    y0 = rng.uniform(0, 10, n)
    boxes = np.stack([x0, y0, x0 + rng.uniform(0, 2, n),
                      y0 + rng.uniform(0, 2, n)], axis=1)
    # force exact touch cases (share an edge / corner with the envelope)
    env = (3.0, 3.0, 6.0, 6.0)
    boxes[0] = (1.0, 1.0, 3.0, 3.0)       # corner touch
    boxes[1] = (6.0, 4.0, 8.0, 5.0)       # left-edge touch
    boxes[2] = (0.0, 6.0, 10.0, 8.0)      # bottom-edge touch
    boxes[3] = (6.0000001, 4.0, 8.0, 5.0)  # just outside

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, minx DOUBLE, miny DOUBLE, "
                "maxx DOUBLE, maxy DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)",
                    [(i, *map(float, b)) for i, b in enumerate(boxes)])
    # the composed predicate: "geom" && ST_MakeEnvelope(xmin,ymin,xmax,ymax)
    # — expanded to the PostGIS-documented bbox-overlap test
    q = pushdown_query("t", bounds=env)
    assert f"ST_MakeEnvelope({env[0]}, {env[1]}, {env[2]}, {env[3]})" in q
    got = {r[0] for r in con.execute(
        f"SELECT id FROM t WHERE NOT (maxx < {env[0]} OR minx > {env[2]} "
        f"OR maxy < {env[1]} OR miny > {env[3]})").fetchall()}
    want = {int(i) for i in range(n)
            if not (boxes[i][2] < env[0] or boxes[i][0] > env[2]
                    or boxes[i][3] < env[1] or boxes[i][1] > env[3])}
    assert got == want
    assert {0, 1, 2} <= got and 3 not in got


class _FakeReader:
    def __init__(self, rec):
        self.rec = rec

    def option(self, k, v):
        self.rec[k] = v
        return self

    def load(self):
        return self.rec


def _fake_spark(rec):
    fmt = {}

    def format_(name):
        fmt["name"] = name
        return _FakeReader(rec)

    return SimpleNamespace(read=SimpleNamespace(format=format_)), fmt


def test_read_postgis_option_assembly():
    rec = {}
    spark, fmt = _fake_spark(rec)
    out = read_postgis(spark, url="jdbc:postgresql://db:5432/gis",
                       table="roads", bounds=(0, 0, 5, 5),
                       user="u", password="p",
                       partition_column="gid", num_partitions=8,
                       lower_bound=0, upper_bound=100_000,
                       fetchsize=5000, queryTimeout="30")
    assert fmt["name"] == "jdbc"
    assert out is rec
    assert rec["url"] == "jdbc:postgresql://db:5432/gis"
    assert rec["driver"] == "org.postgresql.Driver"
    assert rec["dbtable"].startswith("(SELECT *, ST_AsBinary")
    assert 'WHERE "geom" && ST_MakeEnvelope(0.0, 0.0, 5.0, 5.0)' in rec["dbtable"]
    assert rec["dbtable"].endswith(") AS __gts_src")
    assert rec["partitionColumn"] == "gid"
    assert rec["numPartitions"] == "8"
    assert rec["lowerBound"] == "0"
    assert rec["upperBound"] == "100000"
    assert rec["fetchsize"] == "5000"
    assert rec["queryTimeout"] == "30"


def test_read_postgis_partition_args_validation():
    rec = {}
    spark, _ = _fake_spark(rec)
    with pytest.raises(ValueError, match="partition_column needs"):
        read_postgis(spark, url="jdbc:postgresql://db/gis", table="t",
                     partition_column="gid")
