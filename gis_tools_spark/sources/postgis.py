"""PostGIS table scan via Spark's JDBC source with predicate pushdown.

Parity target: reference ``gistools/database.py:73-115``
(``SpatialDatabase.table_to_layer``) — read one PostGIS table as a
layer, optionally pre-filtered server-side by a bounding box
(``geom && ST_MakeEnvelope(xmin, ymin, xmax, ymax)``, the GiST-indexed
bbox-overlap operator) or by a polygon extent (``ST_Within(geom, …)``).
The reference pulls the whole result into one GeoDataFrame through
sqlalchemy; here the same SQL is pushed down as a Spark JDBC subquery
so (a) the database's spatial index does the pruning, (b) the fetch
can be split across executors with ``partition_column`` /
``num_partitions`` (each executor opens its own cursor over a slice —
the standard Spark JDBC parallel-read contract), and (c) the geometry
arrives as WKB (``ST_AsBinary``) ready for this engine's
``geometry_wkb`` pipeline instead of a hex-encoded EWKB string.

The SQL composition is a pure function (``pushdown_query``) so its
semantics are testable without a running server: pytest pins the
rendered SQL against the reference's filter forms and replays the
bbox-overlap row-set semantics on DuckDB (test_postgis_scan.py).

At 100 TB the database is never the big side — this source exists to
pull dimension layers (zones, road networks, admin boundaries) that
then broadcast into the parquet-side spatial joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["pushdown_query", "read_postgis"]


def _num(v: float) -> str:
    f = float(v)
    if not (f == f and abs(f) != float("inf")):
        raise ValueError(f"non-finite bound {v!r}")
    return repr(f)


def pushdown_query(table: str, *, schema: str = "public",
                   bounds: tuple[float, float, float, float] | None = None,
                   polygon_extent: str | None = None,
                   geom: str = "geom",
                   columns: list[str] | None = None,
                   srid: int | None = None) -> str:
    """Compose the server-side SELECT the reference builds in
    database.py:86-92, extended with a WKB-projected geometry column.

    - ``bounds`` → ``WHERE <geom> && ST_MakeEnvelope(xmin, ymin, xmax,
      ymax[, srid])`` — bbox OVERLAP (the reference's `&&` form), which
    is index-assisted and intentionally a superset of exact
    intersection; refine client-side with the engine's geometry
    kernels when exactness matters.
    - ``polygon_extent`` (a WKT string) → ``WHERE ST_Within(<geom>,
      ST_GeomFromText('…'[, srid]))`` — the reference's polygon form,
      exact containment evaluated by the server.
    - neither → full scan; both → ValueError (the reference silently
      ignored both-set; here it is an error).

    ``columns`` limits the projection (column pruning pushed to the
    server); the geometry is always emitted as
    ``ST_AsBinary(<geom>) AS geometry_wkb``.
    """
    if bounds is not None and polygon_extent is not None:
        raise ValueError("pass bounds OR polygon_extent, not both")

    def _ident(name: str) -> str:
        # PostgreSQL identifier quoting: double embedded '"' so an
        # identifier containing a quote cannot break out of the quoted
        # form (round-5 ADVICE — only polygon_extent was escaped)
        return '"' + name.replace('"', '""') + '"'

    qtable = f'{_ident(schema)}.{_ident(table)}'
    qgeom = _ident(geom)
    if columns is None:
        proj = f'*, ST_AsBinary({qgeom}) AS geometry_wkb'
    else:
        cols = ", ".join(_ident(c) for c in columns)
        proj = f'{cols}, ST_AsBinary({qgeom}) AS geometry_wkb'
    sql = f'SELECT {proj} FROM {qtable}'
    if bounds is not None:
        xmin, ymin, xmax, ymax = (_num(v) for v in bounds)
        env = f"ST_MakeEnvelope({xmin}, {ymin}, {xmax}, {ymax}"
        env += f", {int(srid)})" if srid is not None else ")"
        sql += f" WHERE {qgeom} && {env}"
    elif polygon_extent is not None:
        wkt = polygon_extent.replace("'", "''")
        g = f"ST_GeomFromText('{wkt}'"
        g += f", {int(srid)})" if srid is not None else ")"
        sql += f" WHERE ST_Within({qgeom}, {g})"
    return sql


def read_postgis(spark: SparkSession, *, url: str, table: str,
                 schema: str = "public",
                 bounds: tuple[float, float, float, float] | None = None,
                 polygon_extent: str | None = None,
                 geom: str = "geom",
                 columns: list[str] | None = None,
                 srid: int | None = None,
                 user: str | None = None, password: str | None = None,
                 partition_column: str | None = None,
                 num_partitions: int | None = None,
                 lower_bound=None, upper_bound=None,
                 fetchsize: int = 10_000,
                 driver: str = "org.postgresql.Driver",
                 **options) -> DataFrame:
    """Spark DataFrame over one PostGIS table with the filter pushed
    into the database (see ``pushdown_query``).

    ``partition_column``/``num_partitions``/``lower_bound``/
    ``upper_bound`` split the fetch across executors (Spark adds a
    range predicate per partition ON TOP of the pushed filter — the
    spatial prune and the parallel split compose). The JDBC driver jar
    must be on the Spark classpath (``spark.jars`` /
    ``spark.jars.packages``); this sandbox has none, so the composed
    plan is exercised in tests via the pure SQL + a DuckDB stand-in.
    """
    q = pushdown_query(table, schema=schema, bounds=bounds,
                       polygon_extent=polygon_extent, geom=geom,
                       columns=columns, srid=srid)
    r = (spark.read.format("jdbc")
         .option("url", url)
         .option("driver", driver)
         .option("dbtable", f"({q}) AS __gts_src")
         .option("fetchsize", str(int(fetchsize))))
    if user is not None:
        r = r.option("user", user)
    if password is not None:
        r = r.option("password", password)
    if partition_column is not None:
        if num_partitions is None or lower_bound is None \
                or upper_bound is None:
            raise ValueError("partition_column needs num_partitions, "
                             "lower_bound and upper_bound")
        r = (r.option("partitionColumn", partition_column)
             .option("numPartitions", str(int(num_partitions)))
             .option("lowerBound", str(lower_bound))
             .option("upperBound", str(upper_bound)))
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()
