"""Spark SQL surface: register the engine's geometry functions as
``st_*`` SQL functions so pure-SQL users (spark.sql, JDBC/Thrift
clients, notebooks) can run spatial queries without touching the
DataFrame API — the PostGIS-style entry point the reference's users
expect (gis-tools exposes its ops as Python methods; the SQL spelling
is the Spark-native equivalent surface).

All functions operate on WKB binary columns (the engine's geometry
interchange) and are the SAME Arrow-batched kernels the DataFrame ops
use — registration adds a name, not a second implementation. Scalar
constructors/accessors that are pure arithmetic (cell keys, geohash,
point packing) stay codegen: SQL users reach those through the
expression builders (cells.cell_sql / geohash_sql) inlined into their
query text, which keeps the hot join path UDF-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T

from ..geom import kernels as K, relate as R, wkb
from . import geom_funcs as GF


def _pair_predicate(predicate: str):
    @F.pandas_udf(T.BooleanType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(False)
                continue
            try:
                out.append(bool(R.relate(wkb.decode(x), wkb.decode(y),
                                         predicate)))
            except Exception:
                out.append(False)
        return pd.Series(out)

    return _udf


def _st_buffer():
    @F.pandas_udf(T.BinaryType())
    def _udf(g: pd.Series, d: pd.Series) -> pd.Series:
        from .geom_funcs import buffer_geom

        out = []
        for b, dist in zip(g, d):
            if b is None or dist is None:
                out.append(None)
                continue
            gg = wkb.decode(b)
            if gg["type"] == "Point":
                c = gg["coords"]
                out.append(wkb.polygon(
                    [K.buffer_point(c[0], c[1], float(dist), 16)]))
                continue
            r = buffer_geom(gg, float(dist), 16)
            out.append(None if r is None else wkb.encode(r))
        return pd.Series(out, dtype=object)

    return _udf


def _st_point():
    @F.pandas_udf(T.BinaryType())
    def _udf(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [None if (a is None or b is None)
             else wkb.point(float(a), float(b))
             for a, b in zip(x, y)], dtype=object)

    return _udf


def _st_distance():
    @F.pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(np.nan)
                continue
            out.append(float(K.geom_distance(wkb.decode(x),
                                             wkb.decode(y))))
        return pd.Series(out, dtype=np.float64)

    return _udf


def register_sql_functions(spark: SparkSession, *,
                           prefix: str = "st_") -> list[str]:
    """Register the geometry function surface for spark.sql. Returns
    the list of registered names. Idempotent (re-registration
    overwrites)."""
    reg = spark.udf.register
    entries = {
        "area": GF.geom_area(),
        "astext": GF.geom_as_text(),
        "geomfromtext": GF.geom_from_text(),
        "length": GF.geom_length(),
        "shape_factor": GF.geom_shape_factor(),
        "centroid": GF.geom_centroid_xy(),
        "bounds": GF.geom_bounds_struct(),
        "envelope": GF.geom_envelope(),
        "convex_hull": GF.geom_convex_hull(),
        "force_2d": GF.geom_force_2d(),
        "make_valid": GF.geom_make_valid(),
        "is_valid": GF.geom_is_valid(),
        "geometry_type": GF.geom_type_of(),
        "buffer": _st_buffer(),
        "point": _st_point(),
        "distance": _st_distance(),
        "intersects": _pair_predicate("intersects"),
        "contains": _pair_predicate("contains"),
        "within": _pair_predicate("within"),
        "touches": _pair_predicate("touches"),
        "overlaps": _pair_predicate("overlaps"),
    }
    names = []
    for name, udf in entries.items():
        reg(prefix + name, udf)
        names.append(prefix + name)
    return names


def register_cell_sql_functions(spark: SparkSession, *,
                                prefix: str = "st_",
                                qcell_res: int = 16,
                                geohash_precision: int = 8,
                                tile_zoom: int = 14,
                                quadkey_zoom: int = 8) -> list[str]:
    """Register the cell-index encoders as Spark SQL *scalar functions*
    (``CREATE FUNCTION … RETURN <expr>``) — unlike udf.register, the
    body stays a Catalyst expression, so spark.sql/JDBC users get the
    SAME whole-stage-codegen plan as the Column API (plan-asserted in
    test_sql_cells).  Registered: ``st_qcell``, ``st_morton``,
    ``st_geohash``, ``st_tile_x``/``st_tile_y``, ``st_quadkey``.

    The S2-analog encoder is deliberately NOT registered: its
    nested-subquery SQL body trips the analyzer's subquery inlining
    into an exponential tree (same class of blowup as the
    with_s2_cell self-join caveat) — use cells.s2.with_s2_cell."""
    from gis_tools_spark import cells as CC
    from gis_tools_spark.cells import slippy as SL

    tx, ty = SL.tile_sql("lon", "lat", tile_zoom)
    defs = {
        "qcell": ("BIGINT", CC.cell_sql("lon", "lat", qcell_res)),
        "morton": ("BIGINT", _morton_sql("lon", "lat", qcell_res)),
        "geohash": ("STRING",
                    CC.geohash_sql("lon", "lat", geohash_precision)),
        "tile_x": ("BIGINT", tx),
        "tile_y": ("BIGINT", ty),
        "quadkey": ("STRING",
                    SL.quadkey_sql("lon", "lat", quadkey_zoom)),
    }
    names = []
    for name, (rtype, body) in defs.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {prefix}{name}"
            f"(lon DOUBLE, lat DOUBLE) RETURNS {rtype} RETURN {body}")
        names.append(prefix + name)
    return names


def _morton_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """ANSI-SQL Z-order key mirroring cells.morton_key (spread-mask
    interleave as shift/mask arithmetic)."""
    from gis_tools_spark.cells import _SPREAD_MASKS

    n = 1 << res
    def spread(e):
        for sh, mask in _SPREAD_MASKS:
            e = f"((({e}) | (({e}) << {sh})) & {mask})"
        return e
    ix = (f"CAST(least(greatest(floor((({lon_expr}) + 180.0) / 360.0"
          f" * {n}), 0), {n - 1}) AS BIGINT)")
    iy = (f"CAST(least(greatest(floor((({lat_expr}) + 90.0) / 180.0"
          f" * {n}), 0), {n - 1}) AS BIGINT)")
    return (f"(SELECT (({spread('__mx')}) << 1) | ({spread('__my')})"
            f" FROM (SELECT {ix} AS __mx, {iy} AS __my) AS __m)")
