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
