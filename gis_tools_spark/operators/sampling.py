"""Sampling + Z-enrichment operators (SURVEY.md §2.3).

- sample_points_in_polygons: Monte-Carlo rejection sampler (reference
  `sampler` layer.py:1821-1886 — random points in polygon, prepared-
  geometry fast path). Determinism: per-feature RNG seeded by the
  feature id, so results are identical under any partitioning.
- add_z: lift 2D line/point vertices with raster-sampled heights
  (reference add_z layer.py:405-434).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..geom import kernels as K, wkb


def sample_points_in_polygons(df: DataFrame, n_per_polygon: int, *,
                              wkb_col: str = "geometry_wkb", id_col: str = "gid",
                              seed: int = 42, max_tries: int = 10_000) -> DataFrame:
    """n deterministic uniform points inside each polygon (rejection
    sampling over the bbox, vectorized batches). Output: id_col,
    sample_index, lon, lat."""
    fields = T.StructType([
        df.schema[id_col],
        T.StructField("sample_index", T.IntegerType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in range(len(pdf)):
                r = pdf.iloc[i]
                g = wkb.decode(r[wkb_col])
                mnx, mny, mxx, mxy = K.bounds(g)
                rng = np.random.default_rng((seed, hash(str(r[id_col])) & 0xFFFFFFFF))
                got_x: list[float] = []
                got_y: list[float] = []
                tries = 0
                while len(got_x) < n_per_polygon and tries < max_tries:
                    k = max(64, 2 * (n_per_polygon - len(got_x)))
                    xs = rng.uniform(mnx, mxx, k)
                    ys = rng.uniform(mny, mxy, k)
                    ok = K.covers_xy(g, xs, ys, boundary_tol=0)
                    got_x.extend(xs[ok].tolist())
                    got_y.extend(ys[ok].tolist())
                    tries += k
                for j in range(min(n_per_polygon, len(got_x))):
                    rows.append((r[id_col], j, got_x[j], got_y[j]))
            if rows:
                yield pd.DataFrame(rows, columns=[id_col, "sample_index", "lon", "lat"])

    return df.select(id_col, wkb_col).mapInPandas(_run, schema=fields)


def add_z_from_raster(lines: DataFrame, rasters: DataFrame, *,
                      wkb_col: str = "geometry_wkb", id_col: str = "lid") -> DataFrame:
    """Rebuild each line with Z = raster value at every vertex:
    explode vertices → point-sample join → regroup in order → 3D WKB."""
    from ..raster.ops import sample_at_points

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("vx", T.DoubleType()), T.StructField("vy", T.DoubleType())])))
    def _verts(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            g = wkb.decode(b)
            coords = g["coords"] if g["type"] == "LineString" else g["lines"][0]
            out.append([{"vx": float(x), "vy": float(y)} for x, y in coords[:, :2]])
        return pd.Series(out)

    v = (lines.select(id_col, F.posexplode(_verts(F.col(wkb_col))).alias("vidx", "__v"))
         .select(id_col, "vidx", F.col("__v.vx").alias("lon"), F.col("__v.vy").alias("lat"))
         .withColumn("__pid", F.concat_ws(":", F.col(id_col).cast("string"),
                                          F.col("vidx").cast("string"))))
    sampled = sample_at_points(rasters, v, point_id="__pid", lon="lon", lat="lat")
    # regroup per line in vertex order
    agg = (sampled.groupBy(id_col)
           .agg(F.sort_array(F.collect_list(F.struct("vidx", "lon", "lat", "value")))
                .alias("vs")))

    out_schema = T.StructType([lines.schema[id_col], T.StructField(wkb_col, T.BinaryType())])

    def _rebuild(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in range(len(pdf)):
                r = pdf.iloc[i]
                pts = [(v["lon"], v["lat"], 0.0 if v["value"] is None or np.isnan(v["value"])
                        else float(v["value"])) for v in r["vs"]]
                rows.append((r[id_col], wkb.linestring(np.asarray(pts))))
            if rows:
                yield pd.DataFrame(rows, columns=[id_col, wkb_col])

    return agg.mapInPandas(_rebuild, schema=out_schema)
