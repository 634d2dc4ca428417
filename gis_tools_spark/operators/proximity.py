"""Proximity operators (SURVEY.md §2.5): distance-range joins
(reference nearest_neighbors layer.py:896-929 = features intersecting
buffer(d) ≡ ST_DWithin), pairwise distance matrices (layer.py:1007-1028),
element-wise Hausdorff (layer.py:676-689), snap/project
(layer.py:1030-1057).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import cells as C
from ..geom import kernels as K, wkb
from .core import CELL_COL, explode_cover
from .sjoin import _dedupe_names


def dwithin_join(points: DataFrame, features: DataFrame, dist: float, *,
                 lon: str = "lon", lat: str = "lat",
                 feat_wkb: str = "geometry_wkb", feat_id: str = "gid",
                 res: int | None = None) -> DataFrame:
    """All (point, feature) pairs with geometry distance ≤ dist —
    the reference's nearest_neighbors (buffer-intersects) as a range
    join: bbox-expanded cover equi-join (filter) + exact distance
    (refine). Adds a `dist` column."""
    features = _dedupe_names(points, features)
    if feat_wkb not in features.columns:
        feat_wkb = f"{feat_wkb}_right"
    if feat_id not in features.columns:
        feat_id = f"{feat_id}_right"
    if res is None:
        # cells must be ≥ dist so ±1-cell disk covers the radius
        res = C.RES_MIN
        while res > 2 and 180.0 / (1 << res) < dist:
            res -= 1

    # feature cover expanded by one ring (bbox pad by dist)
    pad_udf = _padded_cover_udf(feat_wkb, dist, res)
    fc = (features.withColumn(CELL_COL, F.explode(pad_udf(F.col(feat_wkb)))))
    pts = points.withColumn(CELL_COL, C.cell_column(F.col(lon), F.col(lat), res))
    cand = pts.join(fc, on=CELL_COL).drop(CELL_COL)

    # scalar UDF: only (wkb, lon, lat) cross Arrow; other candidate
    # columns stay JVM-side (pruning/codegen hold around the refine)
    @F.pandas_udf(T.DoubleType())
    def _dist(wkbs: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
        d = np.full(len(wkbs), np.inf)
        if len(wkbs):
            x = xs.to_numpy(dtype=np.float64)
            y = ys.to_numpy(dtype=np.float64)
            for buf, idx in wkbs.groupby(wkbs, sort=False).indices.items():
                if buf is None:
                    continue
                g = wkb.decode(buf)
                d[idx] = K.point_to_geom_distance(g, x[idx], y[idx])
        return pd.Series(d)

    return (cand.withColumn("dist", _dist(F.col(feat_wkb), F.col(lon), F.col(lat)))
            .where(F.col("dist") <= dist)
            .drop(feat_wkb))


def _padded_cover_udf(wkb_col: str, pad: float, res: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _cover(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            if b is None:
                out.append([])
                continue
            mnx, mny, mxx, mxy = K.bounds(wkb.decode(b))
            out.append(C.bbox_to_cells(mnx - pad, mny - pad, mxx + pad, mxy + pad, res).tolist())
        return pd.Series(out)

    return _cover


def pairwise_distance(left: DataFrame, right: DataFrame, *,
                      left_wkb: str = "geometry_wkb", right_wkb: str = "geometry_wkb",
                      left_id: str = "lid", right_id: str = "gid") -> DataFrame:
    """Full M×N distance matrix as long-form rows (reference
    layer.py:1007-1028). Quadratic by definition — for small layers."""
    right = _dedupe_names(left, right)
    if right_wkb not in right.columns:
        right_wkb = f"{right_wkb}_right"
    if right_id not in right.columns:
        right_id = f"{right_id}_right"
    cand = left.select(left_id, left_wkb).crossJoin(right.select(right_id, right_wkb))

    @F.pandas_udf(T.DoubleType())
    def _dist(la: pd.Series, rb: pd.Series) -> pd.Series:
        cache: dict[bytes, dict] = {}

        def _dec(b):
            g = cache.get(b)
            if g is None:
                g = cache[b] = wkb.decode(b)
            return g

        return pd.Series([K.geom_distance(_dec(a), _dec(b))
                          for a, b in zip(la, rb)])

    return (cand.withColumn("dist", _dist(F.col(left_wkb), F.col(right_wkb)))
            .drop(left_wkb, right_wkb))


def hausdorff_pairs(left: DataFrame, right: DataFrame, *,
                    on: str, left_wkb: str = "geometry_wkb",
                    right_wkb: str = "geometry_wkb") -> DataFrame:
    """Element-wise (zip-by-key) Hausdorff distance (reference
    layer.py:676-689 zips rows by position; we zip by an explicit key)."""
    r = right.select(F.col(on), F.col(right_wkb).alias("__rwkb"))
    j = left.select(F.col(on), F.col(left_wkb).alias("__lwkb")).join(r, on=on)

    @F.pandas_udf(T.DoubleType())
    def _hd(la: pd.Series, rb: pd.Series) -> pd.Series:
        return pd.Series([K.hausdorff_distance(wkb.decode(a), wkb.decode(b))
                          for a, b in zip(la, rb)])

    return (j.withColumn("hausdorff", _hd(F.col("__lwkb"), F.col("__rwkb")))
            .drop("__lwkb", "__rwkb"))


def snap_to_lines(points: DataFrame, lines: DataFrame, *,
                  lon: str = "lon", lat: str = "lat", point_id: str = "pid",
                  line_wkb: str = "geometry_wkb", line_id: str = "lid") -> DataFrame:
    """Project each point onto its nearest line (reference `project`,
    layer.py:1030-1057: nearest feature → line.project/interpolate).
    Returns point cols + (line_id, snap_x, snap_y, line_pos, dist)."""
    from .knn import nearest_feature

    nearest = nearest_feature(points, lines, lon=lon, lat=lat,
                              point_id=point_id, feat_wkb=line_wkb,
                              feat_id=line_id, strategy="broadcast")
    j = nearest.join(lines.select(F.col(line_id).alias("nearest_" + line_id),
                                  F.col(line_wkb).alias("__lwkb")),
                     on="nearest_" + line_id)
    snap_t = T.StructType([T.StructField("snap_x", T.DoubleType()),
                           T.StructField("snap_y", T.DoubleType()),
                           T.StructField("line_pos", T.DoubleType())])

    @F.pandas_udf(snap_t)
    def _snap(bs: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        sx, sy, pos = [], [], []
        for b, x, y in zip(bs, xs, ys):
            g = wkb.decode(b)
            coords = g["coords"] if g["type"] == "LineString" else g["lines"][0]
            t = K.project_on_line(coords, x, y)
            p = K.interpolate_line(coords, t)
            sx.append(float(p[0])); sy.append(float(p[1])); pos.append(t)
        return pd.DataFrame({"snap_x": sx, "snap_y": sy, "line_pos": pos})

    return (j.withColumn("__s", _snap(F.col("__lwkb"), F.col(lon), F.col(lat)))
            .drop("__lwkb")
            .select("*", "__s.snap_x", "__s.snap_y", "__s.line_pos")
            .drop("__s"))


def centroid_boundary_distance(df, *, wkb_col: str = "geometry_wkb"):
    """Min and max distance from each polygon's centroid to its boundary
    (reference distance_of_centroid_to_boundary layer.py:1623-1634:
    min = boundary.distance(centroid), max = hausdorff — for a point vs
    boundary, the hausdorff distance is the farthest boundary vertex/
    segment distance). Adds columns (cb_min_dist, cb_max_dist)."""
    from pyspark.sql import types as T

    cb_t = T.StructType([T.StructField("cb_min_dist", T.DoubleType()),
                         T.StructField("cb_max_dist", T.DoubleType())])

    @F.pandas_udf(cb_t)
    def _cb(bs: pd.Series) -> pd.DataFrame:
        mins, maxs = [], []
        for b in bs:
            if b is None:
                mins.append(None); maxs.append(None)
                continue
            g = wkb.decode(b)
            cx, cy = K.centroid(g)
            dmin, dmax = np.inf, 0.0
            for ring in K.ring_list(g):
                pts = ring[:, :2]
                # min: exact point-to-segment; max: farthest vertex
                # (the hausdorff max over a segment is at an endpoint)
                d = K.point_to_geom_distance(
                    {"type": "LineString", "coords": ring},
                    np.array([cx]), np.array([cy]))[0]
                dmin = min(dmin, float(d))
                dv = np.sqrt((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2)
                dmax = max(dmax, float(dv.max()))
            mins.append(dmin); maxs.append(dmax)
        return pd.DataFrame({"cb_min_dist": mins, "cb_max_dist": maxs})

    return (df.withColumn("__cb", _cb(F.col(wkb_col)))
            .select("*", "__cb.cb_min_dist", "__cb.cb_max_dist")
            .drop("__cb"))
