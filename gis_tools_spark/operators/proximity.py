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

    schema = T.StructType(list(cand.schema.fields) + [T.StructField("dist", T.DoubleType())])

    def _refine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            d = np.empty(len(pdf))
            for buf, idx in pdf.groupby(feat_wkb, sort=False).indices.items():
                g = wkb.decode(buf)
                d[idx] = K.point_to_geom_distance(g, pdf[lon].values[idx], pdf[lat].values[idx])
            out = pdf.copy()
            out["dist"] = d
            out = out[d <= dist]
            if len(out):
                yield out

    return cand.mapInPandas(_refine, schema=schema).drop(feat_wkb)


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
    schema = T.StructType(list(cand.schema.fields) + [T.StructField("dist", T.DoubleType())])

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            cache: dict[bytes, dict] = {}
            d = [K.geom_distance(cache.setdefault(a, wkb.decode(a)),
                                 wkb.decode(b))
                 for a, b in zip(pdf[left_wkb], pdf[right_wkb])]
            out = pdf.copy()
            out["dist"] = d
            yield out

    return cand.mapInPandas(_run, schema=schema).drop(left_wkb, right_wkb)


def hausdorff_pairs(left: DataFrame, right: DataFrame, *,
                    on: str, left_wkb: str = "geometry_wkb",
                    right_wkb: str = "geometry_wkb") -> DataFrame:
    """Element-wise (zip-by-key) Hausdorff distance (reference
    layer.py:676-689 zips rows by position; we zip by an explicit key)."""
    r = right.select(F.col(on), F.col(right_wkb).alias("__rwkb"))
    j = left.select(F.col(on), F.col(left_wkb).alias("__lwkb")).join(r, on=on)
    schema = T.StructType(list(j.schema.fields) + [T.StructField("hausdorff", T.DoubleType())])

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            out["hausdorff"] = [
                K.hausdorff_distance(wkb.decode(a), wkb.decode(b))
                for a, b in zip(pdf["__lwkb"], pdf["__rwkb"])]
            yield out

    return j.mapInPandas(_run, schema=schema).drop("__lwkb", "__rwkb")


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
    schema = T.StructType([f for f in j.schema.fields if f.name != "__lwkb"]
                          + [T.StructField("snap_x", T.DoubleType()),
                             T.StructField("snap_y", T.DoubleType()),
                             T.StructField("line_pos", T.DoubleType())])

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            sx, sy, pos = [], [], []
            for b, x, y in zip(pdf["__lwkb"], pdf[lon], pdf[lat]):
                g = wkb.decode(b)
                coords = g["coords"] if g["type"] == "LineString" else g["lines"][0]
                t = K.project_on_line(coords, x, y)
                p = K.interpolate_line(coords, t)
                sx.append(float(p[0])); sy.append(float(p[1])); pos.append(t)
            out = pdf.drop(columns=["__lwkb"])
            out["snap_x"] = sx
            out["snap_y"] = sy
            out["line_pos"] = pos
            yield out

    return j.mapInPandas(_run, schema=schema)


def centroid_boundary_distance(df, *, wkb_col: str = "geometry_wkb"):
    """Min and max distance from each polygon's centroid to its boundary
    (reference distance_of_centroid_to_boundary layer.py:1623-1634:
    min = boundary.distance(centroid), max = hausdorff — for a point vs
    boundary, the hausdorff distance is the farthest boundary vertex/
    segment distance). Adds columns (cb_min_dist, cb_max_dist)."""
    from pyspark.sql import types as T

    fields = T.StructType(list(df.schema.fields) + [
        T.StructField("cb_min_dist", T.DoubleType()),
        T.StructField("cb_max_dist", T.DoubleType()),
    ])

    def _run(it):
        for pdf in it:
            mins, maxs = [], []
            for b in pdf[wkb_col]:
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
            out = pdf.copy()
            out["cb_min_dist"] = mins
            out["cb_max_dist"] = maxs
            yield out

    return df.mapInPandas(_run, schema=fields)
