"""Geocoding composite (SURVEY.md §2.14; reference all_addresses
geocoding.py:21-68): cascade geometric intersections over admin-level
layers, concatenate the level names into an address string, and return
the address polygons with centroids.

This is a stress composite of §2.5 (intersection joins) + §2.6
(dissolve) + §2.3 (centroid) — the fold runs driver-side over Catalyst
joins, exactly like the reference's loop but each step distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.geom_funcs import geom_centroid_xy
from .overlay import intersection_join


def all_addresses(layers: list[DataFrame], *, name_cols: list[str],
                  wkb_col: str = "geometry_wkb",
                  id_cols: list[str] | None = None,
                  sep: str = ", ") -> DataFrame:
    """Fold intersection over the layers (coarsest first). Each layer i
    needs (id_cols[i], name_cols[i], wkb_col). Returns one row per
    non-empty intersection: address string, geometry, area, centroid."""
    if id_cols is None:
        id_cols = [f"id{i}" for i in range(len(layers))]
    cur = layers[0].select(F.col(id_cols[0]).alias("id0"),
                           F.col(name_cols[0]).alias("name0"),
                           F.col(wkb_col))
    for i, layer in enumerate(layers[1:], start=1):
        right = layer.select(F.col(id_cols[i]).alias(f"id{i}"),
                             F.col(name_cols[i]).alias(f"name{i}"),
                             F.col(wkb_col))
        joined = intersection_join(cur, right, left_id="id0" if i == 1 else "__addr_key",
                                   right_id=f"id{i}", left_wkb=wkb_col,
                                   right_wkb=wkb_col, keep_geometry=True)
        keep = [c for c in joined.columns
                if c.startswith("id") or c.startswith("name") or c == "__addr_key"]
        cur = (joined.select(*keep, F.col("inter_wkb").alias(wkb_col),
                             F.col("inter_area").alias("__area")))
        cur = cur.withColumn("__addr_key",
                             F.concat_ws("|", *[c for c in cur.columns if c.startswith("id")]))
    name_list = [f"name{i}" for i in range(len(layers))]
    out = cur.withColumn("address", F.concat_ws(sep, *reversed(name_list)))
    out = out.withColumn("__c", geom_centroid_xy()(F.col(wkb_col)))
    return (out.withColumn("centroid_x", F.col("__c.cx"))
            .withColumn("centroid_y", F.col("__c.cy"))
            .withColumnRenamed("__area", "area")
            .drop("__c", "__addr_key"))
