"""Polygon point sampler (determinism + containment) and add_z."""

import numpy as np
import pandas as pd

from gis_tools_spark import fixtures
from gis_tools_spark.geom import kernels as K, wkb
from gis_tools_spark.operators.sampling import add_z_from_raster, sample_points_in_polygons
from gis_tools_spark.raster import codec


def test_sampler_containment_and_determinism(spark):
    zones = fixtures.gen_zones(6)
    zdf = spark.createDataFrame(zones[["gid", "geometry_wkb"]])
    pts = sample_points_in_polygons(zdf, 20).toPandas()
    assert len(pts) == 120
    for _, z in zones.iterrows():
        g = wkb.decode(z["geometry_wkb"])
        sub = pts[pts.gid == z["gid"]]
        assert K.covers_xy(g, sub["lon"].values, sub["lat"].values).all()
    # partitioning must not change results (per-feature seeding)
    pts2 = sample_points_in_polygons(zdf.repartition(5), 20).toPandas()
    a = pts.sort_values(["gid", "sample_index"]).reset_index(drop=True)
    b = pts2.sort_values(["gid", "sample_index"]).reset_index(drop=True)
    assert a.equals(b)


def test_add_z_from_raster(spark):
    ras_pd = fixtures.gen_rasters(2, 2, 16)
    ras = spark.createDataFrame(ras_pd)
    line = wkb.linestring([(6.0, 41.0), (7.0, 42.0), (8.0, 43.0)])
    ldf = spark.createDataFrame(pd.DataFrame({"lid": [1], "geometry_wkb": [line]}))
    out = add_z_from_raster(ldf, ras).toPandas()
    g = wkb.decode(out["geometry_wkb"].iloc[0])
    assert g["coords"].shape == (3, 3)
    # vertices keep their xy order
    assert list(g["coords"][:, 0]) == [6.0, 7.0, 8.0]
