"""Equal-area partition (METIS substitute) — area-balance criterion per
SURVEY §7.5."""

import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.geom import kernels as K, wkb
from gis_tools_spark.operators.partition import partition_one, partition_polygons


def test_partition_square_kernel():
    g = wkb.decode(wkb.box(0, 0, 4, 4))
    parts = partition_one(g, 4)
    areas = sorted(K.area(p) for p in parts)
    assert len(parts) == 4
    assert sum(areas) == pytest.approx(16.0)
    assert max(areas) / min(areas) < 2.0


def test_partition_layer(spark):
    zones = fixtures.gen_zones(4)
    out = partition_polygons(
        spark.createDataFrame(zones[["gid", "geometry_wkb"]]), 5).toPandas()
    for gid, grp in out.groupby("gid"):
        a0 = K.area(wkb.decode(zones[zones.gid == gid]["geometry_wkb"].iloc[0]))
        assert grp["part_area"].sum() == pytest.approx(a0, rel=1e-9)
        assert len(grp) == 5
        # balance: max part within 2x of the mean (reference criterion is
        # ±1/disaggregation_factor on the *pieces*; parts are coarser)
        assert grp["part_area"].max() / grp["part_area"].mean() < 2.0
