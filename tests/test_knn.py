"""kNN nearest_feature vs oracle with reference tie-break semantics
(gistools geometry.py:682-705)."""

import numpy as np
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.geom import kernels as K, wkb
from gis_tools_spark.operators.knn import nearest_feature


@pytest.fixture(scope="module")
def knn_data(spark):
    zones = fixtures.gen_zones(12)
    pts = fixtures.gen_points(300, zones=zones)
    gs = [(int(g), wkb.decode(b)) for g, b in zip(zones["gid"], zones["geometry_wkb"])]
    cents = {gid: K.centroid(g) for gid, g in gs}
    oracle = {}
    for pid, x, y in zip(pts["pid"], pts["lon"], pts["lat"]):
        d = {gid: float(K.point_to_geom_distance(g, np.array([x]), np.array([y]))[0])
             for gid, g in gs}
        inter = [gid for gid, dd in d.items() if dd == 0.0]
        if inter:
            best = min(inter, key=lambda gid: (np.hypot(x - cents[gid][0], y - cents[gid][1]), gid))
            oracle[int(pid)] = (best, 0.0)
        else:
            best = min(d, key=lambda gid: (d[gid], gid))
            oracle[int(pid)] = (best, d[best])
    return (spark.createDataFrame(pts),
            spark.createDataFrame(zones[["gid", "geometry_wkb"]]), oracle)


@pytest.mark.parametrize("strategy", ["broadcast", "rings"])
def test_nearest_feature(knn_data, strategy):
    pts_df, zones_df, oracle = knn_data
    rows = nearest_feature(pts_df, zones_df, strategy=strategy).collect()
    got = {r["pid"]: (r["nearest_gid"], r["nearest_dist"]) for r in rows}
    assert len(got) == len(oracle)
    for p, (gid, dist) in oracle.items():
        assert got[p][0] == gid, p
        assert got[p][1] == pytest.approx(dist, abs=1e-9)
