"""Property test: pip_join on random CONCAVE (star-shaped) polygons
must match a local brute-force covers test exactly, for both physical
strategies. The rect-fixture oracle tests exercise axis-aligned
boxes only; this covers the adaptive cover UDF + scalar refine on
irregular shapes with reflex vertices.
"""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.geom import kernels as K, wkb as WKB
from gis_tools_spark.operators.sjoin import pip_join


def star_polygon(rng, cx, cy, n_arms=7, r_lo=0.2, r_hi=1.0):
    """Simple (non-self-intersecting) concave polygon: vertices at
    sorted angles with random radii around (cx, cy)."""
    th = np.sort(rng.uniform(0, 2 * np.pi, 2 * n_arms))
    r = rng.uniform(r_lo, r_hi, 2 * n_arms)
    xs = cx + r * np.cos(th)
    ys = cy + r * np.sin(th)
    return [(float(x), float(y)) for x, y in zip(xs, ys)]


@pytest.mark.parametrize("strategy", ["cell", "broadcast"])
def test_pip_join_random_concave_matches_bruteforce(spark, strategy):
    rng = np.random.default_rng(23)
    n_polys, n_pts = 12, 800
    polys = []
    for gid in range(n_polys):
        ring = star_polygon(rng, rng.uniform(1, 9), rng.uniform(1, 9))
        polys.append((gid, bytearray(WKB.polygon([ring]))))
    px = rng.uniform(0, 10, n_pts)
    py = rng.uniform(0, 10, n_pts)

    # local brute force over every (point, polygon) pair
    want = set()
    for gid, b in polys:
        g = WKB.decode(bytes(b))
        hit = K.covers_xy(g, px, py, boundary_tol=0)
        want |= {(int(i), gid) for i in np.nonzero(hit)[0]}

    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": np.arange(n_pts), "lon": px, "lat": py}))
    zs = spark.createDataFrame(pd.DataFrame(
        {"gid": [g for g, _ in polys],
         "geometry_wkb": [b for _, b in polys]}))
    got = {(int(r["pid"]), int(r["gid"]))
           for r in pip_join(pts, zs, strategy=strategy)
           .select("pid", "gid").collect()}
    assert got == want, (len(got - want), len(want - got))


def test_dwithin_join_random_concave_matches_bruteforce(spark):
    """dwithin_join (padded-cover filter + scalar distance refine) must
    reproduce the exact pair set and distances of a local brute force
    over random concave polygons."""
    from gis_tools_spark.operators.proximity import dwithin_join

    rng = np.random.default_rng(41)
    dist = 0.35
    polys = []
    for gid in range(8):
        ring = star_polygon(rng, rng.uniform(1, 9), rng.uniform(1, 9))
        polys.append((gid, bytearray(WKB.polygon([ring]))))
    n_pts = 500
    px = rng.uniform(0, 10, n_pts)
    py = rng.uniform(0, 10, n_pts)

    want = {}
    for gid, b in polys:
        g = WKB.decode(bytes(b))
        d = K.point_to_geom_distance(g, px, py)
        for i in np.nonzero(d <= dist)[0]:
            want[(int(i), gid)] = float(d[i])

    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": np.arange(n_pts), "lon": px, "lat": py}))
    zs = spark.createDataFrame(pd.DataFrame(
        {"gid": [g for g, _ in polys],
         "geometry_wkb": [b for _, b in polys]}))
    got = {(int(r["pid"]), int(r["gid"])): float(r["dist"])
           for r in dwithin_join(pts, zs, dist).select("pid", "gid", "dist").collect()}
    assert set(got) == set(want), (len(set(got) - set(want)), len(set(want) - set(got)))
    for k_ in want:
        assert abs(got[k_] - want[k_]) < 1e-12, k_
