"""Round-4: adaptive-res + salted generic poly×poly sjoin
(round-3 verdict "What's wrong" #2 / next-round #3).

The skew scenario: ONE continent-sized polygon meets thousands of tiny
clustered parcels. With the old fixed-coarse cover, every candidate
pair landed in a handful of coarse cells (hot-key shuffle); with the
adaptive cover, the continent covers coarse and the parcels cover fine,
matched through cell-hierarchy ancestors, and the dense fine side can
be salted.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_tools_spark import cells as C
from gis_tools_spark.geom import wkb
from gis_tools_spark.operators.core import CELL_COL, explode_cover
from gis_tools_spark.operators.sjoin import sjoin


def _box(minx, miny, maxx, maxy):
    return wkb.box(minx, miny, maxx, maxy)


def _skewed_layers(spark, n_small=3000):
    """Continent polygon + one mid polygon + n_small clustered parcels."""
    rng = np.random.default_rng(7)
    left_rows = [
        (0, _box(-40.0, -30.0, 40.0, 30.0)),     # "continent"
        (1, _box(4.0, 4.0, 6.0, 6.0)),           # mid-size
        (2, _box(120.0, 50.0, 121.0, 51.0)),     # far away: no parcels
    ]
    left = spark.createDataFrame(
        pd.DataFrame(left_rows, columns=["lid", "geometry_wkb"]))
    # parcels cluster around (5, 5) inside the continent AND the mid box
    cx = 5.0 + rng.normal(0, 0.5, n_small)
    cy = 5.0 + rng.normal(0, 0.5, n_small)
    s = rng.uniform(0.001, 0.01, n_small)
    right_rows = [(int(i), _box(cx[i] - s[i], cy[i] - s[i],
                                cx[i] + s[i], cy[i] + s[i]))
                  for i in range(n_small)]
    right = spark.createDataFrame(
        pd.DataFrame(right_rows, columns=["gid", "geometry_wkb"]))
    return left, right, (cx, cy, s)


def test_adaptive_cover_res_split(spark):
    """The continent covers at the coarse end of the band, the parcels
    at the fine end — the whole point of the adaptive cover (bounded
    candidate fan-out on both ends)."""
    left, right, _ = _skewed_layers(spark, n_small=200)
    res_of = F.shiftright(F.col(CELL_COL), C.RES_SHIFT)
    lres = [r[0] for r in
            explode_cover(left, "geometry_wkb", CELL_COL, 6, 14, 64)
            .select(res_of).distinct().collect()]
    rres = [r[0] for r in
            explode_cover(right, "geometry_wkb", CELL_COL, 6, 14, 64)
            .select(res_of).distinct().collect()]
    assert min(lres) <= 8          # continent: coarse
    assert max(rres) == 14         # parcels: fine end of the band
    assert max(rres) > max(lres)


def test_sjoin_skewed_matches_bruteforce(spark):
    left, right, (cx, cy, s) = _skewed_layers(spark, n_small=3000)
    out = sjoin(left, right, res_min=6, res_max=14, strategy="cell")
    got = {(r["lid"], r["gid"]) for r in out.select("lid", "gid").collect()}
    exp = set()
    for i in range(len(cx)):
        exp.add((0, i))                                # all inside continent
        if (cx[i] + s[i] >= 4.0 and cx[i] - s[i] <= 6.0
                and cy[i] + s[i] >= 4.0 and cy[i] - s[i] <= 6.0):
            exp.add((1, i))
    assert got == exp


def test_sjoin_salted_equals_unsalted(spark):
    left, right, _ = _skewed_layers(spark, n_small=3000)
    base = sjoin(left, right, res_min=6, res_max=14, strategy="cell")
    salted = sjoin(left, right, res_min=6, res_max=14,
                   salt_threshold=200, strategy="cell")
    a = {(r["lid"], r["gid"]) for r in base.select("lid", "gid").collect()}
    b = {(r["lid"], r["gid"]) for r in salted.select("lid", "gid").collect()}
    assert a == b and len(a) > 3000


def test_sjoin_candidate_load_bounded(spark):
    """Per-cell candidate contributions stay bounded: with the adaptive
    cover, the join key histogram of the fine (ancestor) side is spread
    over many parcel-res cells instead of the continent's few coarse
    cells. The densest single join key must carry only a small fraction
    of all candidate rows."""
    left, right, _ = _skewed_layers(spark, n_small=3000)
    rc = explode_cover(right, "geometry_wkb", CELL_COL, 6, 14, 64)
    hist = (rc.groupBy(CELL_COL).count()
            .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
            .collect()[0])
    assert hist["mx"] / hist["n"] < 0.05
    # while the OLD fixed-coarse cover concentrated everything:
    rc_fixed = explode_cover(right, "geometry_wkb", CELL_COL, 6, 6, 64)
    hist0 = (rc_fixed.groupBy(CELL_COL).count()
             .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
             .collect()[0])
    assert hist0["mx"] / hist0["n"] > 0.5


def test_sjoin_predicates_still_exact(spark):
    """within/contains through the adaptive filter: parcels fully inside
    the mid box are 'within' it; the continent contains every parcel."""
    left, right, (cx, cy, s) = _skewed_layers(spark, n_small=400)
    w = sjoin(right, left, left_wkb="geometry_wkb",
              right_wkb="geometry_wkb", left_id="gid", right_id="lid",
              predicate="within", res_min=6, res_max=14,
              strategy="cell")
    got = {(r["gid"], r["lid"]) for r in w.select("gid", "lid").collect()}
    exp = set()
    for i in range(len(cx)):
        exp.add((i, 0))
        if (cx[i] - s[i] >= 4.0 and cx[i] + s[i] <= 6.0
                and cy[i] - s[i] >= 4.0 and cy[i] + s[i] <= 6.0):
            exp.add((i, 1))
    assert got == exp


def test_cover_fanout_hard_cap():
    """A world-spanning geometry must NOT explode to an unbounded cover
    when even the band floor exceeds max_cells — the cover coarsens
    below res_min (cover_res_for_bounds)."""
    from gis_tools_spark.operators.core import cover_res_for_bounds

    for bb in ((-179, -85, 179, 85), (-40, -30, 40, 30), (0, 0, 90, 45)):
        r = cover_res_for_bounds(*bb, C.RES_MIN, C.RES_MAX, 64)
        assert len(C.bbox_to_cells(*bb, r)) <= 64
    assert cover_res_for_bounds(5.0, 5.0, 5.001, 5.001,
                                C.RES_MIN, C.RES_MAX, 64) == C.RES_MAX


def test_sjoin_default_band_continent(spark):
    """The skew scenario at the DEFAULT res band: the continent coarsens
    below the band floor instead of exploding, and results stay exact."""
    left, right, (cx, cy, s) = _skewed_layers(spark, n_small=400)
    out = sjoin(left, right, strategy="cell")  # default res band
    got = {(r["lid"], r["gid"]) for r in out.select("lid", "gid").collect()}
    exp = set()
    for i in range(len(cx)):
        exp.add((0, i))
        if (cx[i] + s[i] >= 4.0 and cx[i] - s[i] <= 6.0
                and cy[i] + s[i] >= 4.0 and cy[i] - s[i] <= 6.0):
            exp.add((1, i))
    assert got == exp


def test_pip_broadcast_world_polygon_capped(spark):
    """Broadcast PIP with a world-spanning polygon: the driver must not
    enumerate its res_min cell cover (previously ~600k cells); the
    polygon goes to the always-check list and results stay exact."""
    from gis_tools_spark.operators.sjoin import pip_join

    rng = np.random.default_rng(11)
    pts = pd.DataFrame({
        "pid": range(500),
        "lon": rng.uniform(-170, 170, 500),
        "lat": rng.uniform(-80, 80, 500),
    })
    zones = pd.DataFrame({
        "gid": [1, 2],
        "geometry_wkb": [_box(-180.0, -90.0, 180.0, 90.0),   # world
                         _box(0.0, 0.0, 10.0, 10.0)],        # normal
    })
    out = pip_join(spark.createDataFrame(pts), spark.createDataFrame(zones),
                   strategy="broadcast")
    rows = {(r["pid"], r["gid"]) for r in out.select("pid", "gid").collect()}
    exp = {(int(p), 1) for p in pts["pid"]}
    exp |= {(int(r["pid"]), 2) for _, r in pts.iterrows()
            if 0 <= r["lon"] <= 10 and 0 <= r["lat"] <= 10}
    assert rows == exp
