"""line_zone_length (operators/overlay.py) vs a numpy clip reference."""

import numpy as np
import pandas as pd

from gis_tools_spark.operators.overlay import line_zone_length


def _ref_clip(seg, z):
    (x0, y0, x1, y1) = seg
    (zx0, zy0, zx1, zy1) = z
    dx, dy = x1 - x0, y1 - y0

    def slab(d, p0, lo, hi):
        if d != 0:
            ta, tb = (lo - p0) / d, (hi - p0) / d
            return min(ta, tb), max(ta, tb)
        return (0.0, 1.0) if lo <= p0 <= hi else (1.0, 0.0)

    tx = slab(dx, x0, zx0, zx1)
    ty = slab(dy, y0, zy0, zy1)
    tlo = max(tx[0], ty[0], 0.0)
    thi = min(tx[1], ty[1], 1.0)
    return max(thi - tlo, 0.0) * np.hypot(dx, dy)


def _run(spark, segs, zones):
    sdf = spark.createDataFrame(pd.DataFrame(
        segs, columns=["x0", "y0", "x1", "y1"]))
    zdf = spark.createDataFrame(pd.DataFrame(
        zones, columns=["gid", "zminx", "zminy", "zmaxx", "zmaxy"]))
    out = line_zone_length(sdf, zdf)
    return {r["gid"]: (r["n_segments"], r["length"])
            for r in out.collect()}


def test_matches_reference(spark):
    rng = np.random.RandomState(3)
    segs = [tuple(rng.uniform(0, 10, 4)) for _ in range(300)]
    zones = [(g, *sorted(rng.uniform(0, 10, 2)),) for g in range(8)]
    zones = [(g, a, c, b, d) for (g, a, b), (c, d) in
             zip(((g, *sorted(rng.uniform(0, 10, 2))) for g in range(8)),
                 (sorted(rng.uniform(0, 10, 2)) for _ in range(8)))]
    got = _run(spark, segs, zones)
    for g, zx0, zy0, zx1, zy1 in zones:
        clips = [_ref_clip(s, (zx0, zy0, zx1, zy1)) for s in segs]
        n = sum(1 for c in clips if c > 0)
        tot = sum(c for c in clips if c > 0)
        if n == 0:
            assert g not in got
        else:
            gn, gl = got[g]
            assert gn == n
            assert abs(gl - tot) < 1e-9


def test_conservation_partition_of_space():
    """Length is conserved when zones tile the plane (checked via the
    reference identity used by the Spark op)."""
    rng = np.random.RandomState(5)
    segs = [tuple(rng.uniform(0, 4, 4)) for _ in range(100)]
    tiles = [(i * 2 + j, 2 * i, 2 * j, 2 * i + 2, 2 * j + 2)
             for i in range(2) for j in range(2)]
    for s in segs:
        total = sum(_ref_clip(s, t[1:]) for t in tiles)
        assert abs(total - np.hypot(s[2] - s[0], s[3] - s[1])) < 1e-9


def test_degenerate_segments(spark):
    # vertical, horizontal, zero-length, fully inside, fully outside
    segs = [(1.0, 0.0, 1.0, 5.0), (0.0, 2.0, 5.0, 2.0),
            (3.0, 3.0, 3.0, 3.0), (1.5, 1.5, 1.6, 1.6),
            (9.0, 9.0, 10.0, 10.0)]
    zones = [(0, 1.0, 1.0, 2.0, 2.0)]
    got = _run(spark, segs, zones)
    n, tot = got[0]
    want = (1.0          # vertical crosses the zone over y in [1,2]
            + 1.0        # horizontal crosses over x in [1,2]
            + np.hypot(0.1, 0.1))   # fully inside diagonal
    assert n == 3
    assert abs(tot - want) < 1e-9
