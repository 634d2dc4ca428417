"""Round-3 regression tests for the ADVICE.md findings:

1. knn._nearest_rings silently dropped points whose confirm radius
   exceeded 2*max_k (the defer branch anti-joined them out of
   `remaining` without routing them to the broadcast fallback).
2. knn._nearest_rings raised IndexError on empty winner sets
   (empty points input).
3. split_lines_at_underlying_points decoded only part 0 of a
   MultiLineString, silently dropping the other parts.
"""

import numpy as np

from gis_tools_spark.geom import wkb
from gis_tools_spark.operators.knn import nearest_feature
from gis_tools_spark.operators.split import split_lines_at_underlying_points


def _tiny_square(cx, cy, half=0.01):
    return wkb.polygon([[(cx - half, cy - half), (cx + half, cy - half),
                         (cx + half, cy + half), (cx - half, cy + half),
                         (cx - half, cy - half)]])


def test_rings_deferred_points_not_dropped(spark):
    """A point ~5.6 deg (64 lon-cells at res 12) from its nearest feature
    hits at k=64 with confirm radius ~129 > 2*max_k=128 and takes the
    defer branch; pre-fix it vanished from the output (2 in -> 1 out)."""
    feats = spark.createDataFrame(
        [(1, _tiny_square(0.0, 0.0))], ["gid", "geometry_wkb"])
    pts = spark.createDataFrame(
        [(1, 5.63, 0.0), (2, 0.005, 0.005)], ["pid", "lon", "lat"])
    rows = nearest_feature(pts, feats, strategy="rings").collect()
    got = {r["pid"]: (r["nearest_gid"], r["nearest_dist"]) for r in rows}
    assert len(got) == 2, "deferred point must reach the output"
    assert got[2] == (1, 0.0)
    assert got[1][0] == 1
    # nearest edge of the square is at x=0.01 -> dist = 5.63 - 0.01
    np.testing.assert_allclose(got[1][1], 5.62, atol=1e-9)


def test_rings_empty_points_input(spark):
    feats = spark.createDataFrame(
        [(1, _tiny_square(0.0, 0.0))], ["gid", "geometry_wkb"])
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0)], ["pid", "lon", "lat"]).where("pid < 0")
    out = nearest_feature(pts, feats, strategy="rings")
    assert out.count() == 0
    assert "nearest_gid" in out.columns and "nearest_dist" in out.columns


def test_split_underlying_points_multilinestring(spark):
    """All parts of a MultiLineString must be emitted; indices are
    part-local (same interpretation as cut_lines_recursive_midpoint)."""
    part_a = [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0)]
    part_b = [(0.0, 5.0), (1.0, 5.0), (2.0, 5.0)]
    mls = wkb.multilinestring([part_a, part_b])
    lines = spark.createDataFrame([(1, mls)], ["lid", "geometry_wkb"])
    # index 1 is interior for both parts -> part A splits into 2, part B into 2
    locs = spark.createDataFrame([(1, 1)], ["lid", "vertex_index"])
    rows = split_lines_at_underlying_points(lines, locs).collect()
    assert len(rows) == 4
    pieces = [wkb.decode(r["piece_wkb"])["coords"] for r in
              sorted(rows, key=lambda r: r["part_index"])]
    np.testing.assert_allclose(pieces[0], [(0, 0), (1, 0)])
    np.testing.assert_allclose(pieces[1], [(1, 0), (2, 0), (3, 0)])
    np.testing.assert_allclose(pieces[2], [(0, 5), (1, 5)])
    np.testing.assert_allclose(pieces[3], [(1, 5), (2, 5)])

    # no breaks: every part still emitted, one piece per part
    rows2 = split_lines_at_underlying_points(
        lines, locs.where("lid < 0")).collect()
    assert len(rows2) == 2
