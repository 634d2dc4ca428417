"""Greiner–Hormann boolean kernel: golden cases + randomized property
tests (area partition: |A∩B| + |A\\B| = |A|; convex agreement with
Sutherland–Hodgman)."""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.geom import boolean as B, kernels as K, wkb


def test_offset_squares():
    a = wkb.decode(wkb.box(0, 0, 2, 2))
    b = wkb.decode(wkb.box(1, 1, 3, 3))
    assert K.area(B.intersection(a, b)) == pytest.approx(1.0)
    assert K.area(B.difference(a, b)) == pytest.approx(3.0)


def test_concave_L():
    L = {"type": "Polygon", "rings": [np.array(
        [(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3), (0, 0)], float)]}
    s = wkb.decode(wkb.box(0.5, 0.5, 2.5, 2.5))
    assert K.area(B.intersection(L, s)) == pytest.approx(1.75)
    assert K.area(B.difference(L, s)) == pytest.approx(3.25)


def test_containment_hole_and_disjoint():
    big = wkb.decode(wkb.box(0, 0, 10, 10))
    small = wkb.decode(wkb.box(4, 4, 6, 6))
    d = B.difference(big, small)
    assert K.area(d) == pytest.approx(96.0)
    assert len(d["rings"]) == 2
    far = wkb.decode(wkb.box(20, 20, 21, 21))
    assert B.intersection(big, far) is None
    assert K.area(B.difference(big, far)) == pytest.approx(100.0)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_properties(seed):
    rng = np.random.default_rng(seed)
    for _ in range(25):
        th = np.sort(rng.uniform(0, 2 * np.pi, 10))
        r1 = rng.uniform(0.6, 2.2, 10)
        p1 = np.stack([2 + r1 * np.cos(th), 2 + r1 * np.sin(th)], axis=1)
        g1 = {"type": "Polygon", "rings": [K.ensure_ccw(np.vstack([p1, p1[:1]]))]}
        c2 = K.convex_hull(rng.uniform(0.5, 3.5, (8, 2)))
        g2 = {"type": "Polygon", "rings": [c2]}
        got = B.intersection(g1, g2)
        ga = K.area(got) if got else 0.0
        gd = B.difference(g1, g2)
        da = K.area(gd) if gd else 0.0
        assert da + ga == pytest.approx(K.area(g1), abs=1e-8)
        want = K.clip_polygon_convex(g1, c2)
        wa = K.area(want) if want else 0.0
        assert ga == pytest.approx(wa, abs=1e-8)


def test_difference_join_semantics(spark):
    from gis_tools_spark.operators.overlay import difference_join

    left = spark.createDataFrame(pd.DataFrame({
        "lid": [1, 2, 3],
        "geometry_wkb": [wkb.box(0, 0, 2, 2), wkb.box(10, 10, 12, 12),
                         wkb.box(5, 5, 9, 9)]}))
    right = spark.createDataFrame(pd.DataFrame({
        "gid": [1, 2],
        "geometry_wkb": [wkb.box(1, 1, 3, 3), wkb.box(6, 6, 7, 7)]}))
    out = difference_join(left, right).toPandas()
    assert out[out.lid == 1]["diff_area"].sum() == pytest.approx(3.0)
    assert np.isnan(out[out.lid == 2]["diff_area"].iloc[0])  # untouched passthrough
    assert out[out.lid == 3]["diff_area"].sum() == pytest.approx(15.0)
    g3 = wkb.decode(out[out.lid == 3]["geometry_wkb"].iloc[0])
    assert len(g3["rings"]) == 2  # hole preserved
