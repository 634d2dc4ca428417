"""PreparedGeom (y-bucketed PIP index) must be bit-identical to the
dense covers_xy / contains_xy kernels, including points planted exactly
on vertices and edge midpoints, across plain / densified zones,
multipolygons and holes."""
import numpy as np
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.geom import kernels as K, wkb


def _densify_ring(r, target):
    r = np.asarray(r, dtype=np.float64)
    nseg = len(r) - 1
    k = max(1, target // max(nseg, 1))
    pts = []
    for i in range(nseg):
        a, b = r[i], r[i + 1]
        for t in range(k):
            pts.append(a + (b - a) * (t / k))
    pts.append(r[-1])
    return np.asarray(pts)


def _densify(g, target):
    if g["type"] == "Polygon":
        return {"type": "Polygon",
                "rings": [_densify_ring(r, target) for r in g["rings"]]}
    if g["type"] == "MultiPolygon":
        return {"type": "MultiPolygon",
                "polygons": [[_densify_ring(r, target) for r in p]
                             for p in g["polygons"]]}
    return g


@pytest.mark.parametrize("target", [0, 257, 1024])
def test_prepared_matches_dense(target):
    rng = np.random.default_rng(7)
    zones = fixtures.gen_zones(64)
    for buf in zones["geometry_wkb"]:
        g = wkb.decode(buf)
        if target:
            g = _densify(g, target)
        xs = rng.uniform(-55.2, -51.0, 400)
        ys = rng.uniform(1.6, 6.3, 400)
        rings = [r for rr in K.polygons_of(g) for r in rr]
        v = np.asarray(rings[0])
        kv = min(10, len(v))
        xs[:kv], ys[:kv] = v[:kv, 0], v[:kv, 1]
        mid = (v[:-1] + v[1:]) / 2
        km = min(10, len(mid))
        xs[10:10 + km], ys[10:10 + km] = mid[:km, 0], mid[:km, 1]
        prep = K.prepare(g)
        np.testing.assert_array_equal(K.covers_xy(g, xs, ys),
                                      prep.covers_xy(xs, ys))
        np.testing.assert_array_equal(K.contains_xy(g, xs, ys),
                                      prep.contains_xy(xs, ys))


def test_prepared_degenerate():
    # a sliver ring with all-equal y plus a tiny offset must not divide
    # by zero in the bucket layout
    r = np.array([[0.0, 1.0], [2.0, 1.0], [2.0, 1.0 + 1e-13], [0.0, 1.0]])
    g = {"type": "Polygon", "rings": [r]}
    prep = K.prepare(g)
    xs = np.array([1.0, 3.0, 1.0])
    ys = np.array([1.0, 1.0, 2.0])
    np.testing.assert_array_equal(K.covers_xy(g, xs, ys),
                                  prep.covers_xy(xs, ys))
