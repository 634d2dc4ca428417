"""polylabel (geom/kernels.py) — pole of inaccessibility."""

import numpy as np
import pandas as pd

from gis_tools_spark.geom import kernels as K


def _poly(*rings):
    return {"type": "Polygon",
            "rings": [np.asarray(r, dtype=float) for r in rings]}


def test_square_center():
    sq = _poly([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]])
    x, y, d = K.polylabel(sq, precision=1e-6)
    assert abs(x - 1) < 1e-5 and abs(y - 1) < 1e-5 and abs(d - 1) < 1e-5


def test_l_shape_analytic():
    """L-shape pole: circle touching x=0, y=0 and the inner corner
    (1,1): r = sqrt(2)/(1+sqrt(2))."""
    L = _poly([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]])
    x, y, d = K.polylabel(L, precision=1e-6)
    r = np.sqrt(2) / (1 + np.sqrt(2))
    assert abs(d - r) < 1e-4
    assert abs(x - r) < 1e-3 and abs(y - r) < 1e-3
    # centroid of this L lies at ~(1.3, 1.3) — outside the corner arm
    # region and NOT the deepest point; polylabel must beat it
    cx, cy = K.centroid(L)
    cd = float(K._signed_boundary_dist(L, np.array([cx]),
                                       np.array([cy]))[0])
    assert d > cd


def test_donut_corner_pocket():
    """Square donut: the deepest point is a corner pocket at
    t = 3*sqrt(2)/(1+sqrt(2)) on the diagonal."""
    outer = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    hole = [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]
    x, y, d = K.polylabel(_poly(outer, hole), precision=1e-6)
    t = 3 * np.sqrt(2) / (1 + np.sqrt(2))
    assert abs(d - t) < 1e-4
    corners = [(t, t), (10 - t, t), (t, 10 - t), (10 - t, 10 - t)]
    assert min(np.hypot(x - cx, y - cy) for cx, cy in corners) < 1e-2


def test_beats_dense_grid():
    rng = np.random.RandomState(4)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
    rad = rng.uniform(1, 4, 12)
    ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    g = _poly(ring)
    x, y, d = K.polylabel(g, precision=1e-5)
    gx, gy = np.meshgrid(np.linspace(-4, 4, 161), np.linspace(-4, 4, 161))
    sd = K._signed_boundary_dist(g, gx.ravel(), gy.ravel())
    assert d >= sd.max() - 0.05          # grid step bound
    assert K.contains_xy(g, np.array([x]), np.array([y]))[0]


def test_spark_struct(spark):
    from pyspark.sql import functions as F

    from gis_tools_spark.functions.geom_funcs import geom_label_point
    from gis_tools_spark.geom import wkb as W

    sq = _poly([[5, 40], [6, 40], [6, 41], [5, 41], [5, 40]])
    df = spark.createDataFrame(pd.DataFrame(
        {"geometry_wkb": [W.encode(sq), None]}))
    out = df.select(geom_label_point()(F.col("geometry_wkb"))
                    .alias("lp")).collect()
    assert abs(out[0]["lp"]["lx"] - 5.5) < 1e-3
    assert abs(out[0]["lp"]["ldist"] - 0.5) < 1e-3
    assert out[1]["lp"]["lx"] is None or np.isnan(out[1]["lp"]["lx"])
