"""spherical_area (geom/kernels.py) — exact Green's-theorem area on
the sphere for lat/lon-linear polygons."""

import numpy as np

from gis_tools_spark.geom import kernels as K

R = 6_371_000.0


def _poly(*rings):
    return {"type": "Polygon",
            "rings": [np.asarray(r, dtype=float) for r in rings]}


def test_rect_closed_form():
    for (x0, y0, x1, y1) in ((10, 40, 12, 43), (-120, -35, -110, -20),
                             (0, 80, 10, 89), (5, -1, 6, 1)):
        ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
        want = R * R * np.radians(x1 - x0) * (
            np.sin(np.radians(y1)) - np.sin(np.radians(y0)))
        got = K.spherical_area(_poly(ring))
        assert abs(got - want) / want < 1e-12


def test_triangle_vs_numeric_integration():
    tri = [[0, 0], [10, 0], [5, 8], [0, 0]]
    lam = np.linspace(0, 10, 200001)
    top = np.where(lam <= 5, lam * 8 / 5, (10 - lam) * 8 / 5)
    want = np.trapz(R * R * np.sin(np.radians(top)), np.radians(lam))
    got = K.spherical_area(_poly(tri))
    assert abs(got - want) / want < 1e-9


def test_orientation_invariant_and_holes():
    outer = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
    hole = [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]
    a_cw = K.spherical_area(_poly(outer[::-1]))
    a_ccw = K.spherical_area(_poly(outer))
    assert abs(a_cw - a_ccw) < 1e-6
    with_hole = K.spherical_area(_poly(outer, hole))
    a_hole = K.spherical_area(_poly(hole))
    assert abs(with_hole - (a_ccw - a_hole)) < 1e-6


def test_latitude_distortion_vs_planar():
    """Same 1°x1° planar square near the equator vs at 60°N: spherical
    areas differ by ~cos(60°) while planar areas are identical."""
    eq = [[0, -0.5], [1, -0.5], [1, 0.5], [0, 0.5], [0, -0.5]]
    hi = [[0, 59.5], [1, 59.5], [1, 60.5], [0, 60.5], [0, 59.5]]
    a_eq = K.spherical_area(_poly(eq))
    a_hi = K.spherical_area(_poly(hi))
    assert abs(K.area(_poly(eq)) - K.area(_poly(hi))) < 1e-12
    assert abs(a_hi / a_eq - np.cos(np.radians(60))) < 1e-3


def test_whole_band_is_zonal_area():
    """A full longitude band [−180,180]×[φ1,φ2] has the zonal closed
    form 2πR²(sinφ2−sinφ1)."""
    ring = [[-180, 10], [180, 10], [180, 30], [-180, 30], [-180, 10]]
    want = 2 * np.pi * R * R * (np.sin(np.radians(30))
                                - np.sin(np.radians(10)))
    assert abs(K.spherical_area(_poly(ring)) - want) / want < 1e-12


def test_spark_column(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from gis_tools_spark.functions.geom_funcs import geom_spherical_area
    from gis_tools_spark.geom import wkb as W

    ring = np.array([[10, 40], [12, 40], [12, 43], [10, 43], [10, 40]],
                    dtype=float)
    buf = W.encode({"type": "Polygon", "rings": [ring]})
    df = spark.createDataFrame(pd.DataFrame({"geometry_wkb": [buf, None]}))
    out = df.select(geom_spherical_area()(F.col("geometry_wkb"))
                    .alias("a")).collect()
    want = R * R * np.radians(2.0) * (np.sin(np.radians(43))
                                      - np.sin(np.radians(40)))
    assert abs(out[0]["a"] - want) / want < 1e-12
    assert out[1]["a"] is None or np.isnan(out[1]["a"])
