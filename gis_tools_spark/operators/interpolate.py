"""Spatial interpolation of scattered point samples onto the cell grid.

IDW (inverse distance weighting — the ArcGIS/QGIS "IDW" Spatial
Analyst tool; reference scope: the SRTM/DEM sampling surface it wraps,
raster.py:158-165) as a distributed grid operator:

    value(c) = sum_i w_i v_i / sum_i w_i,
    w_i = 1 / (d_i^power + smooth)   over points with d_i < radius.

Plan shape is the same as hotspot.kde_density: each sample point
explodes to the grid cells of its radius box via `sequence()` bounds
(bounded fan-out), then ONE groupBy(cell) accumulates the two sums —
whole-stage codegen, one data-sized shuffle, no Python. At 10^12
samples the shuffle carries (cell, w·v, w) triples only.

`smooth > 0` bounds the weight of exact hits (the standard smoothing
parameter); with power=2 the weight needs no libm (w = 1/(d² + s)), so
a SQL oracle can mirror the expression tree bit-for-bit.
`quantize_decimals` rounds each contribution to exact integers before
summation — partition-order-independent results, same contract as
kde_density.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..cells import IX_SHIFT, RES_SHIFT

__all__ = ["idw_grid"]


def idw_grid(points: DataFrame, *, value_col: str,
             lon: str = "lon", lat: str = "lat",
             res: int = 11, radius: float, power: float = 2.0,
             smooth: float = 1e-12,
             quantize_decimals: int | None = None) -> DataFrame:
    """IDW-interpolate `value_col` onto the res grid. Returns one row
    per cell with ≥1 in-radius sample:
    (cell, ix, iy, cx, cy, idw_value, n_samples)."""
    n = 1 << res
    wx, wy = 360.0 / n, 180.0 / n
    r = float(radius)
    fan = (2 * r / wx + 2) * (2 * r / wy + 2)
    if fan > 250_000:
        raise ValueError(
            f"radius {r} at res {res} explodes each sample to ~{fan:.0f} "
            "cells; lower res or radius (bounded fan-out is the scale "
            "contract of this operator)")
    x, y = F.col(lon), F.col(lat)
    jx0 = F.floor((x - r + 180.0) / 360.0 * n).cast("long")
    jx1 = F.floor((x + r + 180.0) / 360.0 * n).cast("long")
    jy0 = F.floor((y - r + 90.0) / 180.0 * n).cast("long")
    jy1 = F.floor((y + r + 90.0) / 180.0 * n).cast("long")
    base = points.select(
        x.alias("__x"), y.alias("__y"),
        F.col(value_col).cast("double").alias("__v"),
        jx0.alias("__jx0"), jx1.alias("__jx1"),
        jy0.alias("__jy0"), jy1.alias("__jy1"))
    g = (base
         .withColumn("ix", F.explode(F.sequence("__jx0", "__jx1")))
         .withColumn("iy", F.explode(F.sequence("__jy0", "__jy1")))
         .where((F.col("ix") >= 0) & (F.col("ix") < n)
                & (F.col("iy") >= 0) & (F.col("iy") < n)))
    cx = F.lit(-180.0) + (F.col("ix") + F.lit(0.5)) * F.lit(wx)
    cy = F.lit(-90.0) + (F.col("iy") + F.lit(0.5)) * F.lit(wy)
    dx, dy = F.col("__x") - cx, F.col("__y") - cy
    d2 = dx * dx + dy * dy
    if power == 2.0:
        w = F.lit(1.0) / (d2 + F.lit(float(smooth)))
    else:
        w = F.lit(1.0) / (F.pow(d2, F.lit(power / 2.0)) + F.lit(float(smooth)))
    g = g.where(d2 < F.lit(r * r))
    if quantize_decimals is not None:
        s = F.lit(float(10 ** quantize_decimals))
        num = (F.sum(F.floor(w * F.col("__v") * s + F.lit(0.5)).cast("long"))
               .cast("double") / s)
        den = (F.sum(F.floor(w * s + F.lit(0.5)).cast("long"))
               .cast("double") / s)
    else:
        num = F.sum(w * F.col("__v"))
        den = F.sum(w)
    cell = (F.lit(res).cast("long") * F.lit(1 << RES_SHIFT)
            + F.col("ix") * F.lit(1 << IX_SHIFT) + F.col("iy"))
    return (g.groupBy("ix", "iy")
            .agg(num.alias("__num"), den.alias("__den"),
                 F.count("*").alias("n_samples"))
            .select(cell.alias("cell"), "ix", "iy",
                    cx.alias("cx"), cy.alias("cy"),
                    (F.col("__num") / F.col("__den")).alias("idw_value"),
                    "n_samples"))


def trend_surface(points: DataFrame, *, value_col: str,
                  by: Sequence[str] | None = None,
                  lon: str = "lon", lat: str = "lat") -> DataFrame:
    """First-order trend surface (OLS plane fit v = a + b·x + c·y) per
    group — the global-drift summary that classically precedes kriging
    (fit the trend, krige the residuals) and the cheapest "which way
    does this field slope" answer.

    One map-side-combinable aggregation collects the nine monomial
    moments; the normal equations solve in closed form by Cramer's
    rule as pure column expressions — no solver, no Python, exactly
    SQL-mirrorable. R² comes from the same moments via the OLS
    orthogonality identity SSE = Σv² − aΣv − bΣxv − cΣyv.

    Returns per group: (n, a, b, c, r2). Degenerate groups (collinear
    or < 3 points ⇒ singular normal matrix) return NULL coefficients.
    """
    keys = list(by) if by else []
    # sums keep the INPUT type: integer columns aggregate exactly
    # (partition-order independent — the oracle contract); the cast to
    # double happens on the nine moments, not per row
    x, y, v = F.col(lon), F.col(lat), F.col(value_col)
    base = points.groupBy(*keys).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
        F.sum(v).alias("sv"), F.sum(x * v).alias("sxv"),
        F.sum(y * v).alias("syv"), F.sum(v * v).alias("svv"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n, sx, sy = F.col("n"), d("sx"), d("sy")
    sxx, sxy, syy = d("sxx"), d("sxy"), d("syy")
    sv, sxv, syv, svv = d("sv"), d("sxv"), d("syv"), d("svv")
    # det of [[n,sx,sy],[sx,sxx,sxy],[sy,sxy,syy]] and Cramer columns
    det = (n * (sxx * syy - sxy * sxy) - sx * (sx * syy - sxy * sy)
           + sy * (sx * sxy - sxx * sy))
    det_a = (sv * (sxx * syy - sxy * sxy) - sx * (sxv * syy - sxy * syv)
             + sy * (sxv * sxy - sxx * syv))
    det_b = (n * (sxv * syy - sxy * syv) - sv * (sx * syy - sxy * sy)
             + sy * (sx * syv - sxv * sy))
    det_c = (n * (sxx * syv - sxv * sxy) - sx * (sx * syv - sxv * sy)
             + sv * (sx * sxy - sxx * sy))
    ok = F.abs(det) > F.lit(0.0)
    a = F.when(ok, det_a / det)
    b = F.when(ok, det_b / det)
    c = F.when(ok, det_c / det)
    sse = svv - (a * sv + b * sxv + c * syv)
    sst = svv - (sv * sv) / n
    r2 = F.when(ok & (sst > 0), F.lit(1.0) - sse / sst)
    return base.select(*keys, n.cast("long").alias("n"),
                       a.alias("a"), b.alias("b"), c.alias("c"),
                       r2.alias("r2"))
