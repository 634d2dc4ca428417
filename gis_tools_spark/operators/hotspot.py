"""Spatial autocorrelation — Getis-Ord Gi* hot-spot z-scores and global
Moran's I over the engine's quad-cell grid.

The classic ESDA statistics (Getis & Ord 1992; Moran 1950; the same
formulas ArcGIS "Hot Spot Analysis" and PySAL `esda` publish), computed
distributed with queen-contiguity weights on the cell grid
(gis_tools_spark/cells): w_ij = 1 for the 8 surrounding cells (Gi* adds
the self cell, its defining difference from Gi). The study area is the
bounding box of occupied cells; empty cells inside it participate with
x = 0 (their neighbor contributions vanish, and the global moments
include them in closed form), so the result is exactly the dense-grid
statistic without materializing empty cells.

Everything is integer/double column arithmetic — cell encode, the
8-offset neighbor explode, clipped neighborhood sizes at the bbox
border, and the closed-form global moments — so the identical
expressions run in Spark codegen and in the DuckDB oracle.

Plan shape (Gi*): one groupBy on the cell key (map-side combinable),
one explode(9) + groupBy on the neighbor key, one equi-join back to the
occupied cells, and a broadcast of the 1-row global-moments aggregate.
No crossJoin on data, no Python. At 10^12 points the first groupBy
collapses the volume to O(occupied cells) and everything after is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cells import IX_SHIFT, RES_SHIFT, cell_column

__all__ = ["cell_stats", "getis_ord_gi", "moran_i", "local_moran",
           "kde_density", "mann_kendall_trend"]

_IX_MASK = (1 << (RES_SHIFT - IX_SHIFT)) - 1
_IY_MASK = (1 << IX_SHIFT) - 1


def cell_stats(points: DataFrame, *, lon: str = "lon", lat: str = "lat",
               res: int = 11, value_col: str | None = None) -> DataFrame:
    """Aggregate points to (cell, ix, iy, x): x = count (value_col=None)
    or sum(value_col). The one big shuffle of the hot-spot pipeline."""
    cell = cell_column(F.col(lon), F.col(lat), res)
    x = F.count("*") if value_col is None else F.sum(value_col)
    g = points.groupBy(cell.alias("cell")).agg(x.cast("double").alias("x"))
    return g.select(
        "cell",
        F.shiftright("cell", IX_SHIFT).bitwiseAND(F.lit(_IX_MASK)).alias("ix"),
        F.col("cell").bitwiseAND(F.lit(_IY_MASK)).alias("iy"),
        "x")


def _global_moments(cells: DataFrame) -> DataFrame:
    """1-row DF of the study-area moments: bbox, n (ALL bbox cells,
    empties included), mean and population std of x over the n cells."""
    return cells.agg(
        F.min("ix").alias("ix0"), F.max("ix").alias("ix1"),
        F.min("iy").alias("iy0"), F.max("iy").alias("iy1"),
        F.sum("x").alias("sx"), F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        "ix0", "ix1", "iy0", "iy1", "sx", "sxx",
        ((F.col("ix1") - F.col("ix0") + 1) *
         (F.col("iy1") - F.col("iy0") + 1)).cast("double").alias("n"))


def _neighbor_sums(cells: DataFrame, include_self: bool) -> DataFrame:
    """(ix, iy) -> sum of x over the queen neighborhood, via exploding
    each occupied cell's contribution to its 8 (or 9) surrounding
    targets and re-aggregating on the target key."""
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if include_self or (dx, dy) != (0, 0)]
    contrib = cells.select(
        F.explode(F.array(*[
            F.struct((F.col("ix") + dx).alias("jx"), (F.col("iy") + dy).alias("jy"))
            for dx, dy in offs])).alias("t"),
        "x").select(F.col("t.jx").alias("ix"), F.col("t.jy").alias("iy"), "x")
    return contrib.groupBy("ix", "iy").agg(F.sum("x").alias("nsum"))


def _wi(include_self: bool):
    """Clipped neighborhood size at the bbox border, closed form."""
    spanx = (F.least(F.col("ix") + 1, F.col("ix1"))
             - F.greatest(F.col("ix") - 1, F.col("ix0")) + 1)
    spany = (F.least(F.col("iy") + 1, F.col("iy1"))
             - F.greatest(F.col("iy") - 1, F.col("iy0")) + 1)
    w = (spanx * spany).cast("double")
    return w if include_self else w - F.lit(1.0)


def getis_ord_gi(points: DataFrame, *, lon: str = "lon", lat: str = "lat",
                 res: int = 11, value_col: str | None = None,
                 star: bool = True) -> DataFrame:
    """Per-cell Getis-Ord Gi* (star=True, self included) or Gi z-score:

        z_i = (S_i - xbar * W_i) / (s * sqrt((n*W_i - W_i^2) / (n-1)))

    with S_i the neighborhood sum, W_i the (border-clipped) neighborhood
    size, and xbar / s the mean / population std over ALL n bbox cells.
    Returns one row per OCCUPIED cell: (cell, ix, iy, x, nsum, wi, gi_z)
    — empty cells have x=0 and only matter through the global moments,
    which include them in closed form.
    """
    cells = cell_stats(points, lon=lon, lat=lat, res=res, value_col=value_col)
    nsums = _neighbor_sums(cells, include_self=star)
    g = _global_moments(cells)
    j = (cells.join(nsums, on=["ix", "iy"], how="left")
         .withColumn("nsum", F.coalesce("nsum", F.lit(0.0)))
         .crossJoin(F.broadcast(g)))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    xbar = sx / n
    s = F.sqrt(sxx / n - xbar * xbar)
    wi = _wi(include_self=star)
    denom = s * F.sqrt((n * wi - wi * wi) / (n - F.lit(1.0)))
    return j.select(
        "cell", "ix", "iy", "x", "nsum", wi.alias("wi"),
        ((F.col("nsum") - xbar * wi) / denom).alias("gi_z"))


def local_moran(points: DataFrame, *, lon: str = "lon", lat: str = "lat",
                res: int = 11, value_col: str | None = None) -> DataFrame:
    """Local Moran's I (Anselin 1995 LISA — the per-cell statistic
    behind GeoDa / ArcGIS "Cluster and Outlier Analysis") over the bbox
    grid with queen weights, empties included as x = 0:

        I_i = (z_i / m2) * sum_{j != i} w_ij z_j

    with z_i = x_i - xbar, m2 the population variance over ALL n bbox
    cells, and the spatial lag expanded so every term is a sum over
    OCCUPIED cells plus closed-form bbox totals:

        lag_i = nsum_i - W'_i * xbar      (nsum = occupied neighbor sum,
                                           W'_i = clipped queen degree)

    `quadrant` classifies the Moran-scatterplot quadrant from the signs
    of z_i and lag_i: HH (high surrounded by high), LL, HL (high
    outlier in low field), LH; ZZ when either is exactly zero.
    Significance is permutation-based in the source tools and is out of
    scope here — rank/threshold I_i downstream instead.

    Same plan shape as :func:`getis_ord_gi` (one cell groupBy, one
    9-offset explode + re-aggregate, broadcast 1-row moments): one data
    shuffle total, everything after is O(occupied cells). Returns one
    row per OCCUPIED cell:
    (cell, ix, iy, x, nsum, wi, local_i, quadrant).
    """
    cells = cell_stats(points, lon=lon, lat=lat, res=res, value_col=value_col)
    nsums = _neighbor_sums(cells, include_self=False)
    g = _global_moments(cells)
    j = (cells.join(nsums, on=["ix", "iy"], how="left")
         .withColumn("nsum", F.coalesce("nsum", F.lit(0.0)))
         .crossJoin(F.broadcast(g)))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    xbar = sx / n
    m2 = sxx / n - xbar * xbar
    wi = _wi(include_self=False)
    z = F.col("x") - xbar
    lag = F.col("nsum") - wi * xbar
    quad = (F.when((z > 0) & (lag > 0), F.lit("HH"))
            .when((z < 0) & (lag < 0), F.lit("LL"))
            .when((z > 0) & (lag < 0), F.lit("HL"))
            .when((z < 0) & (lag > 0), F.lit("LH"))
            .otherwise(F.lit("ZZ")))
    return j.select(
        "cell", "ix", "iy", "x", "nsum", wi.alias("wi"),
        (z * lag / m2).alias("local_i"), quad.alias("quadrant"))


def kde_density(points: DataFrame, *, lon: str = "lon", lat: str = "lat",
                res: int = 11, radius: float, kernel: str = "quartic",
                value_col: str | None = None,
                quantize_decimals: int | None = None) -> DataFrame:
    """Kernel density estimation onto the cell grid — the heatmap
    raster (ArcGIS "Kernel Density" / QGIS heatmap semantics, quartic
    kernel by default):

        density(c) = sum over points with d = dist(point, center(c))
                     < radius of  w_p * K(d) * 3 / (pi * radius^2)

    with K quartic (1 - (d/r)^2)^2, gaussian exp(-d^2 / (2 (r/3)^2)),
    or uniform 1. Distances are planar in coordinate units (degrees on
    the driver tables; reproject for metric radii). w_p = 1 or
    `value_col`.

    Plan: each point explodes to the grid cells whose CENTER lies in
    its radius box — sequence() bounds in pure arithmetic, fan-out
    ((2r/cell_w)+2)((2r/cell_h)+2) per point, bounded by the caller's
    res/radius choice — then ONE groupBy(cell) sums contributions.
    Whole-stage codegen end to end; at 10^12 points this is a map +
    bounded flat-map + one shuffle on the cell key.

    quantize_decimals: when set, each contribution is rounded to that
    many decimals (exact integer arithmetic) before summation, making
    the result independent of partitioning / summation order —
    bit-reproducible across runs and mirrorable in ANSI SQL. None
    keeps raw double sums (last-ulp run-to-run variation possible, as
    with any distributed float sum).

    Returns one row per cell with >=1 in-radius point:
    (cell, ix, iy, cx, cy, density).
    """
    import math

    n = 1 << res
    wx, wy = 360.0 / n, 180.0 / n
    r = float(radius)
    fan = (2 * r / wx + 2) * (2 * r / wy + 2)
    if fan > 250_000:
        raise ValueError(
            f"radius {r} at res {res} explodes each point to ~{fan:.0f} "
            "cells; lower res or radius (bounded fan-out is the scale "
            "contract of this operator)")
    x, y = F.col(lon), F.col(lat)
    jx0 = F.floor((x - r + 180.0) / 360.0 * n).cast("long")
    jx1 = F.floor((x + r + 180.0) / 360.0 * n).cast("long")
    jy0 = F.floor((y - r + 90.0) / 180.0 * n).cast("long")
    jy1 = F.floor((y + r + 90.0) / 180.0 * n).cast("long")
    w = F.lit(1.0) if value_col is None else F.col(value_col).cast("double")
    base = points.select(x.alias("__x"), y.alias("__y"), w.alias("__w"),
                         jx0.alias("__jx0"), jx1.alias("__jx1"),
                         jy0.alias("__jy0"), jy1.alias("__jy1"))
    # two explodes cannot nest in one expression: two withColumns
    g = (base
         .withColumn("ix", F.explode(F.sequence("__jx0", "__jx1")))
         .withColumn("iy", F.explode(F.sequence("__jy0", "__jy1")))
         .where((F.col("ix") >= 0) & (F.col("ix") < n)
                & (F.col("iy") >= 0) & (F.col("iy") < n)))
    cx = F.lit(-180.0) + (F.col("ix") + F.lit(0.5)) * F.lit(wx)
    cy = F.lit(-90.0) + (F.col("iy") + F.lit(0.5)) * F.lit(wy)
    dx, dy = F.col("__x") - cx, F.col("__y") - cy
    d2 = dx * dx + dy * dy
    r2 = F.lit(r * r)
    if kernel == "quartic":
        k = (F.lit(1.0) - d2 / r2) * (F.lit(1.0) - d2 / r2)
    elif kernel == "gaussian":
        sig2 = F.lit((r / 3.0) * (r / 3.0))
        k = F.exp(-d2 / (F.lit(2.0) * sig2))
    elif kernel == "uniform":
        k = F.lit(1.0)
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    contrib = F.col("__w") * k * F.lit(3.0 / (math.pi * r * r))
    g = g.where(d2 < r2)
    if quantize_decimals is not None:
        s = F.lit(float(10 ** quantize_decimals))
        dens = (F.sum(F.floor(contrib * s + F.lit(0.5)).cast("long"))
                .cast("double") / s)
    else:
        dens = F.sum(contrib)
    cell = (F.lit(res).cast("long") * F.lit(1 << RES_SHIFT)
            + F.col("ix") * F.lit(1 << IX_SHIFT) + F.col("iy"))
    return (g.groupBy("ix", "iy").agg(dens.alias("density"))
            .select(cell.alias("cell"), "ix", "iy",
                    cx.alias("cx"), cy.alias("cy"), "density"))


def mann_kendall_trend(points: DataFrame, *, ts_col: str = "ts",
                       lon: str = "lon", lat: str = "lat",
                       res: int = 11, n_bins: int = 12,
                       z_crit: float = 1.959964) -> DataFrame:
    """Space-time trend per cell — the Mann-Kendall test + Sen's slope
    that powers ArcGIS "Emerging Hot Spot Analysis" (reference scope:
    the per-cell temporal statistics; the Gi*-per-slice overlay can be
    composed with :func:`getis_ord_gi` per bin).

    Events are bucketed into `n_bins` equal time slices of the table's
    [min ts, max ts] span with pure integer arithmetic
    (``(ep - mn) * n_bins div (mx - mn + 1)``), counted per (cell, bin)
    and densified so every occupied cell carries all `n_bins` values
    (empty slices = 0). Then per cell:

        S     = sum over bin pairs t1 < t2 of sign(x_t2 - x_t1)
        VarS  = (T(T-1)(2T+5) - sum_ties t(t-1)(2t+5)) / 18
        z     = (S-1)/sqrt(VarS) if S>0, (S+1)/sqrt(VarS) if S<0, else 0
        sen   = median of pairwise slopes (x_t2-x_t1)/(t2-t1)

    Everything except the final float z / sen is exact integer
    arithmetic. ``var18`` is 18*VarS (exact). `sen` is additionally
    returned LCM-scaled (``sen_scaled = sen * lcm(1..n_bins-1)``) —
    every pairwise slope times the LCM is an exact integer, so the
    median is exact to the half-integer and 2*sen_scaled is a
    partitioning-independent integer: gate on that, not the float.

    Plan: one groupBy on (cell, bin) collapses the point volume to
    O(cells * n_bins); the densify, T^2/2 pair self-join (fan-out
    n_bins^2 per cell, cell-partitioned), tie groupBy and median are
    all over that tiny table. One data-sized shuffle total.

    Returns one row per occupied cell: (cell, ix, iy, n_events, s,
    var18, mk_z, sen_scaled2, trend) with trend in
    {increasing, decreasing, no_trend} at the two-sided `z_crit`.
    """
    import math

    T = int(n_bins)
    lcm = math.lcm(*range(1, T)) if T > 1 else 1
    ep = F.unix_timestamp(F.col(ts_col)).alias("ep")
    cell = cell_column(F.col(lon), F.col(lat), res)
    base = points.select(cell.alias("cell"), ep)
    m = base.agg(F.min("ep").alias("mn"), F.max("ep").alias("mx"))
    binned = (base.crossJoin(F.broadcast(m))
              .withColumn("bin", F.expr(f"(ep - mn) * {T} div (mx - mn + 1)")))
    cnt = binned.groupBy("cell", "bin").agg(F.count("*").alias("x"))
    cells = cnt.groupBy("cell").agg(F.sum("x").alias("n_events"))
    dense = (cells.select("cell", F.explode(F.sequence(
                 F.lit(0).cast("long"), F.lit(T - 1).cast("long"))).alias("bin"))
             .join(cnt, on=["cell", "bin"], how="left")
             .withColumn("x", F.coalesce("x", F.lit(0).cast("long"))))
    a = dense.select("cell", F.col("bin").alias("b1"), F.col("x").alias("x1"))
    b = dense.select("cell", F.col("bin").alias("b2"), F.col("x").alias("x2"))
    pairs = a.join(b, on="cell").where(F.col("b2") > F.col("b1"))
    sgn = (F.when(F.col("x2") > F.col("x1"), 1)
           .when(F.col("x2") < F.col("x1"), -1).otherwise(0))
    slope_scaled = ((F.col("x2") - F.col("x1")) * F.lit(lcm)
                    / (F.col("b2") - F.col("b1"))).cast("long")
    pr = pairs.groupBy("cell").agg(
        F.sum(sgn).alias("s"),
        F.median(slope_scaled.cast("double")).alias("sen_scaled"))
    t = (dense.groupBy("cell", "x").agg(F.count("*").alias("t"))
         .groupBy("cell").agg(
             F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
             .alias("tie_sum")))
    var18 = (F.lit(T * (T - 1) * (2 * T + 5)) - F.col("tie_sum")).alias("var18")
    j = (cells.join(pr, on="cell").join(t, on="cell")
         .select("cell", "n_events", "s", var18, "sen_scaled"))
    sd = F.sqrt(F.col("var18") / F.lit(18.0))
    z = (F.when(F.col("var18") == 0, F.lit(0.0))
         .when(F.col("s") > 0, (F.col("s") - 1) / sd)
         .when(F.col("s") < 0, (F.col("s") + 1) / sd)
         .otherwise(F.lit(0.0)))
    trend = (F.when(z > z_crit, F.lit("increasing"))
             .when(z < -z_crit, F.lit("decreasing"))
             .otherwise(F.lit("no_trend")))
    return j.select(
        "cell",
        F.shiftright("cell", IX_SHIFT).bitwiseAND(F.lit(_IX_MASK)).alias("ix"),
        F.col("cell").bitwiseAND(F.lit(_IY_MASK)).alias("iy"),
        "n_events", "s", "var18", z.alias("mk_z"),
        F.floor(F.lit(2.0) * F.col("sen_scaled") + F.lit(0.5)).cast("long")
        .alias("sen_scaled2"),
        trend.alias("trend"))


def moran_i(points: DataFrame, *, lon: str = "lon", lat: str = "lat",
            res: int = 11, value_col: str | None = None) -> DataFrame:
    """Global Moran's I over the bbox grid with (row-unstandardized)
    queen weights, empties included as x=0:

        I = (n / W) * sum_ij w_ij (x_i - xbar)(x_j - xbar)
                    / sum_i (x_i - xbar)^2

    Expanded so every term is a sum over OCCUPIED cells plus closed-form
    bbox totals:
      num_raw = sum_i x_i * L_i             (L_i = neighbor sum, no self)
      cross   = sum_i x_i * W'_i            (W'_i = clipped degree)
      W       = total queen edge-endpoints in an R x C grid
              = 2*(R*(C-1) + C*(R-1) + 2*(R-1)*(C-1))
      num     = num_raw - xbar*(2*cross) + xbar^2 * W
      den     = sxx - n*xbar^2
    Returns 1 row: (n_cells, w_sum, moran_i).
    """
    cells = cell_stats(points, lon=lon, lat=lat, res=res, value_col=value_col)
    nsums = _neighbor_sums(cells, include_self=False)
    g = _global_moments(cells)
    j = (cells.join(nsums, on=["ix", "iy"], how="left")
         .withColumn("nsum", F.coalesce("nsum", F.lit(0.0)))
         .crossJoin(F.broadcast(g)))
    wi = _wi(include_self=False)
    agg = j.agg(
        F.sum(F.col("x") * F.col("nsum")).alias("num_raw"),
        F.sum(F.col("x") * wi).alias("cross"),
        F.first("n").alias("n"), F.first("sx").alias("sx"),
        F.first("sxx").alias("sxx"),
        F.first(F.col("ix1") - F.col("ix0") + 1).alias("R"),
        F.first(F.col("iy1") - F.col("iy0") + 1).alias("C"))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    R, C = F.col("R").cast("double"), F.col("C").cast("double")
    xbar = sx / n
    w_sum = F.lit(2.0) * (R * (C - 1) + C * (R - 1) + F.lit(2.0) * (R - 1) * (C - 1))
    num = F.col("num_raw") - xbar * F.lit(2.0) * F.col("cross") + xbar * xbar * w_sum
    den = sxx - n * xbar * xbar
    return agg.select(
        n.cast("long").alias("n_cells"),
        w_sum.alias("w_sum"),
        ((n / w_sum) * (num / den)).alias("moran_i"))


def emerging_hotspots(points: DataFrame, *, ts_col: str = "ts",
                      lon: str = "lon", lat: str = "lat",
                      res: int = 11, n_bins: int = 12,
                      z_crit: float = 1.959964) -> DataFrame:
    """Emerging hot spot classification — the composition ArcGIS ships
    as "Emerging Hot Spot Analysis", built from the two mirrored pieces
    this module already provides: per-cell Getis-Ord Gi* over all time
    (spatial heat) joined with the Mann-Kendall trend of the per-bin
    counts (temporal direction). Simplified 9-way taxonomy (this is NOT
    the 17-category ArcGIS legend, which needs per-slice Gi*):

        heat (hot / cold / neutral at ±z_crit) × trend
          hot, increasing   -> intensifying-hot
          hot, no_trend     -> persistent-hot
          hot, decreasing   -> diminishing-hot
          cold, decreasing  -> intensifying-cold
          cold, no_trend    -> persistent-cold
          cold, increasing  -> diminishing-cold
          neutral, increasing -> emerging
          neutral, decreasing -> receding
          else              -> none

    Plan: both inputs collapse the point volume to O(occupied cells)
    with one data shuffle each, and the classification join is on the
    tiny cell table — nothing here grows with row count except the two
    initial groupBys. Returns one row per occupied cell:
    (cell, ix, iy, x, gi_z, mk_z, trend, category)."""
    gi = getis_ord_gi(points, lon=lon, lat=lat, res=res)
    mk = mann_kendall_trend(points, ts_col=ts_col, lon=lon, lat=lat,
                            res=res, n_bins=n_bins, z_crit=z_crit)
    j = gi.join(mk.select("cell", "n_events", "mk_z", "trend"), on="cell")
    heat = (F.when(F.col("gi_z") > z_crit, F.lit("hot"))
            .when(F.col("gi_z") < -z_crit, F.lit("cold"))
            .otherwise(F.lit("neutral")))
    j = j.withColumn("__heat", heat)
    cat = (F.when((F.col("__heat") == "hot") & (F.col("trend") == "increasing"),
                  F.lit("intensifying-hot"))
           .when((F.col("__heat") == "hot") & (F.col("trend") == "no_trend"),
                 F.lit("persistent-hot"))
           .when((F.col("__heat") == "hot") & (F.col("trend") == "decreasing"),
                 F.lit("diminishing-hot"))
           .when((F.col("__heat") == "cold") & (F.col("trend") == "decreasing"),
                 F.lit("intensifying-cold"))
           .when((F.col("__heat") == "cold") & (F.col("trend") == "no_trend"),
                 F.lit("persistent-cold"))
           .when((F.col("__heat") == "cold") & (F.col("trend") == "increasing"),
                 F.lit("diminishing-cold"))
           .when((F.col("__heat") == "neutral") & (F.col("trend") == "increasing"),
                 F.lit("emerging"))
           .when((F.col("__heat") == "neutral") & (F.col("trend") == "decreasing"),
                 F.lit("receding"))
           .otherwise(F.lit("none")))
    return j.select("cell", "ix", "iy", "x", "gi_z", "mk_z", "trend",
                    cat.alias("category"))


def line_density(segments: DataFrame, *, x0: str = "x0", y0: str = "y0",
                 x1: str = "x1", y1: str = "y1",
                 cell_size: float, weight: str | None = None,
                 quantize_decimals: int | None = None,
                 max_cells_per_segment: int = 4096,
                 per_area: bool = False) -> DataFrame:
    """Line density onto a square grid (ArcGIS "Line Density" / QGIS
    v.kernel.rast line mode semantics, box kernel): per cell, the total
    length of the input segments CLIPPED to that cell (optionally
    weighted, optionally divided by the cell area).

    Exact parametric clipping in pure codegen: for segment P0→P1 and
    cell (cx, cy) the inside-interval along t is

        [tlo, thi] = [max(tx_lo, ty_lo, 0), min(tx_hi, ty_hi, 1)]

    with tx_* the crossings of the two vertical cell walls ((cx·s −
    x0)/dx, ((cx+1)·s − x0)/dx, ordered; the full [0,1] when dx = 0 —
    the bbox explode already guarantees x0 lies in the cell column
    then), and the clipped length max(thi − tlo, 0) · |P1 − P0|.

    Plan: each segment explodes to its bbox cells via sequence()
    (fan-out bounded by the segment-length/cell-size ratio — raise
    ``max_cells_per_segment`` guard for long diagonals rather than
    silently flooding), then ONE groupBy(cell) sums. Whole-stage
    codegen end to end; one shuffle on the cell key — the same 100 TB
    shape as kde_density. ``quantize_decimals`` rounds each (segment,
    cell) contribution to exact integer units before the sum, making
    the result partition-order independent and SQL-mirrorable.

    Returns (cx, cy, density) — density in length units (divided by
    s² when per_area)."""
    s = float(cell_size)
    ax0, ay0 = F.col(x0), F.col(y0)
    ax1, ay1 = F.col(x1), F.col(y1)
    w = F.col(weight) if weight else F.lit(1.0)
    cxmin = F.floor(F.least(ax0, ax1) / s).cast("long")
    cxmax = F.floor(F.greatest(ax0, ax1) / s).cast("long")
    cymin = F.floor(F.least(ay0, ay1) / s).cast("long")
    cymax = F.floor(F.greatest(ay0, ay1) / s).cast("long")
    guard = (cxmax - cxmin + 1) * (cymax - cymin + 1)
    base = (segments
            .select(ax0.alias("__x0"), ay0.alias("__y0"),
                    ax1.alias("__x1"), ay1.alias("__y1"), w.alias("__w"),
                    cxmin.alias("__cx0"), cxmax.alias("__cx1"),
                    cymin.alias("__cy0"), cymax.alias("__cy1"),
                    guard.alias("__fan")))
    n_bad = base.where(F.col("__fan") > max_cells_per_segment).limit(1).count()
    if n_bad:
        raise ValueError(
            f"a segment spans more than {max_cells_per_segment} grid "
            "cells; raise max_cells_per_segment or use a coarser grid "
            "(bounded fan-out is the scale contract)")
    e = (base
         .withColumn("cx", F.explode(F.sequence("__cx0", "__cx1")))
         .withColumn("cy", F.explode(F.sequence("__cy0", "__cy1"))))
    dx = F.col("__x1") - F.col("__x0")
    dy = F.col("__y1") - F.col("__y0")
    cxs = F.col("cx").cast("double") * s
    cys = F.col("cy").cast("double") * s
    txa = (cxs - F.col("__x0")) / dx
    txb = (cxs + F.lit(s) - F.col("__x0")) / dx
    tya = (cys - F.col("__y0")) / dy
    tyb = (cys + F.lit(s) - F.col("__y0")) / dy
    txlo = F.when(dx == 0.0, F.lit(0.0)).otherwise(F.least(txa, txb))
    txhi = F.when(dx == 0.0, F.lit(1.0)).otherwise(F.greatest(txa, txb))
    tylo = F.when(dy == 0.0, F.lit(0.0)).otherwise(F.least(tya, tyb))
    tyhi = F.when(dy == 0.0, F.lit(1.0)).otherwise(F.greatest(tya, tyb))
    tlo = F.greatest(txlo, tylo, F.lit(0.0))
    thi = F.least(txhi, tyhi, F.lit(1.0))
    seglen = F.sqrt(dx * dx + dy * dy)
    contrib = F.greatest(thi - tlo, F.lit(0.0)) * seglen * F.col("__w")
    if quantize_decimals is not None:
        q = float(10 ** quantize_decimals)
        qsum = F.sum(F.floor(contrib * q + F.lit(0.5)).cast("long"))
        dens = qsum.cast("double") / q
    else:
        dens = F.sum(contrib)
    if per_area:
        dens = dens / F.lit(s * s)
    out = e.groupBy("cx", "cy").agg(dens.alias("density"))
    return out.where(F.col("density") > 0.0)


def geary_c(points: DataFrame, *, lon: str = "lon", lat: str = "lat",
            res: int = 11, value_col: str | None = None) -> DataFrame:
    """Global Geary's C over the bbox grid (queen weights, empties as
    x=0) — the difference-based sibling of Moran's I (C < 1 clustered,
    C > 1 dispersed):

        C = (n-1)/(2W) * sum_ij w_ij (x_i - x_j)^2 / sum_i (x_i - xbar)^2

    The ordered double sum collapses to occupied-cell sums exactly:
    sum_ij w_ij (x_i-x_j)^2 = 2*sum_i deg_i x_i^2 - 2*sum_i x_i L_i
    (deg_i = clipped queen degree, L_i = neighbor value sum; empty
    cells contribute zero to both). Returns 1 row: (n_cells, w_sum,
    geary_c)."""
    cells = cell_stats(points, lon=lon, lat=lat, res=res,
                       value_col=value_col)
    nsums = _neighbor_sums(cells, include_self=False)
    g = _global_moments(cells)
    j = (cells.join(nsums, on=["ix", "iy"], how="left")
         .withColumn("nsum", F.coalesce("nsum", F.lit(0.0)))
         .crossJoin(F.broadcast(g)))
    wi = _wi(include_self=False)
    agg = j.agg(
        F.sum(F.col("x") * F.col("nsum")).alias("num_raw"),
        F.sum(F.col("x") * F.col("x") * wi).alias("sq_cross"),
        F.first("n").alias("n"), F.first("sx").alias("sx"),
        F.first("sxx").alias("sxx"),
        F.first(F.col("ix1") - F.col("ix0") + 1).alias("R"),
        F.first(F.col("iy1") - F.col("iy0") + 1).alias("C"))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    R, C = F.col("R").cast("double"), F.col("C").cast("double")
    xbar = sx / n
    w_sum = F.lit(2.0) * (R * (C - 1) + C * (R - 1)
                          + F.lit(2.0) * (R - 1) * (C - 1))
    num = F.lit(2.0) * (F.col("sq_cross") - F.col("num_raw"))
    den = sxx - n * xbar * xbar
    return agg.select(
        n.cast("long").alias("n_cells"), w_sum.alias("w_sum"),
        (((n - 1) * num) / (F.lit(2.0) * w_sum * den)).alias("geary_c"))


def general_g(points: DataFrame, *, lon: str = "lon", lat: str = "lat",
              res: int = 11, value_col: str | None = None) -> DataFrame:
    """Getis-Ord General G (global high/low clustering; x must be
    non-negative — counts are):

        G = sum_ij w_ij x_i x_j / sum_{i != j} x_i x_j
          = sum_i x_i L_i / (sx^2 - sxx)

    Empties contribute zero to every term. Returns 1 row: (n_cells,
    w_sum, general_g)."""
    cells = cell_stats(points, lon=lon, lat=lat, res=res,
                       value_col=value_col)
    nsums = _neighbor_sums(cells, include_self=False)
    g = _global_moments(cells)
    j = (cells.join(nsums, on=["ix", "iy"], how="left")
         .withColumn("nsum", F.coalesce("nsum", F.lit(0.0)))
         .crossJoin(F.broadcast(g)))
    agg = j.agg(
        F.sum(F.col("x") * F.col("nsum")).alias("num_raw"),
        F.first("n").alias("n"), F.first("sx").alias("sx"),
        F.first("sxx").alias("sxx"),
        F.first(F.col("ix1") - F.col("ix0") + 1).alias("R"),
        F.first(F.col("iy1") - F.col("iy0") + 1).alias("C"))
    R, C = F.col("R").cast("double"), F.col("C").cast("double")
    w_sum = F.lit(2.0) * (R * (C - 1) + C * (R - 1)
                          + F.lit(2.0) * (R - 1) * (C - 1))
    return agg.select(
        F.col("n").cast("long").alias("n_cells"), w_sum.alias("w_sum"),
        (F.col("num_raw")
         / (F.col("sx") * F.col("sx") - F.col("sxx"))).alias("general_g"))


def join_counts(points: DataFrame, *, lon: str = "lon", lat: str = "lat",
                res: int = 11) -> DataFrame:
    """Binary join-count statistics over the bbox grid: black cells =
    occupied, white = empty. Counts the unordered queen adjacencies by
    color — the categorical-data autocorrelation test (BB ≫ expected ⇒
    occupied cells clump):

        BB = black-black joins,  BW = black-white,  WW = white-white
        BB + BW + WW = W/2 (all joins)

    All outputs exact integers from occupied-cell sums only:
    BB = sum_b nsum_b/2 over the occupancy indicator, BW = sum_b deg_b
    - 2 BB, WW = W/2 - BB - BW. Returns 1 row: (n_cells, n_occupied,
    n_joins, bb, bw, ww)."""
    cells = cell_stats(points, lon=lon, lat=lat, res=res)
    b = cells.select("cell", "ix", "iy", F.lit(1.0).alias("x"))
    nsums = _neighbor_sums(b, include_self=False)
    g = _global_moments(cells)
    j = (b.join(nsums, on=["ix", "iy"], how="left")
         .withColumn("nsum", F.coalesce("nsum", F.lit(0.0)))
         .crossJoin(F.broadcast(g)))
    wi = _wi(include_self=False)
    agg = j.agg(F.sum("nsum").alias("bb2"), F.sum(wi).alias("deg_b"),
                F.count("*").alias("n_occ"), F.first("n").alias("n"),
                F.first(F.col("ix1") - F.col("ix0") + 1).alias("R"),
                F.first(F.col("iy1") - F.col("iy0") + 1).alias("C"))
    R, C = F.col("R"), F.col("C")
    w_half = (R * (C - 1) + C * (R - 1) + 2 * (R - 1) * (C - 1))
    bb = (F.col("bb2") / F.lit(2.0)).cast("long")
    bw = (F.col("deg_b") - F.col("bb2")).cast("long")
    return agg.select(
        F.col("n").cast("long").alias("n_cells"),
        F.col("n_occ").cast("long").alias("n_occupied"),
        w_half.cast("long").alias("n_joins"),
        bb.alias("bb"), bw.alias("bw"),
        (w_half.cast("long") - bb - bw.cast("long")).alias("ww"))
