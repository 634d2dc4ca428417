"""Geostatistics: distributed empirical variogram + ordinary kriging.

The classic two-step geostatistical interpolation workflow (Matheron;
the ArcGIS "Geostatistical Analyst" / gstat / pykrige surface):

1. ``empirical_variogram`` — the experimental semivariogram
   γ̂(h) = 1/(2 N(h)) Σ (z_i − z_j)² over point pairs binned by lag
   distance h. Distributed exactly like the DBSCAN pair phase: grid-bin
   at the cutoff lag, 3×3 neighbor-bin equi-join, so pair volume is
   O(n · local density), never O(n²). Coordinates and values are
   quantized to int64 BEFORE pairing, so every squared difference is an
   exact integer and the per-bin sums are partition-order independent —
   the same contract that makes kde/idw value-gateable: an ANSI-SQL
   oracle can mirror the whole expression tree (the only floats are one
   IEEE sqrt — correctly rounded everywhere — and the final divisions).

2. ``ordinary_kriging`` — moving-neighborhood OK: each query point is
   predicted from its k nearest in-radius samples by solving the
   (m+1)×(m+1) Lagrange system  [[Γ, 1], [1ᵀ, 0]] [λ; μ] = [γ; 1],
   ẑ = λᵀ z,  σ² = λᵀγ + μ.  The neighbor search is the engine's
   bounded grid join + per-query window top-k (pure codegen); only the
   tiny solves run in an Arrow-batched pandas UDF, vectorized with
   np.linalg.solve over stacked systems grouped by neighbor count.

Plan shape / 100 TB notes:
- variogram: one equi-join shuffle on the lag-cutoff bin + one
  map-side-combinable groupBy(bin) — output is n_bins rows;
- kriging: candidates = samples explode(9) on the radius bin, one
  equi-join against queries binned once, window top-k per query, one
  collect_list groupBy, then a scalar Arrow UDF whose rows carry only
  (qx, qy, neighbors) — sample attribute payloads never cross Arrow;
- moving neighborhood caps the solve at k×k regardless of corpus size
  (global kriging's O(n³) solve cannot scale; k-neighborhood OK is the
  standard production variant for exactly that reason).

Reference scope: gis-tools wraps DEM surfaces but has no geostatistics;
brief-scope (gap-filling sensor/elevation/quality surfaces at lake
scale). IDW (interpolate.py) is the deterministic-weights sibling; TIN
(triangulate.py) the exact-surface one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StructField,
                               StructType)
from pyspark.sql.window import Window

__all__ = ["empirical_variogram", "ordinary_kriging", "variogram_gamma"]


# ------------------------------------------------------------- variogram

def empirical_variogram(points: DataFrame, *, value_col: str,
                        lon: str = "lon", lat: str = "lat",
                        max_lag: float, n_bins: int = 12,
                        scale_xy: float = 1e6,
                        scale_v: float = 100.0) -> DataFrame:
    """Experimental semivariogram over all point pairs with planar
    distance < ``max_lag``. Returns one row per non-empty lag bin:
    (lag_bin, n_pairs, gamma, mean_lag), gamma in value² units,
    mean_lag in coordinate units.

    Quantization: coordinates round to 1/scale_xy, values to 1/scale_v
    — every pair contribution is exact int64, so the result is a pure
    function of the input set (and SQL-mirrorable)."""
    L = int(round(max_lag * scale_xy))          # cutoff in int units
    if L <= 0:
        raise ValueError("max_lag too small for scale_xy")
    w = L / float(n_bins)                        # lag bin width, int units
    xi = F.floor(F.col(lon) * scale_xy + 0.5).cast("long")
    yi = F.floor(F.col(lat) * scale_xy + 0.5).cast("long")
    vi = F.floor(F.col(value_col) * scale_v + 0.5).cast("long")
    b = points.select(xi.alias("xi"), yi.alias("yi"), vi.alias("vi"),
                      F.monotonically_increasing_id().alias("__rid"))
    # forward-stencil grid pair join (round-6, guide §2.3): the classic
    # 9-offset explode emits every adjacent-bin pair TWICE and dedups
    # with ra<rb after the shuffle; the 5-offset forward stencil
    # {(0,0),(1,0),(0,1),(1,1),(1,-1)} emits each cross-bin pair exactly
    # once (only the same-bin offset still needs the id tiebreak), so
    # candidate volume — and the shuffle feeding it — drops to 5/9
    bx = (F.col("xi") - F.col("xi") % L) / L
    by = (F.col("yi") - F.col("yi") % L) / L
    offs = [(0, 0), (1, 0), (0, 1), (1, 1), (1, -1)]
    left = b.select(
        F.col("xi").alias("ax"), F.col("yi").alias("ay"),
        F.col("vi").alias("av"), F.col("__rid").alias("ra"),
        F.explode(F.array(*[
            F.struct((bx.cast("long") + dx).alias("bx"),
                     (by.cast("long") + dy).alias("by"),
                     F.lit(dx == 0 and dy == 0).alias("sm"))
            for dx, dy in offs])).alias("t")
    ).select("ax", "ay", "av", "ra",
             F.col("t.bx").alias("bx"), F.col("t.by").alias("by"),
             F.col("t.sm").alias("sm"))
    right = b.select(F.col("xi").alias("cx"), F.col("yi").alias("cy"),
                     F.col("vi").alias("cv"), F.col("__rid").alias("rb"),
                     bx.cast("long").alias("bx"), by.cast("long").alias("by"))
    dx = F.col("ax") - F.col("cx")
    dy = F.col("ay") - F.col("cy")
    d2 = dx * dx + dy * dy
    dv = F.col("av") - F.col("cv")
    pairs = (left.join(right, on=["bx", "by"])
             .where((~F.col("sm") | (F.col("ra") < F.col("rb")))
                    & (d2 < F.lit(L * L).cast("long")) & (d2 > 0))
             .select(d2.alias("d2"), (dv * dv).alias("dv2")))
    lag = F.floor(F.sqrt(F.col("d2").cast("double")) / F.lit(w)).cast("int")
    out = (pairs.groupBy(lag.alias("lag_bin"))
           .agg(F.count("*").alias("n_pairs"),
                F.sum("dv2").alias("__sdv2"),
                F.sum(F.floor(F.sqrt(F.col("d2").cast("double")))
                      .cast("long")).alias("__sd")))
    return out.select(
        "lag_bin", "n_pairs",
        (F.col("__sdv2").cast("double")
         / (2.0 * F.col("n_pairs").cast("double") * scale_v * scale_v)
         ).alias("gamma"),
        (F.col("__sd").cast("double")
         / (F.col("n_pairs").cast("double") * scale_xy)).alias("mean_lag"))


# ------------------------------------------------------------- kriging

def variogram_gamma(h: np.ndarray, *, model: str, nugget: float,
                    sill: float, vrange: float) -> np.ndarray:
    """Theoretical semivariogram γ(h) for h >= 0 (γ(0) = 0 exactly)."""
    h = np.asarray(h, dtype=np.float64)
    c = sill - nugget
    if model == "spherical":
        hr = np.minimum(h / vrange, 1.0)
        g = nugget + c * (1.5 * hr - 0.5 * hr ** 3)
    elif model == "exponential":
        g = nugget + c * (1.0 - np.exp(-3.0 * h / vrange))
    elif model == "gaussian":
        g = nugget + c * (1.0 - np.exp(-3.0 * (h / vrange) ** 2))
    else:
        raise ValueError(f"unknown variogram model {model!r}")
    return np.where(h == 0.0, 0.0, g)


def _solve_ok(qx, qy, nx, ny, nv, *, model, nugget, sill, vrange):
    """Vectorized OK solves for one equal-m batch: nx/ny/nv are
    (B, m) float arrays. Returns (pred, var) length-B arrays."""
    B, m = nx.shape
    dxx = nx[:, :, None] - nx[:, None, :]
    dyy = ny[:, :, None] - ny[:, None, :]
    gij = variogram_gamma(np.sqrt(dxx * dxx + dyy * dyy), model=model,
                          nugget=nugget, sill=sill, vrange=vrange)
    a = np.empty((B, m + 1, m + 1))
    a[:, :m, :m] = gij
    a[:, m, :], a[:, :, m] = 1.0, 1.0
    a[:, m, m] = 0.0
    hq = np.sqrt((nx - qx[:, None]) ** 2 + (ny - qy[:, None]) ** 2)
    rhs = np.empty((B, m + 1))
    rhs[:, :m] = variogram_gamma(hq, model=model, nugget=nugget,
                                 sill=sill, vrange=vrange)
    rhs[:, m] = 1.0
    try:
        sol = np.linalg.solve(a, rhs[:, :, None])[:, :, 0]
    except np.linalg.LinAlgError:
        sol = np.stack([np.linalg.lstsq(a[i], rhs[i], rcond=None)[0]
                        for i in range(B)])
    lam = sol[:, :m]
    mu = sol[:, m]
    pred = (lam * nv).sum(axis=1)
    var = (lam * rhs[:, :m]).sum(axis=1) + mu
    return pred, var


def ordinary_kriging(samples: DataFrame, queries: DataFrame, *,
                     value_col: str, lon: str = "lon", lat: str = "lat",
                     query_id: str, k: int = 12, radius: float,
                     model: str = "spherical", nugget: float = 0.0,
                     sill: float = 1.0, vrange: float = 1.0) -> DataFrame:
    """Moving-neighborhood ordinary kriging: predict ``value_col`` at
    each query point from its ≤k nearest samples within ``radius``.
    Returns (query_id, lon, lat, ok_value, ok_var, n_neighbors); query
    points with zero in-radius samples are omitted.

    Deterministic: neighbor top-k ties break on (d², sample order), the
    solve is a pure function of the neighbor set."""
    r = float(radius)
    sx, sy = F.col(lon), F.col(lat)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    s = samples.select(
        sx.alias("__sx"), sy.alias("__sy"),
        F.col(value_col).cast("double").alias("__sv"),
        F.explode(F.array(*[
            F.struct((F.floor(sx / r) + dx).alias("bx"),
                     (F.floor(sy / r) + dy).alias("by"))
            for dx, dy in offs])).alias("t")
    ).select("__sx", "__sy", "__sv",
             F.col("t.bx").alias("bx"), F.col("t.by").alias("by"))
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(lon).alias("__qx"), F.col(lat).alias("__qy"),
        F.floor(F.col(lon) / r).alias("bx"),
        F.floor(F.col(lat) / r).alias("by"))
    dx = F.col("__qx") - F.col("__sx")
    dy = F.col("__qy") - F.col("__sy")
    d2 = dx * dx + dy * dy
    cand = (q.join(s, on=["bx", "by"])
            .where(d2 <= F.lit(r * r))
            .select("__qid", "__qx", "__qy", "__sx", "__sy", "__sv",
                    d2.alias("__d2")))
    wnd = Window.partitionBy("__qid").orderBy(
        F.col("__d2"), F.col("__sx"), F.col("__sy"))
    top = (cand.withColumn("__rn", F.row_number().over(wnd))
           .where(F.col("__rn") <= int(k)))
    grouped = (top.groupBy("__qid", "__qx", "__qy")
               .agg(F.collect_list(
                   F.struct(F.col("__rn"), F.col("__sx"), F.col("__sy"),
                            F.col("__sv"))).alias("__nb")))

    # carry the caller's id dtype through (string keys are common;
    # hard-coding LongType here used to fail deep inside the Arrow
    # stage with an opaque cast error — round-4 ADVICE)
    qid_type = queries.schema[query_id].dataType
    fields = StructType([
        StructField("qid", qid_type), StructField("qx", DoubleType()),
        StructField("qy", DoubleType()),
        StructField("ok_value", DoubleType()),
        StructField("ok_var", DoubleType()),
        StructField("n_neighbors", LongType())])

    kw = dict(model=model, nugget=nugget, sill=sill, vrange=vrange)

    def _krige(it):
        for pdf in it:
            if not len(pdf):
                continue
            nbs = pdf["__nb"].tolist()
            ms = np.array([len(nb) for nb in nbs])
            qx = pdf["__qx"].to_numpy(np.float64)
            qy = pdf["__qy"].to_numpy(np.float64)
            pred = np.empty(len(pdf))
            var = np.empty(len(pdf))
            for m in np.unique(ms):
                idx = np.nonzero(ms == m)[0]
                # sort each neighbor list by __rn for determinism
                def arr(field, i):
                    nb = sorted(nbs[i], key=lambda t: t["__rn"])
                    return [t[field] for t in nb]
                nx = np.array([arr("__sx", i) for i in idx])
                ny = np.array([arr("__sy", i) for i in idx])
                nv = np.array([arr("__sv", i) for i in idx])
                p, v = _solve_ok(qx[idx], qy[idx], nx, ny, nv, **kw)
                pred[idx] = p
                var[idx] = v
            yield pd.DataFrame({
                "qid": pdf["__qid"].to_numpy(),
                "qx": qx, "qy": qy, "ok_value": pred, "ok_var": var,
                "n_neighbors": ms.astype(np.int64)})

    out = grouped.mapInPandas(_krige, schema=fields)
    return out.select(F.col("qid").alias(query_id),
                      F.col("qx").alias(lon), F.col("qy").alias(lat),
                      "ok_value", "ok_var", "n_neighbors")
