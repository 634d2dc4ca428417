"""Getis-Ord Gi* / Moran's I vs a dense numpy grid oracle."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.cells import latlng_to_cell
from gis_tools_spark.operators.hotspot import getis_ord_gi, moran_i

RES = 9


@pytest.fixture(scope="module")
def pts_pd():
    prng = np.random.default_rng(3)
    # clustered points: a few gaussian blobs + uniform background
    blobs = [(6.2, 41.1, 0.15, 900), (8.7, 43.4, 0.25, 600), (7.5, 42.0, 0.1, 400)]
    xs, ys = [np.array([])], [np.array([])]
    for cx, cy, s, n in blobs:
        xs.append(prng.normal(cx, s, n))
        ys.append(prng.normal(cy, s, n))
    xs.append(prng.uniform(5.2, 9.8, 800))
    ys.append(prng.uniform(40.2, 44.8, 800))
    return pd.DataFrame({"lon": np.concatenate(xs), "lat": np.concatenate(ys)})


def _dense_grid(pts_pd):
    cells = latlng_to_cell(pts_pd["lon"].to_numpy(), pts_pd["lat"].to_numpy(), RES)
    ix = (cells >> 29) & ((1 << 29) - 1)
    iy = cells & ((1 << 29) - 1)
    ix0, iy0 = ix.min(), iy.min()
    R, C = ix.max() - ix0 + 1, iy.max() - iy0 + 1
    grid = np.zeros((R, C))
    np.add.at(grid, (ix - ix0, iy - iy0), 1.0)
    return grid, ix0, iy0


def _oracle_gi_star(grid):
    """Dense Gi*: literal formula over every cell, padded neighbor sum."""
    R, C = grid.shape
    n = R * C
    xbar = grid.sum() / n
    s = np.sqrt((grid ** 2).sum() / n - xbar ** 2)
    p = np.pad(grid, 1)
    nsum = sum(p[1 + dx:1 + dx + R, 1 + dy:1 + dy + C]
               for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    wi = np.ones_like(grid) * 9
    wi[0, :] -= 3; wi[-1, :] -= 3
    wi[:, 0] -= 3; wi[:, -1] -= 3
    wi[0, 0] += 1; wi[0, -1] += 1; wi[-1, 0] += 1; wi[-1, -1] += 1
    z = (nsum - xbar * wi) / (s * np.sqrt((n * wi - wi ** 2) / (n - 1)))
    return z


def _oracle_moran(grid):
    R, C = grid.shape
    n = R * C
    xbar = grid.mean()
    d = grid - xbar
    p = np.pad(d, 1)
    lag = sum(p[1 + dx:1 + dx + R, 1 + dy:1 + dy + C]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if (dx, dy) != (0, 0))
    w_sum = 2 * (R * (C - 1) + C * (R - 1) + 2 * (R - 1) * (C - 1))
    return (n / w_sum) * (d * lag).sum() / (d * d).sum(), w_sum


def test_gi_star_matches_dense_oracle(spark, pts_pd):
    grid, ix0, iy0 = _dense_grid(pts_pd)
    zs = _oracle_gi_star(grid)
    out = getis_ord_gi(spark.createDataFrame(pts_pd), res=RES).toPandas()
    assert len(out) == int((grid > 0).sum())
    got = {(r.ix - ix0, r.iy - iy0): (r.x, r.nsum, r.wi, r.gi_z)
           for r in out.itertuples()}
    for (i, j), (x, nsum, wi, gz) in got.items():
        assert x == grid[i, j]
        assert gz == pytest.approx(zs[i, j], rel=1e-9, abs=1e-12)
    # hottest oracle cell must be occupied and ranked hottest by the op
    hot = np.unravel_index(np.argmax(zs * (grid > 0)), zs.shape)
    assert max(got, key=lambda k: got[k][3]) == hot


def test_gi_without_star_excludes_self(spark, pts_pd):
    out_star = getis_ord_gi(spark.createDataFrame(pts_pd), res=RES).toPandas()
    out_gi = getis_ord_gi(spark.createDataFrame(pts_pd), res=RES,
                          star=False).toPandas()
    m = out_star.merge(out_gi, on=["ix", "iy"], suffixes=("_s", "_g"))
    assert (m["wi_s"] - m["wi_g"]).eq(1.0).all()
    assert (m["nsum_s"] - m["nsum_g"]).eq(m["x_s"]).all()


def test_moran_matches_dense_oracle(spark, pts_pd):
    grid, _, _ = _dense_grid(pts_pd)
    exp, w_sum = _oracle_moran(grid)
    out = moran_i(spark.createDataFrame(pts_pd), res=RES).toPandas()
    assert out["n_cells"].iloc[0] == grid.size
    assert out["w_sum"].iloc[0] == w_sum
    assert out["moran_i"].iloc[0] == pytest.approx(exp, rel=1e-9)
    # clustered data must be strongly positively autocorrelated
    assert out["moran_i"].iloc[0] > 0.1


def test_moran_random_is_near_zero(spark):
    prng = np.random.default_rng(12)
    pts = pd.DataFrame({"lon": prng.uniform(5, 10, 4000),
                        "lat": prng.uniform(40, 45, 4000)})
    out = moran_i(spark.createDataFrame(pts), res=10).toPandas()
    assert abs(out["moran_i"].iloc[0]) < 0.1


def test_local_moran_matches_dense_grid(spark):
    """local_moran vs a literal dense-grid numpy computation: build the
    full bbox grid (empties at 0), compute z, lag, m2, I_i and quadrant
    per occupied cell, compare exactly."""
    import numpy as np
    import pandas as pd

    from gis_tools_spark.operators.hotspot import local_moran

    rng = np.random.default_rng(7)
    npts, res = 3000, 10
    n_grid = 1 << res
    pdf = pd.DataFrame({"lon": rng.uniform(5, 6.5, npts),
                        "lat": rng.uniform(40, 41.5, npts)})
    out = local_moran(spark.createDataFrame(pdf), res=res).toPandas()

    ix = np.floor((pdf.lon + 180.0) / 360.0 * n_grid).astype(int)
    iy = np.floor((pdf.lat + 90.0) / 180.0 * n_grid).astype(int)
    ix0, ix1, iy0, iy1 = ix.min(), ix.max(), iy.min(), iy.max()
    R, C = ix1 - ix0 + 1, iy1 - iy0 + 1
    grid = np.zeros((R, C))
    np.add.at(grid, (ix - ix0, iy - iy0), 1.0)
    n = float(R * C)
    xbar = grid.sum() / n
    m2 = (grid * grid).sum() / n - xbar * xbar
    zg = grid - xbar
    lag = np.zeros_like(zg)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if (dx, dy) == (0, 0):
                continue
            src = zg[max(0, -dx):R - max(0, dx), max(0, -dy):C - max(0, dy)]
            lag[max(0, dx):R - max(0, -dx),
                max(0, dy):C - max(0, -dy)] += src
    assert len(out) == (grid > 0).sum()
    for _, rw in out.iterrows():
        gi, gj = int(rw.ix) - ix0, int(rw.iy) - iy0
        want = zg[gi, gj] * lag[gi, gj] / m2
        assert rw.local_i == pytest.approx(want, rel=1e-9, abs=1e-12)
        zq, lq = zg[gi, gj], lag[gi, gj]
        want_q = ("HH" if zq > 0 and lq > 0 else
                  "LL" if zq < 0 and lq < 0 else
                  "HL" if zq > 0 and lq < 0 else
                  "LH" if zq < 0 and lq > 0 else "ZZ")
        assert rw.quadrant == want_q


def test_mann_kendall_matches_bruteforce(spark):
    """mann_kendall_trend vs a literal per-cell python Mann-Kendall:
    same integer binning, S, tie-corrected variance, z, Sen median."""
    import math
    import statistics

    import numpy as np
    import pandas as pd

    from gis_tools_spark.operators.hotspot import mann_kendall_trend

    rng = np.random.default_rng(5)
    npts, res, T = 4000, 8, 10
    n_grid = 1 << res
    # drifting intensity so some cells genuinely trend
    tfrac = rng.uniform(0, 1, npts) ** 2
    pdf = pd.DataFrame({
        "lon": rng.uniform(5, 6, npts), "lat": rng.uniform(40, 41, npts),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta((tfrac * 86400 * 30).astype(int), unit="s")})
    out = mann_kendall_trend(spark.createDataFrame(pdf), res=res,
                             n_bins=T).toPandas()

    ep = (pdf.ts.astype("int64") // 10**9).to_numpy()
    mn, mx = ep.min(), ep.max()
    bins = (ep - mn) * T // (mx - mn + 1)
    ix = np.floor((pdf.lon + 180.0) / 360.0 * n_grid).astype(int)
    iy = np.floor((pdf.lat + 90.0) / 180.0 * n_grid).astype(int)
    lcm = math.lcm(*range(1, T))
    got = {(int(r.ix), int(r.iy)): r for _, r in out.iterrows()}
    keys = set(zip(ix, iy))
    assert set(got) == keys
    for kx, ky in keys:
        sel = (ix == kx) & (iy == ky)
        xs = np.zeros(T, dtype=int)
        np.add.at(xs, bins[sel], 1)
        s = sum(np.sign(xs[j] - xs[i])
                for i in range(T) for j in range(i + 1, T))
        slopes = [(xs[j] - xs[i]) * lcm // (j - i)
                  for i in range(T) for j in range(i + 1, T)]
        ties = pd.Series(xs).value_counts()
        tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in ties)
        var18 = T * (T - 1) * (2 * T + 5) - tie_sum
        if var18 == 0 or s == 0:
            z = 0.0
        else:
            z = (s - 1 if s > 0 else s + 1) / math.sqrt(var18 / 18.0)
        r = got[(kx, ky)]
        assert int(r.s) == s and int(r.var18) == var18
        assert r.mk_z == pytest.approx(z, rel=1e-9, abs=1e-12)
        assert int(r.sen_scaled2) == math.floor(
            2.0 * statistics.median(slopes) + 0.5)
        assert int(r.n_events) == int(sel.sum())
        want_t = ("increasing" if z > 1.959964 else
                  "decreasing" if z < -1.959964 else "no_trend")
        assert r.trend == want_t
    # tfrac**2 front-loads events, so real trends are decreasing
    assert (out.trend == "decreasing").sum() > 0


def test_kde_density_matches_bruteforce(spark):
    """kde_density vs numpy: every (point, cell-center) pair within the
    radius, quartic + gaussian kernels, weighted + unweighted."""
    import math

    import numpy as np
    import pandas as pd

    from gis_tools_spark.operators.hotspot import kde_density

    rng = np.random.default_rng(11)
    npts, res, r = 300, 10, 0.3
    n = 1 << res
    wx, wy = 360.0 / n, 180.0 / n
    pdf = pd.DataFrame({
        "lon": rng.uniform(5, 7, npts), "lat": rng.uniform(40, 42, npts),
        "wt": rng.uniform(0.5, 2.0, npts)})

    for kernel in ("quartic", "gaussian", "uniform"):
        for vc in (None, "wt"):
            out = kde_density(spark.createDataFrame(pdf), res=res, radius=r,
                              kernel=kernel, value_col=vc).toPandas()
            # brute force
            dens: dict[tuple[int, int], float] = {}
            for _, p in pdf.iterrows():
                jx0 = math.floor((p.lon - r + 180.0) / 360.0 * n)
                jx1 = math.floor((p.lon + r + 180.0) / 360.0 * n)
                jy0 = math.floor((p.lat - r + 90.0) / 180.0 * n)
                jy1 = math.floor((p.lat + r + 90.0) / 180.0 * n)
                for jx in range(jx0, jx1 + 1):
                    for jy in range(jy0, jy1 + 1):
                        cx = -180.0 + (jx + 0.5) * wx
                        cy = -90.0 + (jy + 0.5) * wy
                        d2 = (p.lon - cx) ** 2 + (p.lat - cy) ** 2
                        if d2 >= r * r:
                            continue
                        if kernel == "quartic":
                            k = (1 - d2 / (r * r)) ** 2
                        elif kernel == "gaussian":
                            k = math.exp(-d2 / (2 * (r / 3) ** 2))
                        else:
                            k = 1.0
                        wgt = 1.0 if vc is None else p.wt
                        dens[(jx, jy)] = dens.get((jx, jy), 0.0) \
                            + wgt * k * 3.0 / (math.pi * r * r)
            got = {(int(rw["ix"]), int(rw["iy"])): rw["density"]
                   for _, rw in out.iterrows()}
            assert set(got) == set(dens), kernel
            for key in dens:
                assert got[key] == pytest.approx(dens[key], rel=1e-9), kernel


def test_kde_quantized_partition_invariant(spark):
    """quantize_decimals makes the sum exact-integer: identical results
    at different partitionings."""
    import numpy as np
    import pandas as pd

    from gis_tools_spark.operators.hotspot import kde_density

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"lon": rng.uniform(5, 6, 500),
                        "lat": rng.uniform(40, 41, 500)})
    a = kde_density(spark.createDataFrame(pdf).repartition(1), res=11,
                    radius=0.1, quantize_decimals=9).toPandas()
    b = kde_density(spark.createDataFrame(pdf).repartition(16), res=11,
                    radius=0.1, quantize_decimals=9).toPandas()
    a = a.sort_values(["ix", "iy"]).reset_index(drop=True)
    b = b.sort_values(["ix", "iy"]).reset_index(drop=True)
    assert (a["density"] == b["density"]).all()
    assert len(a) > 50


def test_line_density_conservation_and_exact(spark):
    import numpy as np
    import pandas as pd
    from gis_tools_spark.operators.hotspot import line_density

    rng = np.random.default_rng(5)
    n = 300
    pdf = pd.DataFrame({
        "x0": rng.uniform(0, 10, n), "y0": rng.uniform(0, 10, n),
        "x1": rng.uniform(0, 10, n), "y1": rng.uniform(0, 10, n)})
    out = line_density(spark.createDataFrame(pdf), cell_size=1.0).toPandas()
    total = np.hypot(pdf.x1 - pdf.x0, pdf.y1 - pdf.y0).sum()
    # clipped pieces partition each segment: cell sums == total length
    assert abs(out.density.sum() - total) < 1e-6 * total
    # hand case: unit diagonal of cell (2,3) -> sqrt(2) in exactly it
    one = pd.DataFrame({"x0": [2.0], "y0": [3.0], "x1": [3.0], "y1": [4.0]})
    r = line_density(spark.createDataFrame(one), cell_size=1.0).toPandas()
    got = {(int(c.cx), int(c.cy)): c.density for c in r.itertuples()}
    assert sum(v for v in got.values()) == pytest.approx(np.sqrt(2.0))
    assert got[(2, 3)] == pytest.approx(np.sqrt(2.0))
    # axis-aligned (dy=0) segment crossing three columns
    h = pd.DataFrame({"x0": [0.5], "y0": [0.5], "x1": [2.5], "y1": [0.5]})
    r2 = line_density(spark.createDataFrame(h), cell_size=1.0).toPandas()
    got2 = {(int(c.cx), int(c.cy)): c.density for c in r2.itertuples()}
    assert got2 == {(0, 0): pytest.approx(0.5), (1, 0): pytest.approx(1.0),
                    (2, 0): pytest.approx(0.5)}


def test_line_density_fanout_guard(spark):
    import pandas as pd
    import pytest as _pt
    from gis_tools_spark.operators.hotspot import line_density

    seg = pd.DataFrame({"x0": [0.0], "y0": [0.0], "x1": [99.0], "y1": [99.0]})
    with _pt.raises(ValueError, match="grid cells"):
        line_density(spark.createDataFrame(seg), cell_size=1.0,
                     max_cells_per_segment=100)


def test_emerging_hotspots_consistent_with_components(spark):
    import numpy as np
    import pandas as pd
    from gis_tools_spark.operators.hotspot import (
        emerging_hotspots, getis_ord_gi, mann_kendall_trend)

    rng = np.random.default_rng(9)
    n = 4000
    pdf = pd.DataFrame({
        "lon": np.concatenate([rng.normal(5.0, 0.3, n // 2),
                               rng.uniform(0, 10, n // 2)]),
        "lat": np.concatenate([rng.normal(45.0, 0.3, n // 2),
                               rng.uniform(40, 50, n // 2)]),
        "ts": pd.to_datetime(
            np.sort(rng.integers(1_600_000_000, 1_600_900_000, n)), unit="s"),
    })
    df = spark.createDataFrame(pdf)
    out = emerging_hotspots(df, res=8, n_bins=6).toPandas().set_index("cell")
    gi = getis_ord_gi(df, res=8).toPandas().set_index("cell")
    mk = mann_kendall_trend(df, res=8, n_bins=6).toPandas().set_index("cell")
    assert set(out.index) == set(gi.index) == set(mk.index)
    zc = 1.959964
    for cell, r in out.iterrows():
        heat = ("hot" if gi.loc[cell].gi_z > zc
                else "cold" if gi.loc[cell].gi_z < -zc else "neutral")
        trend = mk.loc[cell].trend
        expect = {
            ("hot", "increasing"): "intensifying-hot",
            ("hot", "no_trend"): "persistent-hot",
            ("hot", "decreasing"): "diminishing-hot",
            ("cold", "decreasing"): "intensifying-cold",
            ("cold", "no_trend"): "persistent-cold",
            ("cold", "increasing"): "diminishing-cold",
            ("neutral", "increasing"): "emerging",
            ("neutral", "decreasing"): "receding",
            ("neutral", "no_trend"): "none",
        }[(heat, trend)]
        assert r.category == expect, (cell, heat, trend, r.category)
    # the constructed cluster must actually produce some hot cells
    assert (out.category.str.endswith("hot")).any()
