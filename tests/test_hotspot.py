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
