"""geary_c / general_g / join_counts vs dense brute-force references
on the full bbox grid (empties materialized, unlike the engine)."""

import numpy as np
import pandas as pd

from gis_tools_spark.operators.hotspot import (geary_c, general_g,
                                               join_counts)


def _grid_counts(pdf, res):
    n_g = 1 << res
    ix = np.clip(np.floor((pdf["lon"] + 180) / 360 * n_g), 0, n_g - 1) \
        .astype(int)
    iy = np.clip(np.floor((pdf["lat"] + 90) / 180 * n_g), 0, n_g - 1) \
        .astype(int)
    x0, x1, y0, y1 = ix.min(), ix.max(), iy.min(), iy.max()
    grid = np.zeros((x1 - x0 + 1, y1 - y0 + 1))
    for a, b in zip(ix, iy):
        grid[a - x0, b - y0] += 1
    return grid


def _brute(grid):
    R, C = grid.shape
    xbar = grid.mean()
    den = ((grid - xbar) ** 2).sum()
    num_m = num_g = w = 0.0
    gnum = 0.0
    for i in range(R):
        for j in range(C):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if di == dj == 0:
                        continue
                    a, b = i + di, j + dj
                    if 0 <= a < R and 0 <= b < C:
                        w += 1
                        num_m += (grid[i, j] - xbar) * (grid[a, b] - xbar)
                        num_g += (grid[i, j] - grid[a, b]) ** 2
                        gnum += grid[i, j] * grid[a, b]
    n = R * C
    moran = (n / w) * num_m / den
    geary = ((n - 1) / (2 * w)) * num_g / den
    sx, sxx = grid.sum(), (grid ** 2).sum()
    g = gnum / (sx * sx - sxx)
    return moran, geary, g, w


def _joins_brute(grid):
    R, C = grid.shape
    bb = bw = ww = 0
    occ = (grid > 0).astype(int)
    for i in range(R):
        for j in range(C):
            for di, dj in ((1, -1), (1, 0), (1, 1), (0, 1)):
                a, b = i + di, j + dj
                if 0 <= a < R and 0 <= b < C:
                    pair = occ[i, j] + occ[a, b]
                    if pair == 2:
                        bb += 1
                    elif pair == 1:
                        bw += 1
                    else:
                        ww += 1
    return bb, bw, ww


def test_against_bruteforce(spark):
    rng = np.random.RandomState(6)
    pdf = pd.DataFrame({"lon": 5 + rng.beta(2, 5, 1500) * 4,
                        "lat": 40 + rng.beta(5, 2, 1500) * 4})
    res = 8
    df = spark.createDataFrame(pdf)
    grid = _grid_counts(pdf, res)
    _, geary_ref, g_ref, w_ref = _brute(grid)
    c = geary_c(df, res=res).head()
    g = general_g(df, res=res).head()
    assert c["w_sum"] == w_ref and g["w_sum"] == w_ref
    assert abs(c["geary_c"] - geary_ref) < 1e-9
    assert abs(g["general_g"] - g_ref) < 1e-12
    jc = join_counts(df, res=res).head()
    bb, bw, ww = _joins_brute(grid)
    assert (jc["bb"], jc["bw"], jc["ww"]) == (bb, bw, ww)
    assert jc["bb"] + jc["bw"] + jc["ww"] == jc["n_joins"]


def test_checkerboard_extremes(spark):
    """Perfect checkerboard of occupancy: BW dominates rook joins and
    Geary's C > 1 (dispersion)."""
    res = 6
    n_g = 1 << res
    step_lon, step_lat = 360.0 / n_g, 180.0 / n_g
    rows = []
    for i in range(8):
        for j in range(8):
            if (i + j) % 2 == 0:
                rows.append((-180 + (i + 0.5) * step_lon,
                             -90 + (j + 0.5) * step_lat))
    pdf = pd.DataFrame(rows, columns=["lon", "lat"])
    df = spark.createDataFrame(pdf)
    c = geary_c(df, res=res).head()["geary_c"]
    assert c > 1.0
    jc = join_counts(df, res=res).head()
    # only diagonal joins connect same colors: 2*49 diagonals split
    # 49/49 between BB and WW (25+24 each way by parity)
    assert jc["bb"] == 49 and jc["ww"] == 49
    assert jc["bw"] == jc["n_joins"] - 98      # all rook joins are BW
    assert jc["bw"] == 2 * 8 * 7
