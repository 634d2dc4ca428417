"""Tile-pyramid rollup vs numpy brute force + invariants."""

import numpy as np
import pytest

from gis_tools_spark import cells as C
from gis_tools_spark.operators.pyramid import tile_pyramid


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(3)
    n = 4000
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-89, 89, n)
    w = rng.uniform(0, 10, n).round(3)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(lon, lat, w)],
        "lon double, lat double, value double")
    return df, lon, lat, w


def test_pyramid_matches_bruteforce_every_level(pts):
    df, lon, lat, w = pts
    out = tile_pyramid(df, res_min=8, res_max=11,
                       weight_col="value").toPandas()
    for r in range(8, 12):
        cells = C.latlng_to_cell(lon, lat, r)
        want_n, want_w = {}, {}
        for c, ww in zip(cells.tolist(), w):
            want_n[c] = want_n.get(c, 0) + 1
            want_w[c] = want_w.get(c, 0.0) + ww
        lev = out[out.res == r]
        got_n = dict(zip(lev.cell.astype(int), lev.n.astype(int)))
        assert got_n == want_n, r
        got_w = dict(zip(lev.cell.astype(int), lev.wsum))
        assert all(abs(got_w[c] - want_w[c]) < 1e-6 for c in want_w), r


def test_pyramid_level_totals_invariant(pts):
    df, lon, lat, w = pts
    out = tile_pyramid(df, res_min=6, res_max=10,
                       weight_col="value").toPandas()
    for r, grp in out.groupby("res"):
        assert grp.n.sum() == len(lon), r
        assert abs(grp.wsum.sum() - w.sum()) < 1e-6, r
    # coarser levels have no more cells than finer ones
    sizes = out.groupby("res").size()
    assert list(sizes.index) == sorted(sizes.index)
    assert all(sizes.iloc[i] <= sizes.iloc[i + 1]
               for i in range(len(sizes) - 1))


def test_pyramid_plan_is_python_free(pts):
    df, *_ = pts
    plan = (tile_pyramid(df, res_min=9, res_max=11)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
