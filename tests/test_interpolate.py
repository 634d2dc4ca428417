"""IDW grid interpolation vs numpy brute force."""

import math

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.operators.interpolate import idw_grid


def test_idw_matches_bruteforce(spark):
    rng = np.random.default_rng(13)
    npts, res, r = 400, 10, 0.25
    n = 1 << res
    wx, wy = 360.0 / n, 180.0 / n
    pdf = pd.DataFrame({"lon": rng.uniform(5, 6, npts),
                        "lat": rng.uniform(40, 41, npts),
                        "v": rng.uniform(-5, 20, npts)})
    for power, smooth in ((2.0, 1e-12), (3.0, 1e-9)):
        out = idw_grid(spark.createDataFrame(pdf), value_col="v", res=res,
                       radius=r, power=power, smooth=smooth).toPandas()
        num: dict = {}
        den: dict = {}
        cnt: dict = {}
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
                    w = 1.0 / (d2 ** (power / 2.0) + smooth)
                    num[(jx, jy)] = num.get((jx, jy), 0.0) + w * p.v
                    den[(jx, jy)] = den.get((jx, jy), 0.0) + w
                    cnt[(jx, jy)] = cnt.get((jx, jy), 0) + 1
        got = {(int(rw.ix), int(rw.iy)): rw for _, rw in out.iterrows()}
        assert set(got) == set(num), power
        for key in num:
            assert got[key].idw_value == pytest.approx(
                num[key] / den[key], rel=1e-9), (power, key)
            assert int(got[key].n_samples) == cnt[key]
        # interpolated values stay inside the sample range
        assert out.idw_value.between(pdf.v.min(), pdf.v.max()).all()


def test_idw_exact_hit_dominates(spark):
    """A sample sitting exactly on a cell center dominates that cell
    (weight 1/smooth), so the cell value ≈ the sample value."""
    res, n = 10, 1 << 10
    wx, wy = 360.0 / n, 180.0 / n
    cx = -180.0 + (math.floor((5.5 + 180.0) / 360.0 * n) + 0.5) * wx
    cy = -90.0 + (math.floor((40.5 + 90.0) / 180.0 * n) + 0.5) * wy
    pdf = pd.DataFrame({"lon": [cx, cx + 0.1], "lat": [cy, cy + 0.1],
                        "v": [100.0, -50.0]})
    out = idw_grid(spark.createDataFrame(pdf), value_col="v", res=res,
                   radius=0.3, smooth=1e-12).toPandas()
    hit = out[(out.cx == cx) & (out.cy == cy)]
    assert len(hit) == 1
    assert hit.idw_value.iloc[0] == pytest.approx(100.0, abs=1e-6)


def test_idw_quantized_partition_invariant(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"lon": rng.uniform(5, 6, 500),
                        "lat": rng.uniform(40, 41, 500),
                        "v": rng.uniform(0, 10, 500)})
    kw = dict(value_col="v", res=11, radius=0.1, smooth=1e-6,
              quantize_decimals=6)
    a = idw_grid(spark.createDataFrame(pdf).repartition(1), **kw).toPandas()
    b = idw_grid(spark.createDataFrame(pdf).repartition(16), **kw).toPandas()
    a = a.sort_values(["ix", "iy"]).reset_index(drop=True)
    b = b.sort_values(["ix", "iy"]).reset_index(drop=True)
    assert (a["idw_value"] == b["idw_value"]).all()
    assert len(a) > 50
