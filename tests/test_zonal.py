"""ZonalStatistics vs single-array pandas oracle + FIXTURES.md §6 golden
micro-case (3×3 raster, 2 zones, one no-data cell)."""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.geom import kernels as K, wkb
from gis_tools_spark.raster import codec
from gis_tools_spark.raster.zonal import (
    pixel_centers,
    pixel_surface,
    rasterize_mask,
    zonal_statistics,
)


def _oracle(ras, zones):
    out = {}
    for _, z in zones.iterrows():
        g = wkb.decode(z["geometry_wkb"])
        vals, wts, nod = [], [], 0
        for _, r in ras.iterrows():
            arr = codec.decode_raw_f32(r["bytes"], r["w"], r["h"]).astype(np.float64)
            xs, ys = pixel_centers(r["gt_x0"], r["gt_rx"], r["gt_y0"], r["gt_ry"], r["w"], r["h"])
            m = rasterize_mask(g, xs, ys)
            v = arr[m]
            nd = v == codec.NO_DATA_F32
            nod += int(nd.sum())
            vals.append(v[~nd])
            wts.append(pixel_surface(xs, ys, r["gt_rx"], r["gt_ry"])[m][~nd])
        v = np.concatenate(vals) if vals else np.array([])
        w = np.concatenate(wts) if wts else np.array([])
        if v.size:
            out[int(z["gid"])] = dict(
                n=v.size, mean=v.mean(), std=v.std(), mn=v.min(), mx=v.max(),
                s=v.sum(), nod=nod, wmean=(w * v).sum() / w.sum())
    return out


def test_zonal_matches_mosaic_oracle(spark):
    ras = fixtures.gen_rasters(2, 2, 32)
    zones = fixtures.gen_zones(8)
    oracle = _oracle(ras, zones)
    got = {r["gid"]: r.asDict() for r in zonal_statistics(
        spark.createDataFrame(ras),
        spark.createDataFrame(zones[["gid", "geometry_wkb"]])).collect()}
    assert set(got) == set(oracle)
    for gid, o in oracle.items():
        g = got[gid]
        assert g["zonal_count"] == o["n"]
        assert g["zonal_mean"] == pytest.approx(o["mean"], abs=1e-9)
        assert g["zonal_std"] == pytest.approx(o["std"], abs=1e-9)
        assert g["zonal_min"] == o["mn"] and g["zonal_max"] == o["mx"]
        assert g["zonal_sum"] == pytest.approx(o["s"], abs=1e-6)
        assert g["no_data_count"] == o["nod"]


def test_zonal_surface_weighted(spark):
    ras = fixtures.gen_rasters(2, 2, 16)
    zones = fixtures.gen_zones(6)
    oracle = _oracle(ras, zones)
    got = {r["gid"]: r.asDict() for r in zonal_statistics(
        spark.createDataFrame(ras),
        spark.createDataFrame(zones[["gid", "geometry_wkb"]]),
        surface_weighted=True).collect()}
    for gid, o in oracle.items():
        assert got[gid]["zonal_mean"] == pytest.approx(o["wmean"], abs=1e-9)


def test_zonal_golden_3x3(spark):
    """FIXTURES.md §6: 3×3 raster, one no-data, 2 zones, hand-computed."""
    vals = np.array([[1, 2, 3],
                     [4, codec.NO_DATA_F32, 6],
                     [7, 8, 9]], dtype=np.float32)
    # grid: x0=0, rx=1, y0=3, ry=1 → pixel centers x=.5/1.5/2.5, y=2.5/1.5/0.5
    ras = pd.DataFrame([("t", codec.encode_raw_f32(vals), 3, 3, "raw_f32",
                         "c", 0, 0.0, 1.0, 3.0, 1.0)],
                       columns=["image_id", "bytes", "w", "h", "fmt", "caption",
                                "phash", "gt_x0", "gt_rx", "gt_y0", "gt_ry"])
    # zone A = left 2 columns (x<2), zone B = right column (2<x<3)
    zones = pd.DataFrame({
        "gid": [1, 2],
        "geometry_wkb": [wkb.box(0, 0, 2, 3), wkb.box(2, 0, 3, 3)],
    })
    got = {r["gid"]: r.asDict() for r in zonal_statistics(
        spark.createDataFrame(ras), spark.createDataFrame(zones)).collect()}
    # zone A pixels: 1,2,4,nodata,7,8 → good = [1,2,4,7,8]
    a = np.array([1, 2, 4, 7, 8], dtype=float)
    assert got[1]["zonal_count"] == 5
    assert got[1]["zonal_mean"] == pytest.approx(a.mean())
    assert got[1]["zonal_std"] == pytest.approx(a.std())
    assert got[1]["no_data_count"] == 1
    # zone B pixels: 3,6,9
    b = np.array([3, 6, 9], dtype=float)
    assert got[2]["zonal_count"] == 3
    assert got[2]["zonal_sum"] == pytest.approx(b.sum())
    assert got[2]["zonal_min"] == 3 and got[2]["zonal_max"] == 9


def test_golden_pip_unit_square(spark):
    """FIXTURES.md §6: unit square + known points (in/out/edge/vertex/dup)."""
    from gis_tools_spark.operators.sjoin import pip_join

    zones = spark.createDataFrame(
        pd.DataFrame({"gid": [1], "geometry_wkb": [wkb.box(0, 0, 1, 1)]}))
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": [1, 2, 3, 4, 5],
        "lon": [0.5, 2.0, 0.0, 1.0, 0.5],
        "lat": [0.5, 2.0, 0.5, 1.0, 0.5],
    }))
    for strat in ("cell", "broadcast"):
        got = sorted(r["pid"] for r in pip_join(pts, zones, strategy=strat,
                                                res_min=18, res_max=20).collect())
        assert got == [1, 3, 4, 5], (strat, got)


def test_zonal_value_counts_and_majority(spark):
    """Histogram + majority/minority/variety vs a numpy brute force over
    the mosaic, including the deterministic tie-breaks."""
    from gis_tools_spark.raster.zonal import zonal_majority, zonal_value_counts

    ras = fixtures.gen_rasters(2, 2, 32)
    zones = fixtures.gen_zones(8)
    sras = spark.createDataFrame(ras)
    szon = spark.createDataFrame(zones[["gid", "geometry_wkb"]])

    # brute force per-zone value counts
    exp: dict[int, dict[float, int]] = {}
    for _, z in zones.iterrows():
        g = wkb.decode(z["geometry_wkb"])
        counts: dict[float, int] = {}
        for _, r in ras.iterrows():
            arr = codec.decode_raw_f32(r["bytes"], r["w"], r["h"]).astype(np.float64)
            xs, ys = pixel_centers(r["gt_x0"], r["gt_rx"], r["gt_y0"],
                                   r["gt_ry"], r["w"], r["h"])
            v = arr[rasterize_mask(g, xs, ys)]
            for x in np.round(v[v != codec.NO_DATA_F32], 6):
                counts[float(x)] = counts.get(float(x), 0) + 1
        if counts:
            exp[int(z["gid"])] = counts

    vc = zonal_value_counts(sras, szon).collect()
    got: dict[int, dict[float, int]] = {}
    for r in vc:
        got.setdefault(int(r["gid"]), {})[float(r["value"])] = int(r["n"])
    assert got == exp

    maj = {r["gid"]: r.asDict() for r in zonal_majority(sras, szon).collect()}
    assert set(maj) == set(exp)
    for gid, counts in exp.items():
        m = maj[gid]
        assert m["variety"] == len(counts)
        assert m["total_n"] == sum(counts.values())
        exp_maj = min(counts, key=lambda v: (-counts[v], v))
        exp_min = min(counts, key=lambda v: (counts[v], v))
        assert m["majority"] == pytest.approx(exp_maj)
        assert m["majority_n"] == counts[exp_maj]
        assert m["minority"] == pytest.approx(exp_min)
        assert m["minority_n"] == counts[exp_min]
