"""Density-tile renderer (raster/render.py) — lossless count packing
round-trip vs a numpy reference histogram."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_tools_spark.raster import codec
from gis_tools_spark.raster.render import (density_pixels,
                                           density_tile_stats,
                                           render_density_tiles)


def _ref_hist(pdf, res, tile_px):
    n_p = (1 << res) * tile_px
    gx = np.clip(np.floor((pdf["lon"].to_numpy() + 180.0) / 360.0 * n_p),
                 0, n_p - 1).astype(np.int64)
    gy = np.clip(np.floor((pdf["lat"].to_numpy() + 90.0) / 180.0 * n_p),
                 0, n_p - 1).astype(np.int64)
    out = {}
    for x, y in zip(gx, gy):
        key = (x // tile_px, y // tile_px)
        g = out.setdefault(key, np.zeros((tile_px, tile_px), np.int64))
        g[tile_px - 1 - (y % tile_px), x % tile_px] += 1
    return out


def test_roundtrip_matches_reference(spark):
    rng = np.random.RandomState(2)
    pdf = pd.DataFrame({"lon": rng.uniform(-10, 30, 4000),
                        "lat": rng.uniform(30, 60, 4000)})
    df = spark.createDataFrame(pdf)
    res, px = 5, 32
    tiles = render_density_tiles(df, res=res, tile_px=px).collect()
    ref = _ref_hist(pdf, res, px)
    assert {(r["tile_x"], r["tile_y"]) for r in tiles} == set(ref)
    for r in tiles:
        g = ref[(r["tile_x"], r["tile_y"])]
        rgb = codec.decode_png(bytes(r["bytes"])).astype(np.int64)
        dec = (rgb[:, :, 0] << 16) | (rgb[:, :, 1] << 8) | rgb[:, :, 2]
        assert np.array_equal(dec, g)
        assert r["n_points"] == g.sum()
        assert r["n_pixels"] == (g > 0).sum()


def test_stats_inverse(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({"lon": rng.uniform(5, 6, 2000),
                        "lat": rng.uniform(40, 41, 2000)})
    df = spark.createDataFrame(pdf)
    tiles = render_density_tiles(df, res=7, tile_px=64)
    st = density_tile_stats(tiles)
    j = (tiles.select("tile_x", "tile_y", "n_points",
                      F.col("n_pixels").alias("np_enc"))
         .join(st, on=["tile_x", "tile_y"]))
    bad = j.where((F.col("sum_n") != F.col("n_points"))
                  | (F.col("np_enc") != F.col("n_pixels"))).count()
    assert bad == 0
    total = st.agg(F.sum("sum_n")).head()[0]
    assert total == 2000


def test_saturation_clips_at_24bit(spark):
    # 2^24 + 10 points on ONE pixel
    n = (1 << 24) + 10
    df = spark.range(n).select(F.lit(5.00001).alias("lon"),
                               F.lit(40.00001).alias("lat"))
    tiles = render_density_tiles(df, res=3, tile_px=16)
    st = density_tile_stats(tiles).collect()
    assert len(st) == 1
    assert st[0]["max_n"] == (1 << 24) - 1     # saturated, not wrapped


def test_pixel_boundary_points(spark):
    """Points exactly on pixel/tile edges bucket by the same floor rule
    as the reference (left-closed)."""
    px, res = 16, 4
    n_p = (1 << res) * px
    step = 360.0 / n_p
    lons = [-180.0, -180.0 + step, -180.0 + 2 * step, 180.0]
    pdf = pd.DataFrame({"lon": lons, "lat": [0.0] * 4})
    df = spark.createDataFrame(pdf)
    pix = density_pixels(df, res=res, tile_px=px).collect()
    ref = _ref_hist(pdf, res, px)
    got = {(r["tile_x"], r["tile_y"], r["px"], r["py"]): r["n"]
           for r in pix}
    want = {}
    for (tx, ty), g in ref.items():
        for (py, pxx) in zip(*np.nonzero(g)):
            want[(tx, ty, int(pxx), int(py))] = int(g[py, pxx])
    assert got == want


def test_non_pow2_raises(spark):
    df = spark.range(1).select(F.lit(0.0).alias("lon"),
                               F.lit(0.0).alias("lat"))
    with pytest.raises(ValueError, match="power of two"):
        render_density_tiles(df, res=4, tile_px=48)
