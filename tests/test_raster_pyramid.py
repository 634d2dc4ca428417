"""Distributed mosaic overview pyramid (raster/ops.raster_pyramid):
cross-row 2×2 tile merge + nodata-aware pooling vs a single-array numpy
oracle, both nodata modes, missing quadrants, and partitioning
invariance (the tree reduction's result cannot depend on row layout).
"""

import numpy as np
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.raster import codec
from gis_tools_spark.raster.ops import raster_pyramid

from conftest import spark  # noqa: F401

AOI = fixtures.AOI
ND = codec.NO_DATA_F32


def _global_grid(pdf, nx, ny, tile):
    g = np.zeros((ny * tile, nx * tile), np.float32)
    for r in pdf.itertuples(index=False):
        tx, ty = map(int, r.image_id.split("_")[1:])
        g[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile] = \
            codec.decode_raw_f32(r.bytes, tile, tile)
    return g


def _pool_np(g, mode):
    hh, ww = g.shape[0] // 2, g.shape[1] // 2
    b = (g.reshape(hh, 2, ww, 2).transpose(0, 2, 1, 3)
         .reshape(hh, ww, 4).astype(np.float64))
    valid = b != ND
    cnt = valid.sum(-1)
    if mode == "propagate":
        return np.where(cnt == 4, b.sum(-1) / 4.0, ND).astype(np.float32)
    s = np.where(valid, b, 0.0).sum(-1)
    return np.where(cnt > 0, s / np.maximum(cnt, 1), ND).astype(np.float32)


@pytest.mark.parametrize("mode", ["ignore", "propagate"])
def test_pyramid_matches_single_array_oracle(spark, mode):  # noqa: F811
    pdf = fixtures.gen_rasters_exact(4, 4, 64)
    ras = spark.createDataFrame(pdf)
    pyr = raster_pyramid(ras, levels=2, origin=(AOI[0], AOI[3]),
                         nodata_mode=mode).collect()
    g0 = _global_grid(pdf, 4, 4, 64)
    g1 = _pool_np(g0, mode)
    g2 = _pool_np(g1, mode)
    rows1 = [r for r in pyr if r["level"] == 1]
    rows2 = [r for r in pyr if r["level"] == 2]
    assert len(rows1) == 4 and len(rows2) == 1
    for r in rows1:
        got = codec.decode_raw_f32(r["bytes"], 64, 64)
        tx, ty = r["tile_x"], r["tile_y"]
        assert np.array_equal(got, g1[ty * 64:(ty + 1) * 64,
                                      tx * 64:(tx + 1) * 64]), (tx, ty)
        # georeferencing: level-1 pixels are 2x coarser, same origin grid
        assert abs(r["gt_rx"] - (AOI[2] - AOI[0]) / 256 * 2) < 1e-12
        assert abs(r["gt_x0"] - (AOI[0] + tx * 64 * r["gt_rx"])) < 1e-12
    got2 = codec.decode_raw_f32(rows2[0]["bytes"], 64, 64)
    assert np.array_equal(got2, g2)


def test_pyramid_missing_quadrants_and_partitioning(spark):  # noqa: F811
    pdf = fixtures.gen_rasters_exact(4, 4, 64)
    pdf = pdf[~pdf.image_id.isin(["tile_3_3", "tile_0_1"])]  # holes
    g0 = _global_grid(pdf, 4, 4, 64)
    g0[3 * 64:, 3 * 64:] = ND
    g0[64:128, :64] = ND
    for nparts in (1, 7):
        ras = spark.createDataFrame(pdf).repartition(nparts)
        pyr = raster_pyramid(ras, levels=1, origin=(AOI[0], AOI[3]),
                             nodata_mode="ignore").collect()
        assert len(pyr) == 4
        g1 = _pool_np(g0, "ignore")
        for r in pyr:
            got = codec.decode_raw_f32(r["bytes"], 64, 64)
            tx, ty = r["tile_x"], r["tile_y"]
            assert np.array_equal(got, g1[ty * 64:(ty + 1) * 64,
                                          tx * 64:(tx + 1) * 64])


def test_pyramid_rejects_bad_input(spark):  # noqa: F811
    pdf = fixtures.gen_rasters_exact(2, 2, 64)
    ras = spark.createDataFrame(pdf)
    with pytest.raises(ValueError):
        raster_pyramid(ras, levels=1, origin=(0, 0), nodata_mode="nope")
