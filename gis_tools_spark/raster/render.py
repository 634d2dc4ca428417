"""Density-tile rendering — the image EGRESS of the point pipeline.

Web maps serve point density as raster tiles; this renders them
distributed: every point maps to (tile, pixel) by pure column bit
arithmetic on the same quadtree grid as ``cells`` (tile = cell at
``res``, pixel = the ``res + log2(tile_px)`` sub-cell), ONE groupBy
collapses the stream to per-pixel counts, and a per-tile Arrow stage
assembles the PNG.  Counts pack losslessly into the 24-bit RGB
channels (count = R·65536 + G·256 + B, saturating), so the tile bytes
are not a visualization approximation — decode recovers the exact
per-pixel histogram, which is what the driver gate checks end-to-end.

Scale shape: shuffle #1 is the pixel-count combine (map-side partial),
shuffle #2 moves only pre-aggregated nonzero pixels (≤ tile_px² rows
per tile, usually far fewer); a 10^12-point stream renders with no
driver involvement and no per-point Python.

Reference analog: gis-tools rasterizes layers via gdal.RasterizeLayer
(raster.py:720-738); a density tile is the count-valued special case.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import codec

_MAX24 = (1 << 24) - 1


def _ilog2(n: int) -> int:
    b = int(n).bit_length() - 1
    if n <= 0 or (1 << b) != n:
        raise ValueError(f"tile_px must be a power of two, got {n}")
    return b


def density_pixels(points: DataFrame, *, res: int, tile_px: int = 256,
                   lon: str = "lon", lat: str = "lat") -> DataFrame:
    """(tile_x, tile_y, px, py, n) per nonzero pixel — the aggregation
    half of the renderer (pure codegen + one groupBy).  py counts from
    the tile's NORTH edge (image row order)."""
    pbits = _ilog2(tile_px)
    n_t = 1 << res
    n_p = n_t << pbits
    gx = F.floor((F.col(lon) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n_p)))
    gy = F.floor((F.col(lat) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n_p)))
    gx = F.least(F.greatest(gx, F.lit(0)), F.lit(n_p - 1)).cast("long")
    gy = F.least(F.greatest(gy, F.lit(0)), F.lit(n_p - 1)).cast("long")
    return (points
            .select(F.shiftrightunsigned(gx, pbits).alias("tile_x"),
                    F.shiftrightunsigned(gy, pbits).alias("tile_y"),
                    gx.bitwiseAND(F.lit(tile_px - 1)).alias("px"),
                    (F.lit(tile_px - 1)
                     - gy.bitwiseAND(F.lit(tile_px - 1))).alias("py"))
            .groupBy("tile_x", "tile_y", "px", "py")
            .agg(F.count("*").alias("n")))


def render_density_tiles(points: DataFrame, *, res: int,
                         tile_px: int = 256, lon: str = "lon",
                         lat: str = "lat") -> DataFrame:
    """(tile_x, tile_y, n_points, n_pixels, bytes) — one lossless PNG
    per nonempty tile (see module docstring for the count packing)."""
    pix = density_pixels(points, res=res, tile_px=tile_px,
                         lon=lon, lat=lat)

    def _assemble(key, g: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        grid = np.zeros((tile_px, tile_px), dtype=np.int64)
        grid[g["py"].to_numpy(), g["px"].to_numpy()] = g["n"].to_numpy()
        clipped = np.minimum(grid, _MAX24)
        rgb = np.empty((tile_px, tile_px, 3), dtype=np.uint8)
        rgb[:, :, 0] = clipped >> 16
        rgb[:, :, 1] = (clipped >> 8) & 0xFF
        rgb[:, :, 2] = clipped & 0xFF
        return pd.DataFrame(
            [(tx, ty, int(g["n"].sum()), int(len(g)),
              codec.encode_png(rgb))],
            columns=["tile_x", "tile_y", "n_points", "n_pixels", "bytes"])

    # applyInPandas (not mapInPandas): a tile whose pixels straddle two
    # Arrow batches must still assemble into ONE image
    return pix.groupBy("tile_x", "tile_y").applyInPandas(
        _assemble, schema="tile_x long, tile_y long, n_points long, "
                          "n_pixels long, bytes binary")


def density_tile_stats(tiles: DataFrame, *,
                       bytes_col: str = "bytes") -> DataFrame:
    """Decode rendered tiles back to their exact per-pixel histogram
    summary: (tile_x, tile_y, sum_n, n_pixels, max_n).  The inverse
    proof of the 24-bit packing — used by the driver gate."""
    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for tx, ty, buf in zip(pdf["tile_x"], pdf["tile_y"],
                                   pdf[bytes_col]):
                rgb = codec.decode_png(bytes(buf)).astype(np.int64)
                n = (rgb[:, :, 0] << 16) | (rgb[:, :, 1] << 8) | rgb[:, :, 2]
                out.append((int(tx), int(ty), int(n.sum()),
                            int((n > 0).sum()), int(n.max())))
            yield pd.DataFrame(out, columns=["tile_x", "tile_y", "sum_n",
                                             "n_pixels", "max_n"])

    return tiles.select("tile_x", "tile_y", bytes_col).mapInPandas(
        _run, schema="tile_x long, tile_y long, sum_n long, "
                     "n_pixels long, max_n long")
