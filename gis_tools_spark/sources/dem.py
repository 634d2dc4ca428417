"""DEM ingest operators — SRTM .hgt tiles and ENVI hdr/img pairs →
the engine's raster-tile schema, so slope/aspect/horizon/zonal run
unchanged downstream.

Reference parity: gis-tools builds DigitalElevationModel rasters from
SRTM tiles (raster.py:826-887) and GeoGrids from ENVI headers
(coordinates.py:279-300, utils/sys/reader.py:14-72). Here both are
DataFrame operators over blob tables:

* ``hgt_tiles`` — (tile_name, bytes): georeferencing comes from the
  NAME and the payload SIZE alone, so ingest touches zero pixel bytes;
  fmt='raw_i16be' lets every kernel decode lazily from the original
  payload (no re-encode shuffle weight).
* ``envi_tiles`` — (image_id, hdr text, img bytes): header parsed per
  reference semantics (pixel-center map info shifted to corner
  anchoring), pixels re-encoded float32 (ENVI carries 10 dtypes; DEM
  math downstream is float anyway).

Corrupt rows are marked (ok=false), never a task kill.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

_TILE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                "gt_x0 double, gt_rx double, gt_y0 double, gt_ry double, "
                "nodata double, ok boolean")


def hgt_tiles(df: DataFrame, name_col: str = "image_id",
              bytes_col: str = "bytes") -> DataFrame:
    """(SRTM tile name, .hgt payload) → raster tiles, zero pixel reads."""

    def _scan(it: Iterator) -> Iterator:
        import pandas as pd

        from ..raster import dem_formats as D

        for pdf in it:
            rows = []
            for name, buf in zip(pdf[name_col], pdf[bytes_col]):
                try:
                    n2 = len(buf) // 2
                    n = int(round(n2 ** 0.5))
                    if n * n * 2 != len(buf) or n < 2:
                        raise ValueError("bad hgt size")
                    m = D._HGT_RE.search(name)
                    if not m:
                        raise ValueError("bad tile name")
                    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N"
                                             else -1)
                    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E"
                                             else -1)
                    res = 1.0 / (n - 1)
                    rows.append((name, buf, n, n, "raw_i16be",
                                 lon - res / 2, res, (lat + 1) + res / 2,
                                 res, float(D.SRTM_NODATA), True))
                except Exception:  # noqa: BLE001 — mark, never kill
                    rows.append((name, buf, None, None, "raw_i16be",
                                 None, None, None, None, None, False))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "gt_x0", "gt_rx",
                "gt_y0", "gt_ry", "nodata", "ok"])

    return df.select(name_col, bytes_col).mapInPandas(_scan,
                                                      schema=_TILE_SCHEMA)


def envi_tiles(df: DataFrame, id_col: str = "image_id",
               hdr_col: str = "hdr", bytes_col: str = "bytes") -> DataFrame:
    """(id, ENVI hdr text, raw img bytes) → raster tiles (float32)."""

    def _scan(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..raster import codec
        from ..raster import dem_formats as D

        for pdf in it:
            rows = []
            for iid, hdr, buf in zip(pdf[id_col], pdf[hdr_col],
                                     pdf[bytes_col]):
                try:
                    arr, info = D.decode_envi(hdr, buf)
                    if arr.ndim == 3:
                        arr = arr.mean(axis=2)
                    a32 = arr.astype(np.float32)
                    if info["nodata"] is not None:
                        a32[arr == info["nodata"]] = codec.NO_DATA_F32
                    rows.append((iid, codec.encode_raw_f32(a32),
                                 a32.shape[1], a32.shape[0], "raw_f32",
                                 info["gt_x0"], info["gt_rx"],
                                 info["gt_y0"], info["gt_ry"],
                                 info["nodata"], True))
                except Exception:  # noqa: BLE001 — mark, never kill
                    rows.append((iid, None, None, None, "raw_f32",
                                 None, None, None, None, None, False))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "gt_x0", "gt_rx",
                "gt_y0", "gt_ry", "nodata", "ok"])

    return df.select(id_col, hdr_col, bytes_col).mapInPandas(
        _scan, schema=_TILE_SCHEMA)
