"""GeoTIFF ingest/egress for the raster-tile table model.

The reference opens every raster with GDAL's GeoTIFF driver and pulls
the geotransform from the file (gistools/raster.py:158-165
``gdal.Open`` → ``GetGeoTransform``/``ReadAsArray``); here the same
contract is a pair of DataFrame operators over the engine's tile
schema (image_id, bytes, w, h, fmt, gt_x0, gt_rx, gt_y0, gt_ry):

* ``geotiff_tiles`` — a table of raw GeoTIFF blobs → that schema, the
  georeferencing read from each file's TAGS ONLY (header parse, no
  pixel decompression — the ingest path of a 100 TB tile table touches
  a few hundred bytes per blob). Every downstream raster operator
  (zonal, slope, polygonize, contour…) then works unchanged because
  codec.decode dispatches fmt='geotiff'.
* ``to_geotiff`` — any raster-tile DataFrame → GeoTIFF blobs carrying
  ModelPixelScale/Tiepoint + EPSG + GDAL_NODATA, the interchange sink
  a GDAL/QGIS user reads directly.

Corrupt blobs are marked (ok=false, null metadata), never a task kill.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

_TILE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                "gt_x0 double, gt_rx double, gt_y0 double, gt_ry double, "
                "epsg int, nodata double, ok boolean")


def geotiff_tiles(df: DataFrame, id_col: str = "image_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """(id, geotiff bytes) → raster-tile schema via tags-only parse."""

    def _scan(it: Iterator) -> Iterator:
        import pandas as pd

        from ..raster import geotiff

        for pdf in it:
            rows = []
            for iid, buf in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    i = geotiff.read_info(buf)
                    rows.append((iid, buf, i["w"], i["h"], "geotiff",
                                 i["gt_x0"], i["gt_rx"], i["gt_y0"],
                                 i["gt_ry"], i["epsg"], i["nodata"],
                                 True))
                except Exception:  # noqa: BLE001 — mark, never kill
                    rows.append((iid, buf, None, None, "geotiff",
                                 None, None, None, None, None, None,
                                 False))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "gt_x0", "gt_rx",
                "gt_y0", "gt_ry", "epsg", "nodata", "ok"])

    return df.select(id_col, bytes_col).mapInPandas(_scan,
                                                    schema=_TILE_SCHEMA)


def to_geotiff(df: DataFrame, epsg: int | None = 4326,
               nodata: float | None = None,
               compression: str = "deflate") -> DataFrame:
    """Raster-tile rows (any fmt) → (image_id, bytes) GeoTIFF blobs.

    nodata defaults to the engine's float32 sentinel for float tiles
    when not given explicitly (pass nodata=... to override)."""

    def _enc(it: Iterator) -> Iterator:
        import pandas as pd

        from ..raster import codec, geotiff

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = codec.decode(r.bytes, int(r.w), int(r.h), r.fmt)
                    nd = nodata
                    if nd is None and arr.dtype.kind == "f":
                        nd = float(codec.NO_DATA_F32)
                    buf = geotiff.encode(
                        arr, gt=(r.gt_x0, r.gt_rx, r.gt_y0, r.gt_ry),
                        epsg=epsg, nodata=nd, compression=compression)
                    rows.append((r.image_id, buf, True))
                except Exception:  # noqa: BLE001 — mark, never kill
                    rows.append((r.image_id, None, False))
            yield pd.DataFrame(rows,
                               columns=["image_id", "bytes", "ok"])

    cols = ["image_id", "bytes", "w", "h", "fmt",
            "gt_x0", "gt_rx", "gt_y0", "gt_ry"]
    return df.select(*cols).mapInPandas(
        _enc, schema="image_id string, bytes binary, ok boolean")


def geotiff_window_tiles(df: DataFrame, *, bbox: tuple | None = None,
                         max_px: int | None = None,
                         window_cols: tuple | None = None,
                         id_col: str = "image_id",
                         bytes_col: str = "bytes") -> DataFrame:
    """AOI scan over a table of tiled GeoTIFF/COG blobs: each row comes
    back holding ONLY the requested window's pixels (fmt='raw_f32'),
    decoded from the tiles that intersect it — never the whole raster
    (raster/geotiff.decode_window; the reference's GDAL windowed read,
    raster.py:99-141, distributed over a blob table).

    Two addressing modes:
    * ``bbox=(xmin, ymin, xmax, ymax)`` in the rasters' CRS, with
      optional ``max_px``: each blob decodes from the FINEST overview
      IFD whose window fits the pixel budget (decode_bbox) — the
      tile-server / coarse-preview plan where a continent request
      reads overview pixels. Blobs not intersecting the bbox drop out.
    * ``window_cols=(row0, col0, nrows, ncols)`` — names of integer
      columns of ``df`` giving a per-row full-resolution pixel window
      (clipped at the raster edge).

    Multi-band rasters reduce to band 0 (the engine's raster-tile
    model is single-band float32; RGB imagery flows through the image
    kernels instead). Corrupt/non-intersecting blobs are marked
    ok=false with null payload — mark, never a task kill.
    """
    if (bbox is None) == (window_cols is None):
        raise ValueError("pass exactly one of bbox= or window_cols=")
    extra = list(window_cols) if window_cols else []

    out_schema = ("image_id string, bytes binary, w int, h int, "
                  "fmt string, gt_x0 double, gt_rx double, gt_y0 double, "
                  "gt_ry double, epsg int, nodata double, level int, "
                  "ok boolean")

    def _scan(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..raster import geotiff

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                iid = getattr(r, id_col)
                try:
                    buf = bytes(getattr(r, bytes_col))
                    if bbox is not None:
                        arr, info = geotiff.decode_bbox(buf, bbox,
                                                        max_px=max_px)
                        lvl = info["ifd"]
                    else:
                        r0, c0, nr, nc = (int(getattr(r, c))
                                          for c in window_cols)
                        arr, info = geotiff.decode_window(buf, r0, c0,
                                                          nr, nc)
                        lvl = 0
                    if arr.ndim == 3:
                        arr = arr[:, :, 0]
                    a32 = np.ascontiguousarray(arr.astype(np.float32))
                    rows.append((iid, a32.tobytes(),
                                 a32.shape[1], a32.shape[0], "raw_f32",
                                 info["gt_x0"], info["gt_rx"],
                                 info["gt_y0"], info["gt_ry"],
                                 info["epsg"], info["nodata"], lvl,
                                 True))
                except Exception:  # noqa: BLE001 — mark, never kill
                    rows.append((iid, None, None, None, "raw_f32",
                                 None, None, None, None, None, None,
                                 None, False))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "gt_x0", "gt_rx",
                "gt_y0", "gt_ry", "epsg", "nodata", "level", "ok"])

    return df.select(id_col, bytes_col, *extra).mapInPandas(
        _scan, schema=out_schema)
