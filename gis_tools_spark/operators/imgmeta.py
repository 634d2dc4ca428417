"""Image geotag metadata extraction — the EXIF ingest path of the
geotagged image+caption table.

A web-crawled image table carries its geotag INSIDE the JPEG bytes as
an EXIF APP1 segment; before any spatial work can happen the engine
must lift (lat, lon, timestamp, orientation) out of the blob into
typed columns.  ``exif_gps`` does that in Arrow batches (only the id +
bytes columns cross into Python; the APP1 walk never touches entropy
data, so per-row cost is a header scan, not a decode), after which the
usual cell-index / PIP machinery applies.  ``geotag_images`` is the
write path: stamp coordinate columns back into the JPEG bytes.

Reference analog: gis-tools reads geo metadata through GDAL's header
scan (/root/reference/gistools/raster.py:158-165); EXIF is the same
job for the camera-image world.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_SCHEMA = ("{id} {idt}, lat double, lon double, alt_m double, "
           "exif_dt string, orientation int, has_gps boolean")


def exif_gps(df: DataFrame, *, bytes_col: str = "bytes",
             id_col: str = "image_id") -> DataFrame:
    """(id, lat, lon, alt_m, exif_dt, orientation, has_gps) per image.

    Null columns (has_gps=false) for rows with no / malformed EXIF or
    non-JPEG bytes — a crawl table is dirty by construction, so the
    kernel never raises.  Join the result back on ``id_col`` when the
    remaining attributes are needed; shipping only (id, bytes) through
    Arrow keeps the Python-side batch minimal (SURVEY §4 UDF rule).
    """
    idt = dict(df.dtypes)[id_col]
    schema = _SCHEMA.format(id=id_col, idt=idt)

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gis_tools_spark.raster.exif import parse_exif

        for pdf in it:
            recs = []
            for i, buf in zip(pdf[id_col], pdf[bytes_col]):
                m = parse_exif(buf) if buf is not None else {
                    "lat": None, "lon": None, "alt_m": None, "dt": None,
                    "orientation": None}
                recs.append((i, m["lat"], m["lon"], m["alt_m"], m["dt"],
                             m["orientation"],
                             m["lat"] is not None and m["lon"] is not None))
            out = pd.DataFrame(recs, columns=[id_col, "lat", "lon",
                                              "alt_m", "exif_dt",
                                              "orientation", "has_gps"])
            out["orientation"] = out["orientation"].astype("Int32")
            yield out

    return df.select(id_col, bytes_col).mapInPandas(_run, schema=schema)


def geotag_images(df: DataFrame, *, bytes_col: str = "bytes",
                  lat_udeg: str | Column = "lat_udeg",
                  lon_udeg: str | Column = "lon_udeg",
                  alt_mm: str | Column | None = None,
                  dt: str | Column | None = None,
                  orientation: str | Column | None = None) -> DataFrame:
    """Stamp EXIF GPS into JPEG bytes (the egress half of the geotag
    contract).  Coordinate columns are integer microdegrees — exact
    through the DMS rationals (raster/exif.py).  Non-JPEG rows pass
    through unchanged.  All original columns are preserved;
    ``bytes_col`` is replaced."""
    cols = list(df.columns)
    lat_c = F.col(lat_udeg) if isinstance(lat_udeg, str) else lat_udeg
    lon_c = F.col(lon_udeg) if isinstance(lon_udeg, str) else lon_udeg
    work = (df.withColumn("__lat_u", lat_c.cast("long"))
              .withColumn("__lon_u", lon_c.cast("long"))
              .withColumn("__alt_mm",
                          (F.col(alt_mm) if isinstance(alt_mm, str)
                           else alt_mm if alt_mm is not None
                           else F.lit(None)).cast("long"))
              .withColumn("__dt",
                          (F.col(dt) if isinstance(dt, str)
                           else dt if dt is not None
                           else F.lit(None)).cast("string"))
              .withColumn("__ori",
                          (F.col(orientation) if isinstance(orientation, str)
                           else orientation if orientation is not None
                           else F.lit(None)).cast("int")))
    schema = work.schema

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gis_tools_spark.raster.exif import geotag

        for pdf in it:
            out_bytes = []
            for buf, lu, lo, am, d, o in zip(
                    pdf[bytes_col], pdf["__lat_u"], pdf["__lon_u"],
                    pdf["__alt_mm"], pdf["__dt"], pdf["__ori"]):
                if (buf is None or len(buf) < 2 or buf[:2] != b"\xff\xd8"
                        or pd.isna(lu) or pd.isna(lo)):
                    out_bytes.append(buf)
                    continue
                out_bytes.append(geotag(
                    bytes(buf), lat_udeg=int(lu), lon_udeg=int(lo),
                    alt_mm=None if pd.isna(am) else int(am),
                    dt=None if d is None else str(d),
                    orientation=None if pd.isna(o) else int(o)))
            pdf = pdf.copy()
            pdf[bytes_col] = out_bytes
            yield pdf

    out = work.mapInPandas(_run, schema=schema)
    return out.select(*cols)
