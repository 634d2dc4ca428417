"""Geotag egress for image tables — the write half of the EXIF
contract (the read half is ``raster/exif.image_exif``).

``geotag_images`` stamps integer-microdegree GPS (plus altitude,
timestamp, orientation) back into JPEG bytes via the exact-roundtrip
DMS rationals (raster/exif.py build_exif_udeg): extract → stamp →
extract is bit-stable at µdeg resolution, which is what makes the
annotate→re-shard→re-ingest loop of a crawl pipeline lossless.

Non-JPEG rows pass through unchanged; only the coordinate/bytes
columns cross the Arrow boundary and all original columns are
preserved.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def geotag_images(df: DataFrame, *, bytes_col: str = "bytes",
                  lat_udeg: str | Column = "lat_udeg",
                  lon_udeg: str | Column = "lon_udeg",
                  alt_mm: str | Column | None = None,
                  dt: str | Column | None = None,
                  orientation: str | Column | None = None) -> DataFrame:
    """Stamp EXIF GPS into JPEG bytes; ``bytes_col`` is replaced,
    schema otherwise preserved.  Coordinates are integer microdegrees
    (exact through the DMS rationals); rows with null coordinates or
    non-JPEG bytes pass through untouched."""
    def _aux(c, cast):
        if c is None:
            return F.lit(None).cast(cast)
        return (F.col(c) if isinstance(c, str) else c).cast(cast)

    cols = list(df.columns)
    work = (df.withColumn("__lat_u", _aux(lat_udeg, "long"))
              .withColumn("__lon_u", _aux(lon_udeg, "long"))
              .withColumn("__alt_mm", _aux(alt_mm, "long"))
              .withColumn("__dt", _aux(dt, "string"))
              .withColumn("__ori", _aux(orientation, "int")))
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
