"""Raster subsystem: codecs + per-image numpy kernels + zonal statistics.

The reference's raster model is one dense float64 array + GeoGrid
(/root/reference/gistools/raster.py:96-185). Here a raster is a *row*:
(image_id, bytes, w, h, fmt, geo_transform); kernels decode → numpy →
encode inside Arrow-batched UDFs (SURVEY.md §1.3).
"""

from . import codec  # noqa: F401
