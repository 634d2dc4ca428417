"""Geometry backend for gis_tools_spark.

This sandbox has no shapely/h3/pyproj wheels, so the default backend is
the pure-numpy implementation in :mod:`wkb` / :mod:`kernels`. The API is
deliberately shaped like shapely 2.x's vectorized functions so the
backend can be swapped for shapely when available (SURVEY.md §7 plan B).
"""

from __future__ import annotations

try:  # pragma: no cover - optional fast path
    import shapely  # noqa: F401

    HAS_SHAPELY = True
except Exception:  # pragma: no cover
    HAS_SHAPELY = False

from . import kernels, wkb  # noqa: E402,F401

__all__ = ["wkb", "kernels", "HAS_SHAPELY"]
