"""Streaming surface.

The reference is a batch library — no watermarks, windows, state, or
late-data handling anywhere in its codebase (SURVEY.md §2.16), so the
engine's primary surface is batch DataFrames with checkpoint/resume via
gis_tools_spark.plans.

This module provides the optional micro-batch ingest described in
SURVEY §2.16: a Structured Streaming file source feeding the SAME
tiling/PIP kernels through foreachBatch, so new image rows landing in a
directory are tiled and joined incrementally.
"""

from .ingest import incremental_ingest  # noqa: F401
from .sink import exactly_once_sink  # noqa: F401
from .windowed import running_zone_totals, windowed_zone_counts  # noqa: F401
