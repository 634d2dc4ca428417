"""gis_tools_spark — a PySpark-native spatial-join + tiling engine.

Brand-new engine with the query semantics of benjaminpillot/gis-tools
(see SURVEY.md), re-expressed Spark-first: DataFrames + Catalyst for all
relational work, hierarchical cell-index equi-joins for the spatial
filter phase, vectorized numpy kernels inside pandas/Arrow UDFs for the
exact-geometry refine phase.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
