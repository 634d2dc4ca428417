"""Dataset profiling: one-pass per-column summary statistics.

The "describe this table" primitive every analytics engine ships —
run before and after each pipeline stage, its output is the lineage
metrics table's schema-level companion (row counts tell you THAT a
stage dropped rows; the profile tells you WHAT changed).

Output is long format, one row per profiled column:
``(column, n, n_null, n_distinct, min_num, max_num, mean_num,
min_str, max_str)`` — numeric columns (and timestamps, as epoch
seconds) fill the ``*_num`` stats, strings fill ``*_str``; other
types carry counts only.

Scale plan: ONE aggregation pass — every statistic is an expression
in a single ``agg`` (map-side partial merge, no per-column scans),
then the 1-row wide result unpivots to long format with ``stack``
(driver-free, though at 1 row it hardly matters).  ``n_distinct``
defaults to ``approx_count_distinct`` (HLL — one pass, mergeable);
``exact=True`` switches to exact distinct counts, which Spark
executes via expand (one shuffle per distinct column set) — the
oracle-checkable mode, priced accordingly.

Reference parity: gis-tools has no profiler; build-brief scope
(pipeline observability), alongside plans/lineage.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["dataset_profile"]

_NUM_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
              T.FloatType, T.DoubleType, T.DecimalType)


def dataset_profile(df: DataFrame, cols=None, *,
                    exact: bool = False) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` in one aggregation.

    ``mean_num`` is rounded to 1e-6 (``floor(x*1e6+0.5)/1e6``) so the
    float sum-order nondeterminism of a distributed mean can never
    leak into downstream equality checks."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    names = list(cols) if cols is not None else list(fields)
    for c in names:
        if c not in fields:
            raise ValueError(f"no such column: {c}")

    aggs = []
    for c in names:
        dt = fields[c]
        col = F.col(c)
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append((F.count(F.lit(1)) - F.count(col)).alias(f"{c}__nn"))
        aggs.append((F.count_distinct(col) if exact
                     else F.approx_count_distinct(col))
                    .cast("long").alias(f"{c}__nd"))
        if isinstance(dt, _NUM_TYPES) or isinstance(dt, T.TimestampType):
            num = col.cast("double")
            mean = F.avg(num)
            aggs.append(F.min(num).alias(f"{c}__mn"))
            aggs.append(F.max(num).alias(f"{c}__mx"))
            aggs.append((F.floor(mean * 1e6 + F.lit(0.5)) / 1e6)
                        .alias(f"{c}__av"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mn"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mx"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__av"))
        if isinstance(dt, T.StringType):
            aggs.append(F.min(col).alias(f"{c}__ms"))
            aggs.append(F.max(col).alias(f"{c}__xs"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__ms"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__xs"))

    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`, "
        f"`{c}__av`, `{c}__ms`, `{c}__xs`" for c in names)
    return wide.selectExpr(
        f"stack({len(names)}, {parts}) AS "
        "(column, n, n_null, n_distinct, min_num, max_num, mean_num, "
        "min_str, max_str)")
