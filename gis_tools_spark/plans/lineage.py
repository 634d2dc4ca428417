"""Per-partition lineage/metrics capture (north rule: lineage rows
(partition_id, cell_range, rows_in/out, wall_ms) written to a metrics
table).

``instrument(df, ...)`` wraps a DataFrame in a pass-through mapInPandas
stage; each task appends one JSON lineage row for its partition to the
metrics directory (shared storage on a real cluster; local disk on
local[N]). ``read_metrics`` loads them back as a DataFrame. The wrapped
data is unchanged — schema and rows pass through verbatim.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def instrument(df: DataFrame, metrics_dir: str, *, stage: str,
               cell_col: str | None = None) -> DataFrame:
    """Pass-through wrapper emitting one lineage row per partition."""
    os.makedirs(metrics_dir, exist_ok=True)
    schema = df.schema

    def _wrap(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.perf_counter()
        rows = 0
        cmin, cmax = None, None
        for pdf in it:
            rows += len(pdf)
            if cell_col and cell_col in pdf.columns and len(pdf):
                lo, hi = pdf[cell_col].min(), pdf[cell_col].max()
                cmin = lo if cmin is None else min(cmin, lo)
                cmax = hi if cmax is None else max(cmax, hi)
            yield pdf
        ctx = TaskContext.get()
        rec = {
            "stage": stage,
            "partition_id": ctx.partitionId() if ctx else -1,
            "cell_min": None if cmin is None else int(cmin),
            "cell_max": None if cmax is None else int(cmax),
            "rows_out": rows,
            "wall_ms": round((time.perf_counter() - t0) * 1000.0, 3),
            "attempt": ctx.attemptNumber() if ctx else -1,
            "ts": time.time(),
        }
        fn = os.path.join(metrics_dir, f"{stage}-{rec['partition_id']}-{uuid.uuid4().hex[:8]}.json")
        with open(fn, "w") as f:
            json.dump(rec, f)

    return df.mapInPandas(_wrap, schema=schema)


def read_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    return spark.read.json(f"{metrics_dir}/*.json")
