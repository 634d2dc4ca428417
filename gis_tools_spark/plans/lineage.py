"""Per-partition lineage/metrics capture (north rule: lineage rows
(partition_id, cell_range, rows_in/out, wall_ms) written to a metrics
table).

``instrument(df, ...)`` wraps a DataFrame in a mapInPandas stage; each
task appends one JSON lineage row for its partition to the metrics
directory (shared storage on a real cluster; local disk on local[N]).
``read_metrics`` loads them back as a DataFrame. By default the wrapped
data is unchanged — schema and rows pass through verbatim — and
``rows_in == rows_out``. An optional per-batch ``op`` fuses a transform
into the instrumented stage, in which case ``rows_in`` counts consumed
input rows and ``rows_out`` counts emitted rows (e.g. a filter shows
the per-partition selectivity in the metrics table).
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
               cell_col: str | None = None, op=None,
               out_schema=None) -> DataFrame:
    """Wrapper emitting one lineage row per partition.

    ``op`` (optional): per-batch ``pd.DataFrame -> pd.DataFrame``
    transform fused into the stage; ``out_schema`` must be given when
    it changes the schema. Without ``op`` the stage is a pass-through.
    """
    os.makedirs(metrics_dir, exist_ok=True)
    schema = out_schema if (op is not None and out_schema is not None) else df.schema

    def _wrap(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.perf_counter()
        rows_in = 0
        rows = 0
        cmin, cmax = None, None
        for pdf in it:
            rows_in += len(pdf)
            if op is not None:
                pdf = op(pdf)
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
            "rows_in": rows_in,
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
