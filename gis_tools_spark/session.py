"""SparkSession factory with the engine's standard configuration.

Arrow on (all geometry UDFs are pandas/Arrow batched — input_hint: "no
per-row Python"), AQE on (runtime skew-join handling and coalescing for
the cell-key joins), sane shuffle-partition default for local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Task parallelism comes from Spark; numpy/BLAS inside each Python worker
# must stay single-threaded or N workers × M BLAS threads oversubscribes
# the box (measured: decode kernel 6.8s@local[8] → 10.9s@local[32] before
# this pin). Set before the JVM forks workers so they inherit it.
_THREAD_PINS = {"OMP_NUM_THREADS": "1", "OPENBLAS_NUM_THREADS": "1",
                "MKL_NUM_THREADS": "1", "NUMEXPR_NUM_THREADS": "1",
                "VECLIB_MAXIMUM_THREADS": "1"}


def get_spark(app_name: str = "gis_tools_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None,
              master: str | None = None, **extra) -> SparkSession:
    """`master` overrides the default local[cpus] — used by the scaling
    harness to launch real multi-JVM executors via
    local-cluster[workers,cores,mem] (N vs 4N *executor* evidence)."""
    cpus = cpus or DEFAULT_CPUS
    for k, v in _THREAD_PINS.items():
        os.environ.setdefault(k, v)
    shuffle_partitions = shuffle_partitions or max(32, cpus)
    b = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 2048 rows ≈ 8 MB of image bytes per Arrow batch: smaller batches
        # keep the JVM→python feed pipelined (measured on the verify
        # stage: 29.6 s → 19.7 s at local-cluster[4,8]); 10k-row batches
        # stall workers while the JVM serializes the next 40 MB slab
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # image rows are CPU-heavy per byte (decode kernels): small splits
        # keep every core busy; 128m packs a whole 100k-image table into
        # ~5 tasks and caps scaling (measured). At 100TB the task count is
        # huge either way; 32m only adds scheduler overhead that AQE
        # coalescing absorbs.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # keep stdout clean for harnesses that tail-parse one JSON line
        # (the round-4 BENCH capture was overrun by progress bars)
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in _THREAD_PINS.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
