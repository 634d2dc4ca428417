"""Stage-level checkpoint/resume (north rule: 'resumable from Iceberg
snapshot checkpoints').

No Iceberg runtime jar ships in this sandbox, so checkpoints are
parquet stage snapshots with a _SUCCESS-gated manifest — the same
semantics as recording an Iceberg snapshot-id per stage and reading
`VERSION AS OF` on resume (SURVEY.md §4 item 5); the storage layer is
swappable (``format='iceberg'`` uses writeTo(...).createOrReplace()
when a catalog is configured).

    pipe = Pipeline(spark, "/data/ckpt", run_id="r1")
    imgs = pipe.stage("ingest", lambda: load_images(...), cell_col="cell")
    joined = pipe.stage("pip", lambda: pip_join(imgs, zones))

Re-running the same pipeline skips completed stages (reads the
snapshot) — a killed job resumes at the first incomplete stage.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .lineage import instrument


class Pipeline:
    def __init__(self, spark: SparkSession, root: str, *, run_id: str = "default",
                 fmt: str = "parquet"):
        self.spark = spark
        self.root = os.path.join(root, run_id)
        self.fmt = fmt
        self.metrics_dir = os.path.join(self.root, "_metrics")
        os.makedirs(self.metrics_dir, exist_ok=True)
        self._manifest_path = os.path.join(self.root, "_manifest.json")

    # ------------------------------------------------------------- manifest

    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"stages": {}}

    def _record(self, name: str, path: str, n_rows: int) -> None:
        m = self._manifest()
        m["stages"][name] = {"path": path, "rows": n_rows,
                             "snapshot_ts": time.time()}
        with open(self._manifest_path, "w") as f:
            json.dump(m, f, indent=1)

    def completed(self, name: str) -> bool:
        st = self._manifest()["stages"].get(name)
        if not st:
            return False
        if self.fmt == "icetable":
            from ..sources import icetable as ice

            return ice._current_version(st["path"]) > 0
        return os.path.exists(os.path.join(st["path"], "_SUCCESS"))

    # ------------------------------------------------------------- stages

    def _read_snapshot(self, path: str) -> DataFrame:
        if self.fmt == "icetable":
            from ..sources import icetable as ice

            return ice.scan(self.spark, path)
        return self.spark.read.parquet(path)

    def stage(self, name: str, build: Callable[[], DataFrame], *,
              cell_col: str | None = None, repartition_by: str | None = None) -> DataFrame:
        """Run (or resume) one stage: build → instrument → snapshot → read
        back. Reading back gives downstream stages a clean scan boundary
        (column pruning + predicate pushdown against the snapshot).

        ``fmt='icetable'`` makes each stage snapshot a real snapshot
        COMMIT on the from-scratch Iceberg-style table
        (sources/icetable.py): atomic (a killed write is invisible —
        resume re-runs the stage instead of reading a half-snapshot),
        time-travelable, and manifest-prunable downstream."""
        path = os.path.join(self.root, name)
        if self.completed(name):
            return self._read_snapshot(path)
        df = build()
        df = instrument(df, self.metrics_dir, stage=name, cell_col=cell_col)
        if repartition_by:
            df = df.repartition(repartition_by)
        if self.fmt == "icetable":
            from ..sources import icetable as ice

            ice.commit(df, path, mode="overwrite")
        else:
            df.write.mode("overwrite").parquet(path)
        out = self._read_snapshot(path)
        self._record(name, path, out.count())
        return out

    def metrics(self) -> DataFrame:
        from .lineage import read_metrics

        return read_metrics(self.spark, self.metrics_dir)
