"""Exactly-once streaming appends to the snapshot table.

Structured Streaming's ``foreachBatch`` contract is AT-LEAST-ONCE: a
batch whose sink write partially completed before a failure is replayed
with the same ``batch_id`` after restart, so a plain
``write.mode('append').parquet`` sink duplicates rows on recovery. The
snapshot table (sources/icetable.py) upgrades that to exactly-once with
no sink-side state: each micro-batch commits with
``dedup_key = '<query>:<batch_id>'`` — a replayed batch finds the key
in the snapshot history and becomes a no-op, and a batch that died
BEFORE its atomic metadata claim left nothing visible, so the replay
commits cleanly. Idempotent replay + atomic visibility = exactly-once
(the same two properties Iceberg's streaming sink relies on, rebuilt
here from scratch).

At 100 TB this is the ingestion front door: crawl shards land in a
directory / queue, micro-batches append Morton-clustered data files,
and every downstream read prunes through the manifest stats — while
``as_of`` time travel pins any analysis to a consistent snapshot even
as ingestion keeps committing.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..sources import icetable as ice


def exactly_once_sink(stream: DataFrame, root: str, *, checkpoint_dir: str,
                      query_name: str = "ingest",
                      transform: Callable[[DataFrame], DataFrame] | None = None,
                      cluster_by: tuple[str, str] | None = None,
                      n_files: int | None = None,
                      trigger_once: bool = True):
    """Start a streaming query that appends each micro-batch to the
    snapshot table at ``root`` exactly once. Returns the StreamingQuery.

    ``transform`` (optional) runs the batch through any engine operator
    (tiling, PIP join, dedup…) before the commit; ``cluster_by``
    Morton-sorts each batch's files so manifest pruning stays tight.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if transform is not None:
            batch_df = transform(batch_df)
        ice.commit(batch_df, root, mode="append", cluster_by=cluster_by,
                   n_files=n_files,
                   dedup_key="%s:%d" % (query_name, batch_id))

    writer = (stream.writeStream.foreachBatch(_process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
