"""Micro-batch incremental ingest of image rows (optional stretch,
SURVEY.md §2.16): readStream over a parquet directory → per-batch tile
assignment + PIP join against a static zone table → append sink.

Batch kernels are reused verbatim — foreachBatch hands each micro-batch
DataFrame to the same operators the batch path uses, so semantics are
identical and exactly-once comes from the streaming checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sjoin import pip_join
from ..operators.split import image_tile_assignment


def incremental_ingest(spark: SparkSession, *, input_dir: str, schema,
                       zones: DataFrame, out_dir: str, checkpoint_dir: str,
                       res: int = 16, trigger_once: bool = True):
    """Start (and by default run-once) the incremental pipeline.

    Returns the StreamingQuery. Input: parquet files with the image_geo
    shape (image_id, lon, lat, minx, miny, maxx, maxy, ...).
    """
    stream = (spark.readStream.schema(schema).format("parquet").load(input_dir))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tiles = image_tile_assignment(batch_df, res=res)
        tiles.write.mode("append").parquet(f"{out_dir}/tiles")
        joined = pip_join(batch_df.select("image_id", "lon", "lat"), zones,
                          strategy="broadcast")
        joined.write.mode("append").parquet(f"{out_dir}/zone_hits")

    writer = (stream.writeStream.foreachBatch(_process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
