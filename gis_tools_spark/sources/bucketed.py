"""Bucketed (pre-shuffled) spatial tables — the co-located-join lever
for repeated joins at the 100 TB scale.

A cell-keyed spatial join shuffles BOTH sides on the cell key every
run. When one layer is joined repeatedly (a canonical zones layer, a
curated image corpus), persisting it bucketed by the cell key pays the
shuffle once at write time: Spark's bucketed scan exposes the hash
partitioning to the planner, so a join between two tables bucketed on
the same key with the same bucket count runs WITHOUT an Exchange on
either side (verified in tests by asserting the physical plan is
Exchange-free).

The reference has no analog (single-node GeoDataFrames); this is
Spark-native scale design per SURVEY §1.1's Iceberg-table model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import cells as C


def write_bucketed(df: DataFrame, *, table: str, path: str,
                   bucket_col: str, n_buckets: int,
                   sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist `df` as an external parquet table bucketed (and
    optionally sorted) by `bucket_col`. The bucket count is part of the
    join contract: co-located joins require equal counts on both sides."""
    w = (df.write.format("parquet").mode(mode)
         .option("path", path)
         .bucketBy(n_buckets, bucket_col))
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_bucketed_by_cell(df: DataFrame, *, table: str, path: str,
                           lon: str = "lon", lat: str = "lat",
                           res: int = C.RES_MIN, n_buckets: int = 64,
                           cell_col: str = "cell",
                           mode: str = "overwrite") -> None:
    """Attach the quadkey cell id at `res` and bucket by it — the
    layout that makes every subsequent cell-keyed spatial join on this
    table shuffle-free on its side."""
    out = df.withColumn(cell_col, C.cell_column(F.col(lon), F.col(lat), res))
    write_bucketed(out, table=table, path=path, bucket_col=cell_col,
                   n_buckets=n_buckets, sort_col=cell_col, mode=mode)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG — `spark.read.parquet`
    on the path would drop the bucket metadata and re-shuffle."""
    return spark.table(table)


def colocated_join(left: DataFrame, right: DataFrame, on: str | list,
                   how: str = "inner") -> DataFrame:
    """Plain equi-join that, when both inputs are bucketed scans on the
    join key with equal bucket counts, plans with zero Exchange. Kept
    as a named op so pipelines document the intent; the optimizer does
    the rest."""
    return left.join(right, on=on, how=how)
