"""Bucketed co-located joins (sources/bucketed.py): writing both sides
bucketed on the cell key makes the join plan Exchange-free, and results
equal the plain shuffled join."""

import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.sources.bucketed import (
    colocated_join, read_bucketed, write_bucketed_by_cell)


@pytest.fixture()
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_is_exchange_free(spark, tmp_path, _no_broadcast):
    pts = fixtures.gen_points(2000)
    a = spark.createDataFrame(pts[["pid", "lon", "lat"]])
    b = spark.createDataFrame(
        pts[["pid", "lon", "lat"]].assign(pid=pts.pid + 100000))
    write_bucketed_by_cell(a, table="t_bucket_a", path=str(tmp_path / "a"),
                           res=10, n_buckets=8)
    write_bucketed_by_cell(b, table="t_bucket_b", path=str(tmp_path / "b"),
                           res=10, n_buckets=8)
    try:
        ta = read_bucketed(spark, "t_bucket_a")
        tb = read_bucketed(spark, "t_bucket_b").withColumnRenamed("pid", "pid_b") \
            .withColumnRenamed("lon", "lon_b").withColumnRenamed("lat", "lat_b")
        j = colocated_join(ta, tb, on="cell")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same pairs as the shuffled join on the raw DataFrames
        n_bucketed = j.count()
        from gis_tools_spark import cells as C
        from pyspark.sql import functions as F
        ra = a.withColumn("cell", C.cell_column(F.col("lon"), F.col("lat"), 10))
        rb = b.withColumn("cell", C.cell_column(F.col("lon"), F.col("lat"), 10)) \
            .withColumnRenamed("pid", "pid_b").withColumnRenamed("lon", "lon_b") \
            .withColumnRenamed("lat", "lat_b")
        n_plain = ra.join(rb, on="cell").count()
        assert n_bucketed == n_plain > 0
        plain_plan = ra.join(rb, on="cell")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" in plain_plan  # the shuffle we eliminated
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")
