"""Lineage capture + checkpoint/resume."""

import os

import pytest

from gis_tools_spark.plans import Pipeline


def test_pipeline_checkpoint_resume(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    calls = {"a": 0, "b": 0}

    def build_a():
        calls["a"] += 1
        return spark.range(100).withColumnRenamed("id", "cell")

    def build_b():
        calls["b"] += 1
        return spark.range(10)

    p1 = Pipeline(spark, root, run_id="r")
    a = p1.stage("a", build_a, cell_col="cell")
    b = p1.stage("b", build_b)
    assert a.count() == 100 and b.count() == 10
    assert calls == {"a": 1, "b": 1}

    # resume: a fresh Pipeline over the same root skips completed stages
    p2 = Pipeline(spark, root, run_id="r")
    a2 = p2.stage("a", build_a, cell_col="cell")
    assert a2.count() == 100
    assert calls["a"] == 1  # not rebuilt

    # lineage rows exist with the required fields (north rule:
    # partition_id, cell_range, rows_in/out, wall_ms)
    m = p1.metrics().toPandas()
    assert {"stage", "partition_id", "rows_in", "rows_out", "wall_ms",
            "cell_min", "cell_max"} <= set(m.columns)
    assert m[m.stage == "a"]["rows_out"].sum() == 100
    assert m[m.stage == "a"]["rows_in"].sum() == 100  # pass-through
    a_rows = m[m.stage == "a"]
    assert a_rows["cell_min"].min() == 0 and a_rows["cell_max"].max() == 99


def test_instrument_fused_op_rows_in_out(spark, tmp_path_factory):
    """A transform fused into the instrumented stage reports true
    per-partition selectivity: rows_in counts consumed input rows,
    rows_out counts emitted rows."""
    from gis_tools_spark.plans.lineage import instrument, read_metrics

    mdir = str(tmp_path_factory.mktemp("metrics"))
    df = spark.range(200, numPartitions=4).withColumnRenamed("id", "cell")
    out = instrument(df, mdir, stage="filt", cell_col="cell",
                     op=lambda pdf: pdf[pdf["cell"] % 4 == 0])
    assert out.count() == 50
    m = read_metrics(spark, mdir).toPandas()
    f = m[m.stage == "filt"]
    assert f["rows_in"].sum() == 200
    assert f["rows_out"].sum() == 50
    assert (f["rows_in"] >= f["rows_out"]).all()
