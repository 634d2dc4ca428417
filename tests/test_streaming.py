"""Structured Streaming over the geo-image stream (SURVEY.md §2.16):
watermarked windowed aggregation (late row DROPPED after the watermark
advances), the applyInPandasWithState running-total operator (state
carried across micro-batches), and exactly-once incremental ingest.

All sources are file streams with maxFilesPerTrigger=1, so each parquet
file becomes its own micro-batch deterministically.
"""

import glob
import os
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_tools_spark import fixtures


def _zone_df(spark):
    zones_pd = fixtures.gen_zones(4, seed=2)
    return spark.createDataFrame(zones_pd[["gid", "geometry_wkb"]]), zones_pd


def _pts_inside(zones_pd, gid, n, ts):
    """n points strictly inside zone gid (grid-scan for an interior
    point — fixture zones are concave, centroids can fall outside)."""
    import gis_tools_spark.geom.wkb as wkb
    from gis_tools_spark.geom import kernels as K

    g = wkb.decode(zones_pd.loc[zones_pd.gid == gid, "geometry_wkb"].iloc[0])
    mnx, mny, mxx, mxy = K.bounds(g)
    gx, gy = np.meshgrid(np.linspace(mnx, mxx, 21)[1:-1],
                         np.linspace(mny, mxy, 21)[1:-1])
    inside = K.covers_xy(g, gx.ravel(), gy.ravel())
    i = int(np.nonzero(inside)[0][0])
    cx, cy = float(gx.ravel()[i]), float(gy.ravel()[i])
    return pd.DataFrame({
        "event_id": np.arange(n), "lon": [cx] * n, "lat": [cy] * n,
        # microsecond precision: Spark's parquet reader rejects the
        # pandas-default TIMESTAMP(NANOS)
        "ts": pd.to_datetime(ts).astype("datetime64[us]")})


def test_windowed_zone_counts_watermark_drops_late(spark, tmp_path):
    from gis_tools_spark.streaming.windowed import windowed_zone_counts

    zones, zones_pd = _zone_df(spark)
    src = tmp_path / "stream_in"
    src.mkdir()
    # batch file 1: 3 rows in zone A at 10:00-10:05, max event time 12:00
    # (the 12:00 row pushes the watermark to 11:50 with a 10 min delay,
    # finalizing the 10:00 window)
    b1 = pd.concat([
        _pts_inside(zones_pd, zones_pd.gid.iloc[0], 3,
                    ["2026-01-01 10:01", "2026-01-01 10:02", "2026-01-01 10:04"]),
        _pts_inside(zones_pd, zones_pd.gid.iloc[0], 1, ["2026-01-01 12:00"]),
    ])
    b1.to_parquet(src / "b1.parquet", index=False)
    schema = spark.read.parquet(str(src / "b1.parquet")).schema

    sink = str(tmp_path / "sink")

    def _run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = windowed_zone_counts(stream, zones, window="10 minutes",
                                   watermark="10 minutes")
        q = (out.writeStream.format("parquet")
             .outputMode("append")
             .option("path", sink)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # pass 1: watermark advances to 11:50 and persists in the checkpoint
    _run_once()
    # pass 2: a LATE row for the finalized 10:00 window -> dropped by the
    # restored watermark
    b2 = _pts_inside(zones_pd, zones_pd.gid.iloc[0], 1, ["2026-01-01 10:03"])
    b2.to_parquet(src / "b2.parquet", index=False)
    _run_once()
    res = {(r["win_start"].strftime("%H:%M"), r["gid"]): r["n"]
           for r in spark.read.parquet(sink).collect()}
    # the finalized 10:00 window holds ONLY the 3 on-time rows — the
    # late 10:03 arrival in batch 2 was evicted by the watermark
    key = ("10:00", int(zones_pd.gid.iloc[0]))
    assert res.get(key) == 3, res


def test_running_zone_totals_state_across_batches(spark, tmp_path):
    from gis_tools_spark.streaming.windowed import running_zone_totals

    zones, zones_pd = _zone_df(spark)
    gid = int(zones_pd.gid.iloc[1])
    src = tmp_path / "state_in"
    src.mkdir()
    _pts_inside(zones_pd, gid, 2, ["2026-01-01 09:00"] * 2) \
        .to_parquet(src / "b1.parquet", index=False)
    _pts_inside(zones_pd, gid, 3, ["2026-01-01 09:30"] * 3) \
        .to_parquet(src / "b2.parquet", index=False)

    schema = spark.read.parquet(str(src / "b1.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = running_zone_totals(stream, zones)
    q = (out.writeStream.format("memory").queryName("rzt")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from rzt").collect()
    totals = sorted(r["total"] for r in rows if r["gid"] == gid)
    # two micro-batches: running total 2 then 5 — state survived
    assert totals == [2, 5], rows


def test_incremental_ingest_exactly_once(spark, tmp_path):
    from gis_tools_spark.streaming.ingest import incremental_ingest

    zones, zones_pd = _zone_df(spark)
    gid = int(zones_pd.gid.iloc[0])
    src = tmp_path / "ingest_in"
    src.mkdir()
    df = _pts_inside(zones_pd, gid, 5, ["2026-01-01 08:00"] * 5)
    df["image_id"] = [f"img{i:09d}" for i in range(5)]
    df[["image_id", "lon", "lat"]].assign(
        minx=df.lon - 0.001, miny=df.lat - 0.001,
        maxx=df.lon + 0.001, maxy=df.lat + 0.001,
    ).to_parquet(src / "a.parquet", index=False)

    schema = spark.read.parquet(str(src / "a.parquet")).schema
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck3")
    q = incremental_ingest(spark, input_dir=str(src), schema=schema,
                           zones=zones, out_dir=out_dir, checkpoint_dir=ck)
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{out_dir}/zone_hits").count()
    # re-running with the same checkpoint must NOT duplicate output
    q2 = incremental_ingest(spark, input_dir=str(src), schema=schema,
                            zones=zones, out_dir=out_dir, checkpoint_dir=ck)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(f"{out_dir}/zone_hits").count()
    assert n1 == n2 == 5


def test_sessionized_zone_counts_gap_sessions(spark, tmp_path):
    """Streaming session windows: rows within the gap merge into one
    session; in append mode only sessions CLOSED by the watermark are
    emitted (the 12:00 row advances the watermark past the first
    session's end but its own session stays open)."""
    from gis_tools_spark.streaming.windowed import sessionized_zone_counts

    zones, zones_pd = _zone_df(spark)
    src = tmp_path / "sess_in"
    src.mkdir()
    gid0 = int(zones_pd.gid.iloc[0])
    b1 = pd.concat([
        _pts_inside(zones_pd, gid0, 2,
                    ["2026-01-01 10:00", "2026-01-01 10:10"]),
        _pts_inside(zones_pd, gid0, 1, ["2026-01-01 12:00"]),
    ])
    b1.to_parquet(src / "b1.parquet", index=False)

    stream = (spark.readStream.schema(
        "event_id long, lon double, lat double, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = sessionized_zone_counts(stream, zones, gap="30 minutes",
                                  watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sess_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess").toPandas()
    # exactly the closed session: 10:00 → 10:40 (10:10 + 30 min), 2 rows
    assert len(got) == 1, got
    r = got.iloc[0]
    assert int(r["gid"]) == gid0
    assert r["n"] == 2
    assert str(r["sess_start"]) == "2026-01-01 10:00:00"
    assert str(r["sess_end"]) == "2026-01-01 10:40:00"


def test_geofence_transitions_state_across_batches(spark, tmp_path):
    """Streaming geofence equals the BATCH geofence_events on the same
    pings — including a transition whose two sides arrive in DIFFERENT
    micro-batches (the GroupState carry)."""
    import numpy as np

    from gis_tools_spark.operators.trajectory import geofence_events
    from gis_tools_spark.streaming.windowed import geofence_transitions

    zones, zones_pd = _zone_df(spark)
    z0 = zones_pd.iloc[0]
    cx = (z0.zminx + z0.zmaxx) / 2 if hasattr(z0, "zminx") else None
    # build pings straddling zone 0: inside -> inside -> outside in b1,
    # outside -> inside in b2 (re-entry crosses the batch boundary)
    import pandas as pd

    from gis_tools_spark.geom import wkb as W
    g = W.decode(bytes(z0.geometry_wkb))
    import gis_tools_spark.geom.kernels as K
    mnx, mny, mxx, mxy = K.bounds(g)
    inx, iny = (mnx + mxx) / 2, (mny + mxy) / 2
    outx, outy = mxx + 1.0, mxy + 1.0
    def mk(ts_s, lon, lat):
        return {"user_id": "u1", "ts": pd.Timestamp(ts_s, unit="s"),
                "lon": lon, "lat": lat}
    b1 = pd.DataFrame([mk(0, inx, iny), mk(10, inx, iny),
                       mk(20, outx, outy)])
    b2 = pd.DataFrame([mk(30, outx, outy), mk(40, inx, iny)])
    src = tmp_path / "gf_in"
    src.mkdir()
    b1["ts"] = b1["ts"].astype("datetime64[us]")
    b2["ts"] = b2["ts"].astype("datetime64[us]")
    b1.to_parquet(src / "b1.parquet", index=False)
    b2.to_parquet(src / "b2.parquet", index=False)
    schema = spark.read.parquet(str(src / "b1.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = geofence_transitions(stream, zones)
    q = (out.writeStream.format("memory").queryName("gft")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "gf_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted((r["ts_us"], r["from_zone"], r["to_zone"], r["kind"])
                 for r in spark.sql("select * from gft").collect())
    # batch reference on the concatenated stream
    allp = pd.concat([b1, b2]).reset_index(drop=True)
    allp["event_id"] = range(len(allp))
    ref = geofence_events(spark.createDataFrame(allp), zones,
                          id_col="event_id", order_tiebreak="event_id")
    want = sorted((int(r["ts"].timestamp() * 1e6),
                   r["from_zone"], r["to_zone"], r["kind"])
                  for r in ref.collect())
    assert got == want and len(got) == 3    # enter, exit, re-enter
