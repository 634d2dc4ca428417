"""Event-time streaming aggregations over the geo-image stream
(SURVEY.md §2.16; reference has no streaming engine — this is the
Spark-native extension the build brief asks for).

- windowed_zone_counts: watermark + tumbling event-time window per
  zone. Late rows beyond the watermark are dropped by Spark's state
  eviction — the standard late-data contract.
- running_zone_totals: applyInPandasWithState custom stateful operator
  keeping a per-zone cumulative count across micro-batches (the
  smallest honest exemplar of the stateful-op plumbing: state schema,
  timeout handling, batch iteration).

Both reuse the batch PIP join kernel via the broadcast strategy, so
stream and batch semantics are identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.sjoin import pip_join


def windowed_zone_counts(stream: DataFrame, zones: DataFrame, *,
                         ts_col: str = "ts", window: str = "10 minutes",
                         watermark: str = "20 minutes",
                         lon: str = "lon", lat: str = "lat") -> DataFrame:
    """points-stream ⋈ zones → (window, gid, n) with late-data eviction.

    The watermark bounds state: windows older than (max event time −
    watermark) finalize and stop accepting rows, so state size is
    O(zones × active windows) regardless of stream length — the 100 TB
    /day ingest shape. Join strategy is broadcast (static small zone
    side), which Structured Streaming allows against a stream without
    state on the join itself.
    """
    # watermarks require TIMESTAMP (with zone); parquet sources often
    # carry TIMESTAMP_NTZ — normalize before declaring event time
    pts = (stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
           .withWatermark(ts_col, watermark))
    joined = pip_join(pts, zones, strategy="broadcast", lon=lon, lat=lat)
    return (joined.groupBy(F.window(F.col(ts_col), window).alias("win"),
                           "gid")
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"), "gid", "n"))


def sessionized_zone_counts(stream: DataFrame, zones: DataFrame, *,
                            ts_col: str = "ts", gap: str = "30 minutes",
                            watermark: str = "1 hour",
                            lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Streaming gap-session aggregation per zone (the streaming analog
    of operators/sessions.sessionize): F.session_window merges rows of a
    zone whose event times are within `gap`; the watermark closes and
    emits sessions once no in-gap row can still arrive. State is
    O(zones × open sessions) — bounded by the watermark horizon.
    """
    pts = (stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
           .withWatermark(ts_col, watermark))
    joined = pip_join(pts, zones, strategy="broadcast", lon=lon, lat=lat)
    return (joined.groupBy(F.session_window(F.col(ts_col), gap).alias("sess"),
                           "gid")
            .agg(F.count("*").alias("n"))
            .select(F.col("sess.start").alias("sess_start"),
                    F.col("sess.end").alias("sess_end"), "gid", "n"))


_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
_OUT_SCHEMA = T.StructType([
    T.StructField("gid", T.LongType()),
    T.StructField("total", T.LongType()),
])


def running_zone_totals(stream: DataFrame, zones: DataFrame, *,
                        lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Custom stateful operator: cumulative per-zone hit count across
    micro-batches via applyInPandasWithState (GroupState keeps one
    64-bit counter per zone; no timeout — zones are a small static
    dimension, so state is bounded by the zone count)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    joined = pip_join(stream, zones, strategy="broadcast", lon=lon, lat=lat)

    def _update(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"gid": [key[0]], "total": [total]})

    return (joined.select("gid", lon, lat)
            .groupBy("gid")
            .applyInPandasWithState(_update, outputStructType=_OUT_SCHEMA,
                                    stateStructType=_STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def geofence_transitions(stream: DataFrame, zones: DataFrame, *,
                         key_col: str = "user_id", ts_col: str = "ts",
                         lon: str = "lon", lat: str = "lat",
                         zone_id: str = "gid", res: int = 11,
                         order_tiebreak: str | None = None) -> DataFrame:
    """Streaming geofence transition detector — the stateful-stream
    form of operators/trajectory.geofence_events: one output row per
    ping at which a device's zone membership CHANGES (enter / exit /
    switch), with the last-known zone carried ACROSS micro-batches in
    GroupState (per-device state is two fields; overlapping fences
    resolve to the MIN zone id, identical to the batch op).

    Zone tagging uses ``pip_tag`` — the join-free broadcast CSR
    variant — because left-join-back plans are illegal on streams.
    Ordering: rows are ordered by (ts, key) WITHIN each micro-batch;
    cross-batch order follows arrival, the standard low-latency
    stateful contract (buffer upstream if strict event-time order is
    required)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.sjoin import pip_tag

    cols = [key_col, ts_col, lon, lat] + (
        [order_tiebreak] if order_tiebreak else [])
    tagged = pip_tag(stream.select(*cols), zones,
                     poly_id=zone_id, res=res, out_col="__zone")
    tagged = tagged.withColumn(
        "__us", F.unix_micros(F.col(ts_col).cast("timestamp")))
    sort_cols = ["__us"] + ([order_tiebreak] if order_tiebreak else [])
    # project before the stateful exchange (guide §4.1): the kernel
    # reads only (key, __us, __zone [, tiebreak]) — lon/lat/ts would
    # otherwise ride the shuffle and the per-group Arrow slices
    tagged = tagged.select(key_col, "__us", "__zone", *(
        [order_tiebreak] if order_tiebreak else []))

    # zone columns / state carry the caller's id dtype: the batch
    # geofence_events and sjoin APIs accept string gids, so LongType
    # here used to crash per micro-batch inside the stateful UDF
    # (round-4 ADVICE)
    zid_t = zones.schema[zone_id].dataType
    integral = isinstance(zid_t, (T.LongType, T.IntegerType,
                                  T.ShortType, T.ByteType))
    if not integral and not isinstance(zid_t, T.StringType):
        raise TypeError(
            f"geofence_transitions: zone id column {zone_id!r} must be "
            f"integral or string, got {zid_t.simpleString()}")
    zone_t = T.LongType() if integral else T.StringType()
    _conv = int if integral else str
    _none_sentinel = -1 if integral else ""

    out_schema = T.StructType([
        tagged.schema[key_col],
        T.StructField("ts_us", T.LongType()),
        T.StructField("from_zone", zone_t),
        T.StructField("to_zone", zone_t),
        T.StructField("kind", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("has_zone", T.IntegerType()),
        T.StructField("zone", zone_t),
    ])

    def _update(key, pdfs, state: GroupState):
        import numpy as np
        if state.exists:
            has_prev, prev = state.get
            prev = None if not has_prev else _conv(prev)
        else:
            prev = None
        frames = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(sort_cols)
            if len(pdf) < 64:
                # tiny trace: the scalar scan beats ~20 numpy calls of
                # fixed vectorization overhead (measured on the 6-row
                # groups of the sf0.1 gate)
                rows = []
                for us, z in zip(pdf["__us"], pdf["__zone"]):
                    z = None if pd.isna(z) else _conv(z)
                    if z != prev:
                        kind = ("enter" if prev is None
                                else "exit" if z is None else "switch")
                        rows.append((key[0], int(us), prev, z, kind))
                    prev = z
                if rows:
                    frames.append(pd.DataFrame(
                        rows, columns=[key_col, "ts_us", "from_zone",
                                       "to_zone", "kind"]))
                continue
            # vectorized transition scan (round-5 verdict #1: the
            # per-event Python loop paid interpreter rate per ping):
            # a row transitions when its (null-ness, zone) differs from
            # the previous row's, row 0 comparing against the carried
            # cross-batch state
            zser = pdf["__zone"]
            na = pd.isna(zser).to_numpy()
            if integral:
                vals = (zser.fillna(_none_sentinel).to_numpy()
                        .astype(np.int64))
            else:
                vals = zser.fillna(_none_sentinel).astype(str) \
                    .to_numpy(dtype=object)
            pna = np.concatenate(([prev is None], na[:-1]))
            pvals = np.concatenate(
                ([_none_sentinel if prev is None else prev], vals[:-1]))
            chg = (pna != na) | (~na & ~pna & (pvals != vals))
            idx = np.nonzero(chg)[0]
            if len(idx):
                us = pdf["__us"].to_numpy()[idx]
                f_na, t_na = pna[idx], na[idx]
                frm = np.where(f_na, None, pvals[idx].astype(object))
                to = np.where(t_na, None, vals[idx].astype(object))
                kind = np.where(f_na, "enter",
                                np.where(t_na, "exit", "switch"))
                frames.append(pd.DataFrame({
                    key_col: key[0], "ts_us": us, "from_zone": frm,
                    "to_zone": to, "kind": kind}))
            prev = None if na[-1] else _conv(vals[-1])
        state.update((0 if prev is None else 1,
                      _none_sentinel if prev is None else _conv(prev)))
        if frames:
            yield pd.concat(frames, ignore_index=True)
        else:
            yield pd.DataFrame({key_col: pd.Series(dtype=object),
                                "ts_us": pd.Series(dtype="int64"),
                                "from_zone": pd.Series(dtype=object),
                                "to_zone": pd.Series(dtype=object),
                                "kind": pd.Series(dtype=object)})

    return (tagged.groupBy(key_col)
            .applyInPandasWithState(_update, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
