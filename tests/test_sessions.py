"""Event sessionization: hand-computed boundaries + stats."""

import datetime as dt

import pandas as pd

from gis_tools_spark.operators.sessions import session_stats, sessionize


def _ts(minute):
    return dt.datetime(2026, 1, 1, 0, minute)


def test_sessionize_boundaries(spark):
    rows = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "event_type": ["a", "a", "a", "a", "b", "b"],
        # a: 0, 10, 45, 50 min → gap>30min splits at 45
        # b: 0, 40 → split
        "ts": [_ts(0), _ts(10), _ts(45), _ts(50), _ts(0), _ts(40)],
    })
    df = spark.createDataFrame(rows)
    out = (sessionize(df, ts_col="ts", gap_s=1800, key_cols=("event_type",),
                      order_tiebreak="event_id")
           .select("event_id", "session_idx").toPandas()
           .set_index("event_id")["session_idx"].to_dict())
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 1}


def test_session_stats(spark):
    rows = pd.DataFrame({
        "event_id": [1, 2, 3],
        "event_type": ["a", "a", "a"],
        "ts": [_ts(0), _ts(10), _ts(45)],
        "value": [1.0, 2.0, 4.0],
    })
    df = spark.createDataFrame(rows)
    out = session_stats(df, ts_col="ts", gap_s=1800, key_cols=("event_type",),
                        value_col="value", order_tiebreak="event_id").toPandas()
    out = out.sort_values("session_idx").reset_index(drop=True)
    assert list(out["n_events"]) == [2, 1]
    assert list(out["sum_value"]) == [3.0, 4.0]
    assert out["duration_s"].iloc[0] == 600.0
    assert out["duration_s"].iloc[1] == 0.0
