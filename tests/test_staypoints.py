"""staypoints (operators/trajectory.py) vs an independent pure-pandas
run-length scan."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gis_tools_spark import cells as C
from gis_tools_spark.operators.trajectory import staypoints


def _ref_stays(pdf: pd.DataFrame, res: int, min_dwell_s: float,
               min_pings: int) -> list[tuple]:
    """Sequential reference: sort, walk runs of equal cell, filter."""
    out = []
    n = 1 << res
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cells = []
        for lo, la in zip(g["lon"], g["lat"]):
            ix = min(max(int(np.floor((lo + 180.0) / 360.0 * n)), 0), n - 1)
            iy = min(max(int(np.floor((la + 90.0) / 180.0 * n)), 0), n - 1)
            cells.append((res << C.RES_SHIFT) + (ix << C.IX_SHIFT) + iy)
        us = (g["ts"].astype("int64") // 1000).tolist()
        runs, start = [], 0
        for i in range(1, len(cells) + 1):
            if i == len(cells) or cells[i] != cells[start]:
                runs.append((start, i))
                start = i
        idx = 0
        for a, b in runs:
            dwell = us[b - 1] - us[a]
            if b - a >= min_pings and dwell >= min_dwell_s * 1e6:
                out.append((uid, idx, cells[a], us[a], us[b - 1], b - a))
                idx += 1
    return sorted(out)


def _pings(seed: int = 0, n_users: int = 6, n: int = 240) -> pd.DataFrame:
    """Clustered synthetic tracks: users alternate dwelling at a POI
    (tight jitter) and travelling (big jumps)."""
    rng = np.random.RandomState(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        t = 0
        lon, lat = 5 + u * 0.5, 40 + u * 0.3
        for _ in range(n // n_users):
            if rng.rand() < 0.3:                     # move to a new POI
                lon += rng.uniform(-2, 2)
                lat += rng.uniform(-1, 1)
            t += int(rng.randint(1, 5000))           # seconds
            rows.append((f"u{u}", eid,
                         pd.Timestamp(t, unit="s"),
                         lon + rng.uniform(-1e-4, 1e-4),
                         lat + rng.uniform(-1e-4, 1e-4)))
            eid += 1
    return pd.DataFrame(rows, columns=["user_id", "event_id", "ts",
                                       "lon", "lat"])


def test_matches_reference(spark):
    pdf = _pings()
    df = spark.createDataFrame(pdf)
    for res, dwell, pings in ((8, 0, 1), (8, 600, 2), (10, 1800, 3)):
        got = staypoints(df, key_cols=["user_id"], res=res,
                         min_dwell_s=dwell, min_pings=pings,
                         order_tiebreak="event_id")
        got_rows = sorted(
            (r["user_id"], r["stay_idx"], r["cell"], r["enter_us"],
             r["exit_us"], r["n_pings"])
            for r in got.collect())
        assert got_rows == _ref_stays(pdf, res, dwell, pings)


def test_partitioning_invariance(spark):
    pdf = _pings(3)
    a = staypoints(spark.createDataFrame(pdf).repartition(1),
                   key_cols=["user_id"], res=9, min_dwell_s=300,
                   min_pings=2, order_tiebreak="event_id")
    b = staypoints(spark.createDataFrame(pdf.sample(frac=1.0, random_state=1))
                   .repartition(16),
                   key_cols=["user_id"], res=9, min_dwell_s=300,
                   min_pings=2, order_tiebreak="event_id")
    ka = sorted(map(tuple, a.select("user_id", "stay_idx", "cell",
                                    "enter_us", "exit_us").collect()))
    kb = sorted(map(tuple, b.select("user_id", "stay_idx", "cell",
                                    "enter_us", "exit_us").collect()))
    assert ka == kb and len(ka) > 0


def test_mean_position_inside_cell(spark):
    pdf = _pings(5)
    out = staypoints(spark.createDataFrame(pdf), key_cols=["user_id"],
                     res=8, min_pings=2, order_tiebreak="event_id")
    chk = out.withColumn(
        "c2", C.cell_column(F.col("lon_c"), F.col("lat_c"), 8))
    bad = chk.where(F.col("c2") != F.col("cell")).count()
    # mean of in-cell points is in the cell (convexity)
    assert bad == 0


def test_single_ping_runs(spark):
    pdf = pd.DataFrame({
        "user_id": ["a"] * 3,
        "event_id": [0, 1, 2],
        "ts": pd.to_datetime([0, 10, 20], unit="s"),
        "lon": [5.0, 50.0, 5.0],     # out and back: 3 runs of 1
        "lat": [40.0, 0.0, 40.0],
    })
    df = spark.createDataFrame(pdf)
    out = staypoints(df, key_cols=["user_id"], res=8, min_pings=1,
                     order_tiebreak="event_id")
    assert out.count() == 3
    assert staypoints(df, key_cols=["user_id"], res=8, min_pings=2,
                      order_tiebreak="event_id").count() == 0


def test_heading_stats_properties(spark):
    from gis_tools_spark.operators.trajectory import heading_stats

    # straight east-bound track: mean 90 deg, resultant 1
    n = 20
    straight = pd.DataFrame({
        "user_id": ["s"] * n, "event_id": range(n),
        "ts": pd.to_datetime(range(n), unit="s"),
        "lon": np.linspace(0, 1, n), "lat": [10.0] * n})
    # shuttle: east then west repeatedly -> resultant ~ 0
    m = 21
    shuttle = pd.DataFrame({
        "user_id": ["z"] * m, "event_id": range(100, 100 + m),
        "ts": pd.to_datetime(range(m), unit="s"),
        "lon": [0.0, 1.0] * 10 + [0.0], "lat": [0.0] * m})
    # stationary duplicates: no segments
    still = pd.DataFrame({
        "user_id": ["q"] * 3, "event_id": [200, 201, 202],
        "ts": pd.to_datetime([0, 1, 2], unit="s"),
        "lon": [5.0] * 3, "lat": [5.0] * 3})
    df = spark.createDataFrame(pd.concat([straight, shuttle, still]))
    out = {r["user_id"]: r for r in heading_stats(
        df, key_cols=["user_id"], order_tiebreak="event_id").collect()}
    assert abs(out["s"]["mean_heading_deg"] - 90.0) < 0.5
    assert out["s"]["resultant"] > 0.999999
    assert out["z"]["resultant"] < 0.06
    assert out["q"]["n_segs"] == 0 and out["q"]["resultant"] is None


def test_heading_stats_vs_reference(spark):
    from gis_tools_spark.operators.trajectory import heading_stats

    rng = np.random.RandomState(8)
    pdf = pd.DataFrame({
        "user_id": ["u"] * 40, "event_id": range(40),
        "ts": pd.to_datetime(range(40), unit="s"),
        "lon": rng.uniform(0, 1, 40), "lat": rng.uniform(40, 41, 40)})
    r = heading_stats(spark.createDataFrame(pdf), key_cols=["user_id"],
                      order_tiebreak="event_id").head()
    # reference: numpy forward azimuths
    lon = np.radians(pdf["lon"].to_numpy())
    lat = np.radians(pdf["lat"].to_numpy())
    dl = lon[1:] - lon[:-1]
    th = np.arctan2(np.sin(dl) * np.cos(lat[1:]),
                    np.cos(lat[:-1]) * np.sin(lat[1:])
                    - np.sin(lat[:-1]) * np.cos(lat[1:]) * np.cos(dl))
    th = np.radians((np.degrees(th) + 360.0) % 360.0)
    ss, sc = np.sin(th).sum(), np.cos(th).sum()
    res = np.hypot(ss, sc) / len(th)
    mh = (np.degrees(np.arctan2(ss, sc)) + 360.0) % 360.0
    assert r["n_segs"] == len(th)
    assert abs(r["resultant"] - res) < 1e-12
    assert abs(r["mean_heading_deg"] - mh) < 1e-9
