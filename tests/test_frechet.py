"""frechet_pairs (operators/trajectory.py) vs a brute-force recursive
reference (free coupling enumeration with memoization)."""

from functools import lru_cache

import numpy as np
import pandas as pd

from gis_tools_spark.operators.trajectory import frechet_pairs


def _ref_frechet_sq(a: list[tuple], b: list[tuple]) -> float:
    """Textbook recursive definition, memoized (independent of the
    operator's iterative DP)."""
    @lru_cache(maxsize=None)
    def c(i, j):
        d = ((a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2)
        if i == 0 and j == 0:
            return d
        if i == 0:
            return max(c(0, j - 1), d)
        if j == 0:
            return max(c(i - 1, 0), d)
        return max(min(c(i - 1, j), c(i - 1, j - 1), c(i, j - 1)), d)

    return c(len(a) - 1, len(b) - 1)


def _mk_df(spark, tracks: dict):
    rows = []
    eid = 0
    for k, pts in tracks.items():
        for t, (x, y) in enumerate(pts):
            rows.append((k, eid, pd.Timestamp(t, unit="s"), x, y))
            eid += 1
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "lon", "lat"]))


def test_matches_reference_random(spark):
    rng = np.random.RandomState(23)
    tracks = {k: [tuple(rng.randint(0, 50, 2).tolist())
                  for _ in range(int(rng.randint(1, 12)))]
              for k in range(10)}
    df = _mk_df(spark, tracks)
    pairs = [(a, b) for a in range(10) for b in range(10) if a < b]
    pdf = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["key_a", "key_b"]))
    out = frechet_pairs(df, pdf, metric="euclidean_sq",
                        order_tiebreak="event_id")
    got = {(r["key_a"], r["key_b"]): r["frechet"] for r in out.collect()}
    for a, b in pairs:
        want = _ref_frechet_sq(tracks[a], tracks[b])
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)


def test_identity_and_symmetry(spark):
    rng = np.random.RandomState(5)
    tracks = {k: [tuple(rng.randint(0, 30, 2).tolist()) for _ in range(8)]
              for k in range(4)}
    df = _mk_df(spark, tracks)
    pdf = spark.createDataFrame(pd.DataFrame(
        [(a, b) for a in range(4) for b in range(4)],
        columns=["key_a", "key_b"]))
    got = {(r["key_a"], r["key_b"]): r["frechet"]
           for r in frechet_pairs(df, pdf, metric="euclidean_sq",
                                  order_tiebreak="event_id").collect()}
    for a in range(4):
        assert got[(a, a)] == 0.0
        for b in range(4):
            assert got[(a, b)] == got[(b, a)]


def test_lower_bound_endpoints(spark):
    """Fréchet >= endpoint distances (both first-first and last-last
    are forced couplings)."""
    rng = np.random.RandomState(9)
    tracks = {k: [tuple(rng.randint(0, 100, 2).tolist()) for _ in range(6)]
              for k in range(6)}
    df = _mk_df(spark, tracks)
    pdf = spark.createDataFrame(pd.DataFrame(
        [(a, a + 1) for a in range(5)], columns=["key_a", "key_b"]))
    for r in frechet_pairs(df, pdf, metric="euclidean_sq",
                           order_tiebreak="event_id").collect():
        a, b = tracks[r["key_a"]], tracks[r["key_b"]]
        d_first = (a[0][0] - b[0][0]) ** 2 + (a[0][1] - b[0][1]) ** 2
        d_last = (a[-1][0] - b[-1][0]) ** 2 + (a[-1][1] - b[-1][1]) ** 2
        assert r["frechet"] >= max(d_first, d_last)


def test_greatcircle_metric(spark):
    """Two same-latitude parallel tracks 0.1° apart: Fréchet =
    haversine of the offset (constant separation dominates)."""
    a = [(5.0 + 0.01 * i, 40.0) for i in range(5)]
    b = [(5.0 + 0.01 * i, 40.1) for i in range(5)]
    df = _mk_df(spark, {0: a, 1: b})
    pdf = spark.createDataFrame(pd.DataFrame([(0, 1)],
                                             columns=["key_a", "key_b"]))
    got = frechet_pairs(df, pdf, metric="greatcircle",
                        order_tiebreak="event_id").head()["frechet"]
    want = 2 * 6_371_000.0 * np.arcsin(np.sin(np.radians(0.05)))
    assert abs(got - want) < 1.0


def test_max_len_guard(spark):
    df = _mk_df(spark, {0: [(i, 0) for i in range(30)],
                        1: [(i, 1) for i in range(30)]})
    pdf = spark.createDataFrame(pd.DataFrame([(0, 1)],
                                             columns=["key_a", "key_b"]))
    import pytest
    with pytest.raises(Exception, match="max_len"):
        frechet_pairs(df, pdf, metric="euclidean_sq",
                      max_len=10).collect()
