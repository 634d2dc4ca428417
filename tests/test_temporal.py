"""asof_join / interval_join vs independent pandas oracles."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.operators.temporal import asof_join, interval_join


@pytest.fixture(scope="module")
def trades_quotes():
    prng = np.random.default_rng(7)
    n_keys = 6
    trades = pd.DataFrame({
        "sym": prng.integers(0, n_keys, 400).astype(str),
        "ts": pd.to_datetime("2024-01-01") +
        pd.to_timedelta(prng.integers(0, 86_400_000_000, 400), unit="us"),
        "qty": prng.integers(1, 100, 400),
    })
    quotes = pd.DataFrame({
        "sym": prng.integers(0, n_keys, 300).astype(str),
        "ts": pd.to_datetime("2024-01-01") +
        pd.to_timedelta(prng.integers(0, 86_400_000_000, 300), unit="us"),
        "px": np.round(prng.uniform(1, 100, 300), 4),
        "qid": np.arange(300),
    })
    # one key with NO quotes at all; a few exact ts collisions
    trades.loc[:20, "sym"] = "nope"
    quotes.loc[5, ["sym", "ts"]] = [trades.loc[30, "sym"], trades.loc[30, "ts"]]
    return trades, quotes


def _oracle_asof(trades, quotes, direction):
    t = trades.sort_values("ts").reset_index()
    q = quotes.sort_values(["ts", "qid"])
    m = pd.merge_asof(t, q, on="ts", by="sym", direction=direction,
                      suffixes=("", "_r"))
    return m.set_index("index").sort_index()


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("chunk_s", [None, 3600])
def test_asof_matches_pandas(spark, trades_quotes, direction, chunk_s):
    trades, quotes = trades_quotes
    out = asof_join(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        key_cols=["sym"], direction=direction, tiebreak="qid",
        chunk_s=chunk_s).toPandas()
    exp = _oracle_asof(trades, quotes, direction)
    got = out.sort_values(["sym", "ts", "qty"]).reset_index(drop=True)
    exps = exp.sort_values(["sym", "ts", "qty"]).reset_index(drop=True)
    assert len(got) == len(trades)
    # pandas merge_asof tie-break on duplicate (sym, ts) quotes: last row
    # in sort order wins for backward, first for forward — the qid sort
    # above makes that max-qid / min-qid, same as the operator contract.
    pd.testing.assert_series_equal(got["r_qid"].astype("float"),
                                   exps["qid"].astype("float"),
                                   check_names=False)
    pd.testing.assert_series_equal(got["r_px"].astype("float"),
                                   exps["px"].astype("float"),
                                   check_names=False)


def test_asof_tolerance_and_inner(spark, trades_quotes):
    trades, quotes = trades_quotes
    tol = 600_000_000  # 10 min in us
    out = asof_join(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        key_cols=["sym"], tiebreak="qid", tolerance_us=tol,
        how="inner").toPandas()
    exp = _oracle_asof(trades, quotes, "backward")
    exp = exp[exp["qid"].notna()]
    qts = quotes.set_index("qid")["ts"]
    gap = (exp["ts"] - exp["qid"].map(qts)).dt.total_seconds() * 1e6
    exp = exp[gap <= tol]
    assert len(out) == len(exp)
    assert out["r_qid"].notna().all()


def test_asof_chunked_equals_plain_across_gap_chunks(spark):
    # right rows only in chunk 0; left rows many chunks later — the
    # carry must survive empty gap chunks.
    left = pd.DataFrame({"k": ["a"] * 3,
                         "ts": pd.to_datetime(["2024-01-01 00:00:30",
                                               "2024-01-01 05:00:00",
                                               "2024-01-02 12:00:00"])})
    right = pd.DataFrame({"k": ["a"], "ts": pd.to_datetime(["2024-01-01 00:00:10"]),
                          "v": [42]})
    for chunk_s in (60, 3600):
        out = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                        key_cols=["k"], chunk_s=chunk_s).toPandas()
        assert out["r_v"].tolist() == [42, 42, 42]


def test_interval_join_matches_bruteforce(spark):
    prng = np.random.default_rng(11)
    pts = pd.DataFrame({
        "k": prng.integers(0, 4, 500).astype(str),
        "ts": pd.to_datetime("2024-01-01") +
        pd.to_timedelta(prng.integers(0, 86_400_000_000, 500), unit="us"),
        "pid": np.arange(500)})
    st = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        prng.integers(0, 80_000_000_000, 60), unit="us")
    iv = pd.DataFrame({
        "k": prng.integers(0, 4, 60).astype(str),
        "start_ts": st,
        "end_ts": st + pd.to_timedelta(prng.integers(1, 7_200_000_000, 60), unit="us"),
        "iid": np.arange(60)})
    for closed, lo_op, hi_op in [("left", "le", "gt"), ("both", "le", "ge")]:
        out = interval_join(spark.createDataFrame(pts), spark.createDataFrame(iv),
                            key_cols=["k"], bin_s=900, closed=closed).toPandas()
        b = iv.merge(pts, on="k")
        lo = b["start_ts"] <= b["ts"] if lo_op == "le" else b["start_ts"] < b["ts"]
        hi = b["end_ts"] > b["ts"] if hi_op == "gt" else b["end_ts"] >= b["ts"]
        exp = b[lo & hi]
        got = set(zip(out["iid"], out["pid"]))
        want = set(zip(exp["iid"], exp["pid"]))
        assert got == want, f"closed={closed}: {len(got)} vs {len(want)}"


def test_interval_join_no_keys(spark):
    pts = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 01:30:00",
                                              "2024-01-01 09:00:00"]),
                        "pid": [0, 1]})
    iv = pd.DataFrame({"start_ts": pd.to_datetime(["2024-01-01 01:00:00"]),
                       "end_ts": pd.to_datetime(["2024-01-01 02:00:00"]),
                       "iid": [7]})
    out = interval_join(spark.createDataFrame(pts), spark.createDataFrame(iv),
                        bin_s=600).toPandas()
    assert out["pid"].tolist() == [0] and out["iid"].tolist() == [7]
