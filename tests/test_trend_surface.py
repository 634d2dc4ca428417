"""trend_surface (operators/interpolate.py) vs numpy lstsq."""

import numpy as np
import pandas as pd

from gis_tools_spark.operators.interpolate import trend_surface


def test_recovers_plane_vs_lstsq(spark):
    rng = np.random.RandomState(2)
    x = rng.uniform(-5, 5, 800)
    y = rng.uniform(-3, 7, 800)
    v = 2.5 - 1.2 * x + 0.8 * y + rng.normal(0, 0.5, 800)
    df = spark.createDataFrame(pd.DataFrame({"lon": x, "lat": y,
                                             "value": v}))
    r = trend_surface(df, value_col="value").head()
    A = np.column_stack([np.ones_like(x), x, y])
    coef, *_ = np.linalg.lstsq(A, v, rcond=None)
    assert abs(r["a"] - coef[0]) < 1e-9
    assert abs(r["b"] - coef[1]) < 1e-9
    assert abs(r["c"] - coef[2]) < 1e-9
    pred = A @ coef
    r2_ref = 1 - ((v - pred) ** 2).sum() / ((v - v.mean()) ** 2).sum()
    assert abs(r["r2"] - r2_ref) < 1e-9


def test_exact_plane_r2_one(spark):
    x = np.arange(50, dtype=float)
    y = (x * 7 % 13).astype(float)
    v = 4.0 + 0.5 * x - 2.0 * y
    df = spark.createDataFrame(pd.DataFrame({"lon": x, "lat": y,
                                             "value": v}))
    r = trend_surface(df, value_col="value").head()
    assert abs(r["a"] - 4.0) < 1e-8 and abs(r["b"] - 0.5) < 1e-10
    assert abs(r["c"] + 2.0) < 1e-10 and abs(r["r2"] - 1.0) < 1e-12


def test_groups_and_degenerate(spark):
    rng = np.random.RandomState(3)
    good = pd.DataFrame({"g": "ok", "lon": rng.uniform(0, 1, 100),
                         "lat": rng.uniform(0, 1, 100),
                         "value": rng.uniform(0, 1, 100)})
    colinear = pd.DataFrame({"g": "bad", "lon": np.arange(10.0),
                             "lat": np.arange(10.0) * 2,
                             "value": np.arange(10.0)})
    df = spark.createDataFrame(pd.concat([good, colinear]))
    out = {r["g"]: r for r in
           trend_surface(df, value_col="value", by=["g"]).collect()}
    assert out["ok"]["a"] is not None
    assert out["bad"]["a"] is None and out["bad"]["r2"] is None


def test_integer_inputs_partition_invariant(spark):
    """Integer columns ⇒ exact moments ⇒ identical coefficients under
    any partitioning (the oracle contract)."""
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"lon": rng.randint(-1000, 1000, 3000),
                        "lat": rng.randint(-1000, 1000, 3000),
                        "value": rng.randint(0, 500, 3000)})
    a = trend_surface(spark.createDataFrame(pdf).repartition(1),
                      value_col="value").head()
    b = trend_surface(spark.createDataFrame(
        pdf.sample(frac=1.0, random_state=1)).repartition(32),
        value_col="value").head()
    assert (a["a"], a["b"], a["c"], a["r2"]) == \
        (b["a"], b["b"], b["c"], b["r2"])
