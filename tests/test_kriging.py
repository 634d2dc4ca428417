"""Geostatistics: empirical variogram vs numpy brute force (+DuckDB
mirror of the quantized expression tree), ordinary kriging vs a direct
numpy global solve, exactness at samples, constant-field reproduction."""

from __future__ import annotations

import numpy as np
import pytest


# --------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(42)
    n = 240
    xs = rng.uniform(0.0, 10.0, n)
    ys = rng.uniform(0.0, 10.0, n)
    vs = (np.sin(xs * 0.7) + np.cos(ys * 0.5)
          + 0.1 * rng.standard_normal(n))
    return xs, ys, np.round(vs, 2)


def _samples_df(spark, xs, ys, vs):
    return spark.createDataFrame(
        [(i, float(x), float(y), float(v))
         for i, (x, y, v) in enumerate(zip(xs, ys, vs))],
        "sid long, lon double, lat double, value double")


# --------------------------------------------------------------- variogram

def _vario_bruteforce(xs, ys, vs, max_lag, n_bins, sxy=1e6, sv=100.0):
    xi = np.floor(xs * sxy + 0.5).astype(np.int64)
    yi = np.floor(ys * sxy + 0.5).astype(np.int64)
    vi = np.floor(vs * sv + 0.5).astype(np.int64)
    L = int(round(max_lag * sxy))
    w = L / n_bins
    out = {}
    n = len(xs)
    for i in range(n):
        for j in range(i + 1, n):
            d2 = int(xi[i] - xi[j]) ** 2 + int(yi[i] - yi[j]) ** 2
            if d2 <= 0 or d2 >= L * L:
                continue
            b = int(np.floor(np.sqrt(float(d2)) / w))
            dv2 = int(vi[i] - vi[j]) ** 2
            c, s, sd = out.get(b, (0, 0, 0))
            out[b] = (c + 1, s + dv2, sd + int(np.floor(np.sqrt(float(d2)))))
    return {b: (c, s / (2.0 * c * sv * sv), sd / (c * sxy))
            for b, (c, s, sd) in out.items()}


def test_variogram_matches_bruteforce(spark, field):
    from gis_tools_spark.operators.kriging import empirical_variogram

    xs, ys, vs = field
    got = empirical_variogram(
        _samples_df(spark, xs, ys, vs), value_col="value",
        max_lag=2.0, n_bins=8).collect()
    want = _vario_bruteforce(xs, ys, vs, 2.0, 8)
    assert {r["lag_bin"] for r in got} == set(want)
    for r in got:
        c, g, ml = want[r["lag_bin"]]
        assert r["n_pairs"] == c
        assert r["gamma"] == pytest.approx(g, abs=1e-12)
        assert r["mean_lag"] == pytest.approx(ml, abs=1e-12)


def test_variogram_partition_invariant(spark, field):
    from gis_tools_spark.operators.kriging import empirical_variogram

    xs, ys, vs = field
    a = sorted(map(tuple, empirical_variogram(
        _samples_df(spark, xs, ys, vs).repartition(1),
        value_col="value", max_lag=1.5, n_bins=6).collect()))
    b = sorted(map(tuple, empirical_variogram(
        _samples_df(spark, xs, ys, vs).repartition(16),
        value_col="value", max_lag=1.5, n_bins=6).collect()))
    assert a == b  # exact equality incl. the float gamma (int sums)


def test_variogram_duckdb_mirror(spark, field):
    """The same quantized expression tree replayed in DuckDB SQL."""
    import duckdb

    from gis_tools_spark.operators.kriging import empirical_variogram

    xs, ys, vs = field
    got = sorted(
        (r["lag_bin"], r["n_pairs"], r["gamma"], r["mean_lag"])
        for r in empirical_variogram(
            _samples_df(spark, xs, ys, vs), value_col="value",
            max_lag=2.0, n_bins=8).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(sid BIGINT, lon DOUBLE, lat DOUBLE, "
                "value DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?,?,?,?)",
                    [(int(i), float(x), float(y), float(v))
                     for i, (x, y, v) in enumerate(zip(xs, ys, vs))])
    L = int(round(2.0 * 1e6))
    w = L / 8
    sql = f"""
    WITH q AS (
      SELECT sid, CAST(floor(lon*1000000.0 + 0.5) AS BIGINT) xi,
             CAST(floor(lat*1000000.0 + 0.5) AS BIGINT) yi,
             CAST(floor(value*100.0 + 0.5) AS BIGINT) vi
      FROM pts),
    pr AS (
      SELECT (a.xi-b.xi)*(a.xi-b.xi) + (a.yi-b.yi)*(a.yi-b.yi) AS d2,
             (a.vi-b.vi)*(a.vi-b.vi) AS dv2
      FROM q a, q b
      WHERE a.sid < b.sid
        AND (a.xi-b.xi)*(a.xi-b.xi) + (a.yi-b.yi)*(a.yi-b.yi) < {L * L}
        AND (a.xi-b.xi)*(a.xi-b.xi) + (a.yi-b.yi)*(a.yi-b.yi) > 0)
    SELECT CAST(floor(sqrt(CAST(d2 AS DOUBLE)) / {w}) AS INT) lag_bin,
           count(*) n_pairs,
           CAST(sum(dv2) AS DOUBLE) / (2.0 * count(*) * 100.0 * 100.0) gamma,
           CAST(sum(CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT)) AS DOUBLE)
             / (count(*) * 1000000.0) mean_lag
    FROM pr GROUP BY 1 ORDER BY 1"""
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert [(a, b) for a, b, _, _ in got] == [(a, b) for a, b, _, _ in want]
    for g, w_ in zip(got, want):
        assert g[2] == w_[2] and g[3] == w_[3]  # bit-equal doubles


# --------------------------------------------------------------- kriging

def _ok_numpy(xs, ys, vs, qx, qy, *, model, nugget, sill, vrange, k, radius):
    """Brute-force moving-neighborhood OK replay."""
    from gis_tools_spark.operators.kriging import variogram_gamma

    d2 = (xs - qx) ** 2 + (ys - qy) ** 2
    order = np.lexsort((ys, xs, d2))
    order = [i for i in order if d2[i] <= radius * radius][:k]
    if not order:
        return None
    nx, ny, nv = xs[order], ys[order], vs[order]
    m = len(order)
    h = np.sqrt((nx[:, None] - nx[None, :]) ** 2
                + (ny[:, None] - ny[None, :]) ** 2)
    a = np.zeros((m + 1, m + 1))
    a[:m, :m] = variogram_gamma(h, model=model, nugget=nugget, sill=sill,
                                vrange=vrange)
    a[m, :m] = 1.0
    a[:m, m] = 1.0
    hq = np.sqrt((nx - qx) ** 2 + (ny - qy) ** 2)
    rhs = np.concatenate([variogram_gamma(hq, model=model, nugget=nugget,
                                          sill=sill, vrange=vrange), [1.0]])
    sol = np.linalg.solve(a, rhs)
    lam, mu = sol[:m], sol[m]
    return float(lam @ nv), float(lam @ rhs[:m] + mu), m


def test_kriging_matches_numpy(spark, field):
    from gis_tools_spark.operators.kriging import ordinary_kriging

    xs, ys, vs = field
    rng = np.random.default_rng(5)
    qx = rng.uniform(1, 9, 40)
    qy = rng.uniform(1, 9, 40)
    queries = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(qx, qy))],
        "qid long, lon double, lat double")
    kw = dict(model="spherical", nugget=0.01, sill=0.8, vrange=3.0)
    got = {r["qid"]: r for r in ordinary_kriging(
        _samples_df(spark, xs, ys, vs), queries, value_col="value",
        query_id="qid", k=10, radius=2.5, **kw).collect()}
    n_checked = 0
    for i in range(40):
        want = _ok_numpy(xs, ys, vs, qx[i], qy[i], k=10, radius=2.5, **kw)
        if want is None:
            assert i not in got
            continue
        r = got[i]
        assert r["n_neighbors"] == want[2]
        assert r["ok_value"] == pytest.approx(want[0], abs=1e-9)
        assert r["ok_var"] == pytest.approx(want[1], abs=1e-9)
        n_checked += 1
    assert n_checked >= 30


@pytest.mark.parametrize("model", ["spherical", "exponential", "gaussian"])
def test_kriging_exact_at_samples_and_constant_field(spark, model):
    from gis_tools_spark.operators.kriging import ordinary_kriging

    rng = np.random.default_rng(9)
    xs = rng.uniform(0, 5, 60)
    ys = rng.uniform(0, 5, 60)
    vs = np.round(rng.uniform(10, 20, 60), 3)
    samples = _samples_df(spark, xs, ys, vs)
    # queries AT the sample locations, nugget=0 -> exact interpolation
    queries = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "qid long, lon double, lat double")
    got = ordinary_kriging(samples, queries, value_col="value",
                           query_id="qid", k=8, radius=2.0, model=model,
                           nugget=0.0, sill=1.0, vrange=2.0).collect()
    assert len(got) == 60
    for r in got:
        assert r["ok_value"] == pytest.approx(vs[r["qid"]], abs=1e-8)
        assert abs(r["ok_var"]) < 1e-8
    # constant field -> constant prediction everywhere (weights sum to 1)
    const = _samples_df(spark, xs, ys, np.full(60, 7.25))
    q2 = spark.createDataFrame([(0, 2.5, 2.5), (1, 1.0, 4.0)],
                               "qid long, lon double, lat double")
    for r in ordinary_kriging(const, q2, value_col="value",
                              query_id="qid", k=8, radius=3.0, model=model,
                              nugget=0.05, sill=1.0, vrange=2.0).collect():
        assert r["ok_value"] == pytest.approx(7.25, abs=1e-9)
