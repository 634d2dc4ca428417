"""st_dbscan (operators/cluster.py) vs a sequential reference and its
relationship to plain dbscan."""

import numpy as np
import pandas as pd

from gis_tools_spark.operators.cluster import dbscan, st_dbscan


def _ref_st_dbscan(pdf, eps, eps_t_s, min_pts):
    """Brute-force reference with the engine's deterministic label
    contract (min-core-id components, min-rule borders)."""
    x = pdf["lon"].to_numpy()
    y = pdf["lat"].to_numpy()
    t = (pdf["ts"].astype("int64") // 1000).to_numpy()
    ids = pdf["id"].to_numpy()
    n = len(x)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    nb = (d2 <= eps * eps) & (np.abs(t[:, None] - t[None, :])
                              <= eps_t_s * 1e6)
    core = nb.sum(1) >= min_pts
    # components over core-core adjacency
    label = {}
    for i in np.where(core)[0]:
        if i in label:
            continue
        stack, comp = [i], []
        seen = {i}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in np.where(nb[u] & core)[0]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(ids[c] for c in comp)
        for c in comp:
            label[c] = m
    out = {}
    for i in range(n):
        if i in label:
            out[ids[i]] = (True, label[i])
        else:
            cand = [label[j] for j in np.where(nb[i] & core)[0]
                    if j != i and j in label]
            out[ids[i]] = (False, min(cand) if cand else None)
    return out


def _pings(seed=0, n=300):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(0, 1, (6, 2))
    which = rng.randint(0, 6, n)
    pos = centers[which] + rng.normal(0, 0.01, (n, 2))
    return pd.DataFrame({
        "id": range(n),
        "lon": pos[:, 0], "lat": pos[:, 1],
        "ts": pd.to_datetime(rng.randint(0, 4 * 86400, n), unit="s"),
    })


def test_matches_reference(spark):
    pdf = _pings()
    df = spark.createDataFrame(pdf)
    for eps, et, mp in ((0.03, 7200, 4), (0.05, 43200, 6)):
        got = {r["id"]: (r["is_core"], r["cluster"])
               for r in st_dbscan(df, eps=eps, eps_t_s=et,
                                  min_pts=mp).collect()}
        assert got == _ref_st_dbscan(pdf, eps, et, mp)


def test_infinite_time_equals_plain_dbscan(spark):
    pdf = _pings(3)
    df = spark.createDataFrame(pdf)
    a = {r["id"]: (r["is_core"], r["cluster"])
         for r in st_dbscan(df, eps=0.04, eps_t_s=10 * 86400,
                            min_pts=5).collect()}
    b = {r["id"]: (r["is_core"], r["cluster"])
         for r in dbscan(df, eps=0.04, min_pts=5).collect()}
    assert a == b


def test_time_splits_space_cluster(spark):
    rng = np.random.RandomState(1)
    n = 120
    pdf = pd.DataFrame({
        "id": range(2 * n),
        "lon": np.concatenate([rng.normal(0.5, 0.005, n)] * 2),
        "lat": np.concatenate([rng.normal(0.5, 0.005, n)] * 2),
        "ts": pd.to_datetime(
            np.concatenate([rng.randint(0, 3600, n),
                            600000 + rng.randint(0, 3600, n)]), unit="s"),
    })
    df = spark.createDataFrame(pdf)
    st = st_dbscan(df, eps=0.05, eps_t_s=7200, min_pts=5)
    assert st.where("cluster is not null").select("cluster") \
        .distinct().count() == 2
    assert dbscan(df, eps=0.05, min_pts=5).where(
        "cluster is not null").select("cluster").distinct().count() == 1


def test_partitioning_invariance(spark):
    pdf = _pings(7)
    a = st_dbscan(spark.createDataFrame(pdf).repartition(1),
                  eps=0.04, eps_t_s=86400, min_pts=5)
    b = st_dbscan(spark.createDataFrame(
        pdf.sample(frac=1.0, random_state=2)).repartition(16),
        eps=0.04, eps_t_s=86400, min_pts=5)
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb
