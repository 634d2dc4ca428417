"""dbscan (operators/cluster.py) vs a brute-force reference
implementation: O(n^2) distance matrix, union-find over core-core
edges, min-label clusters, min-cluster border assignment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def brute_dbscan(xy: np.ndarray, eps: float, min_pts: int):
    n = len(xy)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps * eps
    counts = nbr.sum(1)           # includes self
    core = counts >= min_pts
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nbr[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    cluster = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        if core[i]:
            cluster[i] = find(i)
    for i in range(n):
        if core[i]:
            continue
        cand = [cluster[j] for j in range(n)
                if core[j] and nbr[i, j] and j != i]
        if cand:
            cluster[i] = min(cand)
    return core, cluster


def run_engine(spark, xy, eps, min_pts):
    from gis_tools_spark.operators.cluster import dbscan

    pdf = pd.DataFrame({"id": np.arange(len(xy), dtype=np.int64),
                        "lon": xy[:, 0], "lat": xy[:, 1]})
    out = dbscan(spark.createDataFrame(pdf), id_col="id",
                 eps=eps, min_pts=min_pts).toPandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert len(out) == len(xy)
    return out


@pytest.mark.parametrize("seed,eps,min_pts", [(0, 0.13, 4), (1, 0.2, 3),
                                              (2, 0.09, 5)])
def test_dbscan_matches_bruteforce_random(spark, seed, eps, min_pts):
    rng = np.random.default_rng(seed)
    # clustered blobs + uniform noise
    blobs = np.concatenate([
        rng.normal(c, 0.05, size=(40, 2))
        for c in [(0.3, 0.3), (0.7, 0.6), (0.2, 0.8)]])
    noise = rng.uniform(0, 1, size=(60, 2))
    xy = np.concatenate([blobs, noise])
    core, cluster = brute_dbscan(xy, eps, min_pts)
    out = run_engine(spark, xy, eps, min_pts)
    assert (out["is_core"].to_numpy() == core).all()
    got = out["cluster"].fillna(-1).to_numpy().astype(np.int64)
    assert (got == cluster).all()
    # sanity: the blob seeds should actually produce clusters
    assert (cluster >= 0).sum() > 50


def test_dbscan_all_noise(spark):
    xy = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    out = run_engine(spark, xy, eps=0.1, min_pts=2)
    assert not out["is_core"].any()
    assert out["cluster"].isna().all()


def test_dbscan_single_cluster_chain(spark):
    # chain spaced 0.9*eps: every interior point is core at min_pts=3,
    # endpoints are border; one component end-to-end
    eps = 0.1
    xy = np.array([[i * 0.09, 0.0] for i in range(12)])
    core, cluster = brute_dbscan(xy, eps, 3)
    out = run_engine(spark, xy, eps, 3)
    assert (out["is_core"].to_numpy() == core).all()
    got = out["cluster"].fillna(-1).to_numpy().astype(np.int64)
    assert (got == cluster).all()
    assert len(set(got) - {-1}) == 1


def test_dbscan_border_min_rule(spark):
    # one point within eps of exactly one member of each of two separate
    # 4-point cores — |N(mid)| = 3 < min_pts=4 so it stays border, and
    # the deterministic rule assigns it to the min cluster id
    eps = 0.1
    left = [(0.0, 0.0), (0.03, 0.0), (0.06, 0.0), (0.09, 0.0)]
    right = [(0.26, 0.0), (0.29, 0.0), (0.32, 0.0), (0.35, 0.0)]
    mid = [(0.175, 0.0)]  # 0.085 from 0.09 and from 0.26
    xy = np.array(left + right + mid)
    core, cluster = brute_dbscan(xy, eps, 4)
    out = run_engine(spark, xy, eps, 4)
    assert (out["is_core"].to_numpy() == core).all()
    got = out["cluster"].fillna(-1).to_numpy().astype(np.int64)
    assert (got == cluster).all()
    # two distinct clusters survive; mid is border of the left (min id 0)
    assert len(set(got[:8])) == 2
    assert not out["is_core"].iloc[8]
    assert got[8] == 0
