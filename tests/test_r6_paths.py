"""Round-6 optimization parity tests: every operator that gained a
driver-solved small-data fast path must produce EXACTLY the same result
through its distributed fallback (threshold forced to 0), and the
forward-stencil pair joins must reproduce the classic ordered relation.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_tools_spark.operators import cellcover, cluster, network


def _rand_edges(spark, n_nodes=300, n_edges=600, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    return spark.createDataFrame(
        pd.DataFrame({"src_key": a, "dst_key": b}),
        schema="src_key long, dst_key long")


def test_cc_driver_solve_matches_distributed_rounds(spark, monkeypatch):
    edges = _rand_edges(spark).where("src_key % 7 != 3")  # some isolates
    fast = {(r["node"], r["component"])
            for r in network.connected_components(edges).collect()}
    monkeypatch.setattr(network, "CC_DRIVER_MAX_ROWS", 0)
    slow = {(r["node"], r["component"])
            for r in network.connected_components(edges).collect()}
    assert fast == slow and len(fast) > 0


def test_compact_local_matches_distributed_loop(spark, monkeypatch):
    from gis_tools_spark import cells as C
    rng = np.random.default_rng(3)
    lon = rng.uniform(5.0, 6.0, 4000)
    lat = rng.uniform(40.0, 41.0, 4000)
    pts = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    cov = pts.select(C.cell_column(F.col("lon"), F.col("lat"), 9)
                     .alias("cell")).distinct()
    fast = {r["cell"] for r in cellcover.compact_cells(cov).collect()}
    monkeypatch.setattr(cellcover, "COMPACT_LOCAL_MAX_ROWS", 0)
    slow = {r["cell"] for r in cellcover.compact_cells(cov).collect()}
    assert fast == slow and len(fast) > 0


def test_watershed_driver_chase_matches_pointer_doubling(spark, monkeypatch):
    from gis_tools_spark import fixtures
    from gis_tools_spark.raster.hydrology import watershed
    from gis_tools_spark.raster.stitch import d8_flow_direction

    ras = spark.createDataFrame(fixtures.gen_rasters_exact(2, 2, 32))
    fd = d8_flow_direction(ras)
    fast = {tuple(r) for r in watershed(fd).collect()}
    monkeypatch.setattr(network, "CC_DRIVER_MAX_ROWS", 0)
    slow = {tuple(r) for r in watershed(fd).collect()}
    assert fast == slow and len(fast) > 0


@pytest.mark.parametrize("same_seed", [0, 1])
def test_forward_stencil_pairs_match_bruteforce(spark, same_seed):
    rng = np.random.default_rng(20 + same_seed)
    n = 250
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "lon": rng.uniform(0, 1.0, n),
        "lat": rng.uniform(0, 1.0, n)})
    eps = 0.07
    pts = spark.createDataFrame(pdf)
    got = {(r["ia"], r["ib"]) for r in cluster.eps_neighbor_pairs(
        pts, id_col="id", eps=eps).collect()}
    # brute force ordered pairs incl self
    dx = pdf["lon"].to_numpy()[:, None] - pdf["lon"].to_numpy()[None, :]
    dy = pdf["lat"].to_numpy()[:, None] - pdf["lat"].to_numpy()[None, :]
    m = dx * dx + dy * dy <= eps * eps
    want = {(int(i), int(j)) for i, j in zip(*np.nonzero(m))}
    assert got == want


def test_st_forward_stencil_unordered_exactly_once(spark):
    rng = np.random.default_rng(5)
    n = 200
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "lon": rng.uniform(0, 0.5, n),
        "lat": rng.uniform(0, 0.5, n),
        "ts": pd.to_datetime(
            rng.integers(0, 3_600_000, n), unit="ms", utc=True)})
    eps, eps_t = 0.06, 600.0
    pts = spark.createDataFrame(pdf)
    u = cluster._st_pairs_unordered(pts, id_col="id", lon="lon", lat="lat",
                                    ts_col="ts", eps=eps, eps_t_s=eps_t)
    rows = [(r["ia"], r["ib"]) for r in u.collect()]
    # exactly once per unordered pair, never self
    norm = [tuple(sorted(t)) for t in rows]
    assert len(norm) == len(set(norm))
    assert all(a != b for a, b in rows)
    # matches brute force
    us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    dx = pdf["lon"].to_numpy()[:, None] - pdf["lon"].to_numpy()[None, :]
    dy = pdf["lat"].to_numpy()[:, None] - pdf["lat"].to_numpy()[None, :]
    dt = np.abs(us[:, None] - us[None, :])
    m = (dx * dx + dy * dy <= eps * eps) & (dt <= eps_t * 1e6)
    np.fill_diagonal(m, False)
    want = {(int(i), int(j)) for i, j in zip(*np.nonzero(m)) if i < j}
    assert set(norm) == want
