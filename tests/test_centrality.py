"""Betweenness centrality: exact mode vs networkx, batch-splitting
invariance, weighted mode, sampled-mode determinism and exactness at
k=n, the mega-component guard, and multi-component handling."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_tools_spark.operators.centrality import betweenness, closeness

nx = pytest.importorskip("networkx")


def _random_edges(seed, n=40, p=0.12, weighted=False):
    rng = np.random.RandomState(seed)
    g = nx.gnp_random_graph(n, p, seed=int(seed))
    rows = []
    for u, v in g.edges:
        w = float(rng.randint(1, 9)) if weighted else 1.0
        rows.append((f"n{u}", f"n{v}", w))
    return g, pd.DataFrame(rows, columns=["src_key", "dst_key", "length"])


def _nx_bc(g, weighted):
    return nx.betweenness_centrality(
        g, normalized=False, weight="weight" if weighted else None)


def test_exact_vs_networkx_unweighted(spark):
    g, pdf = _random_edges(1)
    out = betweenness(spark.createDataFrame(pdf)).toPandas()
    exp = _nx_bc(g, False)
    got = dict(zip(out["node"], out["betweenness"]))
    for u in g.nodes:
        if g.degree(u) == 0:
            continue  # isolated nodes never appear in edge rows
        assert abs(got[f"n{u}"] - exp[u]) < 1e-9, u


def test_exact_vs_networkx_weighted(spark):
    g, pdf = _random_edges(7, weighted=True)
    for u, v, w in zip(pdf["src_key"], pdf["dst_key"], pdf["length"]):
        g[int(u[1:])][int(v[1:])]["weight"] = w
    out = betweenness(spark.createDataFrame(pdf),
                      weight_col="length").toPandas()
    exp = _nx_bc(g, True)
    got = dict(zip(out["node"], out["betweenness"]))
    for u in g.nodes:
        if g.degree(u) == 0:
            continue
        assert abs(got[f"n{u}"] - exp[u]) < 1e-9, u


def test_batch_invariance(spark):
    _, pdf = _random_edges(3, n=50)
    df = spark.createDataFrame(pdf)
    a = betweenness(df, batch_size=4).orderBy("node").toPandas()
    b = betweenness(df, batch_size=1000).orderBy("node").toPandas()
    assert (a["node"] == b["node"]).all()
    assert np.allclose(a["betweenness"], b["betweenness"], atol=1e-9)


def test_sample_full_equals_exact_and_deterministic(spark):
    _, pdf = _random_edges(5, n=30)
    df = spark.createDataFrame(pdf)
    exact = betweenness(df).orderBy("node").toPandas()
    k_full = betweenness(df, sample=10_000).orderBy("node").toPandas()
    assert np.allclose(exact["betweenness"], k_full["betweenness"],
                       atol=1e-9)
    s1 = betweenness(df, sample=5, seed=11).orderBy("node").toPandas()
    s2 = betweenness(df, sample=5, seed=11).orderBy("node").toPandas()
    assert np.allclose(s1["betweenness"], s2["betweenness"], atol=1e-12)
    # a different seed picks different sources (estimates differ)
    s3 = betweenness(df, sample=5, seed=12).orderBy("node").toPandas()
    assert not np.allclose(s1["betweenness"], s3["betweenness"], atol=1e-9)


def test_known_graphs(spark):
    # path a-b-c-d: only interior nodes carry load (b and c: 2 each)
    pdf = pd.DataFrame({"src_key": ["a", "b", "c"],
                        "dst_key": ["b", "c", "d"]})
    out = betweenness(spark.createDataFrame(pdf)).toPandas()
    got = dict(zip(out["node"], out["betweenness"]))
    assert got == {"a": 0.0, "b": 2.0, "c": 2.0, "d": 0.0}
    # star: the hub carries every pair
    pdf = pd.DataFrame({"src_key": ["h"] * 4,
                        "dst_key": ["a", "b", "c", "d"]})
    out = betweenness(spark.createDataFrame(pdf)).toPandas()
    got = dict(zip(out["node"], out["betweenness"]))
    assert got["h"] == 6.0 and all(got[k] == 0.0 for k in "abcd")
    # normalized star hub = 1
    out = betweenness(spark.createDataFrame(pdf),
                      normalized=True).toPandas()
    got = dict(zip(out["node"], out["betweenness"]))
    assert abs(got["h"] - 1.0) < 1e-12


def test_multi_component(spark):
    # two disjoint paths; each scores independently
    pdf = pd.DataFrame({"src_key": ["a", "b", "x", "y"],
                        "dst_key": ["b", "c", "y", "z"]})
    out = betweenness(spark.createDataFrame(pdf)).toPandas()
    got = dict(zip(out["node"], out["betweenness"]))
    assert got["b"] == 1.0 and got["y"] == 1.0
    assert got["a"] == got["c"] == got["x"] == got["z"] == 0.0


def test_gate_fixture_graph(spark):
    # the q_graph_betweenness fixture: Z_97 with two affine maps.
    # Pins the properties the unrolled oracle depends on (diameter ≤
    # the 20 unrolled BFS levels; no score near the biased floor
    # boundary) and exactness vs networkx through the operator.
    g = nx.Graph()
    for u in range(97):
        for v in ((u * 7 + 13) % 97, (u * 11 + 5) % 97):
            if u != v:
                g.add_edge(u, v)
    assert nx.is_connected(g) and nx.diameter(g) <= 20
    exp = nx.betweenness_centrality(g, normalized=False)
    fr = np.modf(np.array(list(exp.values())) * 1e6 + 0.5001)[0]
    assert min(fr.min(), (1 - fr).min()) > 1e-4
    pdf = pd.DataFrame([(f"{u}", f"{v}") for u, v in g.edges],
                       columns=["src_key", "dst_key"])
    out = betweenness(spark.createDataFrame(pdf), batch_size=16).toPandas()
    got = {int(n): b for n, b in zip(out["node"], out["betweenness"])}
    assert all(abs(got[u] - exp[u]) < 1e-9 for u in g.nodes)


def test_mega_component_guard(spark):
    _, pdf = _random_edges(2, n=30)
    with pytest.raises(ValueError, match="max_component_rows"):
        betweenness(spark.createDataFrame(pdf), max_component_rows=3)
    with pytest.raises(ValueError, match="max_component_rows"):
        closeness(spark.createDataFrame(pdf), max_component_rows=3)


def test_nonpositive_weight_guard(spark):
    pdf = pd.DataFrame({"src_key": ["a", "b"], "dst_key": ["b", "c"],
                        "length": [1.0, 0.0]})
    with pytest.raises(ValueError, match="positive"):
        betweenness(spark.createDataFrame(pdf), weight_col="length")
    with pytest.raises(ValueError, match="positive"):
        closeness(spark.createDataFrame(pdf), weight_col="length")


def test_closeness_vs_networkx(spark):
    g, pdf = _random_edges(13, n=45)
    out = closeness(spark.createDataFrame(pdf)).toPandas()
    got_c = dict(zip(out["node"], out["closeness"]))
    got_h = dict(zip(out["node"], out["harmonic"]))
    # per-component closeness (no wf scaling): networkx closeness with
    # wf_improved=False on each connected component
    for compo in nx.connected_components(g):
        sub = g.subgraph(compo)
        if sub.number_of_edges() == 0:
            continue
        exp_c = nx.closeness_centrality(sub, wf_improved=False)
        exp_h = nx.harmonic_centrality(sub)
        for u in sub.nodes:
            assert abs(got_c[f"n{u}"] - exp_c[u]) < 1e-9, u
            assert abs(got_h[f"n{u}"] - exp_h[u]) < 1e-9, u


def test_closeness_weighted_and_batches(spark):
    g, pdf = _random_edges(17, n=35, weighted=True)
    for u, v, w in zip(pdf["src_key"], pdf["dst_key"], pdf["length"]):
        g[int(u[1:])][int(v[1:])]["weight"] = w
    df = spark.createDataFrame(pdf)
    a = closeness(df, weight_col="length", batch_size=3) \
        .orderBy("node").toPandas()
    b = closeness(df, weight_col="length", batch_size=500) \
        .orderBy("node").toPandas()
    assert np.allclose(a["closeness"], b["closeness"], atol=1e-9)
    assert np.allclose(a["harmonic"], b["harmonic"], atol=1e-9)
    got = dict(zip(a["node"], a["closeness"]))
    for compo in nx.connected_components(g):
        sub = g.subgraph(compo)
        if sub.number_of_edges() == 0:
            continue
        exp = nx.closeness_centrality(sub, distance="weight",
                                      wf_improved=False)
        for u in sub.nodes:
            assert abs(got[f"n{u}"] - exp[u]) < 1e-9, u


def test_closeness_sampled(spark):
    _, pdf = _random_edges(23, n=40)
    df = spark.createDataFrame(pdf)
    exact = closeness(df).orderBy("node").toPandas()
    full = closeness(df, sample=10_000).orderBy("node").toPandas()
    assert np.allclose(exact["closeness"], full["closeness"], atol=1e-9)
    s1 = closeness(df, sample=8, seed=5).orderBy("node").toPandas()
    s2 = closeness(df, sample=8, seed=5).orderBy("node").toPandas()
    assert np.allclose(s1["harmonic"], s2["harmonic"], atol=1e-12)
