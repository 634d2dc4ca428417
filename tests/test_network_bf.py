"""Round-4: mega-component guard for shortest_paths (round-3 verdict
"What's wrong" #3 / next-round #5). A continental road network is one
huge connected component; shipping it to a single applyInPandas task
OOMs at scale, so components above ``max_component_rows`` edges run the
distributed Bellman-Ford frontier iteration instead. Both paths must
agree with networkx exactly."""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.operators.network import shortest_paths


def _random_graph(n_nodes=120, extra_edges=150, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    # spanning chain keeps one big component; extra random edges add
    # shortcuts so dijkstra != hop count
    for i in range(1, n_nodes):
        rows.append((f"n{i-1}", f"n{i}", float(rng.uniform(1, 10))))
    for _ in range(extra_edges):
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            rows.append((f"n{a}", f"n{b}", float(rng.uniform(1, 10))))
    # a second small component
    rows += [("m0", "m1", 2.0), ("m1", "m2", 3.0)]
    return pd.DataFrame(rows, columns=["src_key", "dst_key", "length"])


def _nx_expected(pdf, sources):
    import networkx as nx

    g = nx.Graph()
    for _, r in pdf.iterrows():
        w = float(r["length"])
        if g.has_edge(r["src_key"], r["dst_key"]):
            g[r["src_key"]][r["dst_key"]]["weight"] = min(
                w, g[r["src_key"]][r["dst_key"]]["weight"])
        else:
            g.add_edge(r["src_key"], r["dst_key"], weight=w)
    exp = {}
    for s in sources:
        if s in g:
            for n, d in __import__("networkx").single_source_dijkstra_path_length(
                    g, s, weight="weight").items():
                exp[(s, n)] = round(float(d), 9)
    return exp


@pytest.fixture(scope="module")
def graph(spark):
    pdf = _random_graph()
    return spark.createDataFrame(pdf), pdf


def _collect(df):
    return {(r["source"], r["node"]): round(float(r["dist"]), 9)
            for r in df.collect()}


def test_bellman_ford_matches_networkx(graph):
    edges, pdf = graph
    sources = ["n0", "n57", "m1"]
    exp = _nx_expected(pdf, sources)
    got = _collect(shortest_paths(edges, sources, method="bellman-ford"))
    assert got == exp


def test_auto_guard_routes_big_components(graph):
    """max_component_rows below the big component's edge count forces
    the distributed path for it while the small component still solves
    in-process — and the union equals networkx."""
    edges, pdf = graph
    sources = ["n0", "m0"]
    exp = _nx_expected(pdf, sources)
    got = _collect(shortest_paths(edges, sources, max_component_rows=50))
    assert got == exp


def test_auto_default_unchanged(graph):
    """Small graphs keep the reference's exact per-component Dijkstra."""
    edges, pdf = graph
    sources = ["n3"]
    exp = _nx_expected(pdf, sources)
    got = _collect(shortest_paths(edges, sources))
    assert got == exp
