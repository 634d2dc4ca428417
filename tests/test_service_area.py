"""Service areas / isochrones (operators/network.service_area): the
cutoff-pruned distributed Bellman-Ford must equal networkx Dijkstra
truncated at the cutoff — pruning mid-iteration must never cut a path
that re-enters the ball (it can't, weights are positive, but this is
the regression net for that invariant)."""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.operators.network import nearest_facility, service_area


def _graph(n=80, extra=120, seed=7):
    rng = np.random.default_rng(seed)
    rows = [(f"n{i-1}", f"n{i}", float(rng.uniform(1, 6))) for i in range(1, n)]
    for _ in range(extra):
        a, b = rng.integers(0, n, 2)
        if a != b:
            rows.append((f"n{a}", f"n{b}", float(rng.uniform(1, 6))))
    return pd.DataFrame(rows, columns=["src_key", "dst_key", "length"])


def _nx_truncated(pdf, sources, cutoff):
    import networkx as nx

    g = nx.Graph()
    for r in pdf.itertuples(index=False):
        if g.has_edge(r.src_key, r.dst_key):
            g[r.src_key][r.dst_key]["weight"] = min(
                g[r.src_key][r.dst_key]["weight"], r.length)
        else:
            g.add_edge(r.src_key, r.dst_key, weight=r.length)
    exp = {}
    for s in sources:
        if s not in g:
            continue
        for node, d in nx.single_source_dijkstra_path_length(
                g, s, cutoff=cutoff, weight="weight").items():
            exp[(s, node)] = d
    return exp


@pytest.mark.parametrize("cutoff", [4.0, 11.0])
def test_service_area_matches_truncated_dijkstra(spark, cutoff):
    pdf = _graph()
    got = {(r.source, r.node): r.dist
           for r in service_area(spark.createDataFrame(pdf),
                                 ["n0", "n40"], cutoff=cutoff).collect()}
    exp = _nx_truncated(pdf, ["n0", "n40"], cutoff)
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9


def test_missing_source_and_unreachable(spark):
    pdf = pd.DataFrame([("a", "b", 1.0), ("c", "d", 1.0)],
                       columns=["src_key", "dst_key", "length"])
    got = service_area(spark.createDataFrame(pdf), ["a", "zz"], cutoff=5.0)
    rows = {(r.source, r.node): r.dist for r in got.collect()}
    assert rows == {("a", "a"): 0.0, ("a", "b"): 1.0}


def test_nearest_facility_tiebreak(spark):
    # node m is exactly 2.0 from both f1 and f2 -> lexicographic winner f1
    pdf = pd.DataFrame([("f1", "m", 2.0), ("f2", "m", 2.0), ("m", "x", 1.0)],
                       columns=["src_key", "dst_key", "length"])
    got = {r.node: (r.facility, r.dist)
           for r in nearest_facility(spark.createDataFrame(pdf),
                                     ["f1", "f2"], cutoff=3.0).collect()}
    assert got["m"] == ("f1", 2.0)
    assert got["x"] == ("f1", 3.0)
    assert got["f1"] == ("f1", 0.0) and got["f2"] == ("f2", 0.0)
