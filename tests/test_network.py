"""Network operators vs networkx oracle on the fixture road grid."""

import networkx as nx
import numpy as np
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.geom import kernels as K, wkb
from gis_tools_spark.operators.network import (
    connected_components,
    edges_from_lines,
    end_nodes,
    multi_edges,
    self_loops,
    shortest_paths,
)


@pytest.fixture(scope="module")
def road_edges(spark):
    lines = fixtures.gen_lines(24)  # 4 random + grid + island + loop
    df = spark.createDataFrame(lines)
    return edges_from_lines(df), lines


def _nx_graph(lines):
    g = nx.Graph()
    for _, r in lines.iterrows():
        geom = wkb.decode(r["geometry_wkb"])
        coords = geom["coords"] if geom["type"] == "LineString" else geom["lines"][0]
        p, q = coords[0], coords[-1]
        key = lambda c: f"{round(float(c[0]),9)},{round(float(c[1]),9)}"  # noqa: E731
        d = np.diff(coords[:, :2], axis=0)
        ln = float(np.sqrt((d * d).sum(axis=1)).sum())
        u, v = key(p), key(q)
        if u != v:
            if g.has_edge(u, v):
                g[u][v]["weight"] = min(g[u][v]["weight"], ln)
            else:
                g.add_edge(u, v, weight=ln)
        else:
            g.add_node(u)
    return g


def test_self_loops_and_degrees(road_edges):
    edges, lines = road_edges
    assert self_loops(edges).count() == 1  # fixture self-loop
    g = _nx_graph(lines)
    deg1 = {n for n, d in g.degree() if d == 1}
    got = {r["node"] for r in end_nodes(edges.where("src_key != dst_key")).collect()}
    assert got == deg1


def test_connected_components_match_networkx(road_edges):
    edges, lines = road_edges
    g = _nx_graph(lines)
    want = {frozenset(c) for c in nx.connected_components(g) if len(c) > 1}
    comp = connected_components(edges.where("src_key != dst_key")).toPandas()
    groups = comp.groupby("component")["node"].apply(frozenset)
    got = {grp for grp in groups if len(grp) > 1}
    assert got == want


def test_travel_times_and_direction_expansion(spark):
    import pandas as pd

    from gis_tools_spark.operators.network import expand_directed, travel_times

    df = spark.createDataFrame(pd.DataFrame({
        "lid": [1, 2],
        "geometry_wkb": [wkb.linestring([(0., 0.), (10., 0.)]),
                         wkb.linestring([(0., 0.), (1., 0.), (1.3, 0.3), (1.3, 1.3)])],
        "direction": ["two-ways", "one-way"],
        "max_speed": [25.0, 25.0]}))
    out = travel_times(df).toPandas().set_index("lid")
    assert out.loc[1, "travel_time"] == pytest.approx(10 / 25)
    assert out.loc[1, "mean_speed"] == pytest.approx(25.0)
    assert out.loc[2, "mean_speed"] < 25.0  # curvature-limited

    from gis_tools_spark.operators.network import edges_from_lines

    d = expand_directed(edges_from_lines(df)).toPandas()
    assert len(d) == 3
    assert set(d[d.lid == 1]["is_forward"]) == {True, False}
    one = d[d.lid == 2].iloc[0]
    assert one["is_forward"]


def test_radius_of_curvature_kernel():
    th = np.array([0.0, 0.5, 1.0])
    pts = np.stack([np.cos(th), np.sin(th)], axis=1)
    assert K.radius_of_curvature(pts)[0] == pytest.approx(1.0)
    assert np.isinf(K.radius_of_curvature(np.array([(0, 0), (1, 0), (2, 0)], float))[0])


def test_shortest_paths_match_networkx(road_edges):
    edges, lines = road_edges
    g = _nx_graph(lines)
    src = "7.0,42.0"  # grid corner node
    assert src in g
    want = nx.single_source_dijkstra_path_length(g, src, weight="weight")
    got = {r["node"]: r["dist"] for r in
           shortest_paths(edges.where("src_key != dst_key"), [src]).collect()}
    assert set(got) == set(want)
    for n, d in want.items():
        assert got[n] == pytest.approx(d, abs=1e-9)


def test_pagerank_fixed_point_and_replay(spark):
    """Power iteration with dangling redistribution: ranks sum to 1,
    the converged vector satisfies the PageRank fixed-point equation to
    1e-9 (an algorithm-independent check), and a numpy replay of the
    fixed-iteration contract matches to 1e-12."""
    import numpy as np

    from gis_tools_spark.operators.network import pagerank

    rng = np.random.default_rng(11)
    E = {(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2))
         if a != b}
    df = spark.createDataFrame(sorted(E), "src long, dst long")
    out = pagerank(df, iters=40).toPandas()
    got = dict(zip(out.node.astype(int), out.pr))
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # fixed-point residual: pr ≈ (1-d)/N + d (A^T pr + dang/N)
    nodes0 = sorted(got)
    idx0 = {v: i for i, v in enumerate(nodes0)}
    n0 = len(nodes0)
    v = np.array([got[x] for x in nodes0])
    deg = np.zeros(n0)
    for a, b in E:
        deg[idx0[a]] += 1
    nxt = np.full(n0, 0.15 / n0) + 0.85 * v[deg == 0].sum() / n0
    for a, b in E:
        nxt[idx0[b]] += 0.85 * v[idx0[a]] / deg[idx0[a]]
    assert np.max(np.abs(nxt - v)) < 1e-9

    # exact replay of the fixed-iteration contract
    nodes = sorted(got)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, v in E:
        outdeg[idx[u]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(40):
        new = np.full(n, 0.15 / n) + 0.85 * pr[outdeg == 0].sum() / n
        for u, v in E:
            new[idx[v]] += 0.85 * pr[idx[u]] / outdeg[idx[u]]
        pr = new
    assert all(abs(got[v] - pr[idx[v]]) < 1e-12 for v in nodes)
