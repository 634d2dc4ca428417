"""Network / graph operators (SURVEY.md §2.13; reference
/root/reference/gistools/network.py).

Edges live in a DataFrame (edge_id, src_key, dst_key, weight, direction)
with node keys = rounded endpoint coordinates (the reference keys its
networkx MultiGraph by coordinate tuples, network.py:131-137).

Distributed pieces are plain DataFrame ops (degree, self-loops,
multi-edges); connected components use iterative label propagation
(small-world joins); Dijkstra runs per-component via applyInPandas with
networkx — authentic to the reference (network.py:625-774) while only
shuffling each component once.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..geom import wkb

KEY_DECIMALS = 9  # coordinate rounding for node identity


def edges_from_lines(df: DataFrame, *, wkb_col: str = "geometry_wkb",
                     id_col: str = "lid") -> DataFrame:
    """Line layer → edge table with endpoint node keys + length."""

    @F.pandas_udf(T.StructType([
        T.StructField("src_key", T.StringType()),
        T.StructField("dst_key", T.StringType()),
        T.StructField("length", T.DoubleType()),
    ]))
    def _ends(s: pd.Series) -> pd.DataFrame:
        rows = []
        for b in s:
            g = wkb.decode(b)
            coords = g["coords"] if g["type"] == "LineString" else g["lines"][0]
            p, q = coords[0], coords[-1]
            d = np.diff(coords[:, :2], axis=0)
            ln = float(np.sqrt((d * d).sum(axis=1)).sum())
            fmt = lambda c: f"{round(float(c[0]), KEY_DECIMALS)},{round(float(c[1]), KEY_DECIMALS)}"  # noqa: E731
            rows.append((fmt(p), fmt(q), ln))
        return pd.DataFrame(rows, columns=["src_key", "dst_key", "length"])

    out = df.withColumn("__e", _ends(F.col(wkb_col)))
    return (out.withColumn("src_key", F.col("__e.src_key"))
            .withColumn("dst_key", F.col("__e.dst_key"))
            .withColumn("length", F.col("__e.length"))
            .drop("__e"))


def self_loops(edges: DataFrame) -> DataFrame:
    """Edges whose endpoints coincide (reference network.py:80-87)."""
    return edges.where(F.col("src_key") == F.col("dst_key"))


def multi_edges(edges: DataFrame) -> DataFrame:
    """Duplicate (src,dst) pairs, undirected (network.py:38-52)."""
    a = F.least("src_key", "dst_key").alias("u")
    b = F.greatest("src_key", "dst_key").alias("v")
    return (edges.select(a, b).groupBy("u", "v").count()
            .where(F.col("count") > 1))


def node_degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree per node key (basis for end-nodes / remote
    nodes, network.py:53-87, 197-215)."""
    nodes = (edges.select(F.col("src_key").alias("node"))
             .unionAll(edges.select(F.col("dst_key").alias("node"))))
    return nodes.groupBy("node").agg(F.count("*").alias("degree"))


def end_nodes(edges: DataFrame) -> DataFrame:
    return node_degrees(edges).where("degree = 1")


def connected_components(edges: DataFrame, *, max_iter: int = 64) -> DataFrame:
    """(node, component) via min-label propagation **with pointer
    jumping**: each round does (1) neighbor-min propagation and (2) label
    compression `component ← label(component)`, so convergence is
    O(log diameter) rounds, not O(diameter) — a million-node road chain
    converges in ~20 rounds instead of silently stopping partway.
    Raises on non-convergence rather than returning split components
    (which would feed Dijkstra wrong subgraphs downstream). Returns all
    nodes incl. isolated endpoints."""
    und = (edges.select(F.col("src_key").alias("a"), F.col("dst_key").alias("b"))
           .unionAll(edges.select(F.col("dst_key").alias("a"), F.col("src_key").alias("b")))
           .distinct())
    labels = (und.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("component", F.col("node")))
    for _ in range(max_iter):
        cand = (und.join(labels.withColumnRenamed("node", "b")
                         .withColumnRenamed("component", "nbr_comp"), on="b")
                .groupBy("a").agg(F.min("nbr_comp").alias("min_nbr")))
        new = (labels.join(cand.withColumnRenamed("a", "node"), on="node", how="left")
               .select("node",
                       F.least(F.col("component"), F.coalesce(F.col("min_nbr"), F.col("component")))
                       .alias("component")))
        # pointer jumping: component ids are node keys, so compress one
        # hop through the label table (large-star step)
        root = (new.select(F.col("node").alias("component"),
                           F.col("component").alias("root")))
        new = (new.join(root, on="component", how="left")
               .select("node",
                       F.least(F.col("component"),
                               F.coalesce(F.col("root"), F.col("component")))
                       .alias("component")))
        new = new.localCheckpoint(eager=True)
        changed = (new.alias("n").join(labels.alias("o"), on="node")
                   .where(F.col("n.component") != F.col("o.component")).limit(1).count())
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def expand_directed(edges: DataFrame, *, direction_col: str = "direction") -> DataFrame:
    """Expand per `direction` into directed arcs (reference build_graph
    network.py:814-844): 'two-ways' → fwd+rev, 'one-way' → fwd,
    'reverse' → rev. Adds `is_forward` boolean; rev arcs swap endpoints."""
    fwd = (edges.where(F.col(direction_col).isin("two-ways", "one-way"))
           .withColumn("is_forward", F.lit(True)))
    rev = (edges.where(F.col(direction_col).isin("two-ways", "reverse"))
           .withColumn("is_forward", F.lit(False))
           .withColumnRenamed("src_key", "__t")
           .withColumnRenamed("dst_key", "src_key")
           .withColumnRenamed("__t", "dst_key"))
    return fwd.unionByName(rev.select(*fwd.columns))


def travel_times(lines: DataFrame, *, wkb_col: str = "geometry_wkb",
                 speed_col: str = "max_speed",
                 rollover_criterion: float = 3.0,
                 min_speed: float = 1.0) -> DataFrame:
    """Per-edge travel time (reference travel_time network.py:846-1047,
    simplified kinematics): per-segment allowed speed =
    min(max_speed, sqrt(rollover · R)) with R the curve radius at the
    segment's vertices (rollover criterion network.py:521-522);
    time = Σ seg_len / v. Adds `travel_time` and `mean_speed` columns.
    Units follow the inputs (speed in length-units/hour → time in hours).
    """
    fields = T.StructType(list(lines.schema.fields) + [
        T.StructField("travel_time", T.DoubleType()),
        T.StructField("mean_speed", T.DoubleType()),
    ])

    def _run(it):
        for pdf in it:
            tt, ms = [], []
            for i in range(len(pdf)):
                g = wkb.decode(pdf[wkb_col].iloc[i])
                coords = g["coords"] if g["type"] == "LineString" else g["lines"][0]
                pts = coords[:, :2]
                seg = np.sqrt((np.diff(pts, axis=0) ** 2).sum(axis=1))
                vmax = float(pdf[speed_col].iloc[i])
                v = np.full(len(seg), max(vmax, min_speed))
                if len(pts) >= 3:
                    from ..geom.kernels import radius_of_curvature

                    r = radius_of_curvature(coords)
                    vcurve = np.sqrt(rollover_criterion * r)
                    # a curve radius at vertex k limits segments k and k+1
                    lim = np.full(len(seg), np.inf)
                    lim[:-1] = np.minimum(lim[:-1], vcurve)
                    lim[1:] = np.minimum(lim[1:], vcurve)
                    v = np.maximum(np.minimum(v, lim), min_speed)
                total_len = float(seg.sum())
                t = float((seg / v).sum()) if total_len > 0 else 0.0
                tt.append(t)
                ms.append(total_len / t if t > 0 else 0.0)
            out = pdf.copy()
            out["travel_time"] = tt
            out["mean_speed"] = ms
            yield out

    return lines.mapInPandas(_run, schema=fields)


def shortest_paths(edges: DataFrame, sources: list[str], *,
                   weight_col: str = "length", max_iter: int = 0) -> DataFrame:
    """Single-source shortest path lengths from each source node key to
    every reachable node (reference Dijkstra network.py:625-774).

    Physical plan: label components → groupBy(component) →
    applyInPandas(networkx dijkstra) — each component shuffles once and
    solves in-process, the reference's exact algorithm per subgraph.
    """
    comp = connected_components(edges)
    e = (edges.join(comp.withColumnRenamed("node", "src_key")
                    .withColumnRenamed("component", "component"), on="src_key"))
    srcs = set(sources)

    schema = T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("node", T.StringType()),
        T.StructField("dist", T.DoubleType()),
    ])

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        import networkx as nx

        g = nx.Graph()
        for _, r in pdf.iterrows():
            w = float(r[weight_col])
            if g.has_edge(r["src_key"], r["dst_key"]):
                if w < g[r["src_key"]][r["dst_key"]]["weight"]:
                    g[r["src_key"]][r["dst_key"]]["weight"] = w
            else:
                g.add_edge(r["src_key"], r["dst_key"], weight=w)
        rows = []
        for s in srcs & set(g.nodes):
            dist = nx.single_source_dijkstra_path_length(g, s, weight="weight")
            rows.extend((s, n, float(d)) for n, d in dist.items())
        return pd.DataFrame(rows, columns=["source", "node", "dist"])

    return e.groupBy("component").applyInPandas(lambda k, pdf: _solve(pdf), schema=schema)
