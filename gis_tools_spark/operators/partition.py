"""Equal-area polygon partitioning (SURVEY.md §2.4 `partition`;
reference layer.py:1765-1794 + geometry.py:37-104: katana-split the
polygon into small pieces, build the piece-adjacency graph, METIS-
partition it, union each part).

METIS has no wheel in this sandbox; per SURVEY §7.5 the acceptable
substitute is a balanced graph partition validated on the reference's
own area-balance criterion (parts within ±1/disaggregation_factor of
equal area). We use greedy balanced region-growing over the adjacency
graph (BFS from spread seeds, always extending the currently-smallest
part), which keeps parts contiguous and balanced.

Per-polygon work is embarrassingly parallel → one Arrow batch kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..geom import kernels as K, wkb
from .split import katana_split


def _adjacency(pieces: list[dict]) -> list[set[int]]:
    bounds = [K.bounds(p) for p in pieces]
    adj: list[set[int]] = [set() for _ in pieces]
    for i in range(len(pieces)):
        for j in range(i + 1, len(pieces)):
            b1, b2 = bounds[i], bounds[j]
            if b1[0] > b2[2] + 1e-12 or b2[0] > b1[2] + 1e-12 \
               or b1[1] > b2[3] + 1e-12 or b2[1] > b1[3] + 1e-12:
                continue
            if K.intersects(pieces[i], pieces[j]):
                adj[i].add(j)
                adj[j].add(i)
    return adj


def partition_one(g: dict, n_parts: int, pieces_per_part: int = 8) -> list[dict]:
    """Split one polygon into n_parts contiguous roughly-equal-area parts."""
    total = K.area(g)
    threshold = max(total / (n_parts * pieces_per_part), 1e-12)
    # katana thresholds are bbox-area based; convert via fill ratio
    mnx, mny, mxx, mxy = K.bounds(g)
    bbox_area = (mxx - mnx) * (mxy - mny)
    fill = max(total / bbox_area, 1e-6)
    pieces = katana_split(g, threshold / fill)
    # the bbox-fill heuristic under-splits sparse/disjoint geometries —
    # keep halving the biggest piece until there's enough granularity
    target = max(n_parts * 3, n_parts + 1)
    guard = 0
    while len(pieces) < target and guard < 64:
        guard += 1
        pieces.sort(key=K.area, reverse=True)
        big = pieces.pop(0)
        mnx_, mny_, mxx_, mxy_ = K.bounds(big)
        sub = katana_split(big, (mxx_ - mnx_) * (mxy_ - mny_) / 2.1)
        if len(sub) <= 1:
            pieces.append(big)
            break
        pieces.extend(sub)
    pieces.sort(key=lambda p: K.bounds(p)[:2])
    if len(pieces) <= n_parts:
        return [{"type": "Polygon", "rings": p["rings"]} for p in pieces]
    areas = np.array([K.area(p) for p in pieces])
    adj = _adjacency(pieces)

    # seeds: spread by picking mutually-far pieces (k-center greedy)
    cents = np.array([K.centroid(p) for p in pieces])
    seeds = [int(np.argmax(areas))]
    while len(seeds) < n_parts:
        d = np.min(
            [np.hypot(cents[:, 0] - cents[s, 0], cents[:, 1] - cents[s, 1])
             for s in seeds], axis=0)
        d[seeds] = -1
        seeds.append(int(np.argmax(d)))

    assign = -np.ones(len(pieces), dtype=int)
    part_area = np.zeros(n_parts)
    frontiers: list[set[int]] = [set() for _ in range(n_parts)]
    for k, s in enumerate(seeds):
        assign[s] = k
        part_area[k] = areas[s]
        frontiers[k] = {j for j in adj[s] if assign[j] < 0}
    # region growing: smallest part grabs an unassigned neighbor
    while (assign < 0).any():
        order = np.argsort(part_area)
        grew = False
        for k in order:
            cand = [j for j in frontiers[k] if assign[j] < 0]
            if not cand:
                frontiers[k] = set()
                continue
            j = max(cand, key=lambda x: areas[x])
            assign[j] = k
            part_area[k] += areas[j]
            frontiers[k] |= {m for m in adj[j] if assign[m] < 0}
            grew = True
            break
        if not grew:
            # disconnected leftovers: dump into smallest part
            left = np.nonzero(assign < 0)[0]
            k = int(np.argmin(part_area))
            for j in left:
                assign[j] = k
                part_area[k] += areas[j]
    out = []
    for k in range(n_parts):
        polys = [pieces[i]["rings"] for i in np.nonzero(assign == k)[0]]
        if not polys:
            continue
        out.append({"type": "Polygon", "rings": polys[0]} if len(polys) == 1
                   else {"type": "MultiPolygon", "polygons": polys})
    return out


def partition_polygons(df: DataFrame, n_parts: int, *,
                       wkb_col: str = "geometry_wkb") -> DataFrame:
    """Layer-level partition: each polygon row → n_parts rows
    (part_index, part_wkb, part_area)."""
    fields = list(df.schema.fields) + [
        T.StructField("part_index", T.IntegerType()),
        T.StructField("part_wkb", T.BinaryType()),
        T.StructField("part_area", T.DoubleType()),
    ]

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in range(len(pdf)):
                buf = pdf[wkb_col].iloc[i]
                if buf is None:
                    continue
                parts = partition_one(wkb.decode(buf), n_parts)
                for k, p in enumerate(parts):
                    row = pdf.iloc[i].to_dict()
                    row["part_index"] = k
                    row["part_wkb"] = wkb.encode(p)
                    row["part_area"] = K.area(p)
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(_run, schema=T.StructType(fields))
