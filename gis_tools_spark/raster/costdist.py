"""Cost-distance accumulation over tiled cost-surface mosaics.

ArcGIS "Cost Distance" / GRASS r.cost semantics, cost-to-enter
variant: moving into cell v costs ``cost(v) * step`` with step 1 for
cardinal and √2 for diagonal moves; the result is the cheapest
accumulated cost from any source cell. (GRASS's (c_u+c_v)/2 averaging
needs the neighbor tile's cost in the halo; the enter-cost variant
needs only the local cost raster plus the DISTANCE halo, which is what
makes the iteration below exchange 1-px strips, not whole tiles.)

Distributed algorithm — block sweeps (the standard parallel Dijkstra
decomposition): every tile runs an in-task Dijkstra seeded by its own
current distances plus the 1-px halo of its neighbors' distances, and
the pass repeats until no tile improves. Distances only decrease and
each pass extends optimal paths across at least one more tile border,
so the iteration count is bounded by the maximum number of tile
crossings of any optimal path (≈ mosaic diameter in tiles), NOT by the
path length in pixels. Unreached cells stay +inf; no-data cost cells
are barriers (NaN).
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import codec
from .stitch import _grid_indexed, stitched_apply

__all__ = ["cost_distance"]

_SQRT2 = float(np.sqrt(2.0))
_MOVES = [(-1, -1, _SQRT2), (-1, 0, 1.0), (-1, 1, _SQRT2),
          (0, -1, 1.0), (0, 1, 1.0),
          (1, -1, _SQRT2), (1, 0, 1.0), (1, 1, _SQRT2)]


def _tile_dijkstra(p: np.ndarray, row: pd.Series) -> np.ndarray:
    """One block sweep: Dijkstra over the (h+2, w+2) padded grid, seeds
    = every finite distance (own cells + halo), entry cost = the local
    cost raster (halo cells are never re-entered)."""
    cost = codec.decode(row["cost_bytes"], int(row["w"]), int(row["h"]),
                        row["cost_fmt"]).astype(np.float64)
    cost = np.where(cost == codec.NO_DATA_F32, np.nan, cost)
    H, W = p.shape
    dist = p.copy()                      # NaN = barrier, inf = unreached
    enter = np.full((H, W), np.nan)
    enter[1:-1, 1:-1] = cost
    heap = [(d, i, j) for (i, j), d in np.ndenumerate(dist)
            if np.isfinite(d)]
    heapq.heapify(heap)
    while heap:
        d, i, j = heapq.heappop(heap)
        if d > dist[i, j]:
            continue
        for di, dj, step in _MOVES:
            vi, vj = i + di, j + dj
            if not (1 <= vi < H - 1 and 1 <= vj < W - 1):
                continue
            ce = enter[vi, vj]
            if np.isnan(ce):
                continue
            nd = d + ce * step
            cur = dist[vi, vj]
            if np.isnan(cur) or nd < cur:
                dist[vi, vj] = nd
                heapq.heappush(heap, (nd, vi, vj))
    out = dist[1:-1, 1:-1]
    out[np.isnan(cost)] = np.nan
    return out


def cost_distance(cost: DataFrame, source_cells: list[tuple[int, int]], *,
                  no_data: float = codec.NO_DATA_F32,
                  max_iters: int = 64) -> DataFrame:
    """Accumulated cost surface from ``source_cells`` (global (gix,
    giy) pixel indices) over a tiled cost mosaic. Returns the input
    tile rows with `bytes` replaced by the float32 distance raster
    (+inf = unreachable, no-data where the cost was no-data) and the
    cost preserved in `cost_bytes`/`cost_fmt`."""
    t, _, _ = _grid_indexed(cost)
    srcs = sorted(set(source_cells))

    def _init(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in range(len(pdf)):
                r = pdf.iloc[i].copy()
                w, h = int(r["w"]), int(r["h"])
                arr = codec.decode(r["bytes"], w, h, r["fmt"])
                dist = np.full((h, w), np.inf, dtype=np.float32)
                dist[arr == no_data] = no_data
                tx, ty = int(r["__col"]), int(r["__row"])
                for gx, gy in srcs:
                    lx, ly = gx - tx * w, gy - ty * h
                    if 0 <= lx < w and 0 <= ly < h \
                            and arr[ly, lx] != no_data:
                        dist[ly, lx] = 0.0
                r["cost_bytes"] = r["bytes"]
                r["cost_fmt"] = r["fmt"]
                r["bytes"] = codec.encode_raw_f32(dist)
                r["fmt"] = "raw_f32"
                rows.append(r)
            if rows:
                yield pd.DataFrame(rows)

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in t.schema.fields
    ) + ", cost_bytes binary, cost_fmt string"
    cur = t.mapInPandas(_init, schema=schema).drop("__col", "__row") \
        .localCheckpoint(eager=True)

    for _ in range(max_iters):
        nxt = stitched_apply(cur, _tile_dijkstra, no_data=no_data,
                             pass_row=True).localCheckpoint(eager=True)
        changed = (nxt.select("image_id", F.col("bytes").alias("nb"))
                   .join(cur.select("image_id", "bytes"), on="image_id")
                   .where(F.col("nb") != F.col("bytes"))
                   .limit(1).count())
        cur = nxt
        if changed == 0:
            break
    return cur
