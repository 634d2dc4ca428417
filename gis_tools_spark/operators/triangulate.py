"""Per-group Delaunay triangulation and Voronoi cells.

The reference exposes shapely/scipy-style triangulation helpers on its
layers (gistools geometry.py centroid/overlay building blocks); here the
operators are Spark-first: millions of SMALL groups (a zone, a tile, a
trajectory cluster) triangulated independently via applyInPandas — the
100 TB pattern is per-tile triangulation fanned across executors, not
one global triangulation (which is not a bounded-memory distributed
primitive; katana/fishnet the AOI first to get groups).

The Delaunay kernel is a from-scratch edge-wavefront ("gift wrap by
circumcircle") construction with EXACT integer predicates:

- For a directed frontier edge (u, v) the mate is the candidate point
  strictly left of u→v minimizing the circle-pencil parameter; a linear
  scan with the exact incircle determinant finds it because circles
  through (u, v) form a monotone 1-parameter family over that half
  plane.
- orient/incircle are 3×3 / lifted 3×3 integer determinants evaluated
  in Python ints (no overflow ever); inputs must be integer lattice
  coordinates (callers scale floats — degrees × 1e4 keeps the SQL
  oracle's BIGINT mirror overflow-free below |coord| ≤ 1e4).
- Cocircular ties keep the first candidate in deterministic scan order
  (points sorted lexicographically), so output is partition- and
  run-independent: a valid triangulation always, THE Delaunay
  triangulation whenever no 4 points are cocircular.

Voronoi cells are the half-plane-clip dual (each site's cell = clip box
∩ bisector half-planes of every other site in the group, O(n²) per
group in float64 after exact dedupe) — conservation (cells partition
the box) is the pytest + gate property.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MAX_ABS_COORD = 100_000  # keeps the DuckDB BIGINT incircle mirror safe


def _orient(ax, ay, bx, by, cx, cy) -> int:
    """Sign of the CCW cross product (exact, Python ints)."""
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return (v > 0) - (v < 0)


def _incircle(ax, ay, bx, by, cx, cy, px, py) -> int:
    """Sign of the lifted determinant: > 0 iff p is STRICTLY inside the
    circumcircle of CCW triangle (a, b, c). Exact Python ints."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    ad2 = adx * adx + ady * ady
    bd2 = bdx * bdx + bdy * bdy
    cd2 = cdx * cdx + cdy * cdy
    v = (adx * (bdy * cd2 - bd2 * cdy)
         - ady * (bdx * cd2 - bd2 * cdx)
         + ad2 * (bdx * cdy - bdy * cdx))
    return (v > 0) - (v < 0)


def triangulate_points(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int, int]]:
    """Exact Delaunay wavefront over integer coordinates. Returns
    index triples (into the input arrays) in CCW orientation, each
    sorted ascending within the triple. Duplicate coordinates must be
    removed by the caller; fewer than 3 points or all-collinear input
    yields []."""
    n = len(xs)
    if n < 3:
        return []
    if (np.abs(xs).max() > MAX_ABS_COORD) or (np.abs(ys).max() > MAX_ABS_COORD):
        raise ValueError(
            f"triangulate_points: |coordinates| must be <= {MAX_ABS_COORD} "
            "(scale/translate the lattice first)")
    X = [int(v) for v in xs]
    Y = [int(v) for v in ys]
    order = sorted(range(n), key=lambda i: (X[i], Y[i]))
    # seed hull edge from the lexicographic minimum: gift-wrap one step
    a = order[0]
    b = -1
    for p in order[1:]:
        if b < 0:
            b = p
            continue
        s = _orient(X[a], Y[a], X[b], Y[b], X[p], Y[p])
        if s < 0:
            b = p
        elif s == 0:
            # collinear: keep the nearer, so on-line points chain up
            if (abs(X[p] - X[a]) + abs(Y[p] - Y[a])
                    < abs(X[b] - X[a]) + abs(Y[b] - Y[a])):
                b = p
    queue = [(a, b), (b, a)]
    visited: set[tuple[int, int]] = set()
    tris: list[tuple[int, int, int]] = []
    while queue:
        u, v = queue.pop()
        if (u, v) in visited:
            continue
        visited.add((u, v))
        best = -1
        for p in order:
            if p == u or p == v:
                continue
            if _orient(X[u], Y[u], X[v], Y[v], X[p], Y[p]) <= 0:
                continue  # not strictly left of u->v
            if best < 0 or _incircle(X[u], Y[u], X[v], Y[v],
                                     X[best], Y[best], X[p], Y[p]) > 0:
                best = p
        if best < 0:
            continue  # hull edge: nothing on this side
        c = best
        tris.append(tuple(sorted((u, v, c))))
        # the new triangle fills the left of u->v, v->c, c->u;
        # explore the far sides of the two new edges
        visited.add((v, c))
        visited.add((c, u))
        for e in ((c, v), (u, c)):
            if e not in visited:
                queue.append(e)
    # triangles can be discovered from up to three frontier edges
    return sorted(set(tris))


def _dedupe(ids, xs, ys):
    """Exact coordinate dedupe keeping the smallest id per lattice
    point (deterministic whatever the partition order)."""
    df = pd.DataFrame({"id": ids, "x": xs, "y": ys})
    df = (df.sort_values(["x", "y", "id"])
          .drop_duplicates(["x", "y"], keep="first")
          .reset_index(drop=True))
    return df["id"].to_numpy(), df["x"].to_numpy(), df["y"].to_numpy()


def delaunay_edges(points: DataFrame, *, by: str, id_col: str = "id",
                   x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Distributed per-group Delaunay: (by, i, j) unique undirected
    triangulation edges with i < j (original ids). Coordinates must be
    integer lattice values (cast to long upstream)."""
    schema = T.StructType([
        points.schema[by],
        T.StructField("i", T.LongType()),
        T.StructField("j", T.LongType()),
    ])

    def _fn(key, pdf):
        ids, xs, ys = _dedupe(pdf[id_col].to_numpy(),
                              pdf[x_col].to_numpy(), pdf[y_col].to_numpy())
        tris = triangulate_points(xs, ys)
        edges = sorted({(min(int(ids[p]), int(ids[q])),
                         max(int(ids[p]), int(ids[q])))
                        for t in tris
                        for p, q in ((t[0], t[1]), (t[0], t[2]), (t[1], t[2]))})
        return pd.DataFrame({by: [key[0]] * len(edges),
                             "i": [e[0] for e in edges],
                             "j": [e[1] for e in edges]})

    return (points.repartition(by).groupBy(by)
            .applyInPandas(_fn, schema=schema))


def delaunay_triangles(points: DataFrame, *, by: str, id_col: str = "id",
                       x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Distributed per-group Delaunay triangles: (by, i, j, k) with
    i < j < k (original ids)."""
    schema = T.StructType([
        points.schema[by],
        T.StructField("i", T.LongType()),
        T.StructField("j", T.LongType()),
        T.StructField("k", T.LongType()),
    ])

    def _fn(key, pdf):
        ids, xs, ys = _dedupe(pdf[id_col].to_numpy(),
                              pdf[x_col].to_numpy(), pdf[y_col].to_numpy())
        tris = triangulate_points(xs, ys)
        trip = sorted(tuple(sorted((int(ids[a]), int(ids[b]), int(ids[c]))))
                      for a, b, c in tris)
        return pd.DataFrame({by: [key[0]] * len(trip),
                             "i": [t[0] for t in trip],
                             "j": [t[1] for t in trip],
                             "k": [t[2] for t in trip]})

    return (points.repartition(by).groupBy(by)
            .applyInPandas(_fn, schema=schema))


def _clip_halfplane(poly: np.ndarray, nx: float, ny: float, d: float) -> np.ndarray:
    """Sutherland-Hodgman clip of polygon rows (x, y) by
    nx*x + ny*y <= d."""
    if len(poly) == 0:
        return poly
    keep = poly[:, 0] * nx + poly[:, 1] * ny <= d
    out = []
    m = len(poly)
    for i in range(m):
        j = (i + 1) % m
        pi, pj = poly[i], poly[j]
        if keep[i]:
            out.append(pi)
        if keep[i] != keep[j]:
            fi = pi[0] * nx + pi[1] * ny - d
            fj = pj[0] * nx + pj[1] * ny - d
            t = fi / (fi - fj)
            out.append(pi + t * (pj - pi))
    return np.asarray(out) if out else np.empty((0, 2))


def voronoi_cells(points: DataFrame, *, by: str, id_col: str = "id",
                  x_col: str = "x", y_col: str = "y",
                  box: tuple[float, float, float, float],
                  max_group_points: int = 4096) -> DataFrame:
    """Per-group Voronoi cells clipped to ``box``: (by, id, n_vertices,
    area). Each site's cell is the clip box intersected with the
    bisector half-planes of every other site in the group (O(n²) per
    group — groups are tiles/zones, the guard raises past
    ``max_group_points``). Cells partition the box exactly (up to
    float64 clipping), which is the conservation property the gate and
    tests pin: Σ area = box area per group."""
    schema = T.StructType([
        points.schema[by],
        T.StructField("id", T.LongType()),
        T.StructField("n_vertices", T.IntegerType()),
        T.StructField("area", T.DoubleType()),
    ])
    x0, y0, x1, y1 = map(float, box)

    def _fn(key, pdf):
        ids, xs, ys = _dedupe(pdf[id_col].to_numpy(),
                              pdf[x_col].to_numpy(), pdf[y_col].to_numpy())
        if len(ids) > max_group_points:
            raise ValueError(
                f"voronoi_cells: group has {len(ids)} points > "
                f"max_group_points={max_group_points}; tile the AOI into "
                "smaller groups (bounded per-task work is the scale contract)")
        xs = xs.astype(np.float64)
        ys = ys.astype(np.float64)
        rows = []
        base = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
        for i in range(len(ids)):
            poly = base
            for j in range(len(ids)):
                if i == j or len(poly) == 0:
                    continue
                # bisector of i, j: keep the side closer to i
                nx, ny = xs[j] - xs[i], ys[j] - ys[i]
                d = 0.5 * (xs[j] ** 2 - xs[i] ** 2 + ys[j] ** 2 - ys[i] ** 2)
                poly = _clip_halfplane(poly, nx, ny, d)
            if len(poly) >= 3:
                x, y = poly[:, 0], poly[:, 1]
                area = 0.5 * abs(np.dot(x, np.roll(y, -1))
                                 - np.dot(y, np.roll(x, -1)))
            else:
                area = 0.0
            rows.append((key[0], int(ids[i]), int(len(poly)), float(area)))
        return pd.DataFrame(rows, columns=[by, "id", "n_vertices", "area"])

    return (points.repartition(by).groupBy(by)
            .applyInPandas(_fn, schema=schema))
