"""General polygon boolean operations (Greiner–Hormann).

Unlocks the reference's overlay semantics beyond convex clippers
(SURVEY §7 hard-part 1): `_intersection` (layer.py:103-131) and
`_difference` (layer.py:72-100 — subtract the union of all intersecting
partners, which equals the sequential fold of pairwise differences).

Scope & robustness policy:
- operands: single-ring simple polygons (holes handled by the callers
  via ring arithmetic: clip holes separately and subtract);
- degenerate contact (vertex exactly on an edge, collinear overlapping
  edges) is detected and resolved by an epsilon perturbation RETRY of
  the clip polygon (deterministic direction); exact-rect cases should
  use the Sutherland–Hodgman path in kernels.clip_polygon_convex.
"""

from __future__ import annotations

import numpy as np

from . import kernels as K

EPS = 1e-12


class _Vtx:
    __slots__ = ("xy", "nxt", "prv", "neighbor", "inter", "entry", "alpha", "visited")

    def __init__(self, xy, alpha=0.0, inter=False):
        self.xy = (float(xy[0]), float(xy[1]))
        self.nxt = None
        self.prv = None
        self.neighbor = None
        self.inter = inter
        self.entry = True
        self.alpha = alpha
        self.visited = False


def _build(ring: np.ndarray) -> _Vtx:
    pts = ring[:, :2]
    if np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    verts = [_Vtx(p) for p in pts]
    n = len(verts)
    for i, v in enumerate(verts):
        v.nxt = verts[(i + 1) % n]
        v.prv = verts[(i - 1) % n]
    return verts[0]


def _iter_ring(start: _Vtx):
    v = start
    while True:
        yield v
        v = v.nxt
        if v is start:
            break


def _seg_intersect(p1, p2, q1, q2):
    """Proper-intersection params (t, u) or None; degenerate → 'degen'."""
    r = (p2[0] - p1[0], p2[1] - p1[1])
    s = (q2[0] - q1[0], q2[1] - q1[1])
    denom = r[0] * s[1] - r[1] * s[0]
    qp = (q1[0] - p1[0], q1[1] - p1[1])
    if abs(denom) < EPS:
        cross = qp[0] * r[1] - qp[1] * r[0]
        if abs(cross) < EPS:
            return "degen"  # collinear
        return None
    t = (qp[0] * s[1] - qp[1] * s[0]) / denom
    u = (qp[0] * r[1] - qp[1] * r[0]) / denom
    tol = 1e-11
    if -tol < t < tol or 1 - tol < t < 1 + tol or -tol < u < tol or 1 - tol < u < 1 + tol:
        if -tol <= t <= 1 + tol and -tol <= u <= 1 + tol:
            return "degen"  # endpoint contact
        return None
    if 0 < t < 1 and 0 < u < 1:
        return (t, u)
    return None


class DegenerateGeometry(Exception):
    pass


def _insert_intersections(s_start: _Vtx, c_start: _Vtx) -> int:
    count = 0
    # collect hits per original edge, then insert sorted by alpha
    s_list = [v for v in _iter_ring(s_start)]
    c_list = [w for w in _iter_ring(c_start)]
    hits_s: dict[int, list] = {}
    hits_c: dict[int, list] = {}
    for i, v in enumerate(s_list):
        p1, p2 = v.xy, v.nxt.xy
        for j, w in enumerate(c_list):
            q1, q2 = w.xy, w.nxt.xy
            res = _seg_intersect(p1, p2, q1, q2)
            if res == "degen":
                raise DegenerateGeometry()
            if res is None:
                continue
            t, u = res
            xy = (p1[0] + t * (p2[0] - p1[0]), p1[1] + t * (p2[1] - p1[1]))
            a = _Vtx(xy, alpha=t, inter=True)
            b = _Vtx(xy, alpha=u, inter=True)
            a.neighbor = b
            b.neighbor = a
            hits_s.setdefault(i, []).append(a)
            hits_c.setdefault(j, []).append(b)
            count += 1
    for i, lst in hits_s.items():
        lst.sort(key=lambda x: x.alpha)
        cur = s_list[i]
        for a in lst:
            nxt = cur.nxt
            cur.nxt = a; a.prv = cur; a.nxt = nxt; nxt.prv = a
            cur = a
    for j, lst in hits_c.items():
        lst.sort(key=lambda x: x.alpha)
        cur = c_list[j]
        for b in lst:
            nxt = cur.nxt
            cur.nxt = b; b.prv = cur; b.nxt = nxt; nxt.prv = b
            cur = b
    return count


def _point_in(ring_start: _Vtx, xy) -> bool:
    pts = np.array([v.xy for v in _iter_ring(ring_start) if not v.inter])
    ring = np.vstack([pts, pts[:1]])
    g = {"type": "Polygon", "rings": [ring]}
    return bool(K.covers_xy(g, np.array([xy[0]]), np.array([xy[1]]), boundary_tol=0)[0])


def _mark_entries(start: _Vtx, other_start: _Vtx, invert: bool) -> None:
    inside = _point_in(other_start, start.xy)
    status = not inside
    if invert:
        status = not status
    for v in _iter_ring(start):
        if v.inter:
            v.entry = status
            status = not status


def _trace(s_start: _Vtx) -> list[np.ndarray]:
    out = []
    inters = [v for v in _iter_ring(s_start) if v.inter]
    for v0 in inters:
        if v0.visited:
            continue
        ring = []
        v = v0
        while not v.visited:
            v.visited = True
            if v.neighbor is not None:
                v.neighbor.visited = True
            if v.entry:
                while True:
                    ring.append(v.xy)
                    v = v.nxt
                    if v.inter:
                        break
            else:
                while True:
                    ring.append(v.xy)
                    v = v.prv
                    if v.inter:
                        break
            v = v.neighbor
            if v is v0 or v.neighbor is v0:
                break
        if len(ring) >= 3:
            arr = np.array(ring + [ring[0]])
            if abs(K.ring_area_signed(arr)) > EPS:
                out.append(arr)
    return out


def _clip_rings(subj: np.ndarray, clip: np.ndarray, op: str) -> list[np.ndarray] | None:
    """GH core for two simple rings. Returns result rings, or None when
    there are no crossings (caller resolves containment cases)."""
    s = _build(K.ensure_ccw(subj))
    c = _build(K.ensure_ccw(clip))
    n = _insert_intersections(s, c)
    if n == 0:
        return None
    if op == "intersection":
        _mark_entries(s, c, invert=False)
        _mark_entries(c, s, invert=False)
    elif op == "difference":
        _mark_entries(s, c, invert=True)
        _mark_entries(c, s, invert=False)
    elif op == "union":
        _mark_entries(s, c, invert=True)
        _mark_entries(c, s, invert=True)
    else:
        raise ValueError(op)
    return _trace(s)


def _perturb(ring: np.ndarray, k: int) -> np.ndarray:
    """Deterministic tiny shift to escape degenerate contact."""
    d = 1e-9 * (k + 1)
    out = ring.copy().astype(np.float64)
    out[:, 0] += d
    out[:, 1] += d * 0.6180339887
    return out


def clip_rings(subj: np.ndarray, clip: np.ndarray, op: str,
               max_retries: int = 3) -> list[np.ndarray]:
    """Boolean op on two simple rings with degeneracy-retry.

    Containment/disjoint resolution when no edge crossings:
      intersection: subj⊂clip → [subj]; clip⊂subj → [clip]; else []
      difference:   subj disjoint clip → [subj]; subj⊂clip → [];
                    clip⊂subj → [subj ring] (hole handled by caller via
                    area accounting — returns subj + reversed clip)
      union: overlap-free → both rings (caller wraps as multipolygon)
    """
    clip_try = clip
    for k in range(max_retries + 1):
        try:
            res = _clip_rings(subj, clip_try, op)
            break
        except DegenerateGeometry:
            clip_try = _perturb(clip, k)
    else:  # pragma: no cover
        res = None
    if res is not None:
        return res
    # no crossings: containment cases (use original clip)
    c_sub = bool(K.covers_xy({"type": "Polygon", "rings": [_close(clip)]},
                             np.array([subj[0, 0]]), np.array([subj[0, 1]]))[0])
    s_sub = bool(K.covers_xy({"type": "Polygon", "rings": [_close(subj)]},
                             np.array([clip[0, 0]]), np.array([clip[0, 1]]))[0])
    if op == "intersection":
        if c_sub:
            return [_close(K.ensure_ccw(subj))]
        if s_sub:
            return [_close(K.ensure_ccw(clip))]
        return []
    if op == "difference":
        if c_sub:   # subj inside clip → empty
            return []
        if s_sub:   # clip inside subj → subj with a hole
            return [_close(K.ensure_ccw(subj)), _close(K.ensure_ccw(clip))[::-1]]
        return [_close(K.ensure_ccw(subj))]
    if op == "union":
        if c_sub:
            return [_close(K.ensure_ccw(clip))]
        if s_sub:
            return [_close(K.ensure_ccw(subj))]
        return [_close(K.ensure_ccw(subj)), _close(K.ensure_ccw(clip))]
    raise ValueError(op)


def _close(r: np.ndarray) -> np.ndarray:
    if np.array_equal(r[0], r[-1]):
        return r
    return np.vstack([r, r[:1]])


# ------------------------------------------------------------- geometry-level

def _rings_to_polygons(rings: list[np.ndarray]) -> dict | None:
    """Assemble traced rings by containment NESTING (GH result rings'
    winding depends on the op): even depth = exterior (forced CCW), odd
    depth = hole of its innermost container (forced CW)."""
    rings = [r for r in rings if abs(K.ring_area_signed(r)) > EPS]
    if not rings:
        return None

    def contains(outer: np.ndarray, inner: np.ndarray) -> bool:
        g = {"type": "Polygon", "rings": [outer]}
        # test a representative interior-ish point (a vertex works since
        # result rings don't cross)
        return bool(K.covers_xy(g, np.array([inner[:-1, 0].mean()]),
                    np.array([inner[:-1, 1].mean()]), boundary_tol=0)[0]) \
            and abs(K.ring_area_signed(outer)) > abs(K.ring_area_signed(inner)) - EPS

    depth = []
    for i, r in enumerate(rings):
        d = sum(1 for j, o in enumerate(rings) if j != i and contains(o, r))
        depth.append(d)
    exts = [(i, K.ensure_ccw(rings[i])) for i in range(len(rings)) if depth[i] % 2 == 0]
    holes = [(i, K.ensure_ccw(rings[i])[::-1]) for i in range(len(rings)) if depth[i] % 2 == 1]
    if not exts:
        return None
    polys = [[e] for _, e in exts]
    for _, h in holes:
        best = None
        for k, p in enumerate(polys):
            g = {"type": "Polygon", "rings": [p[0]]}
            if K.covers_xy(g, np.array([h[:-1, 0].mean()]), np.array([h[:-1, 1].mean()]))[0]:
                if best is None or abs(K.ring_area_signed(polys[k][0])) < abs(K.ring_area_signed(polys[best][0])):
                    best = k
        if best is not None:
            polys[best].append(h)
    if len(polys) == 1:
        return {"type": "Polygon", "rings": polys[0]}
    return {"type": "MultiPolygon", "polygons": polys}


def is_convex(ring: np.ndarray) -> bool:
    pts = ring[:-1, :2] if np.array_equal(ring[0], ring[-1]) else ring[:, :2]
    n = len(pts)
    if n < 4:
        return True
    sign = 0
    for i in range(n):
        a, b, c = pts[i], pts[(i + 1) % n], pts[(i + 2) % n]
        cr = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
        if abs(cr) < EPS:
            continue
        s = 1 if cr > 0 else -1
        if sign == 0:
            sign = s
        elif s != sign:
            return False
    return True


def intersection(g1: dict, g2: dict) -> dict | None:
    """Exact polygon∩polygon for arbitrary simple polygons (holes on
    either side handled by ring arithmetic). Convex clip parts use the
    Sutherland–Hodgman fast path — it is exact AND robust to shared
    edges / touching vertices, which GH handles only via perturbation."""
    out: list[np.ndarray] = []
    for rings1 in K.polygons_of(g1):
        for rings2 in K.polygons_of(g2):
            if is_convex(rings2[0]):
                res_g = K.clip_polygon_convex(
                    {"type": "Polygon", "rings": [rings1[0]]}, rings2[0])
                pieces = [p[0] for p in K.polygons_of(res_g)] if res_g else []
            elif is_convex(rings1[0]):
                res_g = K.clip_polygon_convex(
                    {"type": "Polygon", "rings": [rings2[0]]}, rings1[0])
                pieces = [p[0] for p in K.polygons_of(res_g)] if res_g else []
            else:
                pieces = clip_rings(rings1[0], rings2[0], "intersection")
            # subtract holes of both operands from each piece
            for hole in rings1[1:] + rings2[1:]:
                nxt = []
                for p in pieces:
                    nxt.extend(clip_rings(p, hole, "difference"))
                pieces = nxt
            out.extend(pieces)
    return _rings_to_polygons(out)


def difference(g1: dict, g2: dict) -> dict | None:
    """g1 minus g2 (g1 \\ ∪parts(g2)) — sequential fold over g2's parts
    (equal to subtracting the union; reference layer.py:90-91)."""
    pieces: list[np.ndarray] = []
    for rings1 in K.polygons_of(g1):
        cur = [rings1[0]]
        # carve holes of g1 first (they subtract area too)
        for hole in rings1[1:]:
            nxt = []
            for p in cur:
                nxt.extend(clip_rings(p, hole, "difference"))
            cur = nxt
        for rings2 in K.polygons_of(g2):
            nxt = []
            for p in cur:
                sign = K.ring_area_signed(p)
                if sign < 0:
                    nxt.append(p)  # holes produced earlier pass through
                    continue
                nxt.extend(clip_rings(p, rings2[0], "difference"))
                # a hole of g2 inside g1 ADDS back area — intersect it in
                for hole in rings2[1:]:
                    add = clip_rings(p, hole, "intersection")
                    nxt.extend(add)
            cur = nxt
        pieces.extend(cur)
    return _rings_to_polygons(pieces)


def _polys_to_geom(polys: list[list[np.ndarray]]) -> dict | None:
    if not polys:
        return None
    if len(polys) == 1:
        return {"type": "Polygon", "rings": polys[0]}
    return {"type": "MultiPolygon", "polygons": polys}


def union_parts(geoms: list) -> dict | None:
    """Region union of many polygons as a seam-decomposed MultiPolygon.

    Fold: each geometry contributes the part NOT already covered
    (difference against the accumulated union), so pieces tile the union
    region exactly — total area, covers/intersects predicates, and any
    downstream clip are those of the true union; internal seam edges
    between pieces are kept (no ring re-melting). This is the
    no-shared-library analog of shapely.union_all for region semantics.
    """
    acc: list[list[np.ndarray]] = []
    for g in geoms:
        if g is None:
            continue
        if not acc:
            acc.extend(K.polygons_of(g))
            continue
        d = difference(g, _polys_to_geom(acc))
        if d is not None:
            acc.extend(K.polygons_of(d))
    return _polys_to_geom(acc)


def union(g1: dict | None, g2: dict | None) -> dict | None:
    """Binary region union (seam-decomposed; see union_parts)."""
    return union_parts([g1, g2])
