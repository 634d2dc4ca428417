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
    # drop near-duplicate consecutive vertices (incl. first-vs-last):
    # a (near-)zero-length edge makes _seg_intersect report collinear-
    # degen against EVERY opposite edge, poisoning the whole clip. The
    # threshold is RELATIVE to ring extent: degeneracy-retry perturbation
    # (~1e-9) leaves micro-edges far above the absolute EPS that stay
    # permanently collinear with the seam they came from.
    span = max(float(np.ptp(pts[:, 0])), float(np.ptp(pts[:, 1])), EPS)
    d = np.abs(np.diff(np.vstack([pts, pts[:1]]), axis=0)).max(axis=1)
    keep = d > max(EPS, 1e-8 * span)
    if not keep.all():
        pts = pts[keep]
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


# diagnostic counter: total clip_rings invocations (tests assert the
# tree-fold union's O(g log g) clip budget against it)
CLIP_CALLS = [0]


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
    CLIP_CALLS[0] += 1
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
    # no crossings: containment cases (use original clip). The probe
    # vertex must sit OFF the other ring's boundary — seam-sharing
    # pieces routinely have their FIRST vertex exactly on the clip
    # boundary, and a boundary probe made this fallback misclassify
    # "partially overlapping" as "contained" (dropping whole pieces).
    def _probe(ring: np.ndarray, other: np.ndarray) -> tuple[float, float]:
        pts = ring[:-1, :2] if np.array_equal(ring[0], ring[-1]) else ring[:, :2]
        dmin = _ring_dist(pts, other)
        i = int(np.argmax(dmin))
        return float(pts[i, 0]), float(pts[i, 1])

    sx, sy = _probe(subj, clip)
    cx, cy = _probe(clip, subj)
    c_sub = bool(K.covers_xy({"type": "Polygon", "rings": [_close(clip)]},
                             np.array([sx]), np.array([sy]))[0])
    s_sub = bool(K.covers_xy({"type": "Polygon", "rings": [_close(subj)]},
                             np.array([cx]), np.array([cy]))[0])
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


def _ring_dist(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min distance of each point in pts (n,2) to the ring's segments."""
    r = ring[:, :2]
    a = r[:-1]
    b = r[1:]
    ab = b - a                                     # (m,2)
    ap = pts[:, None, :] - a[None, :, :]           # (n,m,2)
    denom = (ab * ab).sum(axis=1)                  # (m,)
    t = np.clip((ap * ab[None, :, :]).sum(axis=2)
                / np.where(denom > 0, denom, 1.0), 0.0, 1.0)
    close = a[None, :, :] + t[:, :, None] * ab[None, :, :]
    d = np.hypot(pts[:, None, 0] - close[:, :, 0],
                 pts[:, None, 1] - close[:, :, 1])
    return d.min(axis=1)


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
    (equal to subtracting the union; reference layer.py:90-91).

    Round-3 correctness fix: each g2 part is subtracted from a fully
    REASSEMBLED polygon set (_rings_to_polygons between parts), not from
    the raw ring-piece soup of the previous subtraction. The old
    one-pass loop let hole rings produced by part k slip past part k+1
    ("holes pass through") while their enclosing exteriors were re-cut
    without them — producing order-dependent area errors on multi-part
    subtrahends (found by the tree-fold union property test; minimal
    repro in tests/test_union_treefold.py::test_difference_multipart)."""
    parts2 = K.polygons_of(g2)
    cur_geom: dict | None = g1
    for rings2 in parts2:
        pieces: list[np.ndarray] = []
        for rings1 in K.polygons_of(cur_geom):
            cur = [rings1[0]]
            # carve holes of g1 first (they subtract area too)
            for hole in rings1[1:]:
                nxt = []
                for p in cur:
                    nxt.extend(clip_rings(p, hole, "difference"))
                cur = nxt
            nxt = []
            for p in cur:
                if K.ring_area_signed(p) < 0:
                    nxt.append(p)  # holes produced by g1-hole carving
                    continue
                nxt.extend(clip_rings(p, rings2[0], "difference"))
                # a hole of g2 inside g1 ADDS back area — intersect it in
                for hole in rings2[1:]:
                    nxt.extend(clip_rings(p, hole, "intersection"))
            pieces.extend(nxt)
        cur_geom = _rings_to_polygons(pieces)
        if cur_geom is None:
            return None
    if not parts2:  # non-areal subtrahend: normalize g1's ring soup only
        return _rings_to_polygons(
            [r for rings1 in K.polygons_of(g1) for r in rings1])
    return cur_geom


def _polys_to_geom(polys: list[list[np.ndarray]]) -> dict | None:
    if not polys:
        return None
    if len(polys) == 1:
        return {"type": "Polygon", "rings": polys[0]}
    return {"type": "MultiPolygon", "polygons": polys}


def _part_bbox(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    r = rings[0][:, :2]
    return (float(r[:, 0].min()), float(r[:, 1].min()),
            float(r[:, 0].max()), float(r[:, 1].max()))


def _merge_part_lists(A: list[list[np.ndarray]],
                      B: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    """Union of two disjoint seam-decomposed part lists: A passes
    through whole; each part of B differences against ONLY the
    bbox-overlapping parts of A (disjoint parts pass through with zero
    clip calls — the pruning that makes the tree fold near-linear on
    spatially distributed mosaics)."""
    if not A:
        return list(B)
    out = list(A)
    boxes = np.array([_part_bbox(a) for a in A])  # (n,4) minx,miny,maxx,maxy
    for rings in B:
        mnx, mny, mxx, mxy = _part_bbox(rings)
        cand = np.nonzero((boxes[:, 0] <= mxx) & (boxes[:, 2] >= mnx)
                          & (boxes[:, 1] <= mxy) & (boxes[:, 3] >= mny))[0]
        if len(cand) == 0:
            out.append(rings)
            continue
        d = difference(_polys_to_geom([rings]),
                       _polys_to_geom([A[int(i)] for i in cand]))
        if d is not None:
            out.extend(K.polygons_of(d))
    return out


def _union_tree(parts: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    if len(parts) <= 1:
        return parts
    mid = len(parts) // 2
    return _merge_part_lists(_union_tree(parts[:mid]), _union_tree(parts[mid:]))


def union_parts(geoms: list) -> dict | None:
    """Region union of many polygons as a seam-decomposed MultiPolygon.

    Each input contributes the part NOT already covered (difference
    against previously merged parts), so pieces tile the union region
    exactly — total area, covers/intersects predicates, and any
    downstream clip are those of the true union; internal seam edges
    between pieces are kept (no ring re-melting). This is the
    no-shared-library analog of shapely.union_all for region semantics.

    Physical strategy (round-2 verdict #2): pairwise divide-and-conquer
    tree fold over bbox-sorted parts instead of the linear
    accumulate-difference fold — the linear fold differences every new
    member against the ENTIRE accumulated union (O(g²) clips; a
    10⁵-member dissolve group goes quadratic inside one applyInPandas
    task). The tree merge differences each part only against
    bbox-overlapping opposite-side parts, so spatially distributed
    groups cost O(g log g) clips and the worst case never exceeds the
    old fold. Spatial pre-sort (minx, miny) keeps tree halves coherent.
    """
    parts = [rings for g in geoms if g is not None for rings in K.polygons_of(g)]
    if not parts:
        return None
    parts.sort(key=lambda rings: (float(rings[0][:, 0].min()),
                                  float(rings[0][:, 1].min())))
    return _polys_to_geom(_union_tree(parts))


def union(g1: dict | None, g2: dict | None) -> dict | None:
    """Binary region union (seam-decomposed; see union_parts)."""
    return union_parts([g1, g2])
