"""Spatial predicates beyond ``intersects`` (DE-9IM family).

The reference exposes shapely's full predicate set on its layers (e.g.
``within``/``contains`` used by overlay bookkeeping at
/root/reference/gistools/layer.py:1099-1140 and geometry.py:441-458);
this module re-expresses the useful subset on the engine's pure-numpy
geom dicts so the generic ``sjoin`` can refine on any of them.

Strategy per operand pair:

* point × polygon — exact ray-crossing tests (``covers_xy`` /
  ``contains_xy``; boundary handling is explicit).
* polygon × polygon — AREA-based DE-9IM: with ``I = |g1 ∩ g2|`` from
  the property-tested Greiner–Hormann clipper,
  ``within  ⇔ I ≈ |g1|``, ``contains ⇔ I ≈ |g2|``,
  ``touches  ⇔ intersects ∧ I ≈ 0``,
  ``overlaps ⇔ 0 < I < min(|g1|,|g2|)``,
  ``equals   ⇔ I ≈ |g1| ≈ |g2|``.
  This is robust to shared edges and holes because the clipper is; the
  tolerance is relative (``RELTOL`` × the larger operand area).
* line × polygon — vertex+midpoint cover tests plus proper-crossing
  detection: ``within`` = every sample covered and no proper boundary
  crossing; ``crosses`` = interior presence on both sides;
  ``touches`` = boundary contact only.

``covers``/``covered_by`` equal ``contains``/``within`` for the areal
and point cases handled here (they differ only on lower-dimensional
boundary subtleties that the engine's data model does not produce).
"""

from __future__ import annotations

import numpy as np

from . import kernels as K
from . import boolean as B

RELTOL = 1e-9

PREDICATES = ("intersects", "within", "contains", "covers", "covered_by",
              "touches", "overlaps", "equals", "crosses")

_POLY = ("Polygon", "MultiPolygon")
_PT = ("Point", "MultiPoint")
_LINE = ("LineString", "MultiLineString")


def _pts(g: dict) -> np.ndarray:
    if g["type"] == "Point":
        return g["coords"].reshape(1, -1)
    return g["points"]


def _line_samples(g: dict) -> np.ndarray:
    """Vertices plus segment midpoints of a (multi)linestring — enough
    interior witnesses to classify cover/containment once proper
    crossings are ruled out."""
    out = []
    for r in K.ring_list(g):
        out.append(r[:, :2])
        if len(r) > 1:
            out.append((r[:-1, :2] + r[1:, :2]) / 2.0)
    return np.concatenate(out)


def _rings_cross_proper(r1: np.ndarray, r2: np.ndarray) -> bool:
    """Transversal edge crossings ONLY (collinear overlap / endpoint
    touch excluded) — `K._rings_cross` counts touches, which would make
    a line lying along a polygon edge look like it enters the
    interior."""
    p, q = r1[:-1, :2], r1[1:, :2]
    a, b = r2[:-1, :2], r2[1:, :2]
    ab = b - a
    ap = p[:, None, :] - a[None, :, :]
    aq = q[:, None, :] - a[None, :, :]
    d1 = ab[None, :, 0] * ap[:, :, 1] - ab[None, :, 1] * ap[:, :, 0]
    d2 = ab[None, :, 0] * aq[:, :, 1] - ab[None, :, 1] * aq[:, :, 0]
    pq = q - p
    pa = a[None, :, :] - p[:, None, :]
    pb = b[None, :, :] - p[:, None, :]
    d3 = pq[:, None, 0] * pa[:, :, 1] - pq[:, None, 1] * pa[:, :, 0]
    d4 = pq[:, None, 0] * pb[:, :, 1] - pq[:, None, 1] * pb[:, :, 0]
    eps = K.EPS
    # strictly opposite signs on BOTH orientations — a zero determinant
    # (endpoint on the other segment) is a touch, not a crossing
    opp12 = ((d1 > eps) & (d2 < -eps)) | ((d1 < -eps) & (d2 > eps))
    opp34 = ((d3 > eps) & (d4 < -eps)) | ((d3 < -eps) & (d4 > eps))
    return bool((opp12 & opp34).any())


def _has_proper_crossing(g1: dict, g2: dict) -> bool:
    for r1 in K.ring_list(g1):
        for r2 in K.ring_list(g2):
            if _rings_cross_proper(r1, r2):
                return True
    return False


def _inter_area(g1: dict, g2: dict) -> float:
    gi = B.intersection(g1, g2)
    return 0.0 if gi is None else K.area(gi)


def _poly_poly(g1: dict, g2: dict, predicate: str) -> bool:
    a1, a2 = K.area(g1), K.area(g2)
    tol = RELTOL * max(a1, a2, 1e-300)
    inter = K.intersects(g1, g2)
    if predicate == "touches":
        return inter and _inter_area(g1, g2) <= tol
    if not inter:
        return False
    i = _inter_area(g1, g2)
    if predicate in ("within", "covered_by"):
        return i >= a1 - tol
    if predicate in ("contains", "covers"):
        return i >= a2 - tol
    if predicate == "equals":
        return i >= a1 - tol and i >= a2 - tol
    if predicate == "overlaps":
        return i > tol and i < a1 - tol and i < a2 - tol
    if predicate == "crosses":        # areal×areal: never true in DE-9IM
        return False
    raise ValueError(predicate)


def _point_poly(gp: dict, gpoly: dict, predicate: str, *, point_is_left: bool) -> bool:
    p = _pts(gp)
    cov = K.covers_xy(gpoly, p[:, 0], p[:, 1])
    strict = K.contains_xy(gpoly, p[:, 0], p[:, 1])
    if predicate == "touches":
        # boundary contact, no interior point
        return bool(cov.any()) and not bool(strict.any())
    if point_is_left:
        if predicate in ("within", "covered_by"):
            # DE-9IM: all points covered, at least one interior
            return bool(cov.all()) and bool(strict.any())
        if predicate in ("contains", "covers", "overlaps", "equals", "crosses"):
            return False
    else:
        if predicate in ("contains", "covers"):
            return bool(cov.all()) and bool(strict.any())
        if predicate in ("within", "covered_by", "overlaps", "equals", "crosses"):
            return False
    raise ValueError(predicate)


def _line_poly(gl: dict, gpoly: dict, predicate: str, *, line_is_left: bool) -> bool:
    s = _line_samples(gl)
    cov = K.covers_xy(gpoly, s[:, 0], s[:, 1])
    strict = K.contains_xy(gpoly, s[:, 0], s[:, 1])
    crossing = _has_proper_crossing(gl, gpoly)
    interior_in = bool(strict.any()) or crossing
    exterior = (not bool(cov.all())) or crossing
    if predicate == "touches":
        return bool(cov.any()) and not interior_in
    if line_is_left:
        if predicate in ("within", "covered_by"):
            return bool(cov.all()) and not crossing and interior_in
        if predicate == "crosses":
            return interior_in and exterior
        return False
    else:
        if predicate in ("contains", "covers"):
            return bool(cov.all()) and not crossing and interior_in
        if predicate == "crosses":
            return interior_in and exterior
        return False


def _point_line(gp: dict, gl: dict, predicate: str, *, point_is_left: bool) -> bool:
    """Point/MultiPoint × (Multi)LineString. Line boundary = part
    endpoints (DE-9IM): a point AT an endpoint touches; a point on the
    interior is within."""
    pts = _pts(gp)[:, :2]
    parts = K.ring_list(gl)
    on = np.zeros(len(pts), dtype=bool)
    for r in parts:
        on |= K._on_ring(r, pts[:, 0], pts[:, 1], 1e-9)
    ends = np.array([r[i, :2] for r in parts for i in (0, -1)])
    at_end = np.zeros(len(pts), dtype=bool)
    for i, p in enumerate(pts):
        at_end[i] = bool((np.abs(ends - p) < 1e-9).all(axis=1).any())
    interior_hit = bool((on & ~at_end).any())
    if predicate == "touches":
        return bool((on & at_end).any()) and not interior_hit
    if point_is_left:
        if predicate == "covered_by":
            return bool(on.all()) and bool(on.any())
        if predicate == "within":
            return bool(on.all()) and interior_hit
        return False          # contains/covers/equals/overlaps/crosses
    else:
        if predicate == "covers":
            return bool(on.all()) and bool(on.any())
        if predicate == "contains":     # point(s) in the line INTERIOR
            return bool(on.all()) and interior_hit
        if predicate in ("within", "covered_by", "equals", "overlaps",
                         "crosses"):
            return False      # a line is never inside/equal to a point
    raise ValueError(predicate)


def _point_point(g1: dict, g2: dict, predicate: str) -> bool:
    p1, p2 = _pts(g1)[:, :2], _pts(g2)[:, :2]
    m = (np.abs(p1[:, None, :] - p2[None, :, :]) < K.EPS).all(axis=2)
    any_shared = bool(m.any())
    all1 = bool(m.any(axis=1).all())
    all2 = bool(m.any(axis=0).all())
    if predicate in ("within", "covered_by"):
        return all1 and any_shared
    if predicate in ("contains", "covers"):
        return all2 and any_shared
    if predicate == "equals":
        return all1 and all2
    if predicate == "overlaps":
        return any_shared and not all1 and not all2
    if predicate in ("touches", "crosses"):
        return False
    raise ValueError(predicate)


def relate(g1: dict | None, g2: dict | None, predicate: str) -> bool:
    """``predicate(g1, g2)`` — e.g. ``relate(a, b, "within")`` ⇔ a within b.

    Supported operand combos: point/line/polygon (incl. multi) against
    polygon, point×point, polygon×polygon. Line×line beyond
    ``intersects``/``equals`` raises (not in the reference's surface).
    """
    if g1 is None or g2 is None:
        return False
    if predicate == "intersects":
        return K.intersects(g1, g2)
    if predicate not in PREDICATES:
        raise ValueError(f"unknown predicate {predicate!r}")
    b1, b2 = K.bounds(g1), K.bounds(g2)
    # bbox prefilters: disjoint boxes can only ever be False
    if b1[0] > b2[2] or b2[0] > b1[2] or b1[1] > b2[3] or b2[1] > b1[3]:
        return False
    if predicate in ("within", "covered_by", "equals"):
        if b1[0] < b2[0] - RELTOL or b1[1] < b2[1] - RELTOL \
                or b1[2] > b2[2] + RELTOL or b1[3] > b2[3] + RELTOL:
            return False
    if predicate in ("contains", "covers", "equals"):
        if b2[0] < b1[0] - RELTOL or b2[1] < b1[1] - RELTOL \
                or b2[2] > b1[2] + RELTOL or b2[3] > b1[3] + RELTOL:
            return False

    t1, t2 = g1["type"], g2["type"]
    if t1 in _PT and t2 in _PT:
        return _point_point(g1, g2, predicate)
    if t1 in _PT and t2 in _POLY:
        return _point_poly(g1, g2, predicate, point_is_left=True)
    if t1 in _POLY and t2 in _PT:
        return _point_poly(g2, g1, predicate, point_is_left=False)
    if t1 in _PT and t2 in _LINE:
        return _point_line(g1, g2, predicate, point_is_left=True)
    if t1 in _LINE and t2 in _PT:
        return _point_line(g2, g1, predicate, point_is_left=False)
    if t1 in _LINE and t2 in _POLY:
        return _line_poly(g1, g2, predicate, line_is_left=True)
    if t1 in _POLY and t2 in _LINE:
        return _line_poly(g2, g1, predicate, line_is_left=False)
    if t1 in _POLY and t2 in _POLY:
        return _poly_poly(g1, g2, predicate)
    if predicate == "equals" and t1 in _LINE and t2 in _LINE:
        r1, r2 = K.ring_list(g1), K.ring_list(g2)
        if len(r1) != len(r2):
            return False
        for a, b in zip(r1, r2):
            same = a.shape == b.shape and bool((np.abs(a - b) < K.EPS).all())
            rev = a.shape == b.shape and bool((np.abs(a - b[::-1]) < K.EPS).all())
            if not (same or rev):
                return False
        return True
    raise ValueError(
        f"predicate {predicate!r} not supported for {t1} × {t2}")


def relate_batch(lefts: list, g2: dict, predicate: str) -> np.ndarray:
    """``relate(lefts[i], g2, predicate)`` for many lefts against one
    right. ``intersects`` takes the fully vectorized edge-test path;
    the other predicates run the scalar kernel above the bbox
    prefilter (candidate batches are already cell-join-pruned)."""
    if predicate == "intersects":
        return K.intersects_batch(lefts, g2)
    out = np.zeros(len(lefts), dtype=bool)
    if g2 is None:
        return out
    for i, g in enumerate(lefts):
        if g is not None:
            out[i] = relate(g, g2, predicate)
    return out
