"""Geometry repair — the engine's make_valid.

Reference parity: PolygonLayer repairs every geometry at load with
``buffer(0, 0)`` (/root/reference/gistools/layer.py:1543) and
``clean_geometry`` filters/repairs invalid rows (layer.py:1584-1608).
This module reproduces the useful effect of buffer(0) on the common
real-world defects without shapely/GEOS:

  - unclosed rings, repeated consecutive vertices → structural cleanup
  - zero-area / degenerate rings → dropped
  - self-intersecting rings (bowties, figure-eights) → split at the
    crossing points into simple sub-rings
  - winding / hole nesting → reassembled by containment parity (even
    depth = shell, odd = hole), the same rule the boolean kernel's
    ring assembler uses

All pure numpy; used inside Arrow-batched UDFs.
"""

from __future__ import annotations

import numpy as np

from . import kernels as K
from .boolean import _rings_to_polygons

EPS = 1e-12
_MAX_SPLIT_DEPTH = 48


def _clean_ring(r: np.ndarray) -> np.ndarray | None:
    """Drop consecutive duplicate vertices, force closure; None if the
    result has fewer than 3 distinct points."""
    pts = np.asarray(r, dtype=np.float64)[:, :2]
    if len(pts) >= 2 and np.allclose(pts[0], pts[-1], atol=EPS):
        pts = pts[:-1]
    if len(pts) == 0:
        return None
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.abs(np.diff(pts, axis=0)) > EPS).any(axis=1)
    pts = pts[keep]
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[:1]])


def _first_self_crossing(pts: np.ndarray):
    """First PROPER crossing between non-adjacent edges of an open ring
    (pts unclosed, n>=3). Returns (i, j, xy) or None."""
    n = len(pts)
    for i in range(n):
        p, q = pts[i], pts[(i + 1) % n]
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent via wraparound
            a, b = pts[j], pts[(j + 1) % n]
            d = (q[0] - p[0]) * (b[1] - a[1]) - (q[1] - p[1]) * (b[0] - a[0])
            if abs(d) < EPS:
                continue
            t = ((a[0] - p[0]) * (b[1] - a[1]) - (a[1] - p[1]) * (b[0] - a[0])) / d
            u = ((a[0] - p[0]) * (q[1] - p[1]) - (a[1] - p[1]) * (q[0] - p[0])) / d
            if EPS < t < 1 - EPS and EPS < u < 1 - EPS:
                x = (p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1]))
                return i, j, np.array(x)
    return None


def split_simple(ring: np.ndarray, _depth: int = 0) -> list[np.ndarray]:
    """Split a (possibly self-intersecting) CLOSED ring into simple
    closed sub-rings at its first crossing, recursively."""
    r = _clean_ring(ring)
    if r is None:
        return []
    pts = r[:-1]
    if _depth >= _MAX_SPLIT_DEPTH:
        return [r] if abs(K.ring_area_signed(r)) > EPS else []
    hit = _first_self_crossing(pts)
    if hit is None:
        return [r] if abs(K.ring_area_signed(r)) > EPS else []
    i, j, x = hit
    # lobe 1: X -> pts[i+1..j] -> X ; lobe 2: X -> pts[j+1..] ++ pts[..i] -> X
    lobe1 = np.vstack([x[None, :], pts[i + 1:j + 1], x[None, :]])
    lobe2 = np.vstack([x[None, :], pts[j + 1:], pts[:i + 1], x[None, :]])
    return (split_simple(lobe1, _depth + 1)
            + split_simple(lobe2, _depth + 1))


def is_valid_geom(g: dict | None) -> bool:
    """Validity predicate: structurally sound, simple rings, positive
    area for polygon types (reference `is_valid`, layer.py:755-762)."""
    if g is None:
        return False
    t = g.get("type")
    if t in ("Point", "MultiPoint"):
        return True
    if t in ("LineString", "MultiLineString"):
        return all(len(line) >= 2 for line in K.ring_list(g))
    for rings in K.polygons_of(g):
        for r in rings:
            pts = np.asarray(r, dtype=np.float64)[:, :2]
            # strict OGC-style checks on the RAW ring: closed, no
            # repeated consecutive vertices, >= 4 points, simple,
            # non-zero area (is_valid must FLAG what make_valid fixes)
            if len(pts) < 4 or not np.allclose(pts[0], pts[-1], atol=EPS):
                return False
            if (np.abs(np.diff(pts[:-1], axis=0)) <= EPS).all(axis=1).any():
                return False
            if abs(K.ring_area_signed(pts)) <= EPS:
                return False
            if _first_self_crossing(pts[:-1]) is not None:
                return False
    return True


def make_valid(g: dict | None) -> dict | None:
    """Repair a decoded geometry; returns None when nothing salvageable
    remains. Polygon repair: clean each ring, split self-intersections,
    dedupe identical rings, reassemble shells/holes by containment
    parity (buffer(0)-style odd-even semantics)."""
    if g is None:
        return None
    t = g.get("type")
    if t in ("Point", "MultiPoint"):
        return g
    if t in ("LineString", "MultiLineString"):
        lines = []
        for line in K.ring_list(g):
            pts = np.asarray(line, dtype=np.float64)
            keep = np.ones(len(pts), dtype=bool)
            if len(pts) > 1:
                keep[1:] = (np.abs(np.diff(pts[:, :2], axis=0)) > EPS).any(axis=1)
            pts = pts[keep]
            if len(pts) >= 2:
                lines.append(pts)
        if not lines:
            return None
        if len(lines) == 1:
            return {"type": "LineString", "coords": lines[0]}
        return {"type": "MultiLineString", "lines": lines}
    # polygon types
    simple: list[np.ndarray] = []
    seen: set[bytes] = set()
    for rings in K.polygons_of(g):
        for r in rings:
            for s in split_simple(np.asarray(r, dtype=np.float64)):
                # dedupe identical rings (rotation-invariant canonical key)
                pts = np.round(s[:-1, :2], 9)
                k = int(np.lexsort((pts[:, 1], pts[:, 0]))[0])
                key = np.vstack([pts[k:], pts[:k]])
                kb = key.tobytes()
                kb_rev = np.vstack([key[:1], key[1:][::-1]]).tobytes()
                if kb in seen or kb_rev in seen:
                    continue
                seen.add(kb)
                simple.append(s)
    return _rings_to_polygons(simple)
