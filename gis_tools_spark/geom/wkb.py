"""Pure-numpy WKB (Well-Known Binary) codec.

The engine stores every geometry as a little-endian ISO WKB blob in a
``BinaryType`` column (see SURVEY.md §1.1: the reference keeps shapely
objects in a GeoDataFrame — /root/reference/gistools/layer.py:370 — and
uses WKB as its hashable canonical form at layer.py:615-618; we make WKB
the *primary* representation).

No shapely in this sandbox, so this module implements the subset of WKB
we need: Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection, 2D and 3D (Z) variants.

Decoded form ("geom dict"):
    {"type": "Polygon", "rings": [ndarray (n,2|3), ...]}
    {"type": "LineString", "coords": ndarray}
    {"type": "Point", "coords": ndarray (2|3,)}
    {"type": "MultiPolygon", "polygons": [[ring, ...], ...]}
    {"type": "MultiLineString", "lines": [ndarray, ...]}
    {"type": "MultiPoint", "points": ndarray (n, 2|3)}
"""

from __future__ import annotations

import struct

import numpy as np

# WKB geometry type codes (ISO); +1000 for Z variants.
POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION = 4, 5, 6, 7

_LE = b"\x01"


def _hdr(code: int, has_z: bool) -> bytes:
    return _LE + struct.pack("<I", code + (1000 if has_z else 0))


def _pack_coords(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(a, dtype="<f8").tobytes()


def point(x: float, y: float, z: float | None = None) -> bytes:
    if z is None:
        return _hdr(POINT, False) + struct.pack("<dd", x, y)
    return _hdr(POINT, True) + struct.pack("<ddd", x, y, z)


def linestring(coords) -> bytes:
    a = np.asarray(coords, dtype=np.float64)
    has_z = a.shape[1] == 3
    return _hdr(LINESTRING, has_z) + struct.pack("<I", len(a)) + _pack_coords(a)


def _ring_bytes(a: np.ndarray) -> bytes:
    return struct.pack("<I", len(a)) + _pack_coords(a)


def _close_ring(a: np.ndarray) -> np.ndarray:
    if len(a) == 0 or np.array_equal(a[0], a[-1]):
        return a
    return np.vstack([a, a[:1]])


def polygon(rings) -> bytes:
    """rings: list of (n,2|3) arrays; first = exterior. Auto-closes rings."""
    rings = [_close_ring(np.asarray(r, dtype=np.float64)) for r in rings]
    has_z = rings[0].shape[1] == 3
    out = _hdr(POLYGON, has_z) + struct.pack("<I", len(rings))
    for r in rings:
        out += _ring_bytes(r)
    return out


def multipoint(coords) -> bytes:
    a = np.asarray(coords, dtype=np.float64)
    has_z = a.shape[1] == 3
    out = _hdr(MULTIPOINT, has_z) + struct.pack("<I", len(a))
    for row in a:
        out += point(*row)
    return out


def multilinestring(lines) -> bytes:
    lines = [np.asarray(l, dtype=np.float64) for l in lines]
    has_z = lines[0].shape[1] == 3
    out = _hdr(MULTILINESTRING, has_z) + struct.pack("<I", len(lines))
    for l in lines:
        out += linestring(l)
    return out


def multipolygon(polys) -> bytes:
    """polys: list of list-of-rings."""
    first = np.asarray(polys[0][0], dtype=np.float64)
    has_z = first.shape[1] == 3
    out = _hdr(MULTIPOLYGON, has_z) + struct.pack("<I", len(polys))
    for rings in polys:
        out += polygon(rings)
    return out


def box(minx: float, miny: float, maxx: float, maxy: float) -> bytes:
    """Axis-aligned rectangle polygon (CCW exterior)."""
    return polygon(
        [[(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]]
    )


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte_order(self) -> str:
        bo = self.buf[self.pos]
        self.pos += 1
        return "<" if bo == 1 else ">"

    def u32(self, bo: str) -> int:
        (v,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        return v

    def coords(self, bo: str, n: int, dim: int) -> np.ndarray:
        nbytes = n * dim * 8
        a = np.frombuffer(self.buf, dtype=bo + "f8", count=n * dim, offset=self.pos)
        self.pos += nbytes
        return a.reshape(n, dim)


def decode(buf: bytes) -> dict:
    """Decode one WKB blob into a geom dict."""
    r = _Reader(bytes(buf))
    return _decode_geom(r)


def _decode_geom(r: _Reader) -> dict:
    bo = r.byte_order()
    code = r.u32(bo)
    has_z = code >= 1000
    base = code % 1000
    dim = 3 if has_z else 2
    if base == POINT:
        return {"type": "Point", "coords": r.coords(bo, 1, dim)[0]}
    if base == LINESTRING:
        n = r.u32(bo)
        return {"type": "LineString", "coords": r.coords(bo, n, dim)}
    if base == POLYGON:
        nr = r.u32(bo)
        rings = [r.coords(bo, r.u32(bo), dim) for _ in range(nr)]
        return {"type": "Polygon", "rings": rings}
    if base == MULTIPOINT:
        n = r.u32(bo)
        pts = [_decode_geom(r)["coords"] for _ in range(n)]
        return {"type": "MultiPoint", "points": np.array(pts)}
    if base == MULTILINESTRING:
        n = r.u32(bo)
        return {"type": "MultiLineString", "lines": [_decode_geom(r)["coords"] for _ in range(n)]}
    if base == MULTIPOLYGON:
        n = r.u32(bo)
        return {"type": "MultiPolygon", "polygons": [_decode_geom(r)["rings"] for _ in range(n)]}
    if base == COLLECTION:
        n = r.u32(bo)
        return {"type": "GeometryCollection", "geoms": [_decode_geom(r) for _ in range(n)]}
    raise ValueError(f"unsupported WKB type code {code}")


def encode(g: dict) -> bytes:
    t = g["type"]
    if t == "Point":
        return point(*g["coords"])
    if t == "LineString":
        return linestring(g["coords"])
    if t == "Polygon":
        return polygon(g["rings"])
    if t == "MultiPoint":
        return multipoint(g["points"])
    if t == "MultiLineString":
        return multilinestring(g["lines"])
    if t == "MultiPolygon":
        return multipolygon(g["polygons"])
    raise ValueError(f"cannot encode {t}")


def geom_type(buf: bytes) -> str:
    """Cheap type sniff without full decode."""
    bo = "<" if buf[0] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", bytes(buf), 1)
    base = code % 1000
    return {
        POINT: "Point",
        LINESTRING: "LineString",
        POLYGON: "Polygon",
        MULTIPOINT: "MultiPoint",
        MULTILINESTRING: "MultiLineString",
        MULTIPOLYGON: "MultiPolygon",
        COLLECTION: "GeometryCollection",
    }[base]
