"""Slippy-map tiles: the published XYZ / Web-Mercator tiling scheme
(OSM z/x/y tile names, quadkey strings) as pure-codegen columns — the
interop member of the cell-index family that web maps, tile servers and
pyramid sinks speak natively.

tx = ⌊(lon+180)/360 · 2^z⌋
ty = ⌊(1 − asinh(tan φ)/π)/2 · 2^z⌋   (φ clamped to ±85.05112878°)
quadkey digit_i = bit i of tx + 2·bit i of ty, most-significant first.

Reference parity: the reference's GeoGrid/geotile splitting
(/root/reference/gistools/grid.py) names tiles by row/col in an
arbitrary lat/lon window; the slippy scheme is the standardized
Web-Mercator special case every basemap pipeline expects.

Drift-proofing: the Spark Column is built with F.expr over the SAME
SQL text the DuckDB oracle runs (one generator, two engines), and the
Mercator y — the only transcendental — rounds through float32 before
quantization so a ≤1-ulp libm difference cannot flip a tile (float32
ulp 2⁻²⁴ ≫ double libm drift; sound for z ≤ 22).  numpy mirrors the
same float32 rounding.
"""
from __future__ import annotations

import numpy as np

MAX_LAT = 85.05112878          # Web-Mercator square clamp
MAX_ZOOM = 22                  # float32 rounding stays sound (see above)


def _check_zoom(z: int) -> None:
    if not 0 <= z <= MAX_ZOOM:
        raise ValueError(f"zoom must be in [0, {MAX_ZOOM}], got {z}")


# ------------------------------------------------------------------ numpy

def tile_xy(lon, lat, z: int):
    """Vectorized numpy (tx, ty) tile indices at zoom z."""
    _check_zoom(z)
    n = 1 << z
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    fx = (lon + 180.0) / 360.0
    fy = (1.0 - np.arcsinh(np.tan(np.radians(lat))) / np.pi) / 2.0
    fx32 = fx.astype(np.float32).astype(np.float64)
    fy32 = fy.astype(np.float32).astype(np.float64)
    tx = np.clip(np.floor(fx32 * n), 0, n - 1).astype(np.int64)
    ty = np.clip(np.floor(fy32 * n), 0, n - 1).astype(np.int64)
    return tx, ty


def quadkey(lon, lat, z: int):
    """Vectorized numpy quadkey strings (length z) — the base-4
    interleaving of (tx, ty), MSB first."""
    _check_zoom(z)
    tx, ty = tile_xy(lon, lat, z)
    txf, tyf = np.atleast_1d(tx), np.atleast_1d(ty)
    out = []
    for a, b in zip(txf.tolist(), tyf.tolist()):
        s = []
        for i in range(z - 1, -1, -1):
            s.append(str(((a >> i) & 1) + 2 * ((b >> i) & 1)))
        out.append("".join(s))
    if np.isscalar(lon):
        return out[0]
    return np.array(out)


def quadkey_to_tile(qk: str):
    """(z, tx, ty) from a quadkey string."""
    tx = ty = 0
    for ch in qk:
        d = int(ch)
        if not 0 <= d <= 3:
            raise ValueError(f"bad quadkey digit {ch!r}")
        tx = (tx << 1) | (d & 1)
        ty = (ty << 1) | (d >> 1)
    return len(qk), tx, ty


def tile_bounds(tx, ty, z: int):
    """(west, south, east, north) degrees of tile (tx, ty) at zoom z."""
    _check_zoom(z)
    n = float(1 << z)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    west = tx / n * 360.0 - 180.0
    east = (tx + 1) / n * 360.0 - 180.0

    def lat_of(yy):
        return np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yy / n))))
    north = lat_of(ty)
    south = lat_of(ty + 1)
    return west, south, east, north


def tile_parent(tx, ty, z: int, parent_z: int):
    if parent_z > z:
        raise ValueError("parent_z finer than tile zoom")
    d = z - parent_z
    return (np.asarray(tx, dtype=np.int64) >> d,
            np.asarray(ty, dtype=np.int64) >> d)


def tile_children(tx: int, ty: int):
    """The 4 (tx, ty) children at the next zoom."""
    return [(2 * tx, 2 * ty), (2 * tx + 1, 2 * ty),
            (2 * tx, 2 * ty + 1), (2 * tx + 1, 2 * ty + 1)]


# ------------------------------------------------------------------ shared SQL

def tile_sql(lon_expr: str, lat_expr: str, z: int) -> tuple[str, str]:
    """(tx, ty) ANSI-SQL scalar expressions — the ONE text both the
    Spark Column builder (via F.expr) and the DuckDB oracle run."""
    _check_zoom(z)
    n = 1 << z
    latc = (f"least(greatest(CAST({lat_expr} AS DOUBLE), {-MAX_LAT}),"
            f" {MAX_LAT})")
    fx = f"((CAST({lon_expr} AS DOUBLE) + 180.0) / 360.0)"
    # asinh(t) = ln(t + sqrt(t*t + 1)): ln/sqrt exist in both engines
    t = f"tan(radians({latc}))"
    fy = f"((1.0 - ln(({t}) + sqrt(({t}) * ({t}) + 1.0)) / pi()) / 2.0)"

    def q(f):
        return (f"CAST(least(greatest(floor("
                f"CAST(CAST({f} AS FLOAT) AS DOUBLE) * {n}.0"
                f"), 0.0), {n - 1}.0) AS BIGINT)")
    return q(fx), q(fy)


def tile_columns(lon: str, lat: str, z: int):
    """(tx, ty) PySpark Columns — F.expr over the tile_sql text, so
    column and oracle are byte-identical expressions."""
    from pyspark.sql import functions as F

    sx, sy = tile_sql(lon, lat, z)
    return F.expr(sx), F.expr(sy)


def quadkey_sql(lon_expr: str, lat_expr: str, z: int) -> str:
    """Quadkey string SQL — scalar subquery computes (tx, ty) once,
    digits concatenate from bit pairs (portable Spark SQL + DuckDB)."""
    sx, sy = tile_sql(lon_expr, lat_expr, z)
    digits = " || ".join(
        f"CAST((((__qx >> {i}) & 1) + 2 * ((__qy >> {i}) & 1)) AS STRING)"
        for i in range(z - 1, -1, -1))
    return (f"(SELECT {digits} FROM (SELECT {sx} AS __qx, {sy} AS __qy)"
            f" AS __qk)")


def quadkey_column(lon: str, lat: str, z: int):
    """Quadkey PySpark Column (pure codegen; concat of bit-pair digits
    over the shared tile_sql tile indices)."""
    from pyspark.sql import functions as F

    tx, ty = tile_columns(lon, lat, z)
    digits = [
        (F.shiftright(tx, i).bitwiseAND(F.lit(1))
         + F.shiftright(ty, i).bitwiseAND(F.lit(1)) * 2).cast("string")
        for i in range(z - 1, -1, -1)]
    return F.concat(*digits)
