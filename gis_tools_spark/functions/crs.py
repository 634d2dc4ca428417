"""Coordinate reprojection (reference to_crs: layer.py:1196-1229 and
raster to_crs raster.py:438-451 via pyproj/GDAL — neither wheel exists
in this sandbox, so the transforms ship as closed-form numpy kernels).

Supported CRS ids:
  4326  — WGS84 lon/lat (degrees)
  3857  — Web Mercator (meters; spherical, exact closed form)
  utm:N — UTM zone N north (transverse Mercator, Karney/Krüger series,
          ~0.1 mm accuracy within the zone; WGS84 ellipsoid)

API mirrors the per-geometry UDF pattern: ``reproject_udf(src, dst)``
returns a WKB→WKB pandas UDF; ``transform_xy`` is the raw numpy kernel
(used by tests and raster warps).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T

from ..geom import wkb

R = 6_378_137.0           # WGS84 semi-major
F_INV = 298.257223563
E2 = 1 - (1 - 1 / F_INV) ** 2


def _to_mercator(lon, lat):
    x = np.deg2rad(lon) * R
    y = R * np.log(np.tan(np.pi / 4 + np.deg2rad(np.clip(lat, -89.9999, 89.9999)) / 2))
    return x, y


def _from_mercator(x, y):
    lon = np.rad2deg(x / R)
    lat = np.rad2deg(2 * np.arctan(np.exp(y / R)) - np.pi / 2)
    return lon, lat


# --- transverse Mercator (Krüger series, 4th order) for UTM ------------

_N = (1 / F_INV) / (2 - 1 / F_INV)
_A_CAP = R / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64)
_ALPHA = [
    _N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16,
    13 * _N ** 2 / 48 - 3 * _N ** 3 / 5,
    61 * _N ** 3 / 240,
]
_BETA = [
    _N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96,
    _N ** 2 / 48 + _N ** 3 / 15,
    17 * _N ** 3 / 480,
]
_K0 = 0.9996


def _to_utm(lon, lat, zone: int):
    lon0 = np.deg2rad(zone * 6 - 183)
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon) - lon0
    e = np.sqrt(E2)
    t = np.sinh(np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi)))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    x = eta.copy()
    y = xi.copy()
    for j, (a,) in enumerate(zip(_ALPHA), start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    return _K0 * _A_CAP * x + 500_000.0, _K0 * _A_CAP * y


def _from_utm(x, y, zone: int):
    lon0 = np.deg2rad(zone * 6 - 183)
    xi = y / (_K0 * _A_CAP)
    eta = (x - 500_000.0) / (_K0 * _A_CAP)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, (b,) in enumerate(zip(_BETA), start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    e = np.sqrt(E2)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # conformal → geodetic latitude: fixed-point iteration on
    # artanh(sin φ) = artanh(sin χ) + e·artanh(e·sin φ)
    phi = chi.copy()
    for _ in range(6):
        phi = np.arcsin(np.tanh(
            np.arctanh(np.sin(chi)) + e * np.arctanh(e * np.sin(phi))))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.rad2deg(lam + lon0), np.rad2deg(phi)


def transform_xy(x: np.ndarray, y: np.ndarray, src, dst):
    """Transform coordinate arrays between supported CRS ids."""
    src, dst = str(src), str(dst)
    if src == dst:
        return x, y
    # normalize to 4326 first
    if src == "3857":
        x, y = _from_mercator(x, y)
    elif src.startswith("utm:"):
        x, y = _from_utm(x, y, int(src.split(":")[1]))
    elif src != "4326":
        raise NotImplementedError(f"CRS {src} (pyproj unavailable in sandbox)")
    if dst == "4326":
        return x, y
    if dst == "3857":
        return _to_mercator(x, y)
    if dst.startswith("utm:"):
        return _to_utm(x, y, int(dst.split(":")[1]))
    raise NotImplementedError(f"CRS {dst} (pyproj unavailable in sandbox)")


def reproject_udf(src, dst):
    """WKB→WKB vectorized reprojection UDF."""

    def _tx(g):
        t = g["type"]

        def conv(a):
            x, y = transform_xy(a[:, 0].copy(), a[:, 1].copy(), src, dst)
            out = a.copy().astype(np.float64)
            out[:, 0], out[:, 1] = x, y
            return out

        if t == "Point":
            c = conv(g["coords"].reshape(1, -1))[0]
            return wkb.point(*c)
        if t == "LineString":
            return wkb.linestring(conv(g["coords"]))
        if t == "Polygon":
            return wkb.polygon([conv(r) for r in g["rings"]])
        if t == "MultiPolygon":
            return wkb.multipolygon([[conv(r) for r in rings] for rings in g["polygons"]])
        if t == "MultiLineString":
            return wkb.multilinestring([conv(l) for l in g["lines"]])
        if t == "MultiPoint":
            return wkb.multipoint(conv(g["points"]))
        raise ValueError(t)

    @F.pandas_udf(T.BinaryType())
    def _udf(s: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else _tx(wkb.decode(b)) for b in s],
                         dtype=object)

    return _udf
