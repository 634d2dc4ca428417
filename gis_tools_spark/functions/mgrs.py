"""MGRS (Military Grid Reference System) encode/decode over the
engine's own UTM Krüger transform (functions/crs.py) — the third
string cell-key family next to geohash and the quadtree cells, and the
grid most government/SAR imagery is indexed by.

Implements the public NGA standard (TM 8358.1): UTM zone number +
latitude band letter (C..X, skipping I/O, 8° bands) + the 100 km
square identifier (column letters A..Z less I/O cycling every 3 zones
with the AA/AL pattern, row letters A..V less I/O with the odd-zone
5-row offset) + easting/northing digits at precision 1-5 (10 km → 1 m).
Polar UPS zones are out of scope (raise), like the reference's UTM-only
workflows.
"""

from __future__ import annotations

import numpy as np

from .crs import _from_utm, _to_utm

_BANDS = "CDEFGHJKLMNPQRSTUVWX"          # 8° bands from 80S to 84N
_COL_LETTERS = "ABCDEFGHJKLMNPQRSTUVWXYZ"  # 24 (I, O dropped)
_ROW_LETTERS = "ABCDEFGHJKLMNPQRSTUV"      # 20 (I, O dropped)


def _lat_band(lat: float) -> str:
    if not -80.0 <= lat <= 84.0:
        raise ValueError(f"latitude {lat} outside MGRS UTM range "
                         "(polar UPS not supported)")
    if lat >= 72.0:
        return "X"                         # X is 12° tall
    return _BANDS[int((lat + 80.0) // 8.0)]


def _band_mid_lat(band: str) -> float:
    i = _BANDS.index(band)
    lo = -80.0 + 8.0 * i
    return lo + (6.0 if band == "X" else 4.0)


def encode(lon: float, lat: float, precision: int = 5) -> str:
    """(lon, lat) → MGRS string at ``precision`` digits (5 = 1 m)."""
    if not 1 <= precision <= 5:
        raise ValueError("precision must be 1..5")
    lon = float(lon)
    lat = float(lat)
    band = _lat_band(lat)
    zone = int((lon + 180.0) // 6.0) + 1
    zone = min(max(zone, 1), 60)
    # Norway/Svalbard zone exceptions (TM 8358.1)
    if band == "V" and zone == 31 and lon >= 3.0:
        zone = 32
    if band == "X":
        if 0.0 <= lon < 9.0:
            zone = 31
        elif 9.0 <= lon < 21.0:
            zone = 33
        elif 21.0 <= lon < 33.0:
            zone = 35
        elif 33.0 <= lon < 42.0:
            zone = 37
    e, n = _to_utm(np.array([lon]), np.array([lat]), zone)
    e, n = float(e[0]), float(n[0])
    if lat < 0:
        n += 10_000_000.0                  # southern false northing
    e100 = int(e // 100_000)
    n100 = int(n // 100_000)
    # column letters cycle per zone: zone 1 starts at A, 2 at J, 3 at S
    col = _COL_LETTERS[((zone - 1) % 3) * 8 + (e100 - 1)]
    # row letters: even zones offset by 5 ('F'), 2,000,000 m cycle
    row0 = 0 if zone % 2 == 1 else 5
    row = _ROW_LETTERS[(row0 + n100) % 20]
    step = 10 ** (5 - precision)
    ed = int((e % 100_000) // step)
    nd = int((n % 100_000) // step)
    return (f"{zone}{band}{col}{row}"
            f"{ed:0{precision}d}{nd:0{precision}d}")


def decode(ref: str) -> tuple:
    """MGRS string → (lon, lat) of the square's SW corner at the
    stated precision."""
    s = str(ref).strip().replace(" ", "").upper()
    i = 0
    while i < len(s) and s[i].isdigit():
        i += 1
    if not 1 <= i <= 2:
        raise ValueError(f"bad MGRS zone in {ref!r}")
    zone = int(s[:i])
    if not 1 <= zone <= 60 or len(s) < i + 3:
        raise ValueError(f"bad MGRS reference {ref!r}")
    band, col, row = s[i], s[i + 1], s[i + 2]
    if band not in _BANDS or col not in _COL_LETTERS \
            or row not in _ROW_LETTERS:
        raise ValueError(f"bad MGRS letters in {ref!r}")
    digits = s[i + 3:]
    if len(digits) % 2 or len(digits) > 10:
        raise ValueError(f"bad MGRS digits in {ref!r}")
    precision = len(digits) // 2
    step = 10 ** (5 - precision) if precision else 100_000
    ed = int(digits[:precision] or 0) * step
    nd = int(digits[precision:] or 0) * step
    col_idx = _COL_LETTERS.index(col)
    e100 = col_idx - ((zone - 1) % 3) * 8 + 1
    if not 1 <= e100 <= 8:
        raise ValueError(f"column letter {col!r} invalid for zone {zone}")
    row0 = 0 if zone % 2 == 1 else 5
    r = (_ROW_LETTERS.index(row) - row0) % 20
    # resolve the 2,000,000 m row ambiguity from the latitude band:
    # pick the candidate northing whose band matches
    mid = _band_mid_lat(band)
    _, n_guess = _to_utm(np.array([zone * 6.0 - 183.0]), np.array([mid]),
                         zone)
    n_guess = float(n_guess[0]) + (10_000_000.0 if mid < 0 else 0.0)
    best = None
    for k in range(6):                     # candidate 2Mm cycles
        n100 = r + 20 * k
        n = n100 * 100_000.0 + nd
        if best is None or abs(n - n_guess) < abs(best - n_guess):
            best = n
    n = best
    e = e100 * 100_000.0 + ed
    south = mid < 0
    if south:
        n -= 10_000_000.0
    lon, lat = _from_utm(np.array([e]), np.array([n]), zone)
    return float(lon[0]), float(lat[0])


def mgrs_column(precision: int = 5):
    """Pandas-UDF column: (lon, lat) → MGRS string (null outside the
    UTM band range)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _fn(lon, lat):
        out = []
        for lo, la in zip(lon, lat):
            try:
                out.append(encode(float(lo), float(la), precision))
            except (ValueError, TypeError):
                out.append(None)
        return pd.Series(out)

    return F.pandas_udf(_fn, T.StringType())
