"""Geohash encode/decode as pure column bit arithmetic (zero UDFs).

Third cell-index family next to the engine's quadtree cells and the
fishnet grid: the public Geohash standard (Niemeyer 2008) — base-32
characters over lon/lat bit interleaving, even global bit positions
longitude, odd latitude, MSB first.  Both the Column builder and the
SQL-string builder emit the SAME expression tree (shifts, masks, adds,
substr/concat), so a driver gate mirrors bit-for-bit in DuckDB and the
whole encode stays inside whole-stage codegen on Spark — at 10^12 rows
the geohash is free relative to the scan.

Precision 1..12 chars (5 bits/char, ≤60 bits total → int64-safe).
Reference: gis-tools indexes by its GeoGrid cells only; geohash is the
interop surface most external geo tables key by.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_plan(precision: int):
    """For each global bit g (0 = MSB): (source, source_bit_from_msb).

    Geohash interleaves starting with longitude at g=0.  Returns the
    lon/lat bit counts and the per-bit mapping."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be 1..12")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    plan = []
    ilon = ilat = 0
    for g in range(nbits):
        if g % 2 == 0:
            plan.append(("lon", ilon))
            ilon += 1
        else:
            plan.append(("lat", ilat))
            ilat += 1
    return nbits, nlon, nlat, plan


def geohash_column(lon, lat, precision: int = 9) -> Column:
    """Geohash string Column from lon/lat double Columns."""
    nbits, nlon, nlat, plan = _bit_plan(precision)
    ix = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nlon)))
    iy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << nlat)))
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit((1 << nlon) - 1)).cast("long")
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit((1 << nlat) - 1)).cast("long")
    acc = F.lit(0).cast("long")
    for g, (src, sb) in enumerate(plan):
        n, col = (nlon, ix) if src == "lon" else (nlat, iy)
        bit = F.shiftrightunsigned(col, n - 1 - sb).bitwiseAND(F.lit(1))
        acc = acc + bit * F.lit(1 << (nbits - 1 - g))
    chars = []
    for c in range(precision):
        idx = F.shiftrightunsigned(acc, nbits - 5 * (c + 1)) \
            .bitwiseAND(F.lit(31))
        chars.append(F.substring(F.lit(_B32), F.lit(1) + idx.cast("int"), 1))
    return F.concat(*chars)


def geohash_sql(lon_expr: str, lat_expr: str, precision: int = 9) -> str:
    """The identical expression as ANSI SQL (DuckDB oracle mirror)."""
    nbits, nlon, nlat, plan = _bit_plan(precision)
    ix = (f"CAST(least(greatest(floor((({lon_expr}) + 180.0) / 360.0 * "
          f"{float(1 << nlon)}), 0), {(1 << nlon) - 1}) AS BIGINT)")
    iy = (f"CAST(least(greatest(floor((({lat_expr}) + 90.0) / 180.0 * "
          f"{float(1 << nlat)}), 0), {(1 << nlat) - 1}) AS BIGINT)")
    terms = []
    for g, (src, sb) in enumerate(plan):
        n, e = (nlon, ix) if src == "lon" else (nlat, iy)
        terms.append(f"(({e} >> {n - 1 - sb}) & 1) * "
                     f"{1 << (nbits - 1 - g)}")
    acc = "(" + " + ".join(terms) + ")"
    chars = [f"substr('{_B32}', CAST(({acc} >> {nbits - 5 * (c + 1)}) & 31 "
             f"AS INT) + 1, 1)" for c in range(precision)]
    return "(" + " || ".join(chars) + ")"


def geohash_decode(gh: Column) -> tuple[Column, Column]:
    """(lon, lat) cell-center Columns from a geohash string Column.

    Works for any length 1..12 present in the column (per-row length).
    Linear-size expression tree: the de-interleaved lon/lat integers
    are accumulated as flat sums of bit terms per possible precision,
    then a single CASE on length picks the matching closed-form
    center.  (A naive interval-bisection column build doubles the
    expression tree per bit — 2^60 nodes — and OOMs the driver;
    this form is ~400 small terms.)"""
    n = F.length(gh)
    codes = [(F.instr(F.lit(_B32), F.substring(gh, c + 1, 1)) - F.lit(1))
             .cast("long") for c in range(12)]
    lon_e = lat_e = None
    for p in range(1, 13):
        nbits, nlon, nlat, plan = _bit_plan(p)
        ix = F.lit(0).cast("long")
        iy = F.lit(0).cast("long")
        ilon = ilat = 0
        for g, (src, _) in enumerate(plan):
            c, b = divmod(g, 5)
            bit = F.shiftrightunsigned(codes[c], 4 - b).bitwiseAND(F.lit(1))
            if src == "lon":
                ix = ix + bit * F.lit(1 << (nlon - 1 - ilon))
                ilon += 1
            else:
                iy = iy + bit * F.lit(1 << (nlat - 1 - ilat))
                ilat += 1
        clon = F.lit(-180.0) + (ix.cast("double") + F.lit(0.5)) * \
            F.lit(360.0 / float(1 << nlon))
        clat = F.lit(-90.0) + (iy.cast("double") + F.lit(0.5)) * \
            F.lit(180.0 / float(1 << nlat))
        cond = n == p
        lon_e = F.when(cond, clon) if lon_e is None else lon_e.when(cond, clon)
        lat_e = F.when(cond, clat) if lat_e is None else lat_e.when(cond, clat)
    return (lon_e.otherwise(F.lit(None)), lat_e.otherwise(F.lit(None)))
