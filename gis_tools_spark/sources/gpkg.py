"""GeoPackage (GPKG) source — a from-scratch SQLite b-tree reader over
blob columns, plus a stdlib-sqlite3 sink.

Reference parity: gis-tools opens every vector file through
geopandas/fiona drivers (gistools/layer.py:188-210), and GeoPackage is
fiona's flagship modern format.  At lake scale a .gpkg is a BLOB in a
documents table; opening it with the sqlite3 C library would mean a
temp file per row, so the SCAN path here parses the SQLite file format
directly from bytes (header -> sqlite_master b-tree -> table b-trees:
interior/leaf pages, varint records, overflow-page chains, INTEGER
PRIMARY KEY rowid aliasing) and unwraps the GPKG geometry blob header
(envelope indicator, srs_id, empty flag) down to the standard WKB the
whole engine already speaks.  The stdlib ``sqlite3`` module — present
in every CPython — is used only for the WRITER (`to_gpkg`) and as the
CONFORMANCE ORACLE in tests: every table the from-scratch parser reads
is compared row-for-row against what sqlite3 itself returns, including
multi-page trees and overflowing payloads (tests/test_gpkg.py).

Corrupt documents are marked (ok=false), never a task kill; at 100 TB
the parse is embarrassingly parallel over the document table's
existing partitioning — zero shuffle until the first relational op.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import numpy as np


class GpkgError(ValueError):
    pass


# ------------------------------------------------------------------ SQLite file format

def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(8):
        b = buf[pos + i]
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos + i + 1
    return (v << 8) | buf[pos + 8], pos + 9


def _serial_size(t: int) -> int:
    if t >= 12:
        return (t - 12) // 2 if t % 2 == 0 else (t - 13) // 2
    return (0, 1, 2, 3, 4, 6, 8, 8, 0, 0, 0, 0)[t]


def _decode_value(t: int, raw: bytes):
    if t == 0:
        return None
    if 1 <= t <= 6:
        return int.from_bytes(raw, "big", signed=True)
    if t == 7:
        return float(np.frombuffer(raw, dtype=">f8")[0])
    if t == 8:
        return 0
    if t == 9:
        return 1
    if t >= 13 and t % 2:
        return raw.decode("utf-8", "replace")
    if t >= 12:
        return bytes(raw)
    raise GpkgError(f"reserved serial type {t}")


class _Db:
    """Minimal read-only SQLite database over a bytes object."""

    def __init__(self, data: bytes):
        self.data = bytes(data)
        if self.data[:16] != b"SQLite format 3\x00":
            raise GpkgError("not an SQLite database")
        ps = int.from_bytes(self.data[16:18], "big")
        self.page_size = 65536 if ps == 1 else ps
        self.usable = self.page_size - self.data[20]
        enc = int.from_bytes(self.data[56:60], "big")
        if enc not in (0, 1):
            raise GpkgError("only UTF-8 text encoding is supported")

    def _page(self, n: int) -> bytes:
        off = (n - 1) * self.page_size
        if off + self.page_size > len(self.data):
            raise GpkgError(f"page {n} beyond file end")
        return self.data[off:off + self.page_size]

    def _payload(self, page: bytes, pos: int, plen: int) -> bytes:
        """Cell payload with overflow-chain reassembly."""
        u = self.usable
        x = u - 35
        if plen <= x:
            return page[pos:pos + plen]
        m = ((u - 12) * 32) // 255 - 23
        k = m + (plen - m) % (u - 4)
        local = k if k <= x else m
        out = bytearray(page[pos:pos + local])
        nxt = int.from_bytes(page[pos + local:pos + local + 4], "big")
        remaining = plen - local
        while remaining > 0 and nxt:
            pg = self._page(nxt)
            nxt = int.from_bytes(pg[:4], "big")
            take = min(remaining, u - 4)
            out += pg[4:4 + take]
            remaining -= take
        if remaining:
            raise GpkgError("truncated overflow chain")
        return bytes(out)

    def rows(self, rootpage: int) -> Iterator[tuple[int, list]]:
        """(rowid, values) from a table b-tree, in rowid order."""
        stack = [rootpage]
        while stack:
            n = stack.pop()
            page = self._page(n)
            hdr = 100 if n == 1 else 0
            ptype = page[hdr]
            ncell = int.from_bytes(page[hdr + 3:hdr + 5], "big")
            if ptype == 5:                       # table interior
                cells = page[hdr + 12:hdr + 12 + 2 * ncell]
                kids = []
                for i in range(ncell):
                    cp = int.from_bytes(cells[2 * i:2 * i + 2], "big")
                    kids.append(int.from_bytes(page[cp:cp + 4], "big"))
                kids.append(int.from_bytes(page[hdr + 8:hdr + 12], "big"))
                stack.extend(reversed(kids))    # keep rowid order
                continue
            if ptype != 13:
                raise GpkgError(f"unsupported b-tree page type {ptype} "
                                "(WITHOUT ROWID / index pages)")
            cells = page[hdr + 8:hdr + 8 + 2 * ncell]
            for i in range(ncell):
                cp = int.from_bytes(cells[2 * i:2 * i + 2], "big")
                plen, p = _varint(page, cp)
                rowid, p = _varint(page, p)
                payload = self._payload(page, p, plen)
                hlen, q = _varint(payload, 0)
                types = []
                while q < hlen:
                    t, q = _varint(payload, q)
                    types.append(t)
                vals, body = [], hlen
                for t in types:
                    sz = _serial_size(t)
                    vals.append(_decode_value(t, payload[body:body + sz]))
                    body += sz
                yield rowid, vals


_COL_RE = re.compile(r'^\s*(?:"([^"]+)"|`([^`]+)`|\[([^\]]+)\]|(\w+))')


def _parse_create(sql: str) -> tuple[list[str], int]:
    """Column names + index of the INTEGER PRIMARY KEY column (-1 if
    none) from a CREATE TABLE statement (top-level comma split)."""
    body = sql[sql.index("(") + 1:sql.rindex(")")]
    cols, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur))
    names, ipk = [], -1
    for c in cols:
        s = c.strip()
        up = s.upper()
        if up.startswith(("PRIMARY KEY", "UNIQUE", "CHECK", "FOREIGN KEY",
                          "CONSTRAINT")):
            continue
        m = _COL_RE.match(s)
        if not m:
            continue
        name = next(g for g in m.groups() if g is not None)
        if "INTEGER PRIMARY KEY" in up:
            ipk = len(names)
        names.append(name)
    return names, ipk


def sqlite_tables(data: bytes) -> dict[str, dict]:
    """{table_name: {rootpage, sql, columns, ipk}} from sqlite_master."""
    db = _Db(data)
    out = {}
    for _rowid, vals in db.rows(1):
        # sqlite_master: type, name, tbl_name, rootpage, sql
        if len(vals) >= 5 and vals[0] == "table" and vals[4]:
            cols, ipk = _parse_create(vals[4])
            out[vals[1]] = {"rootpage": vals[3], "sql": vals[4],
                            "columns": cols, "ipk": ipk}
    return out


def read_table(data: bytes, name: str) -> Iterator[dict]:
    """Dict rows of one table; INTEGER PRIMARY KEY aliases the rowid."""
    db = _Db(data)
    tables = sqlite_tables(data)
    if name not in tables:
        raise GpkgError(f"no such table {name!r}")
    t = tables[name]
    cols, ipk = t["columns"], t["ipk"]
    for rowid, vals in db.rows(t["rootpage"]):
        row = dict(zip(cols, vals + [None] * (len(cols) - len(vals))))
        if ipk >= 0 and ipk < len(cols):
            row[cols[ipk]] = rowid
        yield row


# ------------------------------------------------------------------ GPKG geometry blob

_ENV_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def gpkg_geom_to_wkb(blob: bytes) -> tuple[bytes | None, int]:
    """(wkb, srs_id) from a GeoPackage geometry blob; (None, srs) for
    the empty-geometry flag."""
    if blob is None or len(blob) < 8 or blob[:2] != b"GP":
        raise GpkgError("not a GPKG geometry blob")
    flags = blob[3]
    if flags & 0x20:
        raise GpkgError("extended GPKG geometry")
    little = flags & 1
    env = (flags >> 1) & 7
    if env not in _ENV_DOUBLES:
        raise GpkgError(f"invalid envelope indicator {env}")
    srs = int.from_bytes(blob[4:8], "little" if little else "big",
                         signed=True)
    off = 8 + 8 * _ENV_DOUBLES[env]
    if flags & 0x10:
        return None, srs
    return blob[off:], srs


def parse_gpkg(data: bytes) -> dict[str, list[dict]]:
    """Every feature table registered in gpkg_contents -> rows with
    ``geometry_wkb``/``srs_id`` replacing the geometry column."""
    tables = sqlite_tables(data)
    if "gpkg_contents" not in tables:
        raise GpkgError("missing gpkg_contents (not a GeoPackage)")
    geom_cols = {}
    if "gpkg_geometry_columns" in tables:
        for r in read_table(data, "gpkg_geometry_columns"):
            geom_cols[r.get("table_name")] = r.get("column_name")
    out = {}
    for c in read_table(data, "gpkg_contents"):
        if c.get("data_type") != "features":
            continue
        tname = c.get("table_name")
        if tname not in tables:
            continue
        gcol = geom_cols.get(tname, "geom")
        rows = []
        for r in read_table(data, tname):
            blob = r.pop(gcol, None)
            wkb, srs = (None, None) if blob is None else gpkg_geom_to_wkb(blob)
            r["geometry_wkb"] = wkb
            r["srs_id"] = srs
            rows.append(r)
        out[tname] = rows
    return out


# ------------------------------------------------------------------ Spark operators

GPKG_FEATURE_SCHEMA = ("doc_id long, table_name string, fid long, "
                       "geometry_wkb binary, srs_id int, properties string, "
                       "ok boolean")


def gpkg_features(df, *, blob_col: str = "bytes", id_col: str = "doc_id"):
    """DataFrame of GeoPackage blobs -> one row per feature.

    Same crawl contract as the other format sources: parse failures
    mark the row (ok=false) instead of killing the task; the heavy
    bytes never cross the JVM boundary again after the Arrow batch."""
    import pandas as pd

    def _run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                did = int(did)
                try:
                    for tname, feats in parse_gpkg(bytes(blob)).items():
                        for r in feats:
                            wkb = r.pop("geometry_wkb")
                            srs = r.pop("srs_id")
                            fid = next((v for k, v in r.items()
                                        if k.lower() in ("fid", "id")
                                        and isinstance(v, int)), -1)
                            props = {k: v for k, v in r.items()
                                     if not isinstance(v, (bytes, bytearray))}
                            rows.append((did, tname, fid, wkb, srs,
                                         json.dumps(props, sort_keys=True,
                                                    default=str), True))
                except (GpkgError, ValueError, IndexError, KeyError):
                    rows.append((did, None, -1, None, None, None, False))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "table_name", "fid", "geometry_wkb", "srs_id",
                "properties", "ok"])

    return df.select(id_col, blob_col).mapInPandas(
        _run, schema=GPKG_FEATURE_SCHEMA)


def to_gpkg(rows, path: str, *, table: str = "features",
            srs_id: int = 4326) -> None:
    """Write (fid, geometry_wkb, properties...) rows to a .gpkg file
    via the stdlib sqlite3 module (interchange sink + test fixture
    writer; the read path above never needs a file)."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        con.executescript(f"""
            CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
                srs_name TEXT, srs_id INTEGER PRIMARY KEY,
                organization TEXT, organization_coordsys_id INTEGER,
                definition TEXT, description TEXT);
            INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES
                ('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS["WGS 84"]', NULL);
            CREATE TABLE IF NOT EXISTS gpkg_contents (
                table_name TEXT PRIMARY KEY, data_type TEXT,
                identifier TEXT, description TEXT, last_change TEXT,
                min_x REAL, min_y REAL, max_x REAL, max_y REAL,
                srs_id INTEGER);
            CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
                table_name TEXT, column_name TEXT, geometry_type_name TEXT,
                srs_id INTEGER, z TINYINT, m TINYINT);
            CREATE TABLE IF NOT EXISTS "{table}" (
                fid INTEGER PRIMARY KEY, geom BLOB, properties TEXT);
        """)
        con.execute("INSERT OR REPLACE INTO gpkg_contents "
                    "(table_name, data_type, identifier, srs_id) "
                    "VALUES (?, 'features', ?, ?)", (table, table, srs_id))
        con.execute("INSERT INTO gpkg_geometry_columns VALUES "
                    "(?, 'geom', 'GEOMETRY', ?, 0, 0)", (table, srs_id))
        hdr = b"GP\x00\x01" + int(srs_id).to_bytes(4, "little", signed=True)
        for r in rows:
            con.execute(f'INSERT OR REPLACE INTO "{table}" VALUES (?,?,?)',
                        (int(r["fid"]), hdr + bytes(r["geometry_wkb"]),
                         json.dumps(r.get("properties", {}), default=str)))
        con.commit()
    finally:
        con.close()
