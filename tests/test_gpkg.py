"""GeoPackage source tests — the from-scratch SQLite b-tree parser is
conformance-checked row-for-row against the stdlib sqlite3 module on
the same file bytes (multi-page trees, overflow chains, rowid
aliasing), then the Spark operator contract (ok=false, never fatal)."""

import json
import os
import sqlite3
import tempfile

import numpy as np
import pytest

from gis_tools_spark.sources import gpkg as G
from gis_tools_spark.geom import wkb as W


def _mk(rows, **kw):
    p = tempfile.mktemp(suffix=".gpkg")
    G.to_gpkg(rows, p, **kw)
    data = open(p, "rb").read()
    return p, data


def _square(i):
    ring = np.array([[i, 0], [i + 1, 0], [i + 1, 1], [i, 1], [i, 0]],
                    dtype=float)
    return W.polygon([ring])


def test_parser_matches_sqlite3_row_for_row():
    rows = [{"fid": i + 1, "geometry_wkb": _square(i),
             "properties": {"name": f"p{i}", "v": i * 0.5}}
            for i in range(800)]                       # multi-page tree
    big = np.stack([np.arange(3000, dtype=float),
                    np.sqrt(np.arange(3000, dtype=float))], axis=1)
    rows.append({"fid": 99999, "geometry_wkb": W.linestring(big),
                 "properties": {"name": "big"}})       # overflow chain
    p, data = _mk(rows)
    feats = G.parse_gpkg(data)["features"]
    con = sqlite3.connect(p)
    oracle = dict((fid, (geom, props)) for fid, geom, props in
                  con.execute("SELECT fid, geom, properties FROM features"))
    con.close()
    os.unlink(p)
    assert len(feats) == len(oracle) == 801
    for r in feats:
        blob, props = oracle[r["fid"]]
        wkb, srs = G.gpkg_geom_to_wkb(blob)
        assert wkb == r["geometry_wkb"]
        assert srs == r["srs_id"] == 4326
        assert json.loads(props) == json.loads(r["properties"])


def test_rowid_aliasing_and_master_parse():
    rows = [{"fid": 7 * i + 3, "geometry_wkb": _square(i),
             "properties": {}} for i in range(5)]
    p, data = _mk(rows)
    os.unlink(p)
    tabs = G.sqlite_tables(data)
    assert {"features", "gpkg_contents",
            "gpkg_geometry_columns"} <= set(tabs)
    t = tabs["features"]
    assert t["columns"] == ["fid", "geom", "properties"] and t["ipk"] == 0
    fids = sorted(r["fid"] for r in G.read_table(data, "features"))
    assert fids == [3, 10, 17, 24, 31]    # stored as NULL, aliased to rowid


def test_geometry_blob_variants():
    wkb = _square(0)
    hdr_le = b"GP\x00\x01" + (4326).to_bytes(4, "little")
    assert G.gpkg_geom_to_wkb(hdr_le + wkb) == (wkb, 4326)
    # envelope indicator 1 (4 doubles), big-endian srs
    flags = bytes([0x02])
    hdr_env = b"GP\x00" + flags + (3857).to_bytes(4, "big") + b"\x00" * 32
    assert G.gpkg_geom_to_wkb(hdr_env + wkb) == (wkb, 3857)
    # empty-geometry flag
    hdr_empty = b"GP\x00" + bytes([0x11]) + (4326).to_bytes(4, "little")
    assert G.gpkg_geom_to_wkb(hdr_empty) == (None, 4326)
    with pytest.raises(G.GpkgError):
        G.gpkg_geom_to_wkb(b"XX" + b"\x00" * 10)
    with pytest.raises(G.GpkgError):
        G.gpkg_geom_to_wkb(hdr_le[:2] + bytes([0, 0x20]) + b"\x00" * 8)


def test_not_a_database_and_index_pages_raise():
    with pytest.raises(G.GpkgError):
        G.sqlite_tables(b"definitely not sqlite" * 10)
    # WITHOUT ROWID table -> index-page b-tree -> explicit unsupported
    p = tempfile.mktemp(suffix=".db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (k TEXT PRIMARY KEY, v INT) WITHOUT ROWID")
    con.execute("INSERT INTO t VALUES ('a', 1)")
    con.commit()
    con.close()
    data = open(p, "rb").read()
    os.unlink(p)
    tabs = G.sqlite_tables(data)
    with pytest.raises(G.GpkgError, match="page type"):
        list(G.read_table(data, "t"))


def test_gpkg_features_spark(spark):
    rows = [{"fid": i + 1, "geometry_wkb": _square(i),
             "properties": {"name": f"p{i}"}} for i in range(20)]
    p, data = _mk(rows)
    os.unlink(p)
    pdf = __import__("pandas").DataFrame(
        {"doc_id": [1, 2], "bytes": [data, b"corrupt not a gpkg"]})
    out = G.gpkg_features(spark.createDataFrame(pdf)).toPandas()
    good = out[out.ok]
    bad = out[~out.ok]
    assert len(good) == 20 and len(bad) == 1
    assert set(good["table_name"]) == {"features"}
    assert sorted(good["fid"]) == list(range(1, 21))
    r5 = good[good.fid == 5].iloc[0]
    assert bytes(r5["geometry_wkb"]) == _square(4)
    assert r5["srs_id"] == 4326
