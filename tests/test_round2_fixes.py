"""Regression tests for the round-2 fixes (ADVICE.md + VERDICT.md).

Each test pins one defect found by the round-1 review:
  1. intersects() containment fallback for disjoint multi-parts
  2. connected_components convergence on long chains (pointer jumping)
  3. pip_join/sjoin how='left' with null attrs and duplicate rows
  4. simhash_near_dups completeness for max_hamming >= 4
  5. PNG Up-filter (2) on the first row
"""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.geom import kernels as K, wkb
from gis_tools_spark.operators.dedup import simhash64, simhash_near_dups
from gis_tools_spark.operators.network import connected_components
from gis_tools_spark.operators.sjoin import pip_join
from gis_tools_spark.raster import codec


# ---------------------------------------------------------- 1. multipart containment

def test_intersects_multipart_contained_second_part():
    # part 0 is far away, part 1 sits fully inside the box: no edge
    # crossings, so only the per-part containment test can find it
    multi = wkb.decode(wkb.multipolygon([
        [[(20, 20), (21, 20), (21, 21), (20, 21)]],
        [[(2, 2), (3, 2), (3, 3), (2, 3)]],
    ]))
    box = wkb.decode(wkb.box(0, 0, 10, 10))
    assert K.intersects(multi, box)
    assert K.intersects(box, multi)
    # and the negative case still holds
    far = wkb.decode(wkb.multipolygon([
        [[(20, 20), (21, 20), (21, 21), (20, 21)]],
        [[(30, 30), (31, 30), (31, 31), (30, 31)]],
    ]))
    assert not K.intersects(far, box)


def test_intersects_multiline_second_part_inside():
    ml = wkb.decode(wkb.multilinestring([
        [(20, 20), (21, 21)],
        [(2, 2), (3, 3)],
    ]))
    box = wkb.decode(wkb.box(0, 0, 10, 10))
    assert K.intersects(ml, box)
    assert K.intersects(box, ml)


# ---------------------------------------------------------- 2. CC on long chains

def test_connected_components_long_chain(spark):
    # a 300-node path has diameter ~300: plain one-hop propagation at the
    # old max_iter=50 silently returned split components
    n = 300
    rows = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(n - 1)]
    rows += [("z0001", "z0002"), ("z0002", "z0003")]  # second component
    edges = spark.createDataFrame(rows, ["src_key", "dst_key"])
    comp = connected_components(edges).toPandas()
    groups = comp.groupby("component")["node"].apply(frozenset)
    assert set(groups) == {
        frozenset(f"n{i:04d}" for i in range(n)),
        frozenset({"z0001", "z0002", "z0003"}),
    }


# ---------------------------------------------------------- 3. left join null/dup safety

def test_pip_left_join_null_attrs_and_duplicates(spark, zones_pd):
    # two identical point rows (same pid) + a null attribute column:
    # joining back on data columns would null out matches / cross-multiply
    z = zones_pd.iloc[0]
    g = wkb.decode(z["geometry_wkb"])
    cx, cy = K.centroid(g)
    pts = pd.DataFrame({
        "pid": [1, 1, 2],
        "lon": [cx, cx, -170.0],
        "lat": [cy, cy, -80.0],
        "tag": pd.array([None, None, "x"], dtype="string"),
    })
    pts_df = spark.createDataFrame(pts)
    zones_df = spark.createDataFrame(
        zones_pd[["gid", "nom", "secteur", "surf", "geometry_wkb"]])
    for strategy in ("cell", "broadcast"):
        out = pip_join(pts_df, zones_df, strategy=strategy, how="left").toPandas()
        inside = out[out["pid"] == 1]
        # both duplicate rows match, each exactly its own matches (no
        # cross-multiplication: 2 rows x k zones, not 2k x 2)
        k = len(inside[inside["gid"].notna()]) // 2
        assert len(inside) == 2 * max(k, 1)
        assert (inside["gid"].notna()).all(), f"null attr broke {strategy} left join"
        outside = out[out["pid"] == 2]
        assert len(outside) == 1 and outside["gid"].isna().all()


# ---------------------------------------------------------- 4. simhash block completeness

def test_simhash_near_dups_complete_for_large_hamming(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, base + f" variant {i % 7} tail {'x' * (i % 5)}") for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    hashes = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    want = set()
    for a in hashes:
        for b in hashes:
            if a < b:
                d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
                if d <= 6:
                    want.add((a, b))
    got = {(r["id_a"], r["id_b"])
           for r in simhash_near_dups(df, max_hamming=6).collect()}
    assert got == want  # pigeonhole must be complete, not best-effort
    with pytest.raises(ValueError):
        simhash_near_dups(df, max_hamming=64)


# ---------------------------------------------------------- 5. PNG Up filter on row 0

def test_png_up_filter_first_row():
    import struct
    import zlib

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 255, size=(4, 5, 3), dtype=np.uint8)
    # build scanlines with filter 2 (Up) on every row incl. row 0
    h, w, _ = arr.shape
    lines = []
    prev = np.zeros((w * 3,), dtype=np.int32)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int32)
        lines.append(bytes([2]) + ((cur - prev) % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (codec._PNG_SIG
           + codec._chunk(b"IHDR", ihdr)
           + codec._chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + codec._chunk(b"IEND", b""))
    out = codec.decode_png(png)
    np.testing.assert_array_equal(out, arr)
