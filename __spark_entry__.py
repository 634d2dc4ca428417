"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs the REAL engine (WKB geometries, cell
covers, Arrow-batched refine kernels); each ``oracle_sql()`` entry is
the closed-form ANSI-SQL equivalent DuckDB can run on the same parquet.
Geometry derivations are deterministic arithmetic over the driver
tables (see gis_tools_spark/sources/driver_tables.py) so both sides see
identical inputs. Every computed column is aliased identically on both
sides; floats are rounded identically before comparison.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from gis_tools_spark import cells as C  # noqa: E402
from gis_tools_spark.operators.knn import nearest_feature  # noqa: E402
from gis_tools_spark.operators.overlay import dissolve, intersection_join  # noqa: E402
from gis_tools_spark.operators.sjoin import pip_join  # noqa: E402
from gis_tools_spark.operators.split import image_tile_assignment  # noqa: E402
from gis_tools_spark.sources import driver_tables as DT  # noqa: E402

CELL_RES = 14
TILE_RES = 16


def _tune(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ===================================================================== geo

def q_pip_zone_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP join (points ⋈ zone polygons) → per-zone counts. The flagship
    operator: filter-refine join over real WKB rect zones."""
    _tune(spark)
    pts = DT.events_points(spark, sf_dir)
    zones = DT.nation_zones(spark, sf_dir)
    j = pip_join(pts, zones, strategy="broadcast")
    return (j.groupBy("gid", "nom").agg(F.count("*").alias("n_points")))


def q_pip_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw PIP join pairs (event_id, gid) via the cell-join strategy
    (exercises cover UDF + equi-join + refine, not broadcast)."""
    _tune(spark)
    pts = DT.events_points(spark, sf_dir)
    zones = DT.nation_zones(spark, sf_dir)
    j = pip_join(pts, zones, strategy="cell")
    return j.select("event_id", "gid")


def q_pip_pairs_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join with explicit hot-cell salting enabled (skew path)."""
    _tune(spark)
    pts = DT.events_points(spark, sf_dir)
    zones = DT.nation_zones(spark, sf_dir)
    j = pip_join(pts, zones, strategy="cell", salt_threshold=200)
    return j.select("event_id", "gid")


def q_cell_index_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-analog cell indexing at res 14 — pure column arithmetic."""
    _tune(spark)
    pts = DT.events_points(spark, sf_dir)
    return (pts.withColumn("cell", C.cell_column(F.col("lon"), F.col("lat"), CELL_RES))
            .groupBy("cell").agg(F.count("*").alias("n")))


def q_tile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image tile assignment from footprint bbox (geotile splitting):
    distinct cover cells at res 16 per footprint."""
    _tune(spark)
    fp = DT.events_footprints(spark, sf_dir)
    return image_tile_assignment(fp, res=TILE_RES).select("event_id", "cell")


def q_knn_nearest_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN nearest-feature with the reference tie-break semantics
    (gistools geometry.py:682-705: intersecting → centroid pick, dist 0)."""
    _tune(spark)
    pts = DT.events_points(spark, sf_dir)
    zones = DT.nation_zones(spark, sf_dir)
    out = nearest_feature(pts, zones, point_id="event_id", strategy="broadcast")
    return out.select("event_id", "nearest_gid",
                      F.round(F.col("nearest_dist"), 9).alias("dist_r"))


def q_zonal_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics semantics over point measures: PIP join then
    per-zone mean/std/min/max/sum/count (gistools stats.py:60-151)."""
    _tune(spark)
    pts = DT.events_points(spark, sf_dir)
    zones = DT.nation_zones(spark, sf_dir)
    j = pip_join(pts, zones, strategy="broadcast")
    return j.groupBy("gid").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.stddev_pop("value"), 6).alias("std_value"),
    )


def q_shared_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlay intersection areas: zones ⋈ query rects (gistools
    intersecting_area layer.py:1728-1747) — real clip kernel vs SQL
    closed-form rect∩rect."""
    _tune(spark)
    zones = DT.nation_zones(spark, sf_dir)
    re = spark.read.parquet(f"{sf_dir}/region.parquet")
    from gis_tools_spark.geom import wkb as W
    rows = [(int(r["r_regionkey"]),
             bytearray(W.box(5.0 + r["r_regionkey"] * 0.9, 40.3,
                             5.0 + r["r_regionkey"] * 0.9 + 1.1, 43.4)))
            for r in re.collect()]
    rects = spark.createDataFrame(rows, "rid int, geometry_wkb binary")
    out = intersection_join(zones, rects, left_id="gid", right_id="rid",
                            keep_geometry=False)
    return out.select("gid", "rid", F.round(F.col("inter_area"), 9).alias("area_r"))


def q_dissolve_region_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dissolve zones by region key; union area (zones disjoint → exact;
    gistools dissolve layer.py:501-516)."""
    _tune(spark)
    zones = DT.nation_zones(spark, sf_dir)
    d = dissolve(zones.select("regionkey", "geometry_wkb"), "regionkey")
    return d.select("regionkey", F.round(F.col("union_area"), 9).alias("area_r"))


def q_dwithin_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-range join (ST_DWithin analog; gistools nearest_neighbors
    layer.py:896-929): points within 0.05° of each zone rect."""
    _tune(spark)
    from gis_tools_spark.operators.proximity import dwithin_join

    pts = DT.events_points(spark, sf_dir)
    zones = DT.nation_zones(spark, sf_dir)
    j = dwithin_join(pts, zones, 0.05)
    return j.groupBy("gid").agg(F.count("*").alias("n_within"))


def q_knn_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN via the distributed ring-expansion strategy (same oracle as
    knn_nearest_zone — gates the shuffle path, not just broadcast)."""
    _tune(spark)
    pts = DT.events_points(spark, sf_dir)
    zones = DT.nation_zones(spark, sf_dir)
    out = nearest_feature(pts, zones, point_id="event_id", strategy="rings")
    return out.select("event_id", "nearest_gid",
                      F.round(F.col("nearest_dist"), 9).alias("dist_r"))


def q_fishnet_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fishnet tiling of the zone rects at res 12: per (zone, cell) piece
    areas — the geotile-splitting fixture op vs a closed-form oracle."""
    _tune(spark)
    from gis_tools_spark.operators.split import fishnet

    zones = DT.nation_zones(spark, sf_dir)
    fn = fishnet(zones, res=12, keep_piece_geom=False)
    # the clip kernel's shoelace area is validated in pytest
    # (area-preservation); for the bit-exact oracle hash we recompute the
    # rect∩cell area with the SAME closed-form column arithmetic as the
    # SQL side (the kernel's value differs in the last ulp, which flips
    # the half-up rounding on dyadic cell edges)
    k = F.col("gid")
    zminx = F.lit(5.0) + (k % 5).cast("double") * 1.0
    zminy = F.lit(40.0) + F.floor(k / 5).cast("double") * 1.0
    zmaxx, zmaxy = zminx + 0.8, zminy + 0.8
    ix = F.floor((F.col("cell") - F.lit(12) * F.lit(1 << C.RES_SHIFT)) / F.lit(1 << C.IX_SHIFT))
    iy = F.col("cell") % F.lit(1 << C.IX_SHIFT)
    cminx = F.lit(-180.0) + ix * (360.0 / 4096)
    cmaxx = F.lit(-180.0) + (ix + 1) * (360.0 / 4096)
    cminy = F.lit(-90.0) + iy * (180.0 / 4096)
    cmaxy = F.lit(-90.0) + (iy + 1) * (180.0 / 4096)
    a = (F.greatest(F.lit(0.0), F.least(zmaxx, cmaxx) - F.greatest(zminx, cminx))
         * F.greatest(F.lit(0.0), F.least(zmaxy, cmaxy) - F.greatest(zminy, cminy)))
    area_r = F.floor(a * 1e9 + F.lit(0.5)).cast("long")
    return fn.select("gid", "cell", area_r.alias("area_r"))


# ============================================================ training-data ops

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup removal: hash-groupBy on document text."""
    _tune(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n")))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring: token count, char stats, punctuation ratio."""
    _tune(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tokens = F.size(F.split(F.trim(F.col("text")), " +"))
    n_chars = F.length("text")
    n_nospace = F.length(F.regexp_replace("text", r"\s", ""))
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_q"),
        F.round(n_nospace / n_tokens, 6).alias("avg_token_len"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID (en/fr/de scores + argmax)."""
    _tune(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def score(word: str):
        return ((F.length("text")
                 - F.length(F.expr(f"replace(text, ' {word} ', '')")))
                / (len(word) + 2)).cast("long")

    en, fr, de = score("the"), score("le"), score("der")
    pred = (F.when((en >= fr) & (en >= de), F.lit("en"))
            .when(fr >= de, F.lit("fr")).otherwise(F.lit("de")))
    return docs.select("doc_id", en.alias("en_s"), fr.alias("fr_s"),
                       de.alias("de_s"), pred.alias("pred_lang"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    _tune(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def q_embed_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine nearest neighbor per embedding (ANN baseline).

    Physical plan: the corpus is broadcast as one numpy matrix; each
    Arrow batch of queries does a single BLAS matmul — no crossJoin
    shuffle, no per-element lambda chains. Top-1 picked on the 6-dp
    rounded cosine with id tie-break (byte-identical to the SQL oracle's
    ORDER BY round(cos,6) DESC, id_b)."""
    _tune(spark)
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>").alias("v")))
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.array([r["v"] for r in rows], dtype=np.float64)
    Mn = np.linalg.norm(M, axis=1)
    bc = spark.sparkContext.broadcast((ids, M, Mn))

    schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cos_r", T.DoubleType()),
    ])

    def _run(it):
        ids_, M_, Mn_ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            Q = np.array(list(pdf["v"]), dtype=np.float64)
            Qn = np.linalg.norm(Q, axis=1)
            S = np.round((Q @ M_.T) / (Qn[:, None] * Mn_[None, :]), 6)
            qids = pdf["vec_id"].values
            recs = []
            for i in range(len(pdf)):
                s = S[i]
                # top-1 by (cos desc, id asc), excluding self
                mask = ids_ != qids[i]
                order = np.lexsort((ids_[mask], -s[mask]))
                j = np.nonzero(mask)[0][order[0]]
                recs.append((int(qids[i]), int(ids_[j]), float(s[j])))
            yield pd.DataFrame(recs, columns=["id_a", "id_b", "cos_r"])

    return emb.mapInPandas(_run, schema=schema)


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs over documents (rows-only
    check — hash choice isn't ANSI-SQL-expressible)."""
    _tune(spark)
    from gis_tools_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.5)


def q_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups (Hamming ≤ 3) over documents (rows-only)."""
    _tune(spark)
    from gis_tools_spark.operators.dedup import simhash_near_dups

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_dups(docs, max_hamming=3)


def q_zonal_raster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True raster zonal statistics (decode → mask → partial/final agg)
    on deterministic synthetic tiles + zones (rows-only; raster decode
    isn't SQL-expressible — pytest holds the mosaic-oracle check)."""
    _tune(spark)
    from gis_tools_spark import fixtures
    from gis_tools_spark.raster.zonal import zonal_statistics

    ras = spark.createDataFrame(fixtures.gen_rasters(4, 4, 64))
    zones = spark.createDataFrame(
        fixtures.gen_zones(32)[["gid", "geometry_wkb"]])
    out = zonal_statistics(ras, zones)
    return out.select("gid", "zonal_count", "no_data_count",
                      F.round(F.col("zonal_mean"), 6).alias("mean_r"))


def q_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """360° horizon extraction from DEM tiles (rows-only; pytest holds
    the brute-force-oracle check)."""
    _tune(spark)
    import pandas as pd

    from gis_tools_spark import fixtures
    from gis_tools_spark.operators.topography import get_horizon

    ras = spark.createDataFrame(fixtures.gen_rasters(2, 2, 32))
    obs = spark.createDataFrame(pd.DataFrame(
        {"pid": [1, 2, 3], "lon": [6.5, 7.5, 8.5], "lat": [41.5, 42.5, 43.5]}))
    out = get_horizon(obs, ras, radius_deg=0.6, n_sectors=24)
    return out.select("pid", "sector", F.round(F.col("horizon_deg"), 6).alias("h_r"))


# ============================================================ relational sanity

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
        F.count("*").alias("count_order")))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
                       "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value")))


# ===================================================================== contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIP join + per-zone counts on sf0.001."""
    return q_pip_zone_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pip_zone_counts": q_pip_zone_counts,
        "pip_pairs": q_pip_pairs,
        "pip_pairs_salted": q_pip_pairs_salted,
        "cell_index_counts": q_cell_index_counts,
        "tile_assignment": q_tile_assignment,
        "knn_nearest_zone": q_knn_nearest_zone,
        "knn_rings": q_knn_rings,
        "dwithin_count": q_dwithin_count,
        "fishnet_tiles": q_fishnet_tiles,
        "zonal_event_stats": q_zonal_event_stats,
        "shared_area": q_shared_area,
        "dissolve_region_area": q_dissolve_region_area,
        "dedup_exact": q_dedup_exact,
        "minhash_pairs": q_minhash_pairs,
        "simhash_dups": q_simhash_dups,
        "zonal_raster_stats": q_zonal_raster_stats,
        "horizon": q_horizon,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "embed_top1": q_embed_top1,
        "pricing_summary": q_pricing_summary,
        "events_hourly": q_events_hourly,
    }


_PIP_PAIRS_SQL = f"""
SELECT p.event_id, z.gid
FROM ({DT.POINTS_SQL.strip()}) p
JOIN ({DT.ZONES_SQL.strip()}) z
  ON p.lon >= z.zminx AND p.lon <= z.zmaxx
 AND p.lat >= z.zminy AND p.lat <= z.zmaxy
"""


def oracle_sql() -> dict[str, str]:
    cell14 = C.cell_sql("p.lon", "p.lat", CELL_RES)
    corner = lambda xe, ye: C.cell_sql(xe, ye, TILE_RES)  # noqa: E731
    return {
        "pip_zone_counts": f"""
            SELECT z.gid, z.nom, count(*) AS n_points
            FROM ({DT.POINTS_SQL.strip()}) p
            JOIN ({DT.ZONES_SQL.strip()}) z
              ON p.lon >= z.zminx AND p.lon <= z.zmaxx
             AND p.lat >= z.zminy AND p.lat <= z.zmaxy
            GROUP BY z.gid, z.nom
        """,
        "pip_pairs": _PIP_PAIRS_SQL,
        "pip_pairs_salted": _PIP_PAIRS_SQL,
        "cell_index_counts": f"""
            SELECT {cell14} AS cell, count(*) AS n
            FROM ({DT.POINTS_SQL.strip()}) p
            GROUP BY 1
        """,
        "tile_assignment": f"""
            SELECT DISTINCT event_id, cell FROM (
              SELECT event_id, {corner('minx', 'miny')} AS cell FROM ({DT.FOOTPRINTS_SQL.strip()})
              UNION ALL
              SELECT event_id, {corner('maxx', 'miny')} FROM ({DT.FOOTPRINTS_SQL.strip()})
              UNION ALL
              SELECT event_id, {corner('minx', 'maxy')} FROM ({DT.FOOTPRINTS_SQL.strip()})
              UNION ALL
              SELECT event_id, {corner('maxx', 'maxy')} FROM ({DT.FOOTPRINTS_SQL.strip()})
            ) t
        """,
        "knn_nearest_zone": f"""
            WITH d AS (
              SELECT p.event_id, z.gid,
                sqrt(pow(greatest(z.zminx - p.lon, p.lon - z.zmaxx, 0), 2)
                   + pow(greatest(z.zminy - p.lat, p.lat - z.zmaxy, 0), 2)) AS dist,
                sqrt(pow(p.lon - (z.zminx + 0.4), 2)
                   + pow(p.lat - (z.zminy + 0.4), 2)) AS cdist
              FROM ({DT.POINTS_SQL.strip()}) p CROSS JOIN ({DT.ZONES_SQL.strip()}) z
            ), ranked AS (
              SELECT event_id, gid, dist,
                row_number() OVER (PARTITION BY event_id
                  ORDER BY CASE WHEN dist = 0 THEN cdist - 1e9 ELSE dist END, gid) AS rn
              FROM d
            )
            SELECT event_id, gid AS nearest_gid, round(dist, 9) AS dist_r
            FROM ranked WHERE rn = 1
        """,
        "zonal_event_stats": f"""
            SELECT z.gid, count(*) AS n,
                   round(sum(p.value), 6) AS sum_value,
                   round(avg(p.value), 6) AS avg_value,
                   round(min(p.value), 6) AS min_value,
                   round(max(p.value), 6) AS max_value,
                   round(stddev_pop(p.value), 6) AS std_value
            FROM ({DT.POINTS_SQL.strip()}) p
            JOIN ({DT.ZONES_SQL.strip()}) z
              ON p.lon >= z.zminx AND p.lon <= z.zmaxx
             AND p.lat >= z.zminy AND p.lat <= z.zmaxy
            GROUP BY z.gid
        """,
        "shared_area": f"""
            WITH r AS (
              SELECT r_regionkey AS rid,
                     5.0 + r_regionkey * 0.9 AS rminx, 40.3 AS rminy,
                     5.0 + r_regionkey * 0.9 + 1.1 AS rmaxx, 43.4 AS rmaxy
              FROM region
            ), x AS (
              SELECT z.gid, r.rid,
                greatest(0, least(z.zmaxx, r.rmaxx) - greatest(z.zminx, r.rminx))
                * greatest(0, least(z.zmaxy, r.rmaxy) - greatest(z.zminy, r.rminy)) AS a
              FROM ({DT.ZONES_SQL.strip()}) z CROSS JOIN r
            )
            SELECT gid, rid, round(a, 9) AS area_r FROM x WHERE a > 1e-12
        """,
        "dissolve_region_area": f"""
            SELECT z.regionkey,
                   round(sum((z.zmaxx - z.zminx) * (z.zmaxy - z.zminy)), 9) AS area_r
            FROM ({DT.ZONES_SQL.strip()}) z
            GROUP BY z.regionkey
        """,
        "dwithin_count": f"""
            SELECT z.gid, count(*) AS n_within
            FROM ({DT.POINTS_SQL.strip()}) p CROSS JOIN ({DT.ZONES_SQL.strip()}) z
            WHERE sqrt(pow(greatest(z.zminx - p.lon, p.lon - z.zmaxx, 0), 2)
                     + pow(greatest(z.zminy - p.lat, p.lat - z.zmaxy, 0), 2)) <= 0.05
            GROUP BY z.gid
        """,
        "knn_rings": f"""
            WITH d AS (
              SELECT p.event_id, z.gid,
                sqrt(pow(greatest(z.zminx - p.lon, p.lon - z.zmaxx, 0), 2)
                   + pow(greatest(z.zminy - p.lat, p.lat - z.zmaxy, 0), 2)) AS dist,
                sqrt(pow(p.lon - (z.zminx + 0.4), 2)
                   + pow(p.lat - (z.zminy + 0.4), 2)) AS cdist
              FROM ({DT.POINTS_SQL.strip()}) p CROSS JOIN ({DT.ZONES_SQL.strip()}) z
            ), ranked AS (
              SELECT event_id, gid, dist,
                row_number() OVER (PARTITION BY event_id
                  ORDER BY CASE WHEN dist = 0 THEN cdist - 1e9 ELSE dist END, gid) AS rn
              FROM d
            )
            SELECT event_id, gid AS nearest_gid, round(dist, 9) AS dist_r
            FROM ranked WHERE rn = 1
        """,
        "fishnet_tiles": f"""
            WITH z AS ({DT.ZONES_SQL.strip()}),
            xs AS (
              SELECT z.*, UNNEST(generate_series(
                CAST(floor((zminx + 180.0) / 360.0 * 4096) AS BIGINT),
                CAST(floor((zmaxx + 180.0) / 360.0 * 4096) AS BIGINT))) AS ix
              FROM z),
            ys AS (
              SELECT xs.*, UNNEST(generate_series(
                CAST(floor((zminy + 90.0) / 180.0 * 4096) AS BIGINT),
                CAST(floor((zmaxy + 90.0) / 180.0 * 4096) AS BIGINT))) AS iy
              FROM xs),
            p AS (
              SELECT gid,
                CAST(12 AS BIGINT) * {1 << 58} + ix * {1 << 29} + iy AS cell,
                greatest(0, least(zmaxx, -180.0 + (ix + 1) * 360.0 / 4096)
                          - greatest(zminx, -180.0 + ix * 360.0 / 4096))
              * greatest(0, least(zmaxy, -90.0 + (iy + 1) * 180.0 / 4096)
                          - greatest(zminy, -90.0 + iy * 180.0 / 4096)) AS a
              FROM ys)
            SELECT gid, cell, CAST(floor(a * 1e9 + 0.5) AS BIGINT) AS area_r
            FROM p WHERE a > 1e-12
        """,
        "dedup_exact": """
            SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
            FROM documents GROUP BY 1
        """,
        "text_stats": r"""
            SELECT doc_id,
              length(string_split_regex(trim(text), ' +')) AS n_tokens,
              length(text) AS n_chars_q,
              round(length(regexp_replace(text, '\s', '', 'g'))
                    / length(string_split_regex(trim(text), ' +')), 6) AS avg_token_len,
              round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                    / length(text), 6) AS punct_ratio
            FROM documents
        """,
        "lang_id": """
            WITH s AS (
              SELECT doc_id,
                CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS en_s,
                CAST((length(text) - length(replace(text, ' le ', ''))) / 4 AS BIGINT) AS fr_s,
                CAST((length(text) - length(replace(text, ' der ', ''))) / 5 AS BIGINT) AS de_s
              FROM documents
            )
            SELECT doc_id, en_s, fr_s, de_s,
              CASE WHEN en_s >= fr_s AND en_s >= de_s THEN 'en'
                   WHEN fr_s >= de_s THEN 'fr' ELSE 'de' END AS pred_lang
            FROM s
        """,
        "doc_fingerprint": r"""
            SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "embed_top1": """
            WITH p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                  CAST(b.embedding AS DOUBLE[])) AS DOUBLE), 6) AS cos_r
              FROM embeddings a CROSS JOIN embeddings b
              WHERE a.vec_id <> b.vec_id
            ), ranked AS (
              SELECT id_a, id_b, cos_r,
                row_number() OVER (PARTITION BY id_a ORDER BY cos_r DESC, id_b) AS rn
              FROM p
            )
            SELECT id_a, id_b, cos_r FROM ranked WHERE rn = 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "events_hourly": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, count(*) AS n, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
    }
