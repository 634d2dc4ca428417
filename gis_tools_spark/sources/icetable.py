"""Iceberg-style snapshot table format, from scratch on parquet + JSON.

The north rule runs the engine "over Iceberg tables of image + caption
pairs" and requires resumability "from Iceberg snapshot checkpoints".
No Iceberg runtime jar ships in this sandbox, so this module implements
the part of the table format the engine actually leans on — re-derived
from the PUBLIC Apache Iceberg spec concepts (metadata file + snapshot
manifests + stats-based file pruning + optimistic concurrency +
version-hint pointer), not from any Iceberg code:

* **Atomic snapshot commits.** A commit stages parquet data files in a
  snapshot-unique directory, writes an immutable manifest, then claims
  the next metadata version with an ``O_EXCL`` create — the lake-store
  analog of Iceberg's atomic metadata swap. Concurrent writers race on
  the version file; the loser re-reads and retries against the new
  current snapshot (optimistic concurrency), so an append is never
  lost and readers NEVER observe a half-commit: until the version file
  exists, the staged files are invisible orphans.
* **Manifests with per-file column stats.** Each manifest row carries
  the file's row count, byte size, and per-column min/max/null-count
  aggregated from the parquet footer (collected DISTRIBUTED — a
  mapInPandas over the file list reads footers on executors, only the
  tiny stats rows reach the driver). This is THE 100 TB read lever:
  ``scan(..., filters=…)`` / ``scan(..., bbox=…)`` drops whole files
  from the plan before Spark opens a single footer. With
  ``cluster_by`` (Morton-sorted layout, same key as
  :mod:`clustered`) a city-sized bbox over a planet-sized table reads
  a handful of files instead of the fleet.
* **Time travel.** Every snapshot (id, parent, timestamp, operation,
  summary) is kept in the metadata file; ``scan(..., as_of=…)`` reads
  any historical snapshot — the exact semantics the checkpoint layer
  needs for resume ("VERSION AS OF").
* **Exactness.** Pruning uses footer stats only to PROVE a file
  disjoint from the predicate; the same predicate is re-applied as a
  residual ``where`` on the surviving rows, so the result is
  value-identical to a full scan + filter (gated value-level vs DuckDB
  in ``icetable_scan``).

Reference parity note: gis-tools holds layers in RAM (geopandas,
/root/reference/gistools/layer.py:60-120) and has no lake layer at
all; this is the from-scratch lake-scale counterpart required by the
brief, not a port of anything.

Layout::

    root/metadata/v{N}.metadata.json   # O_EXCL-claimed, immutable
    root/metadata/version-hint.text    # advisory pointer (os.replace)
    root/metadata/snap-{id}.manifest.json
    root/data/{commit-uuid}/part-*.parquet
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .. import cells as C


class CommitConflict(RuntimeError):
    """Raised when optimistic retries are exhausted (writer storm)."""


class SchemaMismatch(ValueError):
    """Appended DataFrame schema differs from the table schema."""


# --------------------------------------------------------------------- paths

def _meta_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def _version_path(root: str, n: int) -> str:
    return os.path.join(_meta_dir(root), "v%d.metadata.json" % n)


def _hint_path(root: str) -> str:
    return os.path.join(_meta_dir(root), "version-hint.text")


def _current_version(root: str) -> int:
    """Latest committed metadata version; 0 = table does not exist yet.

    The hint file is advisory (it may lag a racing commit): start from
    the hint, then walk forward while higher versions exist — readers
    therefore always see the newest COMMITTED snapshot without listing
    the whole directory on every read.
    """
    n = 0
    try:
        with open(_hint_path(root)) as f:
            n = int(f.read().strip())
    except (OSError, ValueError):
        pass
    if n and not os.path.exists(_version_path(root, n)):
        n = 0                                    # stale/corrupt hint
    if n == 0:
        for p in glob.glob(os.path.join(_meta_dir(root), "v*.metadata.json")):
            try:
                n = max(n, int(os.path.basename(p)[1:].split(".")[0]))
            except ValueError:
                pass
    while os.path.exists(_version_path(root, n + 1)):
        n += 1
    return n


def _load_metadata(root: str) -> dict | None:
    n = _current_version(root)
    if n == 0:
        return None
    with open(_version_path(root, n)) as f:
        m = json.load(f)
    m["_version"] = n
    return m


def _load_manifest(root: str, snapshot_id: int) -> dict:
    with open(os.path.join(_meta_dir(root),
                           "snap-%d.manifest.json" % snapshot_id)) as f:
        return json.load(f)


# --------------------------------------------------------- stats collection

_STAT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType, T.StringType, T.BooleanType,
               T.DateType, T.TimestampType)


def _footer_stats(path: str, stat_cols: list[str]) -> dict:
    """One parquet footer → {rows, bytes, stats{col: [min,max,nulls]}}.

    min/max aggregate over row groups; a column missing stats in ANY
    row group gets ``None`` (file unprunable on that column — safe).
    """
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = {md.schema.column(i).path: i for i in range(md.num_columns)}
    stats: dict[str, list] = {}
    for col in stat_cols:
        i = names.get(col)
        if i is None:
            continue
        mn = mx = None
        nulls = 0
        ok = True
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(i).statistics
            if s is None or not s.has_min_max:
                ok = False
                break
            lo, hi = s.min, s.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    ok = False
                    break
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
            nulls += s.null_count or 0
        if ok and mn is not None:
            stats[col] = [_plain(mn), _plain(mx), nulls]
    return {"path": path, "rows": md.num_rows,
            "bytes": os.path.getsize(path), "stats": stats}


def _plain(v):
    """JSON-serializable scalar (numpy/datetime → python)."""
    import datetime

    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def _collect_stats(spark: SparkSession, files: list[str],
                   stat_cols: list[str]) -> list[dict]:
    """Distributed footer read: executors parse the footers, the driver
    receives one small JSON row per file (never the data)."""
    if not files:
        return []
    if len(files) <= 4:                          # not worth a job
        return [_footer_stats(p, stat_cols) for p in files]
    pdf = pd.DataFrame({"path": files})

    def _read(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            yield pd.DataFrame({"entry": [
                json.dumps(_footer_stats(p, stat_cols)) for p in b["path"]]})

    out = (spark.createDataFrame(pdf).repartition(min(len(files), 64))
           .mapInPandas(_read, schema="entry string").collect())
    return [json.loads(r.entry) for r in out]


# ----------------------------------------------------------------- commits

def _evolve_schema(old_json: str, new_json: str) -> str:
    """Union schema for an append whose DataFrame schema differs.

    Iceberg-style ADDITIVE evolution only: the append may add new
    columns (recorded nullable — old files read as null for them) and
    may omit existing columns (its files read as null for those), but a
    column present in both must keep its exact type. Renames/drops/type
    changes raise — use ``mode='overwrite'`` to replace the schema.
    """
    old = T.StructType.fromJson(json.loads(old_json))
    new = T.StructType.fromJson(json.loads(new_json))
    new_by_name = {f.name: f for f in new.fields}
    fields = []
    for f in old.fields:
        g = new_by_name.pop(f.name, None)
        if g is not None and g.dataType != f.dataType:
            raise SchemaMismatch(
                "column %r type change %s -> %s (append is additive-only; "
                "overwrite to replace the schema)"
                % (f.name, f.dataType.simpleString(),
                   g.dataType.simpleString()))
        fields.append(T.StructField(
            f.name, f.dataType,
            f.nullable or (g is None)))      # omitted → null for new rows
    for g in new.fields:                      # added columns, append order
        if g.name in new_by_name:
            fields.append(T.StructField(g.name, g.dataType, True))
    return T.StructType(fields).json()


def _find_dedup(root: str, dedup_key: str) -> int | None:
    m = _load_metadata(root)
    if m:
        for s in m["snapshots"]:
            if s.get("dedup_key") == dedup_key:
                return s["id"]
    return None


def commit(df: DataFrame, root: str, *, mode: str = "append",
           cluster_by: tuple[str, str] | None = None,
           zres: int = 16, zkey_col: str = "zkey",
           n_files: int | None = None, max_retries: int = 20,
           dedup_key: str | None = None) -> int:
    """Write ``df`` as a new table snapshot; returns the snapshot id.

    ``mode='append'`` adds the staged files to the current snapshot's
    file set; ``'overwrite'`` replaces it. ``cluster_by=(lon, lat)``
    stores the Morton key and range-sorts by it so every data file
    covers a tight Z range — the layout that makes bbox pruning drop
    whole files. Commit is atomic and optimistic (see module doc).

    ``dedup_key`` makes the commit IDEMPOTENT: if a snapshot already
    carries the key, its id is returned and nothing is written — the
    primitive that turns Structured Streaming's at-least-once
    ``foreachBatch`` replay into exactly-once table appends
    (streaming/sink.py keys each micro-batch by (query, batch_id)).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be append|overwrite")
    if dedup_key is not None:
        prior = _find_dedup(root, dedup_key)
        if prior is not None:
            return prior
    spark = df.sparkSession
    if cluster_by is not None:
        lon, lat = cluster_by
        df = df.withColumn(zkey_col,
                           C.morton_column(F.col(lon), F.col(lat), zres))
        n = n_files or spark.sparkContext.defaultParallelism
        df = df.repartitionByRange(n, zkey_col).sortWithinPartitions(zkey_col)
    schema_json = df.schema.json()

    # 1. stage data files (commit-unique dir: concurrent-safe, invisible
    #    to readers until the metadata version is claimed).
    commit_uuid = uuid.uuid4().hex[:16]
    data_dir = os.path.join(root, "data", commit_uuid)
    df.write.mode("overwrite").parquet(data_dir)
    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    stat_cols = [f.name for f in df.schema.fields
                 if isinstance(f.dataType, _STAT_TYPES)]
    entries = _collect_stats(spark, files, stat_cols)
    for e in entries:
        e["path"] = os.path.relpath(e["path"], root)
    added_rows = sum(e["rows"] for e in entries)

    os.makedirs(_meta_dir(root), exist_ok=True)
    snapshot_id = int(time.time() * 1000) * 1000 + (os.getpid() % 1000)

    # 2. claim the next metadata version (optimistic retry loop).
    for _ in range(max_retries):
        cur = _load_metadata(root)
        if dedup_key is not None and cur is not None:
            for s in cur["snapshots"]:       # racer landed the same batch
                if s.get("dedup_key") == dedup_key:
                    return s["id"]
        if cur is None:
            table_uuid, parent, base_files, version = \
                uuid.uuid4().hex, None, [], 0
        else:
            if cur["schema"] != schema_json and mode == "append":
                schema_json = _evolve_schema(cur["schema"], schema_json)
            table_uuid = cur["table_uuid"]
            parent = cur["current_snapshot_id"]
            base = _load_manifest(root, parent)["files"] if parent else []
            base_files = base if mode == "append" else []
            version = cur["_version"]
        all_files = base_files + entries
        manifest = {"snapshot_id": snapshot_id, "files": all_files}
        mpath = os.path.join(_meta_dir(root),
                             "snap-%d.manifest.json" % snapshot_id)
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        snap_rec = {
            "id": snapshot_id, "parent_id": parent, "ts": time.time(),
            "operation": mode, "schema": schema_json,
            "summary": {"added_files": len(entries),
                        "added_rows": added_rows,
                        "total_files": len(all_files),
                        "total_rows": sum(e["rows"] for e in all_files)}}
        if dedup_key is not None:
            snap_rec["dedup_key"] = dedup_key
        snaps = (cur["snapshots"] if cur else []) + [snap_rec]
        meta = {"format_version": 1, "table_uuid": table_uuid,
                "schema": schema_json,
                "current_snapshot_id": snapshot_id, "snapshots": snaps}
        try:
            fd = os.open(_version_path(root, version + 1),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue                              # lost the race: re-read
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f, indent=1)
        tmp = _hint_path(root) + ".tmp.%s" % commit_uuid
        with open(tmp, "w") as f:
            f.write(str(version + 1))
        os.replace(tmp, _hint_path(root))         # advisory; atomic
        return snapshot_id
    raise CommitConflict("commit lost %d races" % max_retries)


# ------------------------------------------------------------------- reads

def snapshots(root: str) -> list[dict]:
    """Snapshot history (oldest first): id/parent/ts/operation/summary."""
    m = _load_metadata(root)
    return list(m["snapshots"]) if m else []


def _resolve_snapshot(root: str, as_of) -> dict:
    m = _load_metadata(root)
    if m is None:
        raise FileNotFoundError("no committed snapshot under %s" % root)
    snaps = m["snapshots"]
    if as_of is None:
        sid = m["current_snapshot_id"]
        return next(s for s in snaps if s["id"] == sid)
    by_id = {s["id"]: s for s in snaps}
    if as_of in by_id:
        return by_id[as_of]
    older = [s for s in snaps if s["ts"] <= as_of]
    if not older:
        raise LookupError("no snapshot at or before %r" % as_of)
    return max(older, key=lambda s: s["ts"])


_OPS = ("<", "<=", ">", ">=", "=", "between")


def _file_survives(stats: dict, filters: list[tuple]) -> bool:
    """False only when footer stats PROVE the file disjoint from the
    conjunction — missing stats keep the file (safe, never wrong)."""
    for flt in filters:
        col, op = flt[0], flt[1]
        s = stats.get(col)
        if s is None or s[0] is None:
            continue
        mn, mx = s[0], s[1]
        if op == "<" and not mn < flt[2]:
            return False
        if op == "<=" and not mn <= flt[2]:
            return False
        if op == ">" and not mx > flt[2]:
            return False
        if op == ">=" and not mx >= flt[2]:
            return False
        if op == "=" and not (mn <= flt[2] <= mx):
            return False
        if op == "between" and (mx < flt[2] or mn > flt[3]):
            return False
    return True


def _residual(filters: list[tuple]):
    pred = None
    for flt in filters:
        col, op = flt[0], flt[1]
        c = F.col(col)
        if op == "<":
            p = c < F.lit(flt[2])
        elif op == "<=":
            p = c <= F.lit(flt[2])
        elif op == ">":
            p = c > F.lit(flt[2])
        elif op == ">=":
            p = c >= F.lit(flt[2])
        elif op == "=":
            p = c == F.lit(flt[2])
        elif op == "between":
            p = (c >= F.lit(flt[2])) & (c <= F.lit(flt[3]))
        else:
            raise ValueError("op must be one of %s" % (_OPS,))
        pred = p if pred is None else (pred & p)
    return pred


def bbox_filters(minx: float, miny: float, maxx: float, maxy: float, *,
                 lon: str = "lon", lat: str = "lat") -> list[tuple]:
    """A query window as prunable filter tuples on the raw columns."""
    return [(lon, "between", minx, maxx), (lat, "between", miny, maxy)]


def scan_files(root: str, *, filters: list[tuple] | None = None,
               as_of=None) -> tuple[list[dict], int]:
    """(surviving manifest entries, total file count) — the pruning
    decision alone, for tests/inspection."""
    snap = _resolve_snapshot(root, as_of)
    manifest = _load_manifest(root, snap["id"])
    files = manifest["files"]
    if filters:
        keep = [e for e in files if _file_survives(e["stats"], filters)]
    else:
        keep = files
    return keep, len(files)


def scan(spark: SparkSession, root: str, *,
         filters: list[tuple] | None = None,
         bbox: tuple[float, float, float, float] | None = None,
         lon: str = "lon", lat: str = "lat", as_of=None) -> DataFrame:
    """Read a snapshot with manifest-level file pruning.

    ``filters`` is a conjunction of ``(col, op, value[, value2])``
    tuples (ops: < <= > >= = between); ``bbox`` is sugar for two
    BETWEENs on ``lon``/``lat``. Files whose footer stats are disjoint
    from the conjunction never enter the Spark plan; the same predicate
    is re-applied as a residual filter (still pushed to row-group stats
    by Catalyst), so the result is value-identical to a full scan.
    """
    flt = list(filters or [])
    if bbox is not None:
        flt += bbox_filters(*bbox, lon=lon, lat=lat)
    keep, _total = scan_files(root, filters=flt, as_of=as_of)
    m = _load_metadata(root)
    snap = _resolve_snapshot(root, as_of)
    # read with the SNAPSHOT's schema (recorded per commit), so time
    # travel across an overwrite/evolution sees that snapshot's columns;
    # files missing an evolved column read as null (additive evolution)
    schema = T.StructType.fromJson(
        json.loads(snap.get("schema", m["schema"])))
    if not keep:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(
        *[os.path.join(root, e["path"]) for e in keep])
    pred = _residual(flt)
    return df.where(pred) if pred is not None else df


# ---------------------------------------------------------------- delete

def delete(spark: SparkSession, root: str, *, filters: list[tuple],
           max_retries: int = 5) -> dict:
    """Row-level DELETE, copy-on-write: remove every row matching the
    ``filters`` conjunction (same tuples as :func:`scan`) and commit the
    result as a new snapshot. Returns a summary dict.

    The manifest stats do the heavy lifting: files PROVABLY disjoint
    from the predicate are carried into the new snapshot untouched
    (never read, never rewritten); only overlapping files are re-read
    and rewritten without the matching rows. A takedown sweep over a
    100 TB clustered table therefore rewrites a handful of files, not
    the fleet — and time travel still reaches the pre-delete snapshot
    until :func:`vacuum` expires it.
    """
    if not filters:
        raise ValueError("delete without filters would drop the table; "
                         "use commit(mode='overwrite') explicitly")
    pred = _residual(filters)
    for _ in range(max_retries):
        cur = _load_metadata(root)
        if cur is None:
            raise FileNotFoundError("no committed snapshot under %s" % root)
        parent = cur["current_snapshot_id"]
        files = _load_manifest(root, parent)["files"]
        touched = [e for e in files if _file_survives(e["stats"], filters)]
        untouched = [e for e in files if not _file_survives(e["stats"],
                                                            filters)]
        if not touched:
            return {"snapshot_id": parent, "deleted_rows": 0,
                    "rewritten_files": 0, "untouched_files": len(files)}
        schema = T.StructType.fromJson(json.loads(cur["schema"]))
        src = spark.read.schema(schema).parquet(
            *[os.path.join(root, e["path"]) for e in touched])
        # delete WHERE pred; a row where pred is NULL (null in a
        # filtered column) is NOT matched and must be kept
        kept = src.where(~F.coalesce(pred, F.lit(False)))
        commit_uuid = uuid.uuid4().hex[:16]
        data_dir = os.path.join(root, "data", commit_uuid)
        kept.write.mode("overwrite").parquet(data_dir)
        new_files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
        stat_cols = [f.name for f in schema.fields
                     if isinstance(f.dataType, _STAT_TYPES)]
        entries = [e for e in _collect_stats(spark, new_files, stat_cols)
                   if e["rows"] > 0]          # fully-deleted files vanish
        for e in entries:
            e["path"] = os.path.relpath(e["path"], root)
        n_before = sum(e["rows"] for e in touched)
        n_after = sum(e["rows"] for e in entries)
        all_files = untouched + entries
        snapshot_id = int(time.time() * 1000) * 1000 + (os.getpid() % 1000)
        manifest = {"snapshot_id": snapshot_id, "files": all_files}
        with open(os.path.join(_meta_dir(root),
                               "snap-%d.manifest.json" % snapshot_id),
                  "w") as f:
            json.dump(manifest, f)
        snap_rec = {"id": snapshot_id, "parent_id": parent,
                    "ts": time.time(), "operation": "delete",
                    "schema": cur["schema"],
                    "summary": {"deleted_rows": n_before - n_after,
                                "rewritten_files": len(touched),
                                "total_files": len(all_files),
                                "total_rows": sum(e["rows"]
                                                  for e in all_files)}}
        meta = {"format_version": 1, "table_uuid": cur["table_uuid"],
                "schema": cur["schema"],
                "current_snapshot_id": snapshot_id,
                "snapshots": cur["snapshots"] + [snap_rec]}
        version = cur["_version"]
        try:
            fd = os.open(_version_path(root, version + 1),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue          # racer landed: re-derive the file split
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f, indent=1)
        tmp = _hint_path(root) + ".tmp.%s" % commit_uuid
        with open(tmp, "w") as f:
            f.write(str(version + 1))
        os.replace(tmp, _hint_path(root))
        return {"snapshot_id": snapshot_id,
                "deleted_rows": n_before - n_after,
                "rewritten_files": len(touched),
                "untouched_files": len(untouched)}
    raise CommitConflict("delete lost %d races" % max_retries)


# ----------------------------------------------------------------- upsert

def upsert(df: DataFrame, root: str, *, key_col: str,
           cluster_by: tuple[str, str] | None = None,
           zres: int = 16, n_files: int | None = None,
           max_retries: int = 5) -> dict:
    """MERGE by key, copy-on-write, in ONE atomic snapshot: rows whose
    ``key_col`` appears in ``df`` are replaced, new keys are inserted.
    Returns a summary dict.

    The re-crawl path of an image/document lake: a refreshed shard
    upserts by image_id and readers switch atomically from the old rows
    to the new ones — no window where both or neither are visible.
    File-level pruning bounds the rewrite: only files whose key stats
    overlap the incoming batch's [min, max] are re-read, and those are
    anti-joined against the incoming keys (matched rows dropped, the
    incoming version wins). Keep the table clustered by key (or commit
    shards with tight key ranges) and an upsert touches few files.
    """
    spark = df.sparkSession
    if cluster_by is not None:
        lon, lat = cluster_by
        df = df.withColumn("zkey", C.morton_column(F.col(lon), F.col(lat),
                                                   zres))
    kmin, kmax = df.agg(F.min(key_col), F.max(key_col)).first()
    if kmin is None:
        m = _load_metadata(root)
        return {"snapshot_id": m["current_snapshot_id"] if m else None,
                "replaced_rows": 0, "inserted_rows": 0,
                "rewritten_files": 0}

    # stage the incoming rows once (their files are snapshot-agnostic)
    if n_files is not None:
        df = df.repartition(n_files)
    stage_uuid = uuid.uuid4().hex[:16]
    stage_dir = os.path.join(root, "data", stage_uuid)
    df.write.mode("overwrite").parquet(stage_dir)
    schema_json = df.schema.json()
    keys = spark.read.parquet(stage_dir).select(key_col).distinct()
    n_incoming = keys.count()

    for _ in range(max_retries):
        cur = _load_metadata(root)
        if cur is None:
            raise FileNotFoundError(
                "no committed snapshot under %s (use commit() to create)"
                % root)
        schema_json2 = (_evolve_schema(cur["schema"], schema_json)
                        if cur["schema"] != schema_json else schema_json)
        parent = cur["current_snapshot_id"]
        files = _load_manifest(root, parent)["files"]
        overlap = [(key_col, "between", _plain(kmin), _plain(kmax))]
        touched = [e for e in files if _file_survives(e["stats"], overlap)]
        untouched = [e for e in files
                     if not _file_survives(e["stats"], overlap)]
        schema = T.StructType.fromJson(json.loads(cur["schema"]))
        stat_cols = [f.name for f in
                     T.StructType.fromJson(json.loads(schema_json2)).fields
                     if isinstance(f.dataType, _STAT_TYPES)]
        rewritten: list[dict] = []
        n_before = 0
        if touched:
            src = spark.read.schema(schema).parquet(
                *[os.path.join(root, e["path"]) for e in touched])
            kept = src.join(F.broadcast(keys) if n_incoming < 2_000_000
                            else keys, on=key_col, how="left_anti")
            rw_uuid = uuid.uuid4().hex[:16]
            rw_dir = os.path.join(root, "data", rw_uuid)
            kept.write.mode("overwrite").parquet(rw_dir)
            rw_files = sorted(glob.glob(os.path.join(rw_dir, "*.parquet")))
            rewritten = [e for e in _collect_stats(spark, rw_files,
                                                   stat_cols)
                         if e["rows"] > 0]
            n_before = sum(e["rows"] for e in touched)
        staged_files = sorted(glob.glob(os.path.join(stage_dir,
                                                     "*.parquet")))
        entries = [e for e in _collect_stats(spark, staged_files, stat_cols)
                   if e["rows"] > 0]
        for e in rewritten + entries:
            e["path"] = os.path.relpath(
                e["path"], root) if os.path.isabs(e["path"]) else e["path"]
        n_kept = sum(e["rows"] for e in rewritten)
        n_new = sum(e["rows"] for e in entries)
        all_files = untouched + rewritten + entries
        snapshot_id = int(time.time() * 1000) * 1000 + (os.getpid() % 1000)
        with open(os.path.join(_meta_dir(root),
                               "snap-%d.manifest.json" % snapshot_id),
                  "w") as f:
            json.dump({"snapshot_id": snapshot_id, "files": all_files}, f)
        replaced = n_before - n_kept
        snap_rec = {"id": snapshot_id, "parent_id": parent,
                    "ts": time.time(), "operation": "upsert",
                    "schema": schema_json2,
                    "summary": {"replaced_rows": replaced,
                                "inserted_rows": n_new - replaced,
                                "rewritten_files": len(touched),
                                "total_files": len(all_files),
                                "total_rows": sum(e["rows"]
                                                  for e in all_files)}}
        meta = {"format_version": 1, "table_uuid": cur["table_uuid"],
                "schema": schema_json2,
                "current_snapshot_id": snapshot_id,
                "snapshots": cur["snapshots"] + [snap_rec]}
        version = cur["_version"]
        try:
            fd = os.open(_version_path(root, version + 1),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f, indent=1)
        tmp = _hint_path(root) + ".tmp.%s" % stage_uuid
        with open(tmp, "w") as f:
            f.write(str(version + 1))
        os.replace(tmp, _hint_path(root))
        return {"snapshot_id": snapshot_id, "replaced_rows": replaced,
                "inserted_rows": n_new - replaced,
                "rewritten_files": len(touched),
                "untouched_files": len(untouched)}
    raise CommitConflict("upsert lost %d races" % max_retries)


# ------------------------------------------------------------ compaction

def compact(spark: SparkSession, root: str, *, target_bytes: int = 128 << 20,
            max_retries: int = 5) -> dict:
    """Bin-pack small data files into ~``target_bytes`` files and commit
    the result as a new snapshot (operation='compact'). Files already at
    or above half the target are carried over untouched.

    Streaming ingest (streaming/sink.py) commits one file set per
    micro-batch, so a long-running stream accumulates small files —
    the classic lakehouse problem. Periodic compaction keeps scans at
    full parquet row-group efficiency without pausing ingest: a stream
    batch landing mid-compaction wins or loses the version race and
    either way no rows are lost (the loser retries on the new current
    snapshot). Rows are re-sorted by zkey when present so the
    compacted files keep tight manifest stats for pruning.
    """
    for _ in range(max_retries):
        cur = _load_metadata(root)
        if cur is None:
            raise FileNotFoundError("no committed snapshot under %s" % root)
        parent = cur["current_snapshot_id"]
        files = _load_manifest(root, parent)["files"]
        small = [e for e in files if e["bytes"] < target_bytes // 2]
        big = [e for e in files if e["bytes"] >= target_bytes // 2]
        if len(small) <= 1:
            return {"snapshot_id": parent, "compacted_files": 0,
                    "output_files": 0}
        schema = T.StructType.fromJson(json.loads(cur["schema"]))
        src = spark.read.schema(schema).parquet(
            *[os.path.join(root, e["path"]) for e in small])
        n_out = max(1, int(sum(e["bytes"] for e in small) // target_bytes)
                    + 1)
        if "zkey" in src.columns:
            src = (src.repartitionByRange(n_out, "zkey")
                   .sortWithinPartitions("zkey"))
        else:
            src = src.coalesce(n_out)
        commit_uuid = uuid.uuid4().hex[:16]
        data_dir = os.path.join(root, "data", commit_uuid)
        src.write.mode("overwrite").parquet(data_dir)
        new_files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
        stat_cols = [f.name for f in schema.fields
                     if isinstance(f.dataType, _STAT_TYPES)]
        entries = [e for e in _collect_stats(spark, new_files, stat_cols)
                   if e["rows"] > 0]
        for e in entries:
            e["path"] = os.path.relpath(e["path"], root)
        all_files = big + entries
        snapshot_id = int(time.time() * 1000) * 1000 + (os.getpid() % 1000)
        with open(os.path.join(_meta_dir(root),
                               "snap-%d.manifest.json" % snapshot_id),
                  "w") as f:
            json.dump({"snapshot_id": snapshot_id, "files": all_files}, f)
        snap_rec = {"id": snapshot_id, "parent_id": parent,
                    "ts": time.time(), "operation": "compact",
                    "schema": cur["schema"],
                    "summary": {"compacted_files": len(small),
                                "output_files": len(entries),
                                "total_files": len(all_files),
                                "total_rows": sum(e["rows"]
                                                  for e in all_files)}}
        meta = {"format_version": 1, "table_uuid": cur["table_uuid"],
                "schema": cur["schema"],
                "current_snapshot_id": snapshot_id,
                "snapshots": cur["snapshots"] + [snap_rec]}
        version = cur["_version"]
        try:
            fd = os.open(_version_path(root, version + 1),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f, indent=1)
        tmp = _hint_path(root) + ".tmp.%s" % commit_uuid
        with open(tmp, "w") as f:
            f.write(str(version + 1))
        os.replace(tmp, _hint_path(root))
        return {"snapshot_id": snapshot_id, "compacted_files": len(small),
                "output_files": len(entries)}
    raise CommitConflict("compact lost %d races" % max_retries)


# ---------------------------------------------------------------- vacuum

def vacuum(root: str, *, keep_last: int = 1) -> dict:
    """Expire all but the last ``keep_last`` snapshots and delete data
    files no kept manifest references. Returns a summary dict."""
    m = _load_metadata(root)
    if m is None:
        return {"removed_snapshots": 0, "removed_files": 0}
    snaps = m["snapshots"]
    kept, dropped = snaps[-keep_last:], snaps[:-keep_last]
    if not any(s["id"] == m["current_snapshot_id"] for s in kept):
        raise ValueError("keep_last would expire the current snapshot")
    live: set[str] = set()
    for s in kept:
        for e in _load_manifest(root, s["id"])["files"]:
            live.add(os.path.normpath(e["path"]))
    removed_files = 0
    for p in glob.glob(os.path.join(root, "data", "*", "*.parquet")):
        if os.path.normpath(os.path.relpath(p, root)) not in live:
            os.remove(p)
            removed_files += 1
    for d in glob.glob(os.path.join(root, "data", "*")):
        if os.path.isdir(d) and not os.listdir(d):
            shutil.rmtree(d)
    for s in dropped:
        mp = os.path.join(_meta_dir(root), "snap-%d.manifest.json" % s["id"])
        if os.path.exists(mp):
            os.remove(mp)
    meta = dict(m)
    version = meta.pop("_version")
    meta["snapshots"] = kept
    fd = os.open(_version_path(root, version + 1),
                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f, indent=1)
    tmp = _hint_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version + 1))
    os.replace(tmp, _hint_path(root))
    return {"removed_snapshots": len(dropped), "removed_files": removed_files}
