"""Temporal joins — distributed as-of join and interval (range) join.

The reference engine has no temporal-join surface (gis-tools is purely
spatial); these close the gap a geotagged image/event pipeline hits
immediately: "attach the most recent calibration/metadata row to each
observation" (as-of) and "which observations fall inside each
acquisition window" (interval containment). Both are notoriously
shuffle-hostile if written naively (inequality joins degrade to
BroadcastNestedLoopJoin); the implementations below stay on equi-join /
window plans that scale linearly.

as-of join — the union + running-last trick
-------------------------------------------
Tag the probe (left) and build (right) rows, union them on the shared
key, and take ``last(right_payload, ignorenulls) OVER (PARTITION BY key
ORDER BY ts, side)`` — one shuffle on the key, one sort, no inequality
join anywhere. The right payload travels as a single STRUCT column so
every output column is taken from the SAME matched right row (per-column
``last(ignorenulls)`` could mix rows when a payload field is NULL).

Skew: a mega-key (one user with 10^8 events) serializes its window
sort. ``chunk_s`` activates the two-level variant: windows partition by
(key, time-chunk) — bounded partitions — and each chunk is seeded with
the previous chunk's carry row, computed from a per-chunk ``max_by``
aggregate (map-side combinable) plus a tiny running-last window over the
per-chunk table (O(keys x chunks) rows, not O(rows)).

interval join — 1-D filter/refine
---------------------------------
The 1-D analog of the engine's spatial cell join (operators/sjoin.py):
intervals explode to the time bins they cover (``sequence()`` codegen),
points carry exactly one bin, the candidate join is a plain equi-join on
(key, bin), and the containment predicate refines. Each point lands in
exactly one bin, so no pair-dedup step is needed. Long intervals explode
to many bins — pick ``bin_s`` near the median interval length; the
explode factor is len/bin_s + 1.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAY = "__asof_pay"
_CHUNK = "__asof_chunk"


def _micros(col: Column) -> Column:
    """Exact integer micros for timestamp columns. TIMESTAMP_NTZ (the
    parquet default) is cast to TIMESTAMP first — under a UTC session
    timezone this reads the naive wall time as a UTC instant, the same
    convention DuckDB's epoch_us applies to naive timestamps."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame, *,
              key_cols: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance_us: int | None = None,
              right_cols: Sequence[str] | None = None,
              right_prefix: str = "r_",
              tiebreak: str | None = None,
              chunk_s: int | None = None,
              how: str = "left") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction='backward', inclusive; the
    pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` contract) or the least
    ``right_ts`` >= ``left_ts`` (direction='forward') sharing
    ``key_cols``.

    Output: every left column, plus ``{right_prefix}{c}`` for each
    ``right_cols`` column and ``{right_prefix}{right_ts}``. Unmatched
    left rows keep NULL right columns (how='left') or are dropped
    (how='inner').

    tolerance_us bounds |left_ts - right_ts| in microseconds (timestamps
    are compared at exact integer micros). tiebreak orders right rows
    that share (key, ts) — the LARGEST tiebreak value wins for
    'backward' (matching "latest row wins" ingestion), the smallest for
    'forward'; omit it only when (key, ts) is unique on the right.
    chunk_s enables the bounded-partition skew path (see module doc).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    keys = list(key_cols)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    pay_fields = list(right_cols) + [right_ts]

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        _micros(F.col(left_ts)).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in pay_fields]).alias(_PAY))
            .schema[_PAY].dataType).alias(_PAY))
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        _micros(F.col(right_ts)).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in pay_fields]).alias(_PAY))
    u = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    fwd = direction == "forward"
    # right rows must sort BEFORE left rows at equal ts so the match is
    # inclusive; among right ties the winner is the one closest to the
    # left row in sort order, i.e. the last right row before it.
    def order_cols(extra_chunk: bool):
        o = [F.col(_CHUNK).asc()] if extra_chunk else []
        o += [F.col(_TS).desc() if fwd else F.col(_TS).asc(), F.col(_SIDE).asc()]
        if tiebreak is not None:
            tb = F.col(_PAY).getField(tiebreak) if tiebreak in pay_fields \
                else F.col(tiebreak)
            o.append(tb.asc() if not fwd else tb.desc())
        return o

    if chunk_s is None:
        w = (Window.partitionBy(*keys).orderBy(*order_cols(False))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = u.withColumn("__m", F.last(_PAY, ignorenulls=True).over(w))
    else:
        matched = _asof_chunked(u, keys, pay_fields, right_ts, tiebreak,
                                chunk_s, fwd, order_cols)

    out = matched.where(F.col(_SIDE) == 1)
    m = F.col("__m")
    if tolerance_us is not None:
        gap = F.abs(F.col(_TS) - _micros(m.getField(right_ts)))
        out = out.withColumn("__m", F.when(gap <= F.lit(int(tolerance_us)), m))
    for c in right_cols:
        out = out.withColumn(right_prefix + c, m.getField(c))
    out = out.withColumn(right_prefix + right_ts, m.getField(right_ts))
    if how == "inner":
        out = out.where(F.col(right_prefix + right_ts).isNotNull())
    return out.drop(_TS, _SIDE, _PAY, "__m", _CHUNK)


def _asof_chunked(u: DataFrame, keys, pay_fields, right_ts, tiebreak,
                  chunk_s: int, fwd: bool, order_cols) -> DataFrame:
    """Bounded-partition as-of: window over (key, chunk), each chunk
    seeded with the carry — the winning right row from all EARLIER
    chunks (later chunks for 'forward'). Carries are computed on the
    tiny per-(key, chunk) winner table, so the only big-data windows
    partition by (key, chunk) and stay bounded."""
    chunk_us = int(chunk_s) * 1_000_000
    u = u.withColumn(_CHUNK, F.floor(F.col(_TS) / F.lit(chunk_us)))

    # per-(key, chunk) winner among RIGHT rows: min/max_by on
    # (ts, tiebreak) — a map-side-combinable aggregate, no big sort.
    rank_fields = [F.col(_TS).alias("f0")]
    if tiebreak is not None:
        rank_fields.append(F.col(_PAY).getField(tiebreak).alias("f1"))
    rank = F.struct(*rank_fields)
    pick = F.min_by(_PAY, rank) if fwd else F.max_by(_PAY, rank)
    winners = (u.where(F.col(_SIDE) == 0)
               .groupBy(*keys, _CHUNK).agg(pick.alias(_PAY)))

    # every (key, chunk) that has ANY row inherits the running winner of
    # strictly-earlier chunks — including across gap chunks with no
    # right rows of their own.
    chunks = u.select(*keys, _CHUNK).distinct()
    aw = (Window.partitionBy(*keys)
          .orderBy(F.col(_CHUNK).desc() if fwd else F.col(_CHUNK).asc())
          .rowsBetween(Window.unboundedPreceding, -1))
    carries = (chunks.join(winners, on=keys + [_CHUNK], how="left")
               .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(aw))
               .where(F.col(_PAY).isNotNull())
               .withColumn(_TS, F.lit(None).cast("long"))
               .withColumn(_SIDE, F.lit(-1)))
    seeded = u.unionByName(
        carries.select(*[F.col(c) if c in carries.columns
                         else F.lit(None).cast(u.schema[c].dataType).alias(c)
                         for c in u.columns]))
    order = [F.col(_SIDE) != -1] + order_cols(False)  # carries (False) first
    w = (Window.partitionBy(*keys, _CHUNK).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return seeded.withColumn("__m", F.last(_PAY, ignorenulls=True).over(w))


def interval_join(points: DataFrame, intervals: DataFrame, *,
                  point_ts: str = "ts",
                  start_col: str = "start_ts", end_col: str = "end_ts",
                  key_cols: Sequence[str] = (),
                  bin_s: int = 3600,
                  closed: str = "left",
                  point_prefix: str = "") -> DataFrame:
    """Inner-join each point row to every interval row containing its
    timestamp: ``start <= ts < end`` (closed='left', default),
    'right' (start < ts <= end) or 'both' (start <= ts <= end),
    optionally also matching on ``key_cols``.

    Plan: 1-D filter/refine (see module doc) — intervals explode to
    covered ``bin_s``-second bins via ``sequence()``, points carry one
    bin, candidates come from an equi-join on (keys..., bin), and the
    containment predicate refines. Output columns: all interval columns
    + all point columns (point columns renamed with ``point_prefix`` on
    name collisions).
    """
    if closed not in ("left", "right", "both"):
        raise ValueError(f"closed must be left|right|both, got {closed!r}")
    keys = list(key_cols)
    bin_us = int(bin_s) * 1_000_000

    p_us, s_us, e_us = "__p_us", "__s_us", "__e_us"
    pts = points.withColumn(p_us, _micros(F.col(point_ts))) \
                .withColumn("__bin", F.floor(F.col(p_us) / F.lit(bin_us)))
    iv = (intervals
          .withColumn(s_us, _micros(F.col(start_col)))
          .withColumn(e_us, _micros(F.col(end_col)))
          .withColumn("__bin", F.explode(F.sequence(
              F.floor(F.col(s_us) / F.lit(bin_us)),
              F.floor(F.col(e_us) / F.lit(bin_us))))))

    # rename colliding point columns
    collide = {c for c in pts.columns if c in iv.columns and c != "__bin"
               and c not in keys}
    renamed = {c: (point_prefix + c if point_prefix else "p_" + c)
               for c in collide}
    for old, new in renamed.items():
        pts = pts.withColumnRenamed(old, new)
    pc = renamed.get(p_us, p_us)

    on = keys + ["__bin"]
    j = iv.join(pts, on=on, how="inner")
    lo = F.col(pc) >= F.col(s_us) if closed in ("left", "both") \
        else F.col(pc) > F.col(s_us)
    hi = F.col(pc) <= F.col(e_us) if closed in ("right", "both") \
        else F.col(pc) < F.col(e_us)
    return j.where(lo & hi).drop("__bin", s_us, e_us, pc)
