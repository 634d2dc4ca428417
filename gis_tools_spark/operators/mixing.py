"""Deterministic corpus sampling and source mixing.

Training corpora are assembled as weighted mixtures ("20% of the token
budget from source A, 50% from B, …").  Two properties matter at
100 TB: the sample must be a PURE FUNCTION of (row identity, seed) —
re-running the pipeline, resuming from a checkpoint, or adding
executors must select the same rows (rand() fails all three) — and the
selection must cost one scan, no shuffle.  Both families hash the id
to a uniform 64-bit integer and keep the row when the hash falls under
the rate threshold:

* ``family='xxhash'`` (production): ``xxhash64(id, seed)``, pure JVM;
* ``family='md5'`` (oracle): first 8 md5 bytes, exactly reproducible
  in DuckDB — the driver-gate family, agreement-tested against xxhash
  for rate accuracy in test_mixing.py.

``mix_corpus`` turns per-source weights plus a global token budget into
per-source rates (one tiny groupBy for source token totals — thousands
of sources at most — broadcast back), then samples each source at its
rate: the Dolma/DataComp mixing step as one scan + one broadcast join.

Reference parity: gis-tools has no text ops; build-brief scope
(training-data pipeline), alongside dedup.py / packing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .packing import token_count

# hash-space size: thresholds are computed in units of 2^-64
_SPACE = float(2 ** 64)


def _unit_hash(id_col: Column, seed: int, family: str) -> Column:
    """Uniform [0, 1) column from (id, seed) — deterministic under
    re-runs, resumes, and any repartitioning."""
    if family == "xxhash":
        h = F.xxhash64(id_col.cast("string"), F.lit(int(seed)))
    elif family == "md5":
        h = F.conv(F.substring(
            F.md5(F.concat_ws("|", id_col.cast("string"),
                              F.lit(str(int(seed))))), 1, 16),
            16, 10).cast("decimal(20,0)")
    else:
        raise ValueError(f"family must be 'xxhash' or 'md5', got {family!r}")
    # signed xxhash64 shifts into [0,1) via +2^63; md5's conv is unsigned
    if family == "xxhash":
        return (h.cast("double") + 2.0 ** 63) / _SPACE
    return h.cast("double") / _SPACE


def deterministic_sample(df: DataFrame, rate: float, *,
                         id_col: str = "doc_id", seed: int = 0,
                         family: str = "xxhash") -> DataFrame:
    """Keep each row iff hash(id, seed) < rate — a seeded Bernoulli
    sample that is reproducible row-for-row. Pure codegen filter."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_unit_hash(F.col(id_col), seed, family) < F.lit(rate))


def mix_corpus(df: DataFrame, weights: dict, token_budget: int, *,
               text_col: str = "text", source_col: str = "source",
               id_col: str = "doc_id", seed: int = 0,
               family: str = "xxhash") -> DataFrame:
    """Sample a weighted mixture: source ``s`` contributes ~
    ``token_budget * weights[s]`` tokens (rate capped at 1 — a source
    smaller than its allocation is taken whole, not upsampled).

    Sources absent from ``weights`` are dropped.  Output rows carry
    ``n_tokens`` and the applied ``sample_rate`` for auditability.
    Plan: one groupBy over thousands of sources, rates to the driver,
    broadcast join back, one codegen filter — the corpus itself never
    shuffles."""
    t = df.withColumn("n_tokens", token_count(F.col(text_col)))
    totals = {r["s"]: r["n"] for r in
              (t.groupBy(F.col(source_col).alias("s"))
               .agg(F.sum("n_tokens").alias("n")).collect())}
    rates = []
    for s, w in weights.items():
        tot = totals.get(s, 0)
        if tot <= 0:
            continue
        rates.append((s, min(1.0, float(token_budget) * float(w) / tot)))
    if not rates:
        return t.withColumn("sample_rate", F.lit(0.0)).limit(0)
    rdf = df.sparkSession.createDataFrame(
        rates, f"{source_col} string, sample_rate double")
    return (t.join(F.broadcast(rdf), on=source_col)
            .where(_unit_hash(F.col(id_col), seed, family)
                   < F.col("sample_rate")))


def unit_hash_sql(id_expr: str, seed: int) -> str:
    """The DuckDB mirror of the md5 family's [0,1) hash — kept next to
    _unit_hash so the two can never drift."""
    return (f"(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || '|' "
            f"|| '{int(seed)}'), 1, 16))::UBIGINT::DOUBLE "
            f"/ 18446744073709551616.0)")


def sample_sql_predicate(id_expr: str, seed: int, rate_expr: str) -> str:
    """The DuckDB mirror of the md5 family's keep-predicate.
    ``rate_expr`` may be any SQL expression producing the per-row
    rate."""
    return f"{unit_hash_sql(id_expr, seed)} < ({rate_expr})"


def stratified_sample(df: DataFrame, k: int, by, *,
                      id_col: str = "doc_id", seed: int = 0,
                      family: str = "xxhash") -> DataFrame:
    """Keep (up to) ``k`` rows per group — deterministic per-stratum
    sampling (class-balanced eval sets, per-source inspection samples,
    per-language capping).  Within each group, rows rank by
    ``hash(id, seed)`` with ``id_col`` as the tie-break, so the sample
    is a pure function of (row identity, seed): stable under re-runs,
    resume, and repartitioning, and a larger ``k`` EXTENDS a smaller
    one (the rank order is fixed).

    Scale plan: one hash-partitioned window on the group key — the
    same shuffle a groupBy costs.  Per-group row counts bound the
    window task; k does not affect the shuffle.  Strata far larger
    than executor memory would need the top-k-via-aggregate variant;
    at k << group size a pre-filter on ``hash < c·k/|group|`` can
    pre-thin, not applied here to keep exactness unconditional."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    groups = [by] if isinstance(by, str) else list(by)
    w = (Window.partitionBy(*groups)
         .orderBy(_unit_hash(F.col(id_col), seed, family).asc(),
                  F.col(id_col).asc()))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= int(k)).drop("__rn"))
