"""Sequence packing: documents → fixed-size training blocks.

The last step before a text corpus hits a trainer is packing: tokenize
every document, append an end-of-document separator, concatenate in a
deterministic order, and slice the stream into fixed ``block_size``
chunks (documents straddle chunk boundaries — the GPT-style packed
layout).  The assignment of document token-spans to chunks is a pure
function of each document's EXCLUSIVE PREFIX SUM of token counts, so
the whole operator reduces to a distributed prefix-sum:

1. bucket documents by contiguous ``id_col`` ranges (order-preserving);
2. per-bucket token totals via one groupBy — only ``n_buckets`` tiny
   rows reach the driver, which turns them into exclusive bucket
   offsets and broadcast-joins them back;
3. within each bucket, a window cumsum (each bucket is one window
   partition — ``n_buckets`` bounds the per-task row count, so size it
   to ~1e6 rows/bucket at scale);
4. each document's global token span [off, off+n) then explodes to the
   chunks it overlaps with pure column arithmetic.

No stage ever materializes the token stream — only counts move.  The
single-partition global window a naive cumsum would use (the classic
Spark prefix-sum trap) never appears.

Token counts use the engine's whitespace convention
(dedup.normalize_text split), ``+ eod_tokens`` per document.

Reference parity: gis-tools has no text ops; build-brief scope
(training-data pipeline), alongside dedup.py / decontam.py / pii.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import normalize_text


def token_count(col, *, eod_tokens: int = 1):
    """Whitespace token count of a text column, plus the end-of-document
    separator(s). Pure codegen; empty docs still cost ``eod_tokens``."""
    words = F.filter(F.split(normalize_text(col), " "),
                     lambda w: w != F.lit(""))
    return (F.size(words) + F.lit(eod_tokens)).cast("long")


def pack_sequences(df: DataFrame, block_size: int, *,
                   text_col: str = "text", id_col: str = "doc_id",
                   eod_tokens: int = 1, n_buckets: int = 64) -> DataFrame:
    """Assign every document's token span to fixed-size chunks.

    Returns one row per (chunk, document) overlap: ``chunk_id``,
    ``id_col``, ``tok_start``/``tok_end`` (the within-document token
    sub-range, end-exclusive) and ``chunk_pos`` (where that sub-range
    starts inside the chunk).  Every chunk except the last is exactly
    ``block_size`` tokens when the spans are concatenated in
    (chunk_id, chunk_pos) order.

    ``id_col`` must be numeric: packing order is ascending ``id_col``,
    and the prefix-sum buckets are contiguous id ranges.  The result is
    invariant to ``n_buckets`` (tested) — tune it so a bucket's rows
    fit one task (~1e6 rows/bucket at corpus scale)."""
    t = df.select(F.col(id_col).cast("long").alias(id_col),
                  token_count(F.col(text_col),
                              eod_tokens=eod_tokens).alias("__n"))
    lo, hi = t.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return t.select(
            F.lit(0).cast("long").alias("chunk_id"),
            F.col(id_col),
            F.lit(0).cast("long").alias("tok_start"),
            F.lit(0).cast("long").alias("tok_end"),
            F.lit(0).cast("long").alias("chunk_pos")).limit(0)
    width = max(1, (int(hi) - int(lo)) // max(1, n_buckets) + 1)
    t = t.withColumn("__b", ((F.col(id_col) - int(lo)) / width)
                     .cast("long"))
    # bucket totals: n_buckets rows — driver-side exclusive prefix
    sums = {r["__b"]: r["s"]
            for r in t.groupBy("__b").agg(F.sum("__n").alias("s")).collect()}
    acc, boffs = 0, []
    for b in sorted(sums):
        boffs.append((b, acc))
        acc += int(sums[b])
    spark = df.sparkSession
    bdf = spark.createDataFrame(boffs, "__b long, __boff long")
    w = (Window.partitionBy("__b").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    t = (t.join(F.broadcast(bdf), on="__b")
         .withColumn("__off", F.col("__boff")
                     + F.coalesce(F.sum("__n").over(w), F.lit(0))))
    L = int(block_size)
    c0 = F.floor(F.col("__off") / L).cast("long")
    c1 = F.floor((F.col("__off") + F.col("__n") - 1) / L).cast("long")
    out = t.withColumn("chunk_id", F.explode(F.sequence(c0, c1)))
    tok_start = F.greatest(F.lit(0), F.col("chunk_id") * L - F.col("__off"))
    tok_end = F.least(F.col("__n"),
                      (F.col("chunk_id") + 1) * L - F.col("__off"))
    chunk_pos = F.greatest(F.lit(0), F.col("__off") - F.col("chunk_id") * L)
    return out.select(
        F.col("chunk_id"),
        F.col(id_col),
        tok_start.cast("long").alias("tok_start"),
        tok_end.cast("long").alias("tok_end"),
        chunk_pos.cast("long").alias("chunk_pos"))


def chunk_documents(df: DataFrame, *, chunk_tokens: int = 256,
                    overlap: int = 32, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split every document into fixed-size OVERLAPPING token windows —
    the context-window chunker (RAG indexing / long-doc pretraining
    prep), the sliding-window complement of :func:`pack_sequences`'
    straddling layout.  Reference has no analog; build-brief scope.

    Chunk ``i`` covers tokens ``[i*stride, min(i*stride+chunk_tokens,
    n))`` with ``stride = chunk_tokens - overlap``; the chunk count is
    ``1 + ceil(max(n - chunk_tokens, 0) / stride)`` so the final window
    always reaches the last token and no window starts past ``n``.
    Returns one row per chunk: ``(id, chunk_idx, tok_start, tok_end,
    n_tok, chunk_text)`` with ``tok_end`` exclusive.

    Scale plan: pure column arithmetic — tokenize, a closed-form chunk
    count, ``sequence``+``explode``, and an array ``slice`` per chunk.
    Zero Python, zero shuffle beyond the scan; output rows ≈
    input_tokens/stride, the same order of growth as the corpus itself.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda w: w != F.lit(""))
    n = F.size(toks).cast("long")
    n_chunks = (F.lit(1) + F.floor(
        (F.greatest(n - chunk_tokens, F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)).cast("long"))
    base = df.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"),
                     F.explode(F.sequence(F.lit(0).cast("long"),
                                          n_chunks - 1)).alias("chunk_idx"))
    start = F.col("chunk_idx") * stride
    end = F.least(start + chunk_tokens, F.col("_n"))
    return base.select(
        F.col(id_col),
        F.col("chunk_idx"),
        start.alias("tok_start"),
        end.alias("tok_end"),
        (end - start).alias("n_tok"),
        F.array_join(
            F.slice("_toks", (start + 1).cast("int"),
                    (end - start).cast("int")), " ").alias("chunk_text"))
