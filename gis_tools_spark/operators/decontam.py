"""Benchmark decontamination for training corpora.

Before training, every document that shares long n-gram runs with an
evaluation/benchmark set has to be dropped, or downstream eval numbers
are meaningless (the GPT-3 appendix-C / Llama approach: a 13-gram
collision with any benchmark prompt marks the document contaminated).

Shape at 100 TB: the eval side is small (benchmarks are thousands of
prompts, not billions), so its distinct n-grams broadcast and the whole
scan stays shuffle-free — each training partition streams through one
broadcast-hash-join probe plus a partial count.  The training side's
gram explosion is pure JVM codegen (the same sliding ``array_join``
windows as ``dedup.minhash_signatures_fast``); nothing crosses into
Python.  With ``key='xxhash'`` grams travel as 8-byte longs instead of
strings, shrinking the broadcast and probe rows ~10x; ``key='text'``
keeps raw gram strings so DuckDB can mirror the join exactly (the
driver-oracle family, same split as minhash's md5_oracle/xxhash pair —
cross-family agreement is pytest-gated in test_decontam.py).

Reference parity: gis-tools has no text ops; this is build-brief scope
(training-data pipeline), alongside dedup.py / textstats.py / pii.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import normalize_text


def ngram_array(col: Column, n: int) -> Column:
    """Distinct word n-grams of a text column as ``array<string>`` —
    higher-order array expressions only (split → sliding-window
    array_join → array_distinct), zero Python.  Documents shorter than
    ``n`` words contribute their whole text as one gram (the minhash
    short-doc convention, so the two families tokenize identically)."""
    words = F.filter(F.split(normalize_text(col), " "),
                     lambda w: w != F.lit(""))
    grams = F.when(
        F.size(words) < n,
        F.array(F.array_join(words, " "))
    ).otherwise(
        F.transform(F.sequence(F.lit(0), F.size(words) - n),
                    lambda i: F.array_join(F.slice(words, i + 1, n), " ")))
    return F.array_distinct(grams)


def decontaminate(docs: DataFrame, eval_df: DataFrame, *, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str = "text", min_hits: int = 1,
                  key: str = "xxhash",
                  broadcast_eval: bool = True) -> DataFrame:
    """Flag training documents sharing ≥ ``min_hits`` distinct word
    n-grams with the evaluation set.

    Returns one row per input document: ``(id_col, n_contaminated,
    contaminated)`` — clean documents appear with a zero count, so the
    caller can either anti-filter or audit the contamination histogram.

    ``broadcast_eval=False`` falls back to a shuffled join for the rare
    case of an eval side too large to broadcast (e.g. decontaminating
    against another corpus rather than a benchmark)."""
    gram_doc = docs.select(
        id_col, F.explode(ngram_array(F.col(text_col), n)).alias("gram"))
    gram_ev = eval_df.select(
        F.explode(ngram_array(F.col(eval_text_col), n)).alias("gram")
    ).distinct()
    if key == "xxhash":
        gram_doc = gram_doc.select(id_col, F.xxhash64("gram").alias("gram"))
        gram_ev = gram_ev.select(F.xxhash64("gram").alias("gram"))
    elif key != "text":
        raise ValueError(f"key must be 'xxhash' or 'text', got {key!r}")
    if broadcast_eval:
        gram_ev = F.broadcast(gram_ev)
    # per-doc grams are already distinct (array_distinct pre-explode)
    # and the eval side is distinct, so the join emits exactly one row
    # per contaminated gram — count(*) IS the distinct-gram hit count,
    # no count_distinct shuffle needed
    hits = (gram_doc.join(gram_ev, on="gram")
            .groupBy(id_col).agg(F.count("*").alias("__n")))
    n_cont = F.coalesce(F.col("__n"), F.lit(0)).cast("long")
    return (docs.select(id_col).join(hits, on=id_col, how="left")
            .select(id_col,
                    n_cont.alias("n_contaminated"),
                    (n_cont >= min_hits).alias("contaminated")))
