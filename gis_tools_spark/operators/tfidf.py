"""TF-IDF / BM25 term scoring over a document corpus.

The corpus-statistics member of the text-analysis family (alongside
heuristic quality_scores and the Gopher/repetition filters): term
frequencies per document, document frequencies over the corpus, and the
classic smoothed TF-IDF / Okapi BM25 weights — the standard relevance
baseline for keyword extraction, corpus exploration, and sparse
retrieval over a crawl table.

Reference parity: gis-tools has no text operators; this serves the
build brief's large-scale training-data-pipeline scope.

Scale plan (100 TB): tokenization is a codegen projection on the scan;
term frequencies are ONE shuffle on (doc_id, word) with map-side
partial aggregation; document frequencies reduce the tf table again by
word (strictly smaller). The tf×df join is keyed on word — AQE picks a
broadcast when the (min_df-pruned) vocabulary fits, and falls back to a
sort-merge join co-partitioned with the df aggregation otherwise; no
driver-side collection anywhere. The only driver value is the scalar
document count (one count() action, documented).

Tokenization matches the repo-wide convention (split lower(text) on
\\s+, drop empties) so DuckDB oracles can mirror values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _words(text_col: str):
    return F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                    lambda x: x != F.lit(""))


def term_stats(df: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """(tf, df) building blocks: per-document term counts and corpus
    document frequencies, both lazy DataFrames."""
    w = (df.select(id_col, F.explode(_words(text_col)).alias("word")))
    tf = w.groupBy(id_col, "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df_t"))
    return tf, dfreq


def tfidf_topk(df: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id", k: int = 3,
               min_df: int = 1) -> DataFrame:
    """Top-k TF-IDF keywords per document.

    Weight: ``tf * (ln((N + 1) / (df + 1)) + 1)`` (the smoothed idf of
    standard sklearn-style TF-IDF), rounded to 6 dp; rank ties break on
    the rounded score descending then word ascending, so the result is
    deterministic and SQL-mirrorable. Returns one row per kept keyword:
    ``(id, word, tf, df_t, score_r, rank)`` with rank in 1..k.
    """
    n_docs = df.count()
    tf, dfreq = term_stats(df, text_col=text_col, id_col=id_col)
    if min_df > 1:
        dfreq = dfreq.where(F.col("df_t") >= min_df)
    scored = (tf.join(dfreq, on="word")
              .withColumn("score_r", F.round(
                  F.col("tf") * (F.log((F.lit(float(n_docs + 1)))
                                       / (F.col("df_t") + 1)) + 1), 6)))
    win = Window.partitionBy(id_col).orderBy(
        F.col("score_r").desc(), F.col("word"))
    return (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select(id_col, "word", "tf", "df_t", "score_r", "rank"))


def bm25_scores(df: DataFrame, terms: list[str], *,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 score of each document against a bag of query terms.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the non-negative
    variant), ``score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 - b +
    b·dl/avgdl))``. Document length and the corpus average length use
    the same whitespace tokens as tf. Returns ``(id, bm25_r)`` for every
    document (zero when no query term occurs), rounded to 6 dp.

    The query-term list is a literal isin filter on the tf table — the
    corpus scan stays one pass and only matching (doc, term) rows reach
    the join; N and avgdl are two scalar aggregates collected once.
    """
    n_docs = df.count()
    lens = df.select(F.col(id_col),
                     F.size(_words(text_col)).alias("dl"))
    avgdl = lens.agg(F.avg("dl")).collect()[0][0] or 0.0
    tf, dfreq = term_stats(df, text_col=text_col, id_col=id_col)
    tq = tf.where(F.col("word").isin([t.lower() for t in terms]))
    dq = dfreq.where(F.col("word").isin([t.lower() for t in terms]))
    idf = dq.withColumn(
        "idf", F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t")
                                   + 0.5) / (F.col("df_t") + 0.5)))
    parts = (tq.join(F.broadcast(idf), on="word")
             .join(lens, on=id_col)
             .withColumn("part", F.col("idf") * F.col("tf")
                         * (k1 + 1)
                         / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                                / F.lit(float(avgdl))))))
    per_doc = parts.groupBy(id_col).agg(
        F.round(F.sum("part"), 6).alias("bm25_r"))
    return (df.select(id_col).join(per_doc, on=id_col, how="left")
            .select(id_col, F.coalesce("bm25_r", F.lit(0.0)).alias("bm25_r")))
