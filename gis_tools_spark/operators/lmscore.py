"""N-gram language-model perplexity scoring (CCNet-style quality).

The published crawl-quality recipe scores each document's perplexity
under a language model trained on a clean corpus and keeps the
low-perplexity head. This module implements the distributed version
with a bigram model and add-alpha smoothing:

    P(w2 | w1) = (C(w1 w2) + alpha) / (C(w1·) + alpha · (V + 1))

where C are corpus counts from the TRAINING frame, V is the training
vocabulary size (+1 for the unseen token class), and every document is
scored as the average bigram log-probability (natural log) over its
token stream prefixed with a BOS marker; perplexity = exp(-avg).

Scale plan (100 TB): training is two shuffled aggregations (bigram and
unigram counts) with map-side combine; scoring joins each document's
bigram stream against the count tables on their natural keys — a
shuffle join co-partitioned with training aggregation, with AQE free to
broadcast a small (min_count-pruned) model. Unseen bigrams fall back to
the smoothing floor via left joins, so the scoring pass never loses
rows. Only two scalars (V, total training rows) are collected.

Tokenization matches the repo convention (split lower(text) on \\s+,
drop empties) so a DuckDB oracle can mirror every count and logprob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BOS = "<s>"


def _words(text_col: str):
    return F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                    lambda x: x != F.lit(""))


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per (doc, position): (id, w1, w2) with BOS prefix."""
    toks = df.select(F.col(id_col),
                     F.concat(F.array(F.lit(BOS)),
                              _words(text_col)).alias("toks"))
    return (toks.where(F.size("toks") >= 2)
            .select(id_col, F.posexplode(F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"))
                .alias("pos", "bg"))
            .select(id_col, "pos", F.col("bg.w1").alias("w1"),
                    F.col("bg.w2").alias("w2")))


def train_bigram_lm(train: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", min_count: int = 1
                    ) -> tuple[DataFrame, DataFrame, int]:
    """Corpus counts for the bigram model: returns
    ``(bigram_counts(w1, w2, c2), context_counts(w1, c1), vocab_size)``.
    ``min_count`` prunes rare bigrams from the shipped model (their
    probability falls back to the smoothing floor at scoring time —
    counts-only pruning, the model stays proper)."""
    bg = _bigrams(train, text_col, id_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (train.select(F.explode(_words(text_col)).alias("w"))
             .agg(F.countDistinct("w")).collect()[0][0])
    if min_count > 1:
        c2 = c2.where(F.col("c2") >= min_count)
    return c2, c1, int(vocab)


def perplexity_scores(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", alpha: float = 0.5,
                      train: DataFrame | None = None,
                      min_count: int = 1) -> DataFrame:
    """Per-document average bigram log-probability and perplexity under
    an add-alpha bigram model trained on ``train`` (defaults to scoring
    the corpus under its own statistics). Returns one row per document
    with at least one bigram: ``(id, n_bigrams, logprob_r, ppl_r)``,
    both floats rounded to 6 dp. Documents with fewer than two tokens
    (including BOS) carry no signal and are omitted — mirror of the
    oracle's semantics."""
    c2, c1, vocab = train_bigram_lm(train if train is not None else df,
                                    text_col=text_col, id_col=id_col,
                                    min_count=min_count)
    floor_den = float(alpha) * (vocab + 1)
    bg = _bigrams(df, text_col, id_col)
    scored = (bg.join(c2, on=["w1", "w2"], how="left")
              .join(c1, on="w1", how="left")
              .withColumn("lp", F.log(
                  (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(alpha)))
                  / (F.coalesce(F.col("c1"), F.lit(0))
                     + F.lit(floor_den)))))
    agg = (scored.groupBy(id_col)
           .agg(F.count("*").alias("n_bigrams"),
                F.avg("lp").alias("avg_lp")))
    return agg.select(
        id_col, "n_bigrams",
        F.round(F.col("avg_lp"), 6).alias("logprob_r"),
        F.round(F.exp(-F.col("avg_lp")), 6).alias("ppl_r"))
