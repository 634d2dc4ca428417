"""Subword tokenization: distributed BPE training + apply, WordPiece.

The tokenizer step of a training-data pipeline (token counting for
packing/mixing already exists in textstats/packing; this module
produces the actual subword streams):

- ``train_bpe``: classic byte-pair-encoding merge learning. The
  corpus-scale work is ONE aggregation to (word, count); merge
  selection then runs on that bounded word-frequency table driver-side
  (the standard formulation — BPE statistics are a pure function of
  the word-count dict, so a 100 TB corpus reduces to a vocabulary-sized
  problem before any quadratic work).
- ``bpe_tokenize``: greedy lowest-rank adjacent-pair merging (the
  published apply algorithm). Tokenization is computed once per
  DISTINCT word (second aggregation), then joined back — so cost
  scales with vocabulary, not corpus, and the per-word loop runs in an
  Arrow-batched UDF over the distinct-word table only.
- ``wordpiece_tokenize``: greedy longest-match (maximal-munch)
  segmentation against a fixed vocabulary, BERT-style with a
  configurable continuation prefix. Same distinct-word plan. Its
  sequential prefix scan is expressible as a recursive CTE, so this
  family is value-gated end-to-end against a DuckDB oracle
  (gate doc_wordpiece); BPE apply's pair-priority loop is not
  SQL-expressible and is pytest-gated against a local reference.

Tokenization of raw text into words follows the repo convention
(split lower(text) on \\s+, drop empties).

Reference parity: gis-tools has no text operators; brief-scope
training-pipeline op.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

UNK = "[UNK]"


def _words(text_col: str):
    return F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                    lambda x: x != F.lit(""))


def word_counts(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table (the BPE training reduction)."""
    return (df.select(F.explode(_words(text_col)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _learn_merges(wc: list[tuple[str, int]], n_merges: int,
                  end_of_word: str) -> list[tuple[str, str]]:
    """Reference BPE merge learning over a word-count dict: repeatedly
    merge the most frequent adjacent symbol pair (ties break on the
    lexicographically smallest pair, making training deterministic)."""
    seqs = [(tuple(w) + (end_of_word,), c) for w, c in wc]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for seq, c in seqs:
            for pair in zip(seq, seq[1:]):
                stats[pair] = stats.get(pair, 0) + c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        out = []
        for seq, c in seqs:
            ns, i = [], 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(seq[i])
                    i += 1
            out.append((tuple(ns), c))
        seqs = out
    return merges


def train_bpe(df: DataFrame, *, text_col: str = "text",
              n_merges: int = 100, min_count: int = 1,
              max_words: int = 1_000_000,
              end_of_word: str = "</w>") -> list[tuple[str, str]]:
    """Learn BPE merges from the corpus. The distributed part is the
    word-count aggregation; the returned driver-side table is bounded
    by ``max_words`` (most frequent first — the standard cutoff; rare
    tail words contribute negligible pair mass). Returns the ordered
    merge list (rank = position)."""
    rows = (word_counts(df, text_col=text_col)
            .where(F.col("cnt") >= min_count)
            .orderBy(F.col("cnt").desc(), F.col("word"))
            .limit(max_words).collect())
    return _learn_merges([(r["word"], r["cnt"]) for r in rows],
                         n_merges, end_of_word)


def _bpe_apply_word(word: str, ranks: dict[tuple[str, str], int],
                    end_of_word: str) -> list[str]:
    """Greedy BPE apply: merge the lowest-rank adjacent pair until no
    ranked pair remains (the published algorithm, all occurrences of
    the chosen pair per round, left-to-right)."""
    seq = list(word) + [end_of_word]
    while len(seq) > 1:
        pairs = {(seq[i], seq[i + 1]): i for i in range(len(seq) - 1)}
        ranked = [p for p in pairs if p in ranks]
        if not ranked:
            break
        a, b = min(ranked, key=lambda p: ranks[p])
        ns, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                ns.append(a + b)
                i += 2
            else:
                ns.append(seq[i])
                i += 1
        seq = ns
    return seq


def bpe_tokenize(df: DataFrame, merges: list[tuple[str, str]], *,
                 text_col: str = "text", id_col: str = "doc_id",
                 end_of_word: str = "</w>") -> DataFrame:
    """Tokenize every document with a learned merge list. Returns
    ``(id, n_tokens, tokens)`` where tokens is the full subword stream
    in document order.

    Plan: distinct words are tokenized once in an Arrow UDF (broadcast
    merge ranks), then a join on word re-expands to document order —
    corpus rows never enter Python."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ranks, end_of_word))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(words: pd.Series) -> pd.Series:
        r, eow = bc.value
        cache: dict[str, list[str]] = {}

        def one(w):
            if w not in cache:
                cache[w] = _bpe_apply_word(w, r, eow)
            return cache[w]

        return words.map(one)

    pos = (df.select(id_col, F.posexplode(_words(text_col))
                     .alias("pos", "word")))
    vocab = pos.select("word").distinct().withColumn("pieces",
                                                     _tok(F.col("word")))
    joined = pos.join(vocab, on="word")
    return (joined.groupBy(id_col)
            .agg(F.flatten(F.array_sort(F.collect_list(
                F.struct("pos", "pieces"))).pieces).alias("tokens"))
            .select(id_col, F.size("tokens").alias("n_tokens"), "tokens"))


def _wordpiece_word(word: str, vocab: set[str], cont: str,
                    max_piece: int) -> list[str]:
    """Greedy longest-match segmentation; a position with no matching
    piece emits UNK for the whole word (BERT semantics)."""
    out, i = [], 0
    while i < len(word):
        found = None
        for ln in range(min(max_piece, len(word) - i), 0, -1):
            cand = word[i:i + ln]
            key = cont + cand if i > 0 else cand
            if key in vocab:
                found = key
                break
        if found is None:
            return [UNK]
        out.append(found)
        i += len(found) - (len(cont) if found.startswith(cont) and i > 0
                           else 0)
    return out


def wordpiece_tokenize(df: DataFrame, vocab: list[str], *,
                       text_col: str = "text", id_col: str = "doc_id",
                       cont_prefix: str = "##") -> DataFrame:
    """WordPiece (greedy longest-match) tokenization against a fixed
    vocabulary. Returns ``(id, n_pieces, n_unk, pieces)`` with pieces
    in document order; words with an unmatchable position collapse to
    a single ``[UNK]``.

    Same distinct-word plan as :func:`bpe_tokenize`. The greedy scan is
    sequential per word but its state is just (position), so the exact
    semantics are mirrorable as a recursive CTE — this is the
    value-gated member of the tokenizer family (gate doc_wordpiece).
    """
    vs = set(vocab)
    max_piece = max((len(v) for v in vs), default=1)
    bc = df.sparkSession.sparkContext.broadcast(
        (vs, cont_prefix, max_piece))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(words: pd.Series) -> pd.Series:
        v, cont, mx = bc.value
        cache: dict[str, list[str]] = {}

        def one(w):
            if w not in cache:
                cache[w] = _wordpiece_word(w, v, cont, mx)
            return cache[w]

        return words.map(one)

    pos = (df.select(id_col, F.posexplode(_words(text_col))
                     .alias("pos", "word")))
    voc = pos.select("word").distinct().withColumn("pieces",
                                                   _tok(F.col("word")))
    joined = pos.join(voc, on="word")
    return (joined.groupBy(id_col)
            .agg(F.flatten(F.array_sort(F.collect_list(
                F.struct("pos", "pieces"))).pieces).alias("pieces"))
            .select(id_col, F.size("pieces").alias("n_pieces"),
                    F.size(F.filter("pieces",
                                    lambda x: x == F.lit(UNK)))
                    .alias("n_unk"), "pieces"))
