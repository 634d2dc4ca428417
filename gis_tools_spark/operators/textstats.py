"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting. All pure Spark column
expressions (JVM-side, whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword lists for the n-gram heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "est"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "es"],
}


def lang_scores(df: DataFrame, *, text_col: str = "text",
                langs=("en", "fr", "de")) -> DataFrame:
    """Per-language stopword-occurrence scores + argmax prediction."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    out = df
    score_cols = []
    for lg in langs:
        total = None
        for wd in STOPWORDS[lg]:
            c = ((F.length(padded) - F.length(F.regexp_replace(padded, f" {wd} ", "")))
                 / (len(wd) + 2)).cast("long")
            total = c if total is None else total + c
        out = out.withColumn(f"{lg}_score", total)
        score_cols.append(f"{lg}_score")
    pred = F.lit(langs[0])
    best = F.col(score_cols[0])
    for lg, sc in zip(langs[1:], score_cols[1:]):
        pred = F.when(F.col(sc) > best, F.lit(lg)).otherwise(pred)
        best = F.greatest(best, F.col(sc))
    return out.withColumn("pred_lang", pred)


def quality_scores(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    n_tokens = F.size(F.split(F.trim(txt), r"\s+"))
    n_alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(txt, r"[.,;:!?'\"()\[\]]", ""))
    n_digit = F.length(F.regexp_replace(txt, r"[^0-9]", ""))
    padded = F.concat(F.lit(" "), F.lower(txt), F.lit(" "))
    stop = None
    for wd in STOPWORDS["en"]:
        c = ((F.length(padded) - F.length(F.regexp_replace(padded, f" {wd} ", "")))
             / (len(wd) + 2)).cast("long")
        stop = c if stop is None else stop + c
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        (n_chars / n_tokens).alias("mean_token_len"),
        (n_punct / n_chars).alias("punct_ratio"),
        (n_digit / n_chars).alias("digit_ratio"),
        (n_alpha / n_chars).alias("alpha_ratio"),
        (stop / n_tokens).alias("stopword_ratio"),
    )


def token_count_bpeish(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Token count under a BPE-ish regex (word pieces + punctuation +
    digit runs), plus plain whitespace count."""
    txt = F.col(text_col)
    # BPE-ish: alpha runs (≤4 chars per piece approximated by counting
    # ceil(len/4) over alpha runs), digits, punctuation as single tokens
    ws_tokens = F.size(F.split(F.trim(txt), r"\s+"))
    pieces = F.expr(
        f"size(regexp_extract_all({text_col}, '[A-Za-z]{{1,4}}|[0-9]+|[^A-Za-z0-9\\\\s]', 0))")
    return df.select("*", ws_tokens.alias("ws_tokens"), pieces.alias("bpe_tokens"))


def fingerprint(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Normalized md5 fingerprint + 64-bit rolling-style hash (xxhash64
    of the normalized text — same spirit as a rolling hash fingerprint,
    deterministic and JVM-side)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select("*", F.md5(norm).alias("fp_md5"),
                     F.xxhash64(norm).alias("fp64"))


def repetition_stats(df: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document — the filter
    columns a training-data pipeline drops repetitive boilerplate on:

    * ``dup_line_frac`` — fraction of lines that occur more than once
      within the document (lines split on \\n, empties dropped);
    * ``top_bigram_frac`` — fraction of the document's word bigrams
      taken by its single most frequent bigram.

    Pure JVM plan: two explode+groupBy aggregations joined on the id —
    shuffles are O(lines) and O(tokens) on (doc, value) keys, ordinary
    partial-aggregated shapes at 100 TB.  Zero-line / zero-bigram
    documents report 0.0 (never null), so the columns are directly
    usable in a WHERE."""
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda x: x != F.lit(""))
    ln = (df.select(F.col(id_col), F.explode(lines).alias("l"))
            .groupBy(id_col, "l").agg(F.count("*").alias("c"))
            .groupBy(id_col)
            .agg((F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))),
                             F.lit(0)) /
                  F.sum("c")).alias("dup_line_frac")))
    toks = F.filter(F.split(F.col(text_col), " "),
                    lambda x: x != F.lit(""))
    base = (df.select(F.col(id_col), toks.alias("t"))
              .withColumn("n", F.size("t")).where(F.col("n") >= 2))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.col("n") - 1),
        lambda i: F.concat(F.element_at("t", i), F.lit(" "),
                           F.element_at("t", i + 1)))
    bg = (base.select(F.col(id_col), F.explode(bigrams).alias("b"))
          .groupBy(id_col, "b").agg(F.count("*").alias("c"))
          .groupBy(id_col)
          .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac")))
    ids = df.select(id_col).distinct()
    return (ids.join(ln, id_col, "left").join(bg, id_col, "left")
            .select(id_col,
                    F.coalesce("dup_line_frac", F.lit(0.0))
                    .alias("dup_line_frac"),
                    F.coalesce("top_bigram_frac", F.lit(0.0))
                    .alias("top_bigram_frac")))


# Gopher rule-set stopwords (Rae et al. 2021, table A1; same list the
# public Dolma / RedPajama-Data implementations use)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# first-match rule order — the filter reports ONE reason per rejected doc
GOPHER_RULES = ("word_count", "mean_word_len", "symbol_ratio",
                "bullet_lines", "ellipsis_lines", "alpha_words",
                "stopwords", "dup_lines")


def gopher_filter(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_words: int = 50, max_words: int = 100_000,
                  min_mean_word_len: float = 3.0,
                  max_mean_word_len: float = 10.0,
                  max_symbol_ratio: float = 0.1,
                  max_bullet_frac: float = 0.9,
                  max_ellipsis_frac: float = 0.3,
                  min_alpha_word_frac: float = 0.8,
                  min_stopwords: int = 2,
                  max_dup_line_frac: float = 0.3) -> DataFrame:
    """Gopher-style heuristic quality FILTER decision (the accept/reject
    gate a training pipeline runs after PII/url filtering and before
    dedup) — reference has no analog; brief-scope training-pipeline op.
    Rules and default thresholds follow the published Gopher rule set:
    word-count band, mean-word-length band, symbol-to-word ratio
    (``#``, ``…``, ``...``), bullet-line and ellipsis-line fractions,
    fraction of words containing an alphabetic character, required-
    stopword presence, and duplicate-line fraction.

    Returns the input ids plus the signal columns and the decision:
    ``accept`` (1/0) and ``reject_reason`` — the FIRST rule that fired
    in ``GOPHER_RULES`` order, or ``'ok'``.

    Scale plan: every signal except ``dup_line_frac`` is a pure column
    expression over the scan (whole-stage codegen, zero shuffle, zero
    Python); ``dup_line_frac`` reuses :func:`repetition_stats` (an
    O(lines) explode+groupBy) joined back on the id — so the op costs
    one corpus pass plus one lines-shaped aggregation at 100 TB.
    """
    txt = F.col(text_col)
    words = F.filter(F.split(F.trim(txt), r"\s+"),
                     lambda x: x != F.lit(""))
    lines = F.filter(F.split(txt, "\n"), lambda x: x != F.lit(""))

    sig = df.select(
        F.col(id_col),
        F.size(words).cast("long").alias("wc"),
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda a, x: a + F.length(x)).alias("chsum"),
        (F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
         ).alias("n_hash"),
        (F.length(txt) - F.length(F.replace(txt, F.lit("…"), F.lit("")))
         ).alias("n_uell"),
        ((F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / 3
         ).alias("n_aell"),
        F.size(lines).cast("long").alias("nl"),
        F.size(F.filter(lines, lambda l: F.substring(l, 1, 2)
                        .isin("• ", "- ", "* "))).alias("n_bullet"),
        F.size(F.filter(lines, lambda l: l.endswith("...")
                        | l.endswith("…"))).alias("n_ell_line"),
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
        .alias("n_alpha_w"),
        sum((F.array_contains(F.transform(words, F.lower), sw).cast("int")
             for sw in GOPHER_STOPWORDS), F.lit(0)).cast("long")
        .alias("n_stop"),
    )
    rep = repetition_stats(df.select(id_col, text_col),
                           text_col=text_col, id_col=id_col) \
        .select(id_col, "dup_line_frac")
    sig = sig.join(rep, on=id_col, how="left") \
             .withColumn("dup_line_frac",
                         F.coalesce("dup_line_frac", F.lit(0.0)))

    mean_wl = F.col("chsum") / F.col("wc")
    sym_ratio = (F.col("n_hash") + F.col("n_uell") + F.col("n_aell")) / F.col("wc")
    reason = (
        F.when((F.col("wc") < min_words) | (F.col("wc") > max_words),
               "word_count")
        .when((mean_wl < min_mean_word_len) | (mean_wl > max_mean_word_len),
              "mean_word_len")
        .when(sym_ratio > max_symbol_ratio, "symbol_ratio")
        .when((F.col("nl") > 0)
              & (F.col("n_bullet") / F.col("nl") > max_bullet_frac),
              "bullet_lines")
        .when((F.col("nl") > 0)
              & (F.col("n_ell_line") / F.col("nl") > max_ellipsis_frac),
              "ellipsis_lines")
        .when(F.col("n_alpha_w") / F.col("wc") < min_alpha_word_frac,
              "alpha_words")
        .when(F.col("n_stop") < min_stopwords, "stopwords")
        .when(F.col("dup_line_frac") > max_dup_line_frac, "dup_lines")
    )
    return (sig
            .withColumn("reject_reason", F.coalesce(reason, F.lit("ok")))
            .withColumn("accept",
                        (F.col("reject_reason") == "ok").cast("int")))


C4_BAD_WORDS = ("badword",)
C4_RULES = ("lorem_ipsum", "curly_brace", "bad_word", "too_few_sentences")


def c4_filter(df: DataFrame, *, text_col: str = "text",
              id_col: str = "doc_id", min_words_per_line: int = 5,
              min_sentences: int = 3,
              bad_words: tuple[str, ...] = C4_BAD_WORDS) -> DataFrame:
    """C4-style cleanup (the other published heuristic family next to
    :func:`gopher_filter`): a LINE stage keeps only trimmed lines that
    end in terminal punctuation (``. ! ? \"``), carry at least
    ``min_words_per_line`` whitespace words, and do not mention
    ``javascript``; then a DOCUMENT stage rejects the cleaned text on
    the first matching rule in ``C4_RULES`` order — ``lorem ipsum``
    occurrence, any curly brace, any listed bad word, or fewer than
    ``min_sentences`` sentence enders (``.!?`` count over the kept
    text). Returns one row per document:
    ``(id, n_lines, n_kept, n_sent, clean_text, reject_reason,
    accept)`` with ``reject_reason = 'ok'`` on acceptance.

    Scale plan: the whole op is ONE codegen projection over the scan —
    line filtering is an array lambda, every document signal is a
    column expression; zero shuffles, zero Python, so it runs at
    ingest rate like pii_stats/url_filter.
    """
    txt = F.col(text_col)
    lines = F.transform(F.split(txt, "\n"), F.trim)
    lines = F.filter(lines, lambda x: x != F.lit(""))

    def _ok(l):
        nw = F.size(F.filter(F.split(l, r"\s+"),
                             lambda x: x != F.lit("")))
        term = (l.endswith(".") | l.endswith("!") | l.endswith("?")
                | l.endswith('"'))
        return (term & (nw >= min_words_per_line)
                & ~F.lower(l).contains("javascript"))

    kept = F.filter(lines, _ok)
    clean = F.array_join(kept, "\n")

    sig = df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        clean.alias("clean_text"))
    ct = F.col("clean_text")
    n_sent = (F.length(ct) - F.length(
        F.replace(F.replace(F.replace(ct, F.lit("."), F.lit("")),
                            F.lit("!"), F.lit("")),
                  F.lit("?"), F.lit("")))).cast("long")
    lower_ct = F.lower(ct)
    has_bad = None
    for w in bad_words:
        c = lower_ct.contains(w)
        has_bad = c if has_bad is None else (has_bad | c)
    reason = (
        F.when(lower_ct.contains("lorem ipsum"), "lorem_ipsum")
        .when(ct.contains("{") | ct.contains("}"), "curly_brace")
        .when(has_bad if has_bad is not None else F.lit(False), "bad_word")
        .when(n_sent < min_sentences, "too_few_sentences"))
    return (sig.withColumn("n_sent", n_sent)
            .withColumn("reject_reason", F.coalesce(reason, F.lit("ok")))
            .withColumn("accept",
                        (F.col("reject_reason") == "ok").cast("int"))
            .select(id_col, "n_lines", "n_kept", "n_sent", "clean_text",
                    "reject_reason", "accept"))
