"""Exact repeated-substring span detector (dedup.substring_dup_spans)."""

import pandas as pd
import pytest

from gis_tools_spark.operators.dedup import substring_dup_spans


def test_spans_merge_and_occurrence_band(spark):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta gamma delta eps zeta eta theta iota kappa unique one",
            "prefix words here alpha beta gamma delta eps zeta eta theta iota kappa tail",
            "totally different content with no overlap at all whatsoever in here",
            "alpha beta gamma delta eps zeta eta theta REPLACED iota kappa xx yy zz",
        ]})
    out = (substring_dup_spans(spark.createDataFrame(docs), k=8)
           .orderBy("doc_id", "span_start").toPandas())
    rows = [tuple(r) for r in out.itertuples(index=False)]
    # docs 1+2 share the 10-token run (3 windows); doc 4 only the first
    # 8 tokens (1 window); doc 3 clean
    assert rows == [(1, 1, 10, 3), (2, 4, 13, 3), (4, 1, 8, 1)]


def test_boilerplate_cap_excludes_hot_phrase(spark):
    phrase = " ".join(f"w{i}" for i in range(8))
    docs = pd.DataFrame({
        "doc_id": list(range(10)),
        "text": [f"{phrase} filler{i} more{i} words{i} here{i}"
                 for i in range(10)]})
    df = spark.createDataFrame(docs)
    hot = substring_dup_spans(df, k=8, max_occ=5).toPandas()
    assert len(hot) == 0                      # 10 occurrences > cap 5
    ok = substring_dup_spans(df, k=8, max_occ=100).toPandas()
    assert len(ok) == 10                      # cap lifted: all flagged


def test_short_docs_skipped(spark):
    docs = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["too short", "also short"]})
    out = substring_dup_spans(spark.createDataFrame(docs), k=8).toPandas()
    assert len(out) == 0


def test_repetition_stats(spark):
    from gis_tools_spark.operators.textstats import repetition_stats
    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["a b\na b\nc d", "x y x y x y",
                                  "one line only"]})
    out = (repetition_stats(spark.createDataFrame(docs))
           .orderBy("doc_id").toPandas())
    assert out["dup_line_frac"].tolist() == pytest.approx([2 / 3, 0.0, 0.0])
    # single-space tokenization: newlines bind to tokens (doc1 bigrams
    # all distinct); doc2 top bigram "x y" 3/5; doc3 1/2
    assert out["top_bigram_frac"].tolist() == pytest.approx(
        [1 / 3, 0.6, 0.5])
