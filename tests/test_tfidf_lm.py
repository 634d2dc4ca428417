"""TF-IDF / BM25 and bigram-LM perplexity vs hand-computed oracles."""

import math

import pandas as pd
import pytest

from gis_tools_spark.operators.lmscore import perplexity_scores, train_bigram_lm
from gis_tools_spark.operators.tfidf import bm25_scores, tfidf_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark shuffles data and spark joins data"),
        (1, "the quick brown fox jumps"),
        (2, "data pipelines shuffle data at scale"),
        (3, "the fox and the hound"),
        (4, "   "),                      # whitespace-only: no tokens
        (5, "singleton"),                # one token: one BOS bigram
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _words(t):
    return [w for w in t.lower().strip().split() if w]


def test_tfidf_exact_values(corpus):
    df, rows = corpus
    out = tfidf_topk(df, k=2).toPandas()
    n = len(rows)
    tfs, dfs = {}, {}
    for did, t in rows:
        ws = _words(t)
        tfs[did] = {w: ws.count(w) for w in ws}
        for w in set(ws):
            dfs[w] = dfs.get(w, 0) + 1
    for did, t in rows:
        want = sorted(
            ((round(c * (math.log((n + 1) / (dfs[w] + 1)) + 1), 6), w)
             for w, c in tfs[did].items()),
            key=lambda x: (-x[0], x[1]))[:2]
        got = out[out.doc_id == did].sort_values("rank")
        assert list(got.word) == [w for _, w in want], did
        assert list(got.score_r) == pytest.approx([s for s, _ in want],
                                                  abs=1e-9)
    # the empty doc contributes no keyword rows
    assert (out.doc_id == 4).sum() == 0


def test_tfidf_plan_is_python_free(corpus):
    df, _ = corpus
    plan = tfidf_topk(df, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_bm25_closed_form(corpus):
    df, rows = corpus
    out = bm25_scores(df, ["data", "fox"], k1=1.2, b=0.75).toPandas()
    n = len(rows)
    lens = {did: len(_words(t)) for did, t in rows}
    avgdl = sum(lens.values()) / n
    dfs = {"data": 2, "fox": 2}
    for did, t in rows:
        ws = _words(t)
        want = 0.0
        for term in ("data", "fox"):
            tf = ws.count(term)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfs[term] + 0.5) / (dfs[term] + 0.5))
            want += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75
                                                  + 0.75 * lens[did] / avgdl))
        got = float(out[out.doc_id == did].bm25_r.iloc[0])
        assert got == pytest.approx(round(want, 6), abs=1e-9), did
    # every doc appears exactly once, zero-scored when no term matches
    assert sorted(out.doc_id) == [r[0] for r in rows]


def test_perplexity_self_scored(corpus):
    df, rows = corpus
    out = perplexity_scores(df).toPandas()
    # whitespace-only doc is omitted; all others present
    assert sorted(out.doc_id) == [0, 1, 2, 3, 5]

    toks = {did: ["<s>"] + _words(t) for did, t in rows if _words(t)}
    c2, c1, vocab = {}, {}, set()
    for ts in toks.values():
        vocab.update(ts[1:])
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    V = len(vocab)
    for did, ts in toks.items():
        bgs = list(zip(ts, ts[1:]))
        avg = sum(math.log((c2[x] + 0.5) / (c1[x[0]] + 0.5 * (V + 1)))
                  for x in bgs) / len(bgs)
        row = out[out.doc_id == did]
        assert int(row.n_bigrams.iloc[0]) == len(bgs)
        assert float(row.logprob_r.iloc[0]) == pytest.approx(round(avg, 6),
                                                             abs=1e-9)
        assert float(row.ppl_r.iloc[0]) == pytest.approx(
            round(math.exp(-avg), 6), abs=1e-6)


def test_perplexity_unseen_bigrams_floor(spark, corpus):
    """Scoring against a DIFFERENT training corpus exercises the
    left-join smoothing floor: bigrams absent from training get
    probability alpha / (C(w1) + alpha(V+1)) and the scoring pass keeps
    every input doc."""
    df, _ = corpus
    train = spark.createDataFrame(
        [(100, "spark shuffles data"), (101, "the fox jumps")],
        "doc_id long, text string")
    out = perplexity_scores(df, train=train).toPandas()
    assert sorted(out.doc_id) == [0, 1, 2, 3, 5]

    t_toks = [["<s>", "spark", "shuffles", "data"],
              ["<s>", "the", "fox", "jumps"]]
    c2, c1, vocab = {}, {}, set()
    for ts in t_toks:
        vocab.update(ts[1:])
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    V = len(vocab)
    # doc 3: "the fox and the hound" — mixes seen and unseen bigrams
    ts = ["<s>", "the", "fox", "and", "the", "hound"]
    bgs = list(zip(ts, ts[1:]))
    avg = sum(math.log((c2.get(x, 0) + 0.5)
                       / (c1.get(x[0], 0) + 0.5 * (V + 1)))
              for x in bgs) / len(bgs)
    row = out[out.doc_id == 3]
    assert float(row.logprob_r.iloc[0]) == pytest.approx(round(avg, 6),
                                                         abs=1e-9)


def test_perplexity_separates_fluent_from_shuffled(spark):
    """Semantics: under a model trained on fluent text, a scrambled
    word-salad doc scores strictly higher perplexity than an in-domain
    doc — the signal the CCNet-style filter thresholds on."""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug")
         for i in range(8)], "doc_id long, text string")
    score = spark.createDataFrame(
        [(0, "the cat sat on the rug"),
         (1, "rug the on cat mat sat")],
        "doc_id long, text string")
    out = (perplexity_scores(score, train=train).toPandas()
           .set_index("doc_id"))
    assert out.loc[1, "ppl_r"] > out.loc[0, "ppl_r"] * 2
