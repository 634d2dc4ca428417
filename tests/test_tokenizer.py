"""BPE train/apply + WordPiece tokenization vs reference implementations."""

import pytest

from gis_tools_spark.operators.tokenizer import (
    UNK,
    _bpe_apply_word,
    _learn_merges,
    _wordpiece_word,
    bpe_tokenize,
    train_bpe,
    wordpiece_tokenize,
)


def test_learn_merges_classic_example():
    """The published low/lower/newest/widest worked example: ('e','s')
    merges first, then ('es','t'), then the end-of-word fusion."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = _learn_merges(wc, 4, "</w>")
    assert m[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]


def test_bpe_apply_merges_all_occurrences():
    ranks = {("a", "a"): 0}
    assert _bpe_apply_word("aaaa", ranks, "</w>") == ["aa", "aa", "</w>"]
    # odd run: leftover single symbol stays
    assert _bpe_apply_word("aaa", ranks, "</w>") == ["aa", "a", "</w>"]


def test_bpe_roundtrip_and_order(spark):
    """Tokens concatenate back to the exact source words, in document
    order, for every doc — the lossless-tokenization property."""
    rows = [(0, "low lower newest widest low low"),
            (1, "newest newest widest unseen"),
            (2, "the quick brown fox")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=12)
    out = bpe_tokenize(df, merges).orderBy("doc_id").toPandas()
    for did, text in rows:
        toks = list(out[out.doc_id == did].tokens.iloc[0])
        rebuilt = "".join(toks).replace("</w>", " ").strip()
        assert rebuilt == text.lower(), did
        assert int(out[out.doc_id == did].n_tokens.iloc[0]) == len(toks)


def test_bpe_trainer_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "spark shuffles data and spark joins data") for i in range(5)],
        "doc_id long, text string")
    assert train_bpe(df, n_merges=10) == train_bpe(df, n_merges=10)


def _ref_wordpiece(word, vocab, cont="##"):
    """Independent longest-match reference (recursive formulation)."""
    def seg(pos):
        if pos == len(word):
            return []
        for ln in range(len(word) - pos, 0, -1):
            cand = word[pos:pos + ln]
            key = cont + cand if pos > 0 else cand
            if key in vocab:
                rest = seg(pos + ln)
                return None if rest is None else [key] + rest
        return None

    # greedy (not backtracking): take the longest match at each step,
    # fail the whole word if any position dead-ends
    out, pos = [], 0
    while pos < len(word):
        hit = None
        for ln in range(len(word) - pos, 0, -1):
            key = (cont if pos > 0 else "") + word[pos:pos + ln]
            if key in vocab:
                hit = (key, ln)
                break
        if hit is None:
            return [UNK]
        out.append(hit[0])
        pos += hit[1]
    return out


def test_wordpiece_matches_reference_on_random_words():
    import random

    rng = random.Random(7)
    vocab = set("abcdef") | {"##" + c for c in "abcdef"} | {
        "ab", "abc", "##cd", "##def", "fa", "##ba"}
    for _ in range(300):
        w = "".join(rng.choice("abcdefg") for _ in range(rng.randint(1, 9)))
        assert _wordpiece_word(w, vocab, "##", 5) == _ref_wordpiece(w, vocab)


def test_wordpiece_spark_order_and_unk(spark):
    rows = [(0, "abc fab xyz abc"), (1, "ab ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = ["a", "b", "c", "f", "##a", "##b", "##c", "ab", "abc", "fa"]
    out = (wordpiece_tokenize(df, vocab).orderBy("doc_id").toPandas())
    p0 = list(out[out.doc_id == 0].pieces.iloc[0])
    assert p0 == ["abc", "fa", "##b", UNK, "abc"]
    assert int(out[out.doc_id == 0].n_unk.iloc[0]) == 1
    assert list(out[out.doc_id == 1].pieces.iloc[0]) == ["ab", "ab"]
