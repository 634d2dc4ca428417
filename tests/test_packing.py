"""Sequence-packing oracles: crafted corpora with hand-computed spans,
full-coverage/exact-block properties, bucketing invariance, and the
fixture-scale shape the driver gate runs."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gis_tools_spark.operators.packing import pack_sequences


def _collect(df):
    return sorted((r.chunk_id, r.doc_id, r.tok_start, r.tok_end,
                   r.chunk_pos) for r in df.collect())


def test_hand_computed(spark):
    # token counts (+1 EOD): 3, 5, 2 -> offsets 0, 3, 8; block 4
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "c d e f"), (2, "g")],
        "doc_id long, text string")
    got = _collect(pack_sequences(docs, 4))
    assert got == [
        (0, 0, 0, 3, 0),   # doc0 tokens 0..3 at chunk0 pos 0
        (0, 1, 0, 1, 3),   # doc1 first token fills chunk0
        (1, 1, 1, 5, 0),   # doc1 tokens 1..5 fill chunk1
        (2, 2, 0, 2, 0),   # doc2 starts chunk2 (partial tail)
    ]


def test_properties_fixture_scale(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    L = 128
    rows = pack_sequences(docs, L).collect()
    # (1) full chunks are exactly L tokens; the last may be shorter
    per_chunk = {}
    for r in rows:
        per_chunk.setdefault(r.chunk_id, []).append(r)
    last = max(per_chunk)
    for cid, rs in per_chunk.items():
        tot = sum(r.tok_end - r.tok_start for r in rs)
        assert tot == L or (cid == last and 0 < tot <= L)
        # (2) spans tile the chunk: sorted by chunk_pos, contiguous
        rs = sorted(rs, key=lambda r: r.chunk_pos)
        pos = 0
        for r in rs:
            assert r.chunk_pos == pos
            pos += r.tok_end - r.tok_start
    # (3) every document's tokens appear exactly once, in order
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.tok_start, r.tok_end))
    n_docs = docs.count()
    assert len(per_doc) == n_docs
    for spans in per_doc.values():
        spans.sort()
        assert spans[0][0] == 0
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 == s2


def test_bucket_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = _collect(pack_sequences(docs, 256, n_buckets=1))
    b = _collect(pack_sequences(docs, 256, n_buckets=7))
    c = _collect(pack_sequences(docs, 256, n_buckets=64))
    assert a == b == c


def test_empty_and_sparse_ids(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty, 16).count() == 0
    # non-dense ids: order by id still; empty text costs 1 EOD token
    docs = spark.createDataFrame(
        [(1000, ""), (5, "x y"), (70, "z")], "doc_id long, text string")
    got = _collect(pack_sequences(docs, 3))
    # counts: doc5=3, doc70=2, doc1000=1 -> offsets 0, 3, 5
    assert got == [
        (0, 5, 0, 3, 0),
        (1, 70, 0, 2, 0),
        (1, 1000, 0, 1, 2),
    ]


def test_chunk_documents_coverage_and_overlap(spark):
    """Windows tile the token stream: first starts at 0, consecutive
    windows overlap by exactly `overlap`, the last reaches the final
    token, and reassembling non-overlap segments reproduces the doc."""
    from gis_tools_spark.operators.packing import chunk_documents

    texts = [(0, " ".join(f"t{i}" for i in range(37))),
             (1, " ".join(f"u{i}" for i in range(8))),   # shorter than chunk
             (2, " ".join(f"v{i}" for i in range(16))),  # exactly one chunk
             (3, " ".join(f"w{i}" for i in range(17)))]  # one token over
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = (chunk_documents(df, chunk_tokens=16, overlap=4)
           .orderBy("doc_id", "chunk_idx").toPandas())

    for did, text in texts:
        toks = text.split()
        ch = out[out.doc_id == did].reset_index(drop=True)
        assert ch.tok_start.iloc[0] == 0
        assert ch.tok_end.iloc[-1] == len(toks)
        for i in range(1, len(ch)):
            assert ch.tok_start.iloc[i] == ch.tok_start.iloc[i - 1] + 12
        for _, r in ch.iterrows():
            assert r.chunk_text == " ".join(toks[r.tok_start:r.tok_end])
        rebuilt = ch.chunk_text.iloc[0].split()
        for i in range(1, len(ch)):
            rebuilt += ch.chunk_text.iloc[i].split()[4:]
        assert rebuilt == toks
    # doc 1: single short chunk; doc 3: 17 tokens -> 2 chunks
    assert len(out[out.doc_id == 1]) == 1
    assert len(out[out.doc_id == 2]) == 1
    assert len(out[out.doc_id == 3]) == 2

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
