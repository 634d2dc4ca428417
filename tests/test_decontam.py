"""Decontamination oracles: crafted corpus with known n-gram overlaps,
family agreement (xxhash longs vs raw gram strings), and the min_hits /
short-doc conventions."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gis_tools_spark.operators.decontam import decontaminate

BENCH_PROMPT = "the quick brown fox jumps over the lazy dog"

DOCS = [
    # doc 0: verbatim benchmark prompt embedded mid-document
    (0, "intro words then " + BENCH_PROMPT + " and trailing filler here"),
    # doc 1: shares no 5-gram with the prompt (words reordered)
    (1, "dog lazy the over jumps fox brown quick the filler filler"),
    # doc 2: shares exactly one 5-gram window ('quick brown fox jumps over')
    (2, "we saw a quick brown fox jumps over something else entirely"),
    # doc 3: clean
    (3, "completely unrelated text with no shared runs at all today"),
    # doc 4: shorter than n -> whole-doc gram, equal to a short eval doc
    (4, "tiny doc"),
]
EVALS = [(100, BENCH_PROMPT), (101, "tiny doc")]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVALS, "doc_id long, text string")
    return docs, ev


def _run(docs, ev, **kw):
    out = decontaminate(docs, ev, n=5, **kw).orderBy("doc_id").collect()
    return {r.doc_id: (r.n_contaminated, r.contaminated) for r in out}


def test_known_overlaps(frames):
    docs, ev = frames
    got = _run(docs, ev)
    # prompt has 9 words -> 5 distinct 5-grams, all inside doc 0
    assert got[0] == (5, True)
    assert got[1] == (0, False)
    assert got[2] == (1, True)
    assert got[3] == (0, False)
    assert got[4] == (1, True)  # whole-short-doc gram matches eval 101


def test_min_hits_threshold(frames):
    docs, ev = frames
    got = _run(docs, ev, min_hits=2)
    # only the verbatim-inclusion doc clears a 2-hit bar
    assert [i for i, (_n, c) in sorted(got.items()) if c] == [0]


def test_family_agreement(frames):
    docs, ev = frames
    assert _run(docs, ev, key="xxhash") == _run(docs, ev, key="text")


def test_family_agreement_fixture_scale(spark):
    """Both key families over the sf0.001 documents table with a
    derived eval slice — the exact shape the driver gate runs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.where("doc_id % 17 = 0")
    a = decontaminate(docs, ev, n=8, key="xxhash").orderBy("doc_id")
    b = decontaminate(docs, ev, n=8, key="text").orderBy("doc_id")
    assert a.collect() == b.collect()
    # every eval-member doc is trivially contaminated
    flagged = {r.doc_id for r in a.where("contaminated").collect()}
    assert {i for i in range(500) if i % 17 == 0} <= flagged


def test_shuffle_join_path(frames):
    docs, ev = frames
    assert _run(docs, ev, broadcast_eval=False) == _run(docs, ev)
