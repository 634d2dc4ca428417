"""Deterministic sampling / corpus-mixing oracles: reproducibility
under repartitioning, family rate agreement, the DuckDB predicate
mirror (exact row sets), and the budget→rate algebra."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gis_tools_spark.operators.mixing import (
    deterministic_sample,
    mix_corpus,
    sample_sql_predicate,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_deterministic_under_repartition(docs):
    a = _ids(deterministic_sample(docs, 0.4, seed=7))
    b = _ids(deterministic_sample(docs.repartition(13), 0.4, seed=7))
    assert a == b and 0 < len(a) < 500


def test_seed_changes_selection(docs):
    a = _ids(deterministic_sample(docs, 0.4, seed=7))
    b = _ids(deterministic_sample(docs, 0.4, seed=8))
    assert a != b
    # and rates stay in the same ballpark
    assert abs(len(a) - len(b)) < 100


def test_family_rate_agreement(docs):
    for rate in (0.1, 0.5, 0.9):
        nx = deterministic_sample(docs, rate, seed=3,
                                  family="xxhash").count()
        nm = deterministic_sample(docs, rate, seed=3, family="md5").count()
        assert abs(nx - nm) / 500 < 0.12
        assert abs(nx / 500 - rate) < 0.12


def test_md5_family_matches_duckdb(docs):
    got = _ids(deterministic_sample(docs, 0.37, seed=11, family="md5"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF}/documents.parquet'")
    pred = sample_sql_predicate("doc_id", 11, "0.37")
    want = [r[0] for r in con.execute(
        f"SELECT doc_id FROM documents WHERE {pred} ORDER BY doc_id"
    ).fetchall()]
    assert got == want


def test_mix_corpus_semantics(docs):
    out = mix_corpus(docs, {"src1": 0.5, "src4": 0.5}, 10**9, seed=0)
    rows = out.collect()
    # budget >> corpus: rate caps at 1.0, both sources taken whole,
    # all other sources dropped
    assert {r.source for r in rows} == {"src1", "src4"}
    assert all(r.sample_rate == 1.0 for r in rows)
    assert len(rows) == 50  # 25 docs per source in the fixture
    # tight budget: src1's 600-token allocation < its ~2k total, so it
    # downsamples; src4's 1400-token allocation exceeds its ~1.3k total,
    # so it caps at 1.0 and is taken whole (never upsampled)
    out2 = mix_corpus(docs, {"src1": 0.3, "src4": 0.7}, 2000, seed=0)
    rows2 = out2.collect()
    r1 = {r.sample_rate for r in rows2 if r.source == "src1"}
    r4 = {r.sample_rate for r in rows2 if r.source == "src4"}
    assert len(r1) == 1 and 0 < r1.pop() < 1
    assert r4 == {1.0}
    assert sum(1 for r in rows2 if r.source == "src4") == 25
    toks1 = sum(r.n_tokens for r in rows2 if r.source == "src1")
    assert abs(toks1 - 600) < 500  # binomial noise at n=25 docs


def test_mix_corpus_empty_weights(docs):
    assert mix_corpus(docs, {"nosuch": 1.0}, 1000).count() == 0
