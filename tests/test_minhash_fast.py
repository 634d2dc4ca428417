"""Production (pure-JVM xxhash64) MinHash family vs the md5 oracle
family (round-2 verdict #4): different hash families estimate the same
Jaccard, so on a well-separated fixture the reported pair sets must
agree, and every reported pair must verify against EXACT n-gram
Jaccard within LSH estimation error."""

import numpy as np
import pytest

from gis_tools_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures_fast,
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(21)
    words = [f"w{i}" for i in range(400)]
    rows = []
    for i in range(60):
        rows.append((i, " ".join(rng.choice(words, 40).tolist())))
    # exact duplicate + one-word near-duplicate
    rows.append((100, rows[0][1]))
    t = rows[1][1].split()
    t[5] = "zzz"
    rows.append((101, " ".join(t)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _jacc(a, b, n=3):
    wa, wb = a.split(), b.split()
    sa = {" ".join(wa[i:i + n]) for i in range(max(1, len(wa) - n + 1))}
    sb = {" ".join(wb[i:i + n]) for i in range(max(1, len(wb) - n + 1))}
    return len(sa & sb) / len(sa | sb)


def test_fast_family_finds_same_pairs(docs):
    md5 = minhash_lsh_pairs(docs, threshold=0.5).toPandas()
    fast = minhash_lsh_pairs(docs, threshold=0.5,
                             hash_family="xxhash").toPandas()
    got_md5 = set(map(tuple, md5[["id_a", "id_b"]].values))
    got_fast = set(map(tuple, fast[["id_a", "id_b"]].values))
    assert (0, 100) in got_fast  # exact dup
    assert (1, 101) in got_fast  # near dup
    assert got_fast == got_md5
    # estimates track exact n-gram Jaccard
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for _, r in fast.iterrows():
        assert abs(r.jaccard_est - _jacc(texts[r.id_a], texts[r.id_b])) < 0.35


def test_fast_signature_deterministic_and_shaped(docs):
    s1 = minhash_signatures_fast(docs, num_hashes=32).collect()
    s2 = minhash_signatures_fast(docs, num_hashes=32).collect()
    sig1 = {r["doc_id"]: r["minhash"] for r in s1}
    sig2 = {r["doc_id"]: r["minhash"] for r in s2}
    assert sig1 == sig2
    assert all(len(v) == 32 for v in sig1.values())
    assert sig1[0] == sig1[100]  # identical text -> identical signature


def test_fast_signature_plan_is_jvm_only(docs):
    plan = minhash_signatures_fast(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # row-local: no shuffle
