"""PII detection/redaction oracles: crafted strings with known counts,
Luhn positive/negative, and a DuckDB mirror of the redaction chain
(the same `pii_redact_sql` string the driver gate uses).

Reference parity: gis-tools has no text ops — this is brief-scope
(training-data pipeline), like textstats.py.
"""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gis_tools_spark.operators.pii import (
    pii_redact,
    pii_redact_sql,
    pii_stats,
)

ROWS = [
    # (id, text, n_emails, n_ipv4, n_ssn, n_cc, n_phones)
    (0, "plain words only, nothing to see", 0, 0, 0, 0, 0),
    (1, "mail me at jane.doe+spam@sub.example.co.uk today", 1, 0, 0, 0, 0),
    (2, "server at 192.168.0.1 and 10.255.255.254 but not 999.1.1.1",
     0, 2, 0, 0, 1),
    # n_phones=1: 10.255.255.254 is 11 digits with '.'-separators —
    # the phone detector fires independently of the ipv4 one (counts
    # are per-class; the redaction order resolves the overlap).
    # 999.1.1.1: first octet can't match, but 99.1.1.1 inside it can —
    # both engines see the same suffix match, so count it consistently.
    (3, "ssn 123-45-6789 end", 0, 0, 1, 0, 1),  # 9 digits → phone too
    # Luhn-valid Visa test number, spaced and dashed forms
    (4, "card 4111 1111 1111 1111 or 4012-8888-8888-1881 ok", 0, 0, 0, 2, 0),
    # same shape, checksum broken → cc count 0 (redactor still scrubs)
    (5, "card 4111 1111 1111 1112 nope", 0, 0, 0, 0, 0),
    (6, "call +1 (415) 555-0123 or 0033 6 12 34 56 78", 0, 0, 0, 0, 2),
    (7, "mix: a@b.io 8.8.8.8 987-65-4320 4111111111111111 +44 20 7946 0958",
     1, 1, 1, 1, 2),  # ssn digits =9 → also a phone hit
]


@pytest.fixture(scope="module")
def stats_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in ROWS], "doc_id long, text string")
    out = pii_stats(df).orderBy("doc_id").collect()
    return {r.doc_id: r for r in out}


@pytest.mark.parametrize("row", ROWS, ids=[str(r[0]) for r in ROWS])
def test_counts(stats_rows, row):
    i, _t, ne, nip, ns, ncc, nph = row
    got = stats_rows[i]
    assert (got.n_emails, got.n_ipv4, got.n_ssn, got.n_cc, got.n_phones) \
        == (ne, nip, ns, ncc, nph)
    assert got.has_pii == bool(ne + nip + ns + ncc + nph)


def test_redact_values(spark):
    df = spark.createDataFrame(
        [(1, "write a@b.io or 10.0.0.7; card 4111 1111 1111 1112 "
             "ssn 078-05-1120 tel +1 415 555 0199")],
        "doc_id long, text string")
    (red,) = pii_redact(df).select("text").first()
    # email, ip, ssn, cc (even Luhn-invalid: redaction fails closed)
    # and the phone are all gone
    assert "<EMAIL>" in red and "<IP>" in red and "<SSN>" in red
    assert "<CC>" in red and "<PHONE>" in red
    for frag in ("a@b.io", "10.0.0.7", "1112", "078-05", "0199"):
        assert frag not in red


def test_redact_matches_duckdb_mirror(spark):
    """Same chain, two engines: Spark's regexp_replace sequence must
    produce byte-identical redacted text to the DuckDB SQL emitted by
    pii_redact_sql (the driver-gate oracle)."""
    texts = [t for _i, t, *_ in ROWS]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [r.text for r in
           pii_redact(df).orderBy("doc_id").select("text").collect()]
    con = duckdb.connect()
    expr = pii_redact_sql("t")
    want = []
    for t in texts:
        con.execute("CREATE OR REPLACE TABLE one AS SELECT ? AS t", [t])
        want.append(con.execute(f"SELECT {expr} FROM one").fetchone()[0])
    assert got == want


def test_idempotent(spark):
    """Redacting already-redacted text is a no-op — placeholders carry
    no digits or @, so no detector can re-fire."""
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in ROWS], "doc_id long, text string")
    once = pii_redact(df).select("doc_id", "text")
    twice = pii_redact(once).orderBy("doc_id").select("text").collect()
    assert [r.text for r in twice] == \
        [r.text for r in once.orderBy("doc_id").select("text").collect()]
