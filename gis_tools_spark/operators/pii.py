"""PII detection and redaction for training-data pipelines.

A web crawl destined for model training has to be scrubbed of
personally identifying strings before anything else touches it, so the
scrubber must run at ingest rate: every detector here is a pure Spark
column expression (JVM regex / higher-order array functions inside
whole-stage codegen) — zero Python, zero UDFs, no shuffle. The
operators scale exactly like the scan that feeds them.

Reference parity: gis-tools has no text ops; this serves the build
brief's training-data-pipeline scope (like textstats.py).

Detected classes (leftmost-first regex semantics in both Spark's Java
engine and DuckDB's RE2, so the driver oracle can mirror every
pattern):

* ``email``  — RFC-lite mailbox (``local@domain.tld``);
* ``ipv4``   — dotted quad with strict 0-255 octets;
* ``ssn``    — US social security shape ``ddd-dd-dddd``;
* ``cc``     — 13-19 digit runs with optional single space/dash
  separators, **counted only when the Luhn checksum passes**
  (validated JVM-side with aggregate/transform over the digit string
  — no UDF);
* ``phone``  — ``+``-optional digit runs with ``()/space/./-``
  separators whose digit count lands in [9, 15] (ITU E.164 bounds);
  validation again via higher-order filter, not Python.

No lookarounds anywhere: RE2 (DuckDB) does not support them, and the
oracle must run the same patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------- patterns
# Shared verbatim between Spark (Java regex) and the DuckDB oracle
# (RE2): only constructs both engines implement identically.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = (r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
           r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b")
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
# candidate digit runs; real hits are Luhn-filtered / length-filtered
CC_RE = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"
PHONE_RE = r"\+?[0-9][0-9 ().-]{6,18}[0-9]"

REDACTIONS = (  # applied in this order; earlier classes win overlaps
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("cc", CC_RE, "<CC>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def _digits(x: Column) -> Column:
    return F.regexp_replace(x, r"[^0-9]", "")


def _luhn_ok(d: Column) -> Column:
    """Luhn checksum over a digit string — pure codegen (aggregate over
    a position sequence; every second digit from the right doubles,
    >9 folds back by -9)."""
    rev = F.reverse(d)

    def term(i: Column) -> Column:
        v = F.substring(rev, i, 1).cast("int")
        dbl = v * 2
        return F.when(i % 2 == 0,
                      F.when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(v)

    total = F.aggregate(F.sequence(F.lit(1), F.length(d)), F.lit(0),
                        lambda acc, i: acc + term(i))
    return (F.length(d) >= 13) & (total % 10 == 0)


def pii_stats(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Append per-row PII counts + a ``has_pii`` flag.

    Columns: n_emails, n_ipv4, n_ssn, n_cc (Luhn-valid only),
    n_phones (digit count in [9, 15]; rows already matching the
    stricter cc/ipv4/ssn shapes are NOT excluded — the counts are
    independent detectors, the redaction order resolves overlaps).
    """
    txt = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(txt, F.lit(EMAIL_RE), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all(txt, F.lit(IPV4_RE), F.lit(0)))
    n_ssn = F.size(F.regexp_extract_all(txt, F.lit(SSN_RE), F.lit(0)))
    cc_digits = F.transform(
        F.regexp_extract_all(txt, F.lit(CC_RE), F.lit(0)), _digits)
    n_cc = F.size(F.filter(cc_digits, _luhn_ok))
    ph_digits = F.transform(
        F.regexp_extract_all(txt, F.lit(PHONE_RE), F.lit(0)), _digits)
    n_phones = F.size(F.filter(
        ph_digits, lambda d: (F.length(d) >= 9) & (F.length(d) <= 15)))
    out = df.select(
        "*",
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_ssn.alias("n_ssn"),
        n_cc.alias("n_cc"),
        n_phones.alias("n_phones"),
    )
    return out.withColumn(
        "has_pii",
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_ssn")
         + F.col("n_cc") + F.col("n_phones")) > 0)


def pii_redact(df: DataFrame, *, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace every detected span with a typed placeholder
    (``<EMAIL>``/``<IP>``/``<SSN>``/``<CC>``/``<PHONE>``), in a fixed
    class order so overlapping matches resolve deterministically
    (email before phone keeps ``user123@…`` digits out of the phone
    detector; cc before phone keeps card runs whole).

    Redaction is shape-based: any 13-19-digit cc *candidate* is
    scrubbed whether or not Luhn passes — a redactor must fail closed,
    the Luhn filter is for the *counting* side only."""
    out = out_col or text_col
    col: Column = F.col(text_col)
    for _name, pat, repl in REDACTIONS:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out, col)


def pii_redact_sql(text_expr: str) -> str:
    """The DuckDB mirror of :func:`pii_redact`'s replacement chain —
    used by the driver oracle; kept next to the patterns so they can
    never drift apart."""
    s = text_expr
    for _name, pat, repl in REDACTIONS:
        p = pat.replace("'", "''")
        s = f"regexp_replace({s}, '{p}', '{repl}', 'g')"
    return s
