"""URL parse/filter oracles: crafted URLs with known components,
public-suffix reduction cases, blocklist families (literal isin vs
broadcast DataFrame), and reason precedence."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gis_tools_spark.operators.urlfilter import parse_urls, url_filter

URLS = [
    # (id, url, scheme, host, port, path, query, reg_domain, is_ip)
    (0, "https://www.site.com/a/b?q=1#frag",
     "https", "www.site.com", "", "/a/b", "q=1", "site.com", False),
    (1, "http://a.b.shop.co.uk:8080/",
     "http", "a.b.shop.co.uk", "8080", "/", "", "shop.co.uk", False),
    (2, "ftp://user:pw@files.example.org/pub",
     "ftp", "files.example.org", "", "/pub", "", "example.org", False),
    (3, "https://93.184.216.34/index.html",
     "https", "93.184.216.34", "", "/index.html", "", "93.184.216.34",
     True),
    (4, "https://localhost", "https", "localhost", "", "", "",
     "localhost", False),
    (5, "not a url at all", "", "", "", "", "", "", False),
    (6, "HTTPS://MiXeD.CaSe.NET/P?Q=Z",
     "https", "mixed.case.net", "", "/p", "q=z", "case.net", False),
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(i, u) for i, u, *_ in URLS],
                               "doc_id long, url string")
    return {r.doc_id: r for r in parse_urls(df).collect()}


@pytest.mark.parametrize("row", URLS, ids=[str(r[0]) for r in URLS])
def test_parse(parsed, row):
    i, _u, scheme, host, port, path, query, reg, is_ip = row
    got = parsed[i]
    assert (got.scheme, got.host, got.port, got.path, got.query,
            got.registered_domain, got.is_ip) == \
        (scheme, host, port, path, query, reg, is_ip)


def test_filter_reasons(spark):
    df = spark.createDataFrame([(i, u) for i, u, *_ in URLS],
                               "doc_id long, url string")
    out = url_filter(df, blocked_domains=["site.com", "case.net"],
                     blocked_path_re=r"^/pub")
    got = {r.doc_id: r.block_reason for r in out.collect()}
    assert got[0] == "domain"
    assert got[1] is None
    assert got[2] == "scheme"   # scheme precedes the /pub path hit
    assert got[3] == "ip_host"
    assert got[4] is None
    assert got[5] == "scheme"   # unparseable -> '' scheme -> blocked
    assert got[6] == "domain"


def test_blocklist_dataframe_family(spark):
    """Literal-isin and broadcast-DataFrame blocklists must classify
    identically (same rows, same reasons)."""
    df = spark.createDataFrame([(i, u) for i, u, *_ in URLS],
                               "doc_id long, url string")
    bl = ["site.com", "case.net", "shop.co.uk"]
    a = url_filter(df, blocked_domains=bl)
    bdf = spark.createDataFrame([(d,) for d in bl], "domain string")
    b = url_filter(df, blocked_domains=bdf)
    ka = sorted((r.doc_id, r.block_reason, r.blocked) for r in a.collect())
    kb = sorted((r.doc_id, r.block_reason, r.blocked) for r in b.collect())
    assert ka == kb


def test_pure_codegen_literal_path(spark):
    """The literal-blocklist filter must stay UDF-free and join-free —
    it is the per-scan crawl gate."""
    df = spark.createDataFrame([(0, "https://x.com/a")],
                               "doc_id long, url string")
    out = url_filter(df, blocked_domains=["x.com"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Join" not in plan
