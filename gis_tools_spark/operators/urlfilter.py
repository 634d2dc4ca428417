"""URL parsing and domain filtering for web-crawl corpora.

The first gate on a crawl is URL-level: drop disallowed schemes, raw-IP
hosts, blocklisted registered domains, and spammy path shapes before a
single byte of content is decoded.  At 100 TB that filter must cost
exactly one scan: every operator here is a pure Spark column expression
(JVM regex + array ops inside whole-stage codegen) — parsing, public-
suffix reduction, and a literal-list blocklist are all zero-shuffle;
only a DataFrame-valued blocklist adds a broadcast probe.

The registered-domain reduction uses a small curated multi-part public
suffix table (the common ccTLD second-level registries: co.uk, com.au,
co.jp, …).  The full Mozilla PSL is ~9k rules; callers with exotic
suffixes can extend ``MULTIPART_SUFFIXES`` — the reduction rule (suffix
match → keep one extra label) is the same one the PSL algorithm applies.

Reference parity: gis-tools has no crawl ops; build-brief scope
(training-data pipeline), alongside pii.py / decontam.py / html.py.

No lookarounds in any pattern: the DuckDB oracle runs the same regexes
under RE2, and both engines return '' for a non-matching group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Curated multi-part public suffixes (common second-level registries).
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.nz", "net.nz", "org.nz", "co.za", "co.kr", "or.kr",
)

# Shared verbatim with the DuckDB oracle (RE2-safe, no lookarounds).
SCHEME_RE = r"^([a-z][a-z0-9+.-]*)://"
HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"
PORT_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*:([0-9]+)"
PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
QUERY_RE = r"\?([^#]*)"
IPV4_HOST_RE = r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}$"


def registered_domain(host: Column) -> Column:
    """Public-suffix-reduced registrable domain of a hostname column:
    ``a.b.site.co.uk`` → ``site.co.uk``, ``www.site.com`` → ``site.com``,
    IPs and bare/single-label hosts pass through unchanged.  Pure array
    codegen (split / negative slice / array_join / isin)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    last3 = F.array_join(F.slice(parts, -3, 3), ".")
    return (F.when(host.rlike(IPV4_HOST_RE), host)
            .when(n <= 2, host)
            .when(last2.isin(*MULTIPART_SUFFIXES), last3)
            .otherwise(last2))


def parse_urls(df: DataFrame, *, url_col: str = "url") -> DataFrame:
    """Append parsed URL components: ``scheme host port path query
    registered_domain is_ip`` — one codegen projection, no shuffle.
    Unparseable components come back as '' (both engines' no-match
    convention), never null, so downstream filters stay total."""
    u = F.lower(F.col(url_col))
    host = F.regexp_extract(u, HOST_RE, 1)
    return df.select(
        "*",
        F.regexp_extract(u, SCHEME_RE, 1).alias("scheme"),
        host.alias("host"),
        F.regexp_extract(u, PORT_RE, 1).alias("port"),
        F.regexp_extract(u, PATH_RE, 1).alias("path"),
        F.regexp_extract(u, QUERY_RE, 1).alias("query"),
        registered_domain(host).alias("registered_domain"),
        host.rlike(IPV4_HOST_RE).alias("is_ip"),
    )


def url_filter(df: DataFrame, *, url_col: str = "url",
               allowed_schemes: tuple = ("http", "https"),
               blocked_domains=None,
               block_ip_hosts: bool = True,
               blocked_path_re: str | None = None) -> DataFrame:
    """Classify every row with ``blocked`` + a first-match
    ``block_reason`` (scheme → ip_host → domain → path, in that fixed
    order so the reason column is deterministic).  Rows are kept, not
    dropped — callers audit the reason histogram, then anti-filter.

    ``blocked_domains`` may be a python sequence (compiled to a literal
    ``isin`` — zero shuffle, the common case: blocklists are thousands
    of rows) or a single-column DataFrame (broadcast left-join probe,
    for blocklists too large to inline in the plan)."""
    out = parse_urls(df, url_col=url_col)
    dom_hit = None
    if blocked_domains is not None and not isinstance(blocked_domains,
                                                      DataFrame):
        dom_hit = F.col("registered_domain").isin(*[str(d).lower()
                                                    for d in blocked_domains])
    elif isinstance(blocked_domains, DataFrame):
        bl_col = blocked_domains.columns[0]
        bl = blocked_domains.select(
            F.lower(F.col(bl_col)).alias("registered_domain")
        ).distinct().withColumn("__blk", F.lit(True))
        out = out.join(F.broadcast(bl), on="registered_domain", how="left")
        dom_hit = F.coalesce(F.col("__blk"), F.lit(False))
    reason = F.when(~F.col("scheme").isin(*allowed_schemes),
                    F.lit("scheme"))
    if block_ip_hosts:
        reason = reason.when(F.col("is_ip"), F.lit("ip_host"))
    if dom_hit is not None:
        reason = reason.when(dom_hit, F.lit("domain"))
    if blocked_path_re:
        reason = reason.when(F.col("path").rlike(blocked_path_re),
                             F.lit("path"))
    out = out.select("*", reason.alias("block_reason"))
    if "__blk" in out.columns:
        out = out.drop("__blk")
    return out.withColumn("blocked", F.col("block_reason").isNotNull())
