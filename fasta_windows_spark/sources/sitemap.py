"""Sitemap XML source: the crawl-DISCOVERY input (sitemaps.org protocol) —
per-host `sitemap.xml` files listing `<url><loc/><lastmod/><changefreq/>
<priority/></url>` entries, plus `<sitemapindex>` files that list other
sitemaps.

Why the engine reads it: sitemaps are the third leg of the crawl-native
input family (WARC = payloads, CDX = what was captured, sitemaps = what
the SITE says exists and when it changed). A recrawl scheduler diffs a
host's sitemap lastmods against the last-capture index to decide what to
fetch — `sitemap_fetch_plan` below is exactly that join.

Parsing is the JVM `from_xml` expression with an EXPLICIT schema (Spark
4's built-in XML support — no spark-xml package, no Python): one wholetext
read per sitemap file (sitemaps are per-host and ≤50k urls by spec, so
file == natural task unit; .gz decompresses transparently), then explode.
`lastmod` accepts both W3C datetime and bare dates via try_to_timestamp
fallbacks, NULL when absent/invalid — never a parse crash on the open
web's sloppy XML (from_xml yields NULL structs for malformed input, and
malformed rows surface as NULL urls the caller can filter or count).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# explicit schemas: inference is banned on untrusted web input
_URLSET_SCHEMA = (
    "url ARRAY<STRUCT<loc: STRING, lastmod: STRING, "
    "changefreq: STRING, priority: DOUBLE>>"
)
_INDEX_SCHEMA = "sitemap ARRAY<STRUCT<loc: STRING, lastmod: STRING>>"

_LASTMOD_TS = (
    "coalesce(try_to_timestamp(lastmod), "
    "try_to_timestamp(lastmod, \"yyyy-MM-dd'T'HH:mm:ssXXX\"), "
    "try_to_timestamp(lastmod, 'yyyy-MM-dd'))"
)

# from_xml parses a document FRAGMENT: the <?xml ...?> prolog (and a BOM)
# must be stripped or the whole document parses to NULL
_STRIP_PROLOG = r"regexp_replace(value, '^\\uFEFF?\\s*<\\?xml[^?]*\\?>\\s*', '')"


def read_sitemap(spark: SparkSession, path: str) -> DataFrame:
    """Read sitemap urlset file(s) (plain or .gz) into
    (sitemap_file, url, host, lastmod TIMESTAMP, changefreq, priority).
    One row per <url> entry; entries with no parseable <loc> are dropped,
    missing optional fields are NULL."""
    raw = (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("sitemap_file"),
            F.from_xml(F.expr(_STRIP_PROLOG), _URLSET_SCHEMA).alias("x"),
        )
    )
    return (
        raw.select("sitemap_file", F.explode("x.url").alias("u"))
        .select(
            "sitemap_file",
            F.col("u.loc").alias("url"),
            F.expr("parse_url(u.loc, 'HOST')").alias("host"),
            F.expr(_LASTMOD_TS.replace("lastmod", "u.lastmod")).alias("lastmod"),
            F.col("u.changefreq").alias("changefreq"),
            F.col("u.priority").alias("priority"),
        )
        .where(F.col("url").isNotNull())
    )


def read_sitemap_index(spark: SparkSession, path: str) -> DataFrame:
    """Read sitemapindex file(s) into (index_file, sitemap_url, lastmod) —
    the fan-out list a crawler resolves before fetching child sitemaps."""
    raw = (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("index_file"),
            F.from_xml(F.expr(_STRIP_PROLOG), _INDEX_SCHEMA).alias("x"),
        )
    )
    return (
        raw.select("index_file", F.explode("x.sitemap").alias("s"))
        .select(
            "index_file",
            F.col("s.loc").alias("sitemap_url"),
            F.expr(_LASTMOD_TS.replace("lastmod", "s.lastmod")).alias("lastmod"),
        )
        .where(F.col("sitemap_url").isNotNull())
    )


def sitemap_fetch_plan(
    sitemap: DataFrame, last_captures: DataFrame
) -> DataFrame:
    """Freshness diff: which sitemap urls need (re)fetching — unseen urls,
    and urls whose sitemap lastmod is newer than the last capture. Input
    `last_captures` is (url, capture_ts) from the CDX index (latest per
    url). LEFT JOIN on url (both sides bucketable by url/host at scale;
    the sitemap side is per-host tiny and broadcastable when planning one
    host's recrawl). Output adds `reason` ('new' | 'stale') and orders by
    (priority DESC NULLS LAST, url) — the politeness scheduler consumes
    this per host."""
    j = sitemap.join(last_captures, "url", "left")
    return (
        j.where(
            F.col("capture_ts").isNull()
            | (F.col("lastmod").isNotNull() & (F.col("lastmod") > F.col("capture_ts")))
        )
        .select(
            "url",
            "host",
            "lastmod",
            "priority",
            F.when(F.col("capture_ts").isNull(), "new").otherwise("stale").alias(
                "reason"
            ),
        )
        .orderBy(F.desc_nulls_last("priority"), F.asc("url"))
    )
