"""Sitemap source (sources/sitemap.py): urlset + sitemapindex parsing via
JVM from_xml, lastmod format tolerance, gzip transparency, malformed-input
behavior, and the freshness fetch plan."""

import gzip
import os

import pyspark.sql.functions as F

from fasta_windows_spark.sources import sitemap as SM

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/p1</loc><lastmod>2024-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://a.example/p2</loc><lastmod>2024-02-03T04:05:06Z</lastmod></url>
  <url><loc>https://a.example/p3</loc></url>
</urlset>
"""

INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/sitemap-1.xml</loc>
           <lastmod>2024-03-01</lastmod></sitemap>
  <sitemap><loc>https://a.example/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>
"""


def _write(d, name, body, gz=False):
    p = os.path.join(str(d), name)
    if gz:
        with gzip.open(p, "wt") as f:
            f.write(body)
    else:
        with open(p, "w") as f:
            f.write(body)
    return p


def test_read_sitemap_urlset(spark, tmp_path):
    p = _write(tmp_path, "sitemap.xml", URLSET)
    rows = {r.url: r for r in SM.read_sitemap(spark, p).collect()}
    assert set(rows) == {
        "https://a.example/p1",
        "https://a.example/p2",
        "https://a.example/p3",
    }
    r1 = rows["https://a.example/p1"]
    assert r1.host == "a.example"
    assert str(r1.lastmod).startswith("2024-01-02")
    assert r1.changefreq == "daily" and abs(r1.priority - 0.8) < 1e-9
    # W3C datetime parses; missing lastmod is NULL, not a crash
    assert rows["https://a.example/p2"].lastmod is not None
    assert rows["https://a.example/p3"].lastmod is None


def test_read_sitemap_gzip_transparent(spark, tmp_path):
    _write(tmp_path, "sitemap.xml.gz", URLSET, gz=True)
    got = SM.read_sitemap(spark, str(tmp_path)).count()
    assert got == 3


def test_read_sitemap_index(spark, tmp_path):
    p = _write(tmp_path, "sitemapindex.xml", INDEX)
    rows = sorted(
        (r.sitemap_url, r.lastmod is not None)
        for r in SM.read_sitemap_index(spark, p).collect()
    )
    assert rows == [
        ("https://a.example/sitemap-1.xml", True),
        ("https://a.example/sitemap-2.xml.gz", False),
    ]


def test_read_sitemap_malformed_is_quiet(spark, tmp_path):
    _write(tmp_path, "bad.xml", "this is not xml at all <<<")
    assert SM.read_sitemap(spark, str(tmp_path / "bad.xml")).count() == 0


def test_sitemap_plan_is_jvm_only(spark, tmp_path):
    p = _write(tmp_path, "sitemap.xml", URLSET)
    plan = (
        SM.read_sitemap(spark, p)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sitemap_fetch_plan(spark, tmp_path):
    p = _write(tmp_path, "sitemap.xml", URLSET)
    sm = SM.read_sitemap(spark, p)
    last = spark.createDataFrame(
        [
            ("https://a.example/p1", "2023-12-01 00:00:00"),  # stale (lastmod newer)
            ("https://a.example/p2", "2024-06-01 00:00:00"),  # fresh (capture newer)
        ],
        "url string, capture_ts string",
    ).select("url", F.to_timestamp("capture_ts").alias("capture_ts"))
    rows = {r.url: r.reason for r in SM.sitemap_fetch_plan(sm, last).collect()}
    # p1 stale, p3 never captured; p2 fresh -> excluded
    assert rows == {"https://a.example/p1": "stale", "https://a.example/p3": "new"}
