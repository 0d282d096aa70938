"""CDX(J) crawl-index source: parse semantics, comment/blank handling,
streaming twin, fetch-plan shape (latest capture per url, per-WARC offset
order), and the pure-JVM plan contract."""

import pyspark.sql.functions as F

from fasta_windows_spark.sources import cdx as C

ROWS = [
    ("org,example)/a", "20240115093000",
     {"url": "http://example.org/a", "status": "200", "mime": "text/html",
      "digest": "sha1:AAA", "length": "1200", "offset": "0",
      "filename": "crawl-00.warc.gz"}),
    # re-crawl of the same url, later capture, different location
    ("org,example)/a", "20240116093000",
     {"url": "http://example.org/a", "status": "200", "mime": "text/html",
      "digest": "sha1:AAB", "length": "1300", "offset": "900",
      "filename": "crawl-01.warc.gz"}),
    ("org,example)/b", "20240115093100",
     {"url": "http://example.org/b", "status": "404", "mime": "text/html",
      "digest": "sha1:BBB", "length": "300", "offset": "1200",
      "filename": "crawl-00.warc.gz"}),
    ("com,site)/c", "20240115094500",
     {"url": "http://site.com/c", "status": "200", "mime": "application/pdf",
      "digest": "sha1:CCC", "length": "9000", "offset": "1500",
      "filename": "crawl-00.warc.gz"}),
    ("com,site)/d", "20240115095000",
     {"url": "http://site.com/d", "status": "200", "mime": "text/html",
      "digest": "sha1:DDD", "length": "800", "offset": "10500",
      "filename": "crawl-00.warc.gz"}),
]


def _write(tmp_path):
    d = str(tmp_path / "cdx")
    C.write_cdx(ROWS, d)
    # comments and blank lines must be ignored
    with open(f"{d}/part-000.cdx", "a") as f:
        f.write("\n# a CDX header comment\n")
    return d


def test_cdx_parse_semantics(spark, tmp_path):
    df = C.read_cdx(spark, _write(tmp_path)).orderBy("capture_ts", "url")
    rows = df.collect()
    assert len(rows) == len(ROWS)
    r = [x for x in rows if x.url == "http://example.org/a"][0]
    assert r.surt == "org,example)/a"
    assert str(r.capture_ts) == "2024-01-15 09:30:00"
    assert r.status == 200 and r.mime == "text/html"
    assert r.warc_record_len == 1200 and r.warc_offset == 0
    assert r.warc_file == "crawl-00.warc.gz"


def test_cdx_plan_is_pure_jvm(spark, tmp_path):
    df = C.read_cdx(spark, _write(tmp_path)).where(F.col("status") == 200)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # "*(n)" prefixes are whole-stage-codegen stages in the string form
    assert "*(" in plan
    # the comment/blank prefilter reaches the text scan as pushed filters
    assert "StringStartsWith(value,#)" in plan


def test_cdx_stream_matches_batch(spark, tmp_path):
    d = _write(tmp_path)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        C.read_cdx_stream(spark, d)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {tuple(r) for r in C.read_cdx(spark, d).collect()}
    assert got == want and len(got) == len(ROWS)


def test_fetch_plan_latest_capture_and_offset_order(spark, tmp_path):
    plan = C.fetch_plan(C.read_cdx(spark, _write(tmp_path)))
    rows = plan.collect()
    # 404 and non-html rows excluded; /a deduped to the LATEST capture
    assert {r.url for r in rows} == {"http://example.org/a", "http://site.com/d"}
    a = [r for r in rows if r.url.endswith("/a")][0]
    assert a.warc_file == "crawl-01.warc.gz" and a.warc_offset == 900
    # physically grouped per warc file, ascending offsets inside each task
    for part in plan.rdd.glom().collect():
        by_file = {}
        for r in part:
            by_file.setdefault(r.warc_file, []).append(r.warc_offset)
        for offs in by_file.values():
            assert offs == sorted(offs)
