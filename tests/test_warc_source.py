"""WARC source tests: ISO 28500 record parsing (plain + per-record-member
gzip), HTTP envelope stripping, truncated-tail tolerance, JVM HTML->text
extraction, and crawl-container -> window-statistics end to end."""

import gzip
import os

import pyspark.sql.functions as F

from fasta_windows_spark.sources.warc import (
    html_text_column,
    iter_warc_records,
    read_warc,
    warc_to_pages,
    write_warc,
)

HTML = (
    b"<html><head><style>p{color:red}</style>"
    b"<script>var x=1;</script></head>"
    b"<body><h1>Title</h1><p>Hello &amp; welcome<br/>to the crawl</p></body></html>"
)
HTTP = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
    b"Content-Length: " + str(len(HTML)).encode() + b"\r\n\r\n" + HTML
)

RECORDS = [
    (
        {"WARC-Type": "warcinfo", "WARC-Date": "2023-11-15T14:00:00Z"},
        b"software: test-crawler/1.0\r\n",
    ),
    (
        {
            "WARC-Type": "request",
            "WARC-Target-URI": "https://example.org/a",
            "WARC-Date": "2023-11-15T14:42:47Z",
        },
        b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n",
    ),
    (
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "https://example.org/a",
            "WARC-Date": "2023-11-15T14:42:47Z",
            "Content-Type": "application/http; msgtype=response",
        },
        HTTP,
    ),
    (
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "https://example.org/b",
            "WARC-Date": "2023-11-15T14:43:00Z",
        },
        b"HTTP/1.1 404 Not Found\r\n\r\nmissing",
    ),
]


def _warc_bytes(compress=False):
    import io
    import tempfile

    with tempfile.NamedTemporaryFile(delete=False) as f:
        name = f.name
    write_warc(RECORDS, name, compress=compress)
    with open(name, "rb") as fh:
        data = fh.read()
    os.unlink(name)
    return data


def test_iter_warc_records_plain_and_gzip():
    for compress in (False, True):
        recs = list(iter_warc_records(_warc_bytes(compress)))
        assert [h["warc-type"] for h, _ in recs] == [
            "warcinfo",
            "request",
            "response",
            "response",
        ]
        assert recs[2][0]["warc-target-uri"] == "https://example.org/a"
        assert recs[2][1] == HTTP  # exact Content-Length payload slice


def test_iter_warc_records_truncated_tail_dropped():
    data = _warc_bytes()
    # cut into the final record's payload: it must be dropped, prior kept
    assert [h["warc-type"] for h, _ in iter_warc_records(data[:-5])] == [
        "warcinfo",
        "request",
        "response",
    ]


def test_read_warc_responses(spark, tmp_path):
    write_warc(RECORDS, str(tmp_path / "crawl-00000.warc"))
    write_warc(RECORDS, str(tmp_path / "crawl-00001.warc.gz"), compress=True)
    df = read_warc(spark, str(tmp_path)).orderBy("url", "warc_ts")
    rows = df.collect()
    assert len(rows) == 4  # 2 files x 2 response records; others filtered
    a = [r for r in rows if r.url == "https://example.org/a"][0]
    assert a.record_type == "response"
    assert a.http_status == 200
    assert bytes(a.html) == HTML  # HTTP envelope stripped
    assert a.payload_len == len(HTTP)
    assert a.warc_ts.isoformat() == "2023-11-15T14:42:47"
    b = [r for r in rows if r.url == "https://example.org/b"][0]
    assert b.http_status == 404 and bytes(b.html) == b"missing"


def test_html_text_column_is_jvm_only(spark):
    df = spark.createDataFrame([(HTML,)], "html binary").select(
        html_text_column(F.col("html")).alias("text")
    )
    assert df.collect()[0].text == "Title Hello & welcome to the crawl"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_warc_to_pages_feeds_window_stats(spark, tmp_path):
    from fasta_windows_spark.functions.udfs import window_stats

    body = b"<p>" + b"ACGT" * 600 + b"</p>"
    recs = [
        (
            {
                "WARC-Type": "response",
                "WARC-Target-URI": f"https://example.org/p{i}",
                "WARC-Date": "2023-11-15T14:42:47Z",
            },
            b"HTTP/1.1 200 OK\r\n\r\n" + body,
        )
        for i in range(3)
    ]
    write_warc(recs, str(tmp_path / "c.warc.gz"), compress=True)
    pages = warc_to_pages(read_warc(spark, str(tmp_path)))
    ws = window_stats(pages, window=1000, id_cols=["url"])
    out = ws.select("url", "w_start", "w_end", "gc_prop").collect()
    # 2400 chars/page -> windows [0,1000),[1000,2000),[2000,2400) x 3 pages
    assert len(out) == 9
    assert all(abs(r.gc_prop - 0.5) < 1e-9 for r in out)


def test_cli_reads_warc_by_extension(tmp_path, spark):
    import os

    from fasta_windows_spark import cli

    recs = [
        (
            {
                "WARC-Type": "response",
                "WARC-Target-URI": f"https://example.org/p{i}",
                "WARC-Date": "2023-11-15T14:42:47Z",
            },
            b"HTTP/1.1 200 OK\r\n\r\n<p>" + b"ACGT" * 16 + b"</p>",
        )
        for i in range(4)
    ]
    warc = str(tmp_path / "crawl.warc.gz")
    write_warc(recs, warc, compress=True)
    out_dir = str(tmp_path / "fw_out")
    rc = cli.main(["-f", warc, "-o", "w", "-w", "16", "--out-dir", out_dir])
    assert rc == 0
    stats = open(os.path.join(out_dir, "w_freq_windows.tsv")).read().splitlines()
    assert len(stats) == 1 + 4 * 4  # 64 chars/page -> 4 windows x 4 pages
    assert stats[1].startswith("https://example.org/p0\t")


def test_extract_host_edges_from_html(spark):
    from fasta_windows_spark.sources.warc import extract_host_edges

    pages = spark.createDataFrame(
        [
            (
                "https://a.example/page1",
                b'<a HREF="https://B.example/x">b</a> '
                b"<a href='http://c.example:8080/y?z=1'>c</a> "
                b'<a href=https://a.example/self>self</a> '
                b'<a href="/relative/skipped">rel</a>',
            ),
            (
                "http://c.example/page2",
                b'<link href="https://a.example/css"> <a href="https://b.example/dup">'
                b'</a><a href="https://b.example/dup2"></a>',
            ),
            ("https://d.example/nolinks", b"<p>plain</p>"),
        ],
        "url string, html binary",
    )
    got = {(r["src"], r["dst"]) for r in extract_host_edges(pages).collect()}
    assert got == {
        ("a.example", "b.example"),   # case-folded host, deduped
        ("a.example", "c.example"),  # port stripped: one host, one node
        ("c.example", "a.example"),
        ("c.example", "b.example"),
    }


def test_host_edges_feed_pagerank(spark):
    """The crawl-native composition: WARC pages -> host edges -> PageRank."""
    from fasta_windows_spark.operators.graph import pagerank
    from fasta_windows_spark.sources.warc import extract_host_edges

    pages = spark.createDataFrame(
        [
            (f"https://h{i}.example/p", f'<a href="https://hub.example/{i}">'.encode())
            for i in range(4)
        ],
        "url string, html binary",
    )
    ranks = {r["node"]: r["rank_fp"] for r in pagerank(extract_host_edges(pages)).collect()}
    assert ranks["hub.example"] == max(ranks.values())


def test_extract_anchor_pairs_jvm_only(spark):
    """Anchor (url, text) pairs from raw HTML: inner markup stripped from
    the anchor text, relative hrefs skipped, empty anchors preserved as
    '' — and the plan stays pure JVM (no Python boundary)."""
    from fasta_windows_spark.sources.warc import extract_anchor_pairs

    html = (
        b"<html><body>"
        b'<a href="https://a.example/x">Great <b>Search</b>  Engine</a>'
        b"<a class=z href='http://b.example/'>b site</a>"
        b'<a href="/relative">skip me</a>'
        b'<a href="https://c.example">   </a>'
        b"</body></html>"
    )
    df = spark.createDataFrame([(html,)], "html binary")
    out = df.select(extract_anchor_pairs(F.col("html")).alias("p"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    (pairs,) = out.collect()[0]
    assert [(r["url"], r["anchor"]) for r in pairs] == [
        ("https://a.example/x", "Great Search Engine"),
        ("http://b.example/", "b site"),
        ("https://c.example", ""),
    ]


def test_href_left_boundary_rejects_data_href(spark):
    """ADVICE r4: attributes that merely END in href (data-href=, xhref=)
    are not links — both the links column and the anchor pairs use a
    (?<![\\w-]) left boundary. A real href beside a data-href in the same
    element still extracts."""
    from fasta_windows_spark.sources.warc import (
        extract_anchor_pairs,
        extract_links_column,
    )

    html = (
        b'<a data-href="https://tracker.example/t">decoy</a>'
        b'<a xhref="https://typo.example/">decoy2</a>'
        b'<div data-href="https://widget.example/w"></div>'
        b'<a data-href="https://tracker.example/t2" href="https://real.example/p">ok</a>'
        b'<a HREF="https://caps.example/">caps</a>'
    )
    df = spark.createDataFrame([(html,)], "html binary")
    (links,) = df.select(extract_links_column(F.col("html")).alias("l")).collect()[0]
    assert links == ["https://real.example/p", "https://caps.example/"]
    (pairs,) = df.select(extract_anchor_pairs(F.col("html")).alias("p")).collect()[0]
    assert [(r["url"], r["anchor"]) for r in pairs] == [
        ("https://real.example/p", "ok"),
        ("https://caps.example/", "caps"),
    ]


def test_anchor_terms_topk_deterministic(spark):
    """Top-k anchor terms per host: count desc, term asc ties, rank
    bounded by topk, counts exact."""
    from fasta_windows_spark.operators.graph import anchor_terms

    rows = [
        ("h1", "best search engine"),
        ("h1", "search here"),
        ("h1", "best search"),
        ("h2", "news"),
        ("h2", ""),  # empty anchor contributes nothing
    ]
    df = spark.createDataFrame(rows, ["dst", "anchor"])
    got = [
        (r["host"], r["term"], r["n"], r["rank"])
        for r in anchor_terms(df, topk=2).orderBy("host", "rank").collect()
    ]
    assert got == [
        ("h1", "search", 3, 1),
        ("h1", "best", 2, 2),
        ("h2", "news", 1, 1),
    ]
