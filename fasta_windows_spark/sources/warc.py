"""WARC pages source: the native interchange format of web crawls
(ISO 28500; what Common Crawl actually ships), read without any external
WARC library.

A WARC file is a concatenation of records — CRLF-line headers
(``WARC/1.0``, ``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``,
``Content-Length``), a blank line, then exactly ``Content-Length`` payload
bytes. For ``response`` records the payload is a full HTTP response whose
body is the page HTML. ``.warc.gz`` stores EACH record as its own gzip
member, concatenated — which is why arbitrary byte-range splits are
impossible without a side index: the standard Spark shape (warcio-on-Spark
does the same) is one task per file, which is what
``spark.read.format("binaryFile")`` provides. Crawl archives ship as many
~1 GB files, so per-file tasks saturate a cluster; at 100 TB that is
~100k tasks, far above any executor count.

Parsing runs in ``mapInPandas`` (Arrow-batched; one Python crossing per
file, not per record). The output feeds ``warc_to_pages`` which maps to
the engine's pages schema (url, warc_ts, html, text, lang) with the text
extracted from HTML by ``html_text_column`` — pure JVM regexp chain, no
Python in that hot path.

Reference parity: the reference reads FASTA (needletail); WARC is the
equivalent "native corpus container" for the webtext axis of this graft.
"""

from __future__ import annotations

import gzip
from datetime import datetime
from typing import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("payload_len", T.LongType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def iter_warc_records(buf: bytes):
    """Yield (headers: dict[str,str], payload: bytes) per WARC record.

    Accepts plain or gzipped input (``gzip.decompress`` walks concatenated
    members, so per-record-member .warc.gz needs no special casing). A
    truncated trailing record (payload shorter than Content-Length) is
    dropped rather than raised — crawl tails are routinely cut mid-record.
    """
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    pos, n = 0, len(buf)
    while pos < n:
        while buf.startswith(b"\r\n", pos):
            pos += 2
        if not buf.startswith(b"WARC/", pos):
            break
        hdr_end = buf.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + len(_CRLF2)
        if body_start + clen > n:  # truncated tail
            break
        yield headers, buf[body_start : body_start + clen]
        pos = body_start + clen


def _parse_warc_date(s: str):
    # WARC-Date is ISO-8601 UTC ("2023-11-15T14:42:47Z"); pages timestamps
    # are naive-UTC (TIMESTAMP_NTZ parquet convention used repo-wide)
    try:
        return datetime.fromisoformat(s.rstrip("Z"))
    except ValueError:
        return None


def _split_http_response(payload: bytes):
    """(status:int|None, body:bytes) — strips the HTTP envelope when the
    payload is an HTTP response, else passes the payload through."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    he = payload.find(_CRLF2)
    if he < 0:
        return None, payload
    try:
        status = int(payload[:he].split(b"\r\n", 1)[0].split()[1])
    except (IndexError, ValueError):
        status = None
    return status, payload[he + len(_CRLF2) :]


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC records as a DataFrame (WARC_SCHEMA), one task per file."""
    import pandas as pd

    types = tuple(record_types)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for headers, payload in iter_warc_records(bytes(blob)):
                    rtype = headers.get("warc-type", "")
                    if types and rtype not in types:
                        continue
                    status, body = _split_http_response(payload)
                    rows.append(
                        (
                            headers.get("warc-target-uri"),
                            _parse_warc_date(headers.get("warc-date", "")),
                            rtype,
                            status,
                            body,
                            len(payload),
                        )
                    )
            yield pd.DataFrame(
                {
                    "url": pd.Series([r[0] for r in rows], dtype="object"),
                    "warc_ts": pd.Series([r[1] for r in rows], dtype="object"),
                    "record_type": pd.Series([r[2] for r in rows], dtype="object"),
                    "http_status": pd.Series([r[3] for r in rows], dtype="Int32"),
                    "html": pd.Series([r[4] for r in rows], dtype="object"),
                    "payload_len": pd.Series([r[5] for r in rows], dtype="Int64"),
                }
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(parse, WARC_SCHEMA)


def html_text_column(html_col) -> F.Column:
    """HTML -> text as a pure JVM regexp chain (no Python per row): drop
    script/style subtrees, strip tags, decode the common entities, collapse
    whitespace. Deliberately heuristic — a boilerplate extractor (trafilatura
    class) is a model/library concern; this is the scale-shaped plumbing."""
    s = F.decode(html_col, "UTF-8")
    s = F.regexp_replace(s, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
    ):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """Project parsed WARC responses onto the engine's pages schema so the
    whole existing pipeline (window kernels, dedup, streaming agg) runs on
    crawl data unchanged."""
    return warc_df.select(
        "url",
        "warc_ts",
        "html",
        html_text_column(F.col("html")).alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def extract_links_column(html_col) -> F.Column:
    """href targets out of raw HTML as a pure JVM expression: an
    array<string> of every absolute http(s) URL in href attributes
    (single-, double-, or un-quoted). Relative links are skipped — host
    attribution for them needs the base URL, which `extract_host_edges`
    supplies separately. The `(?<![\\w-])` left boundary keeps attributes
    that merely END in href (data-href=, xhref=) from counting as links
    (ADVICE r4). No Python per row."""
    s = F.decode(html_col, "UTF-8")
    return F.regexp_extract_all(
        s, F.lit(r'(?i)(?<![\w-])href\s*=\s*["\']?(https?://[^"\'\s>]+)'), F.lit(1)
    )


def extract_anchor_pairs(html_col) -> F.Column:
    """(url, anchor) pairs from raw HTML as a pure JVM expression: every
    absolute-href <a> element paired with its visible anchor text (inner
    tags stripped, whitespace collapsed). Anchor text is how the WEB
    describes a target page — the classic relevance/spam signal a crawl
    pipeline aggregates per target host (`operators/graph.anchor_terms`).
    No Python per row; nested/relative links are skipped like
    `extract_links_column`."""
    s = F.decode(html_col, "UTF-8")
    # (?<![\w-]) boundary: data-href= / xhref= are not anchor hrefs (ADVICE r4)
    whole = r'(?is)<a\b[^>]*(?<![\w-])href\s*=\s*["\']?(https?://[^"\'\s>]+)[^>]*>(.*?)</a\s*>'
    href = r'(?is)(?<![\w-])href\s*=\s*["\']?(https?://[^"\'\s>]+)'

    def pair(m):
        url = F.regexp_extract(m, href, 1)
        body = F.regexp_extract(m, r"(?is)>(.*)</a\s*>$", 1)
        anchor = F.trim(
            F.regexp_replace(
                F.regexp_replace(body, r"(?s)<[^>]*>", " "), r"\s+", " "
            )
        )
        return F.struct(url.alias("url"), anchor.alias("anchor"))

    return F.transform(
        F.regexp_extract_all(s, F.lit(whole), F.lit(0)), pair
    )


def extract_host_edges(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """(src_host, dst_host) edge list for the host link graph — the input
    `operators/graph.pagerank` ranks. src is the page's own host, dst the
    host of each absolute href (ports stripped: one host, one node);
    self-loops dropped, edges deduped (the
    graph is host-level, multiplicity is not rank-relevant in the
    PageRank model used).

    Scale shape: one narrow JVM pass (regexp extract + explode) then a
    distinct on (src, dst) — the only shuffle, map-side combined. At
    crawl scale the explode fan-out is bounded by links-per-page (~100),
    and the distinct collapses it to the much smaller host graph."""
    host = F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    links = pages.select(
        F.lower(host).alias("src"),
        F.explode(extract_links_column(F.col(html_col))).alias("link"),
    )
    dst = F.regexp_extract(F.col("link"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    return (
        links.select("src", F.lower(dst).alias("dst"))
        .where((F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .distinct()
    )


def write_warc(records, path: str, compress: bool = False) -> None:
    """Test helper: serialize (headers-dict, payload-bytes) pairs as a WARC
    file — per-record gzip members when compress=True (the .warc.gz layout).
    Not an export path; the engine's sinks are parquet/TSV."""
    out = b""
    for headers, payload in records:
        hdr_lines = [b"WARC/1.0"]
        hdr = dict(headers)
        hdr["Content-Length"] = str(len(payload))
        for k, v in hdr.items():
            hdr_lines.append(f"{k}: {v}".encode())
        rec = b"\r\n".join(hdr_lines) + _CRLF2 + payload + _CRLF2
        out += gzip.compress(rec) if compress else rec
    with open(path, "wb") as fh:
        fh.write(out)
