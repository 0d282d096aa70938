"""CDX(J) crawl-index source: the Common-Crawl / Internet-Archive index
format — one line per capture: `<searchable-url> <timestamp14> <JSON>`
(the "CDXJ" variant; e.g. `org,example)/page 20240115093000 {"url":
"http://example.org/page", "status": "200", "mime": "text/html", ...}`).

Why the engine reads it: at web scale you don't list WARC files to decide
what to fetch/process — you query the INDEX (which url-host, when, what
mime/status, where inside which WARC member the payload sits) and push
those predicates down before any payload byte moves. This reader turns a
CDX dump into that queryable table.

All parsing is JVM expressions — `split` on the first two spaces,
`from_json` with an EXPLICIT schema (never inference), `to_timestamp` on
the 14-digit stamp — so a CDX scan is whole-stage codegen with column
pruning and predicate pushdown intact (the json struct prunes to the
fields referenced). Splittable: plain text splits by newline; .gz falls
back to per-file tasks, same trade as JSONL.

The SURT (Sort-friendly URI Reordering Transform) key in field 1 is kept:
it is the crawl-native clustering key (host-reversed, so one host's
captures are contiguous) — exactly what you bucket/sort by when writing
the index to a lakehouse table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

CDX_JSON_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("languages", T.StringType()),
    ]
)


def _parse_lines(df: DataFrame, value_col: str = "value") -> DataFrame:
    v = F.col(value_col)
    surt = F.substring_index(v, " ", 1)
    ts14 = F.element_at(F.split(v, " ", 3), 2)
    js = F.element_at(F.split(v, " ", 3), 3)
    rec = F.from_json(js, CDX_JSON_SCHEMA)
    return (
        df.where(v.isNotNull() & (F.length(v) > 0) & ~v.startswith("#"))
        .select(
            surt.alias("surt"),
            F.to_timestamp(ts14, "yyyyMMddHHmmss").alias("capture_ts"),
            rec.alias("r"),
        )
        .select(
            "surt",
            "capture_ts",
            F.col("r.url").alias("url"),
            F.col("r.status").cast("int").alias("status"),
            F.col("r.mime").alias("mime"),
            F.col("r.digest").alias("digest"),
            F.col("r.length").cast("long").alias("warc_record_len"),
            F.col("r.offset").cast("long").alias("warc_offset"),
            F.col("r.filename").alias("warc_file"),
            F.col("r.languages").alias("languages"),
        )
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """(surt, capture_ts, url, status, mime, digest, warc_record_len,
    warc_offset, warc_file, languages) — one row per capture."""
    return _parse_lines(spark.read.text(path))


def read_cdx_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return _parse_lines(r.text(path))


def fetch_plan(cdx: DataFrame, statuses=(200,), mimes=("text/html",)) -> DataFrame:
    """The index-driven fetch list: which WARC byte ranges to read, grouped
    per WARC file in offset order (the sequential-read plan a 100 TB fetch
    stage wants) — latest capture per URL only (crawl dumps carry
    re-crawls; the digest dedups identical payloads first)."""
    latest = (
        cdx.where(
            F.col("status").isin(*statuses) & F.col("mime").isin(*mimes)
        )
        .groupBy("url")
        .agg(F.max(F.struct("capture_ts", "warc_file", "warc_offset",
                            "warc_record_len", "digest")).alias("m"))
        .select(
            "url",
            F.col("m.capture_ts").alias("capture_ts"),
            F.col("m.warc_file").alias("warc_file"),
            F.col("m.warc_offset").alias("warc_offset"),
            F.col("m.warc_record_len").alias("warc_record_len"),
            F.col("m.digest").alias("digest"),
        )
    )
    return latest.repartition("warc_file").sortWithinPartitions(
        "warc_file", "warc_offset"
    )


def write_cdx(rows, path: str, n_files: int = 2) -> None:
    """Test helper: dump (surt, ts14, dict) rows as sharded CDX files."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    per = max(1, (len(rows) + n_files - 1) // n_files)
    for i in range(0, len(rows), per):
        with open(os.path.join(path, f"part-{i // per:03d}.cdx"), "w") as f:
            for surt, ts14, rec in rows[i : i + per]:
                f.write(f"{surt} {ts14} {json.dumps(rec)}\n")
