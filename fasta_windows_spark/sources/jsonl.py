"""JSONL pages source: newline-delimited JSON, the standard web-corpus
interchange format (Common-Crawl derivative dumps, WET-derived exports).

Reads into the engine's pages schema (url, warc_ts, html, text, lang) with
an EXPLICIT schema — never schema inference, which at 100 TB would scan the
data once just to guess types (and guess differently per day's dump). The
html field rides as a base64 string in JSON and is decoded to binary here;
timestamps are parsed from ISO-8601. Splittable: uncompressed JSONL splits
by newline (one task per 128 MB split); .gz falls back to per-file tasks.

`read_pages_jsonl_stream` is the same schema on readStream for the
streaming pipeline (file-source stand-in for the Kafka/Iceberg feed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html_b64", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _to_pages(df: DataFrame) -> DataFrame:
    # A missing html_b64 stays NULL in the html column — matching the
    # parquet pages schema, where an absent payload is NULL, not b"".
    return df.select(
        "url",
        "warc_ts",
        F.unbase64(F.col("html_b64")).alias("html"),
        "text",
        "lang",
    )


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return _to_pages(spark.read.schema(JSONL_SCHEMA).json(path))


def read_pages_jsonl_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(JSONL_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return _to_pages(r.json(path))


def write_pages_jsonl(pdf, path: str, n_files: int = 4) -> None:
    """Test helper: dump a pandas pages frame as sharded JSONL files."""
    import base64
    import json
    import os

    os.makedirs(path, exist_ok=True)
    rows = pdf.to_dict("records")
    per = max(1, -(-len(rows) // n_files))
    for f in range(n_files):
        part = rows[f * per : (f + 1) * per]
        if not part:
            break
        with open(os.path.join(path, f"part-{f:04d}.jsonl"), "w") as fh:
            for r in part:
                fh.write(
                    json.dumps(
                        {
                            "url": r["url"],
                            "warc_ts": r["warc_ts"].isoformat(),
                            "html_b64": (
                                base64.b64encode(r["html"]).decode()
                                if r.get("html") is not None
                                else None
                            ),
                            "text": r["text"],
                            "lang": r["lang"],
                        }
                    )
                    + "\n"
                )
