"""FASTA source: read the reference's native input format into a DataFrame.

`read_fasta` turns FASTA files (plain or .gz — Spark decompresses by
codec) into rows of (seq_id, description, seq), the exact record model of
the reference reader (fw.rs:46-60 via needletail): id = header token up to
the first whitespace, description = the rest (None when absent), seq = all
sequence lines concatenated, case preserved (the kernels own case folding,
seq_statsu8.rs:50-58).

Distribution model: one task per FILE (`wholetext=true`), because FASTA
records span lines and a byte-split reader would need cross-split record
stitching. Web/genome corpora at scale arrive as many files (per-sample
.fa.gz, sharded exports), so file-level parallelism is the natural unit —
the same reason the reference processes one file per invocation. A single
monolithic multi-GB FASTA should be sharded first (standard practice);
gzip is per-file-decompressed either way. Parsing is vectorized pandas
string ops inside mapInPandas — no per-line Python loop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

FASTA_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("seq", T.StringType()),
    ]
)


def parse_fasta_text(text: str) -> pd.DataFrame:
    """Parse one FASTA file's full text into a (seq_id, description, seq)
    frame. Tolerates CRLF, blank lines, and a missing trailing newline;
    raises on content before the first header (malformed FASTA)."""
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    ids, descs, seqs = [], [], []
    first = True
    for rec in text.split("\n>"):
        if first:
            first = False
            if not rec.strip():
                continue
            if not rec.startswith(">"):
                raise ValueError("FASTA content before first '>' header")
            rec = rec[1:]
        nl = rec.find("\n")
        header, body = (rec, "") if nl < 0 else (rec[:nl], rec[nl + 1 :])
        header = header.strip()
        # id = token up to the FIRST whitespace of any kind (space or tab) —
        # needletail's rule (entropy.rs:109-113); a tab-delimited header
        # '>id\tdesc' must not keep the tab in seq_id.
        parts = header.split(None, 1)
        if len(parts) <= 1:
            ids.append(header)
            descs.append(None)
        else:
            ids.append(parts[0])
            descs.append(parts[1].strip() or None)
        seqs.append(body.replace("\n", ""))
    return pd.DataFrame({"seq_id": ids, "description": descs, "seq": seqs})


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """FASTA file(s)/glob -> DataFrame(seq_id, description, seq)."""
    files = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for text in pdf["value"]:
                out = parse_fasta_text(text or "")
                if len(out):
                    yield out

    return files.mapInPandas(parse, FASTA_SCHEMA)


def fasta_as_documents(spark: SparkSession, path: str) -> DataFrame:
    """Adapter to the engine's document model: (doc_id=seq_id, text=seq) —
    plug FASTA straight into window_stats / dedup / the TSV sinks."""
    return read_fasta(spark, path).selectExpr(
        "seq_id AS doc_id", "description", "seq AS text"
    )
