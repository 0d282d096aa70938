"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md).

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Everything is seeded (seed=42 convention); text is byte-identical per url
across regenerations (the per-row invariant). Text is ACGTN-alphabet (plus
lowercase blocks for masked-mode cases) so the reference's dense 4^k k-mer
semantics and the dynamic-key quirk coincide (SURVEY.md §7 quirk 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_EPOCH = 1_700_000_000  # 2023-11-14T22:13:20Z, fixed

# the reference's own unit-test strings, included verbatim as whole pages
REFERENCE_STRINGS = [
    "AACCTTGG",
    "AAaCCcTTtGGg",
    "ACGTACGTACGTGGGGCCCCAAAATTTTACGT",
    "ACACACACACACACACACACACACACACACAC",
    "ACGTNNNNACGTNNAC",
    "NNNNNNNN",
]

_ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _gen_text(rng: np.random.Generator, kind: str, n: int) -> str:
    if kind == "uniform":
        return rng.choice(_ALPHA, size=n).tobytes().decode()
    if kind == "homopolymer":
        return "A" * n
    if kind == "periodic2":
        return ("AC" * (n // 2 + 1))[:n]
    if kind == "periodic4":
        return ("ACGT" * (n // 4 + 1))[:n]
    if kind == "nruns":
        body = rng.choice(_ALPHA, size=n).tobytes().decode()
        out = []
        pos = 0
        while pos < n:
            take = int(rng.integers(4, 17))
            out.append(body[pos : pos + take])
            out.append("N" * int(rng.integers(1, 6)))
            pos += take
        return "".join(out)[:n]
    if kind == "mixedcase":
        s = rng.choice(_ALPHA, size=n).tobytes().decode()
        # lowercase every third base (masked-mode cases)
        return "".join(c.lower() if i % 3 == 2 else c for i, c in enumerate(s))
    raise ValueError(kind)


KINDS = ["uniform", "homopolymer", "periodic2", "periodic4", "nruns", "mixedcase"]


def gen_pages(
    n_pages: int = 2000,
    n_hosts: int = 50,
    n_hot_hosts: int = 2,
    min_len: int = 200,
    max_len: int = 2000,
    seed: int = 42,
    late_fraction: float = 0.02,
    out_of_order_fraction: float = 0.1,
) -> pd.DataFrame:
    """Seeded pages table. Hot hosts receive ~100x the pages of cold hosts
    (skew cases); a fraction of rows is out-of-order in warc_ts, some beyond
    a 10-minute watermark (late-data tests)."""
    rng = np.random.default_rng(seed)
    rows = []
    # host weights: hot hosts 100x
    weights = np.ones(n_hosts)
    weights[:n_hot_hosts] = 100.0
    weights /= weights.sum()

    ts = BASE_EPOCH
    for i in range(n_pages):
        h = int(rng.choice(n_hosts, p=weights))
        host = f"host{h:03d}.example"
        url = f"https://{host}/page{i:07d}"
        if i < len(REFERENCE_STRINGS):
            text = REFERENCE_STRINGS[i]
        else:
            kind = KINDS[int(rng.integers(0, len(KINDS)))]
            n = int(rng.integers(min_len, max_len))
            text = _gen_text(rng, kind, n)
        ts += int(rng.integers(1, 30))  # monotone base clock, seconds
        warc_ts = ts
        r = rng.random()
        if r < late_fraction:
            warc_ts = ts - int(rng.integers(660, 3600))  # beyond 10-min watermark
        elif r < late_fraction + out_of_order_fraction:
            warc_ts = ts - int(rng.integers(1, 300))  # within watermark
        rows.append(
            {
                "url": url,
                "warc_ts": warc_ts,
                "html": b"<html>" + text.encode() + b"</html>",
                "text": text,
                "lang": ["en", "de", "fr", "zz"][i % 4],
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], unit="s")
    return pdf


def gen_lang_detect(pages: pd.DataFrame, seed: int = 43) -> pd.DataFrame:
    """Late-arriving language-detection side stream keyed by host
    (FIXTURES.md §2): one detection per (host, coarse time bucket), offset
    by seeded lags, some beyond the join bound (dropped by the join)."""
    rng = np.random.default_rng(seed)
    hosts = pages["url"].str.extract(r"https://([^/]+)/")[0]
    base = pages[["warc_ts", "lang"]].copy()
    base["host"] = hosts
    base["bucket"] = base["warc_ts"].dt.floor("10min")
    g = base.groupby(["host", "bucket"], as_index=False).agg(
        lang=("lang", "first"), first_ts=("warc_ts", "min")
    )
    lag = rng.integers(-1800, 5400, size=len(g))  # some outside +/- join bound
    g["detect_ts"] = g["first_ts"] + pd.to_timedelta(lag, unit="s")
    g["confidence"] = rng.random(len(g)).round(6)
    return g[["host", "detect_ts", "lang", "confidence"]]


def write_pages_parquet(
    pdf: pd.DataFrame, out_dir: str, n_files: int = 8
) -> list[str]:
    """Write pages as n_files ordered parquet files (file-source micro-batch
    control for streaming tests: maxFilesPerTrigger=1 -> n_files batches)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    chunks = np.array_split(np.arange(len(pdf)), n_files)
    for i, idx in enumerate(chunks):
        p = os.path.join(out_dir, f"part-{i:04d}.parquet")
        pdf.iloc[idx].to_parquet(
            p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        paths.append(p)
    return paths


def spark_pages(spark, pdf: pd.DataFrame):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)
