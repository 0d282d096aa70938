"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a `media_type`
string. The Spark-side plumbing (schema, Arrow batch shape, partitioning,
UDF signatures) is real and tested; the actual codec step is STUBBED —
this container has no image/audio libraries — behind ``_decode_payload``,
which produces a deterministic fake feature vector. Swapping in PIL/ffmpeg
changes only that function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType(), False)),
    ]
)


def _decode_payload(payload: bytes, media_type: str):
    """STUB codec. Real deployment: PIL.Image.open / soundfile / pyav here.

    Deterministic fake: 'dimensions' from the payload hash, 'features' =
    normalized byte histogram folded to FEATURE_DIM bins. Raises on media
    types the pipeline doesn't know, like a real decoder would."""
    if media_type not in ("image/fake", "audio/fake", "text/plain"):
        raise NotImplementedError(f"no codec for {media_type}")
    digest = hashlib.md5(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    hist = np.bincount(
        np.frombuffer(payload, dtype=np.uint8) % FEATURE_DIM, minlength=FEATURE_DIM
    ).astype(np.float32)
    total = hist.sum()
    feats = hist / total if total else hist
    return width, height, feats


def decode_media(df: DataFrame, payload_col: str = "payload", media_type_col: str = "media_type") -> DataFrame:
    """mapInPandas decode stage: one Arrow batch in, one feature frame out.
    Narrow (no shuffle); scales with input splits. Oversized payloads would
    be handled by lowering arrow.maxRecordsPerBatch, not by per-row calls."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "media_type", "byte_len", "payload_md5", "width", "height", "features")}
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf[media_type_col], pdf[payload_col]
            ):
                payload = bytes(payload) if payload is not None else b""
                w, h, feats = _decode_payload(payload, mt)
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["byte_len"].append(len(payload))
                out["payload_md5"].append(hashlib.md5(payload).hexdigest())
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.select("doc_id", media_type_col, payload_col).mapInPandas(
        compute, DECODED_SCHEMA
    )


def docs_as_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter: treat documents.text bytes as a fake media payload so the
    plumbing is exercised end-to-end on the driver tables."""
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    docs: DataFrame,
    text_col: str = "text",
    frame_chars: int = 256,
    every: int = 4,
) -> DataFrame:
    """Frame sampling plumbing (video analog): split each payload into
    fixed-size frames and keep every `every`-th (frame 0, every, 2*every…) —
    the 1-row-in / N-rows-out explode shape a real frame sampler has.
    Frames are CHARACTER slices so the md5 fingerprint is reproducible by
    the SQL oracle (md5 of a substring hashes its UTF-8 bytes identically
    in Spark and DuckDB); a byte-exact variant only changes the slicing.
    Narrow stage: mapInPandas, no shuffle."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "frame_len", "frame_md5")}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                text = text or ""
                n_frames = (len(text) + frame_chars - 1) // frame_chars
                for i in range(0, n_frames, every):
                    frame = text[i * frame_chars : (i + 1) * frame_chars]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(frame))
                    out["frame_md5"].append(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return docs.select("doc_id", text_col).mapInPandas(compute, FRAME_SCHEMA)


def resize_features(
    decoded: DataFrame, out_dim: int = 4, features_col: str = "features"
) -> DataFrame:
    """Feature 'resize' (image-resize analog on the feature axis): fold the
    FEATURE_DIM vector to `out_dim` bins by summing adjacent groups —
    entirely JVM-side higher-order functions (no Python), chained after the
    decode stage."""
    r = FEATURE_DIM // out_dim
    folded = F.expr(
        f"transform(sequence(0, {out_dim - 1}), j -> "
        f"aggregate(slice({features_col}, j*{r}+1, {r}), 0.0F, (a, x) -> a + x))"
    )
    return decoded.withColumn("features_resized", folded)


def media_meta(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pure-SQL metadata extraction over the binary payload (oracle-checkable
    part of the multimodal path: octet length, first byte, md5)."""
    return docs.select(
        "doc_id",
        F.octet_length(text_col).cast("long").alias("byte_len"),
        F.ascii(F.substring(text_col, 1, 1)).cast("long").alias("first_byte"),
        F.md5(text_col).alias("payload_md5"),
    )
