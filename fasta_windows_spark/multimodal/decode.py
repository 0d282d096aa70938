"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a `media_type`
string. The Spark-side plumbing (schema, Arrow batch shape, partitioning,
UDF signatures) is real and tested. The codec layer behind
``_decode_payload`` is REAL for three dependency-free formats —
uncompressed BI_RGB BMP (``image/bmp``), PCM WAV (``audio/wav``), and
8-bit non-interlaced PNG (``image/png``: zlib inflate + full scanline
filter reversal, stdlib only) — and a deterministic fake for the
remaining types (``image/fake``/``audio/fake``/``text/plain``), since
this container has no lossy-codec libraries (JPEG/MP3 would need
PIL/ffmpeg and slot into the same dispatch).
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


def _hist_features(data: bytes) -> np.ndarray:
    """Normalized FEATURE_DIM-bin byte histogram — the feature extractor
    shared by every codec path (a real deployment would emit embedding-
    model features here instead)."""
    hist = np.bincount(
        np.frombuffer(data, dtype=np.uint8) % FEATURE_DIM, minlength=FEATURE_DIM
    ).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def _decode_bmp(payload: bytes):
    """REAL decoder for uncompressed BI_RGB BMP: BITMAPFILEHEADER (14 B,
    'BM' magic, pixel-array offset at byte 10) + BITMAPINFOHEADER (width/
    height int32-LE at 18/22, bpp uint16 at 28, compression uint32 at 30).
    Negative height = top-down row order (dims reported absolute).
    Features come from the actual pixel array bytes."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise NotImplementedError("only BI_RGB (uncompressed) BMP")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"unsupported BMP bit depth {bpp}")
    row_stride = (width * (bpp // 8) + 3) // 4 * 4
    n_pixel_bytes = row_stride * abs(height)
    if pixel_off + n_pixel_bytes > len(payload):
        raise ValueError("truncated BMP pixel array")
    pixels = payload[pixel_off : pixel_off + n_pixel_bytes]
    return width, abs(height), _hist_features(pixels)


def _decode_wav(payload: bytes):
    """REAL decoder for PCM WAV (RIFF/WAVE, canonical 'fmt ' chunk):
    audio_format uint16 at 20 (1 = PCM), channels at 22, sample rate
    uint32 at 24, bits-per-sample at 34. Dimension mapping for the image-
    shaped schema: width = n_channels, height = bits_per_sample. Features
    come from the data chunk's sample bytes."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    audio_format = int.from_bytes(payload[20:22], "little")
    if audio_format != 1:
        raise NotImplementedError("only PCM WAV")
    channels = int.from_bytes(payload[22:24], "little")
    bits = int.from_bytes(payload[34:36], "little")
    # walk chunks from byte 12 to find 'data' (canonical layout has it at
    # 36, but chunk-walking handles LIST/fact chunks too)
    pos, data = 12, b""
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    return channels, bits, _hist_features(data)


def _decode_payload(payload: bytes, media_type: str):
    """Codec dispatch. image/bmp and audio/wav run the REAL header parsers
    above; the fake types use a deterministic stand-in ('dimensions' from
    the payload hash, features = byte histogram). Raises on media types
    the pipeline doesn't know, like a real decoder would."""
    if media_type == "image/bmp":
        return _decode_bmp(payload)
    if media_type == "image/png":
        return _decode_png(payload)
    if media_type == "audio/wav":
        return _decode_wav(payload)
    if media_type not in ("image/fake", "audio/fake", "text/plain"):
        raise NotImplementedError(f"no codec for {media_type}")
    digest = hashlib.md5(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    return width, height, _hist_features(payload)


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


def encode_bmp(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Minimal REAL 24-bit BI_RGB BMP writer (row stride padded to 4 bytes;
    pixel_bytes zero-padded/truncated to width*height*3). Used by tests and
    the synthetic-corpus adapter below; `_decode_bmp` must invert it."""
    stride = (3 * width + 3) // 4 * 4
    need = width * height * 3
    px = (pixel_bytes + b"\x00" * need)[:need]
    rows = b"".join(
        px[y * width * 3 : (y + 1) * width * 3].ljust(stride, b"\x00")
        for y in range(height)
    )
    return (
        b"BM"
        + (54 + len(rows)).to_bytes(4, "little")  # file size
        + b"\x00\x00\x00\x00"                      # reserved
        + (54).to_bytes(4, "little")               # pixel array offset
        + (40).to_bytes(4, "little")               # BITMAPINFOHEADER size
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")                # planes
        + (24).to_bytes(2, "little")               # bpp
        + (0).to_bytes(4, "little")                # BI_RGB
        + len(rows).to_bytes(4, "little")          # image size
        + bytes(16)                                # ppm x/y, palette counts
        + rows
    )




_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA


def _png_pixels(payload: bytes):
    """REAL PNG reader core (ISO/IEC 15948): signature, chunk walk (IHDR/
    IDAT/IEND, CRC-carrying), zlib-inflate of the concatenated IDAT stream,
    and full reversal of all five scanline filters (None/Sub/Up/Average/
    Paeth). Supports 8-bit depth, color types 0/2/6, non-interlaced —
    i.e. the overwhelmingly common PNG shape; palette/16-bit/Adam7 raise
    like any codec on an unsupported profile. Returns (width, height,
    channels, raw_pixel_bytes)."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, width = 8, b"", None
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            depth, color_type, interlace = data[8], data[9], data[12]
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth}")
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type}")
            if interlace:
                raise NotImplementedError("Adam7 interlacing")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride, bpp = width * channels, channels
    if len(raw) != height * (1 + stride):
        raise ValueError("truncated PNG scanline data")
    out, prev = bytearray(), bytearray(stride)
    for y in range(height):
        base = y * (1 + stride)
        ftype = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += row
        prev = row
    return width, height, channels, bytes(out)


def _decode_png(payload: bytes):
    width, height, _channels, pixels = _png_pixels(payload)
    return width, height, _hist_features(pixels)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(
    width: int,
    height: int,
    pixel_bytes: bytes,
    channels: int = 3,
    filter_type: int = 0,
) -> bytes:
    """Minimal REAL PNG writer (8-bit gray/RGB/RGBA, non-interlaced):
    applies the requested scanline filter FORWARD on every row (so the
    decoder's filter reversal is exercised per type), deflates, and emits
    signature + IHDR/IDAT/IEND with real CRCs. `_png_pixels` must invert
    it bit-for-bit. pixel_bytes is zero-padded/truncated to fit."""
    import zlib

    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    need = stride * height
    px = (pixel_bytes + b"\x00" * need)[:need]
    raw, prev = bytearray(), bytearray(stride)
    for y in range(height):
        row = bytearray(px[y * stride : (y + 1) * stride])
        filt = bytearray(stride)
        for i in range(stride):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            elif filter_type == 4:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                raise ValueError(f"unknown PNG filter type {filter_type}")
            filt[i] = (row[i] - pred) & 0xFF
        raw += bytes([filter_type]) + filt
        prev = row
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def docs_as_png_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter: render each document's text bytes as a REAL RGB PNG whose
    dimensions are deterministic row functions — width = 1 + length(text)
    % 29, height = 1 + doc_id % 5 — so a SQL oracle predicts exactly what
    `_decode_png` must parse back out of IHDR after a real zlib inflate +
    filter reversal. (Unlike BMP, the container byte length is NOT
    SQL-predictable: it depends on deflate output.)"""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                data = (text or "").encode("utf-8")
                payloads.append(
                    encode_png(
                        1 + len(data) % 29,
                        1 + int(doc_id) % 5,
                        data,
                        channels=3,
                        filter_type=int(doc_id) % 5,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": payloads,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(compute, schema)



def docs_as_bmp_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter: render each document's text bytes as a REAL (tiny) BMP whose
    dimensions are deterministic functions of the row — width =
    1 + length(text) % 31, height = 1 + doc_id % 7 — so a SQL oracle can
    predict exactly what `_decode_bmp` must parse back out of the header
    bytes. The per-row Python here IS the codec (an encoder), the one place
    a row loop is warranted; the stage is narrow (no shuffle)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                data = (text or "").encode("utf-8")
                payloads.append(
                    encode_bmp(1 + len(data) % 31, 1 + int(doc_id) % 7, data)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/bmp",
                    "payload": payloads,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(compute, schema)


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

    Entirely JVM expressions (sequence -> explode -> substring -> md5):
    frame slicing is pure string arithmetic, so no Python row loop is
    warranted — unlike the codec-shaped decode stage. Narrow stage, no
    shuffle; whole-stage codegen end to end."""
    fc, ev = int(frame_chars), int(every)
    n_frames = F.ceil(F.length(text_col) / F.lit(float(fc))).cast("long")
    idxs = F.when(
        n_frames > 0,
        F.sequence(F.lit(0).cast("long"), n_frames - 1, F.lit(ev).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    frame = F.expr(f"substring({text_col}, cast(frame_idx * {fc} + 1 as int), {fc})")
    return docs.select(
        F.col("doc_id"), F.explode(idxs).alias("frame_idx"), F.col(text_col)
    ).select(
        "doc_id",
        "frame_idx",
        F.length(frame).cast("long").alias("frame_len"),
        F.md5(frame).alias("frame_md5"),
    )


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
