"""Multimodal codec layer: REAL BMP/WAV header parsers against hand-written
byte fixtures, encoder/parser round-trips, and the JVM-expression frame
sampler vs an independent Python reference."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from fasta_windows_spark.multimodal.decode import (
    FEATURE_DIM,
    _decode_bmp,
    _decode_payload,
    _decode_wav,
    decode_media,
    docs_as_bmp_media,
    encode_bmp,
    sample_frames,
)

# The canonical 2x2 24-bit BMP example (bottom row: red, white; top row:
# blue, green), byte-for-byte — NOT produced by encode_bmp, so a shared
# encoder/parser bug cannot cancel out.
BMP_2X2 = bytes.fromhex(
    "424d460000000000000036000000280000000200000002000000010018000000"
    "00001000000013000000130000000000000000000000"
    "0000ff" "ffffff" "0000"   # bottom row + 2 pad bytes
    "ff0000" "00ff00" "0000"   # top row + 2 pad bytes
)

# Minimal PCM WAV: stereo, 16-bit, 4 data bytes (one frame), canonical
# 44-byte header laid out by hand.
WAV_PCM = (
    b"RIFF" + (36 + 4).to_bytes(4, "little") + b"WAVE"
    + b"fmt " + (16).to_bytes(4, "little")
    + (1).to_bytes(2, "little")        # PCM
    + (2).to_bytes(2, "little")        # channels
    + (8000).to_bytes(4, "little")     # sample rate
    + (32000).to_bytes(4, "little")    # byte rate
    + (4).to_bytes(2, "little")        # block align
    + (16).to_bytes(2, "little")       # bits per sample
    + b"data" + (4).to_bytes(4, "little")
    + bytes([10, 20, 10, 30])
)


def _hist(data: bytes) -> np.ndarray:
    h = np.bincount(
        np.frombuffer(data, np.uint8) % FEATURE_DIM, minlength=FEATURE_DIM
    ).astype(np.float32)
    return h / h.sum() if h.sum() else h


def test_decode_bmp_canonical_example():
    w, h, feats = _decode_bmp(BMP_2X2)
    assert (w, h) == (2, 2)
    np.testing.assert_array_equal(feats, _hist(BMP_2X2[54:]))


def test_decode_bmp_rejects_garbage_and_compressed():
    with pytest.raises(ValueError):
        _decode_bmp(b"PNG is not BMP" * 10)
    compressed = bytearray(BMP_2X2)
    compressed[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError):
        _decode_bmp(bytes(compressed))
    with pytest.raises(ValueError):
        _decode_bmp(BMP_2X2[:-4])  # truncated pixel array


def test_encode_decode_bmp_roundtrip():
    for w, hh, data in [(1, 1, b"x"), (5, 3, b"hello world" * 9),
                        (31, 7, bytes(range(256)) * 4), (4, 2, b"")]:
        payload = encode_bmp(w, hh, data)
        gw, gh, feats = _decode_bmp(payload)
        assert (gw, gh) == (w, hh)
        stride = (3 * w + 3) // 4 * 4
        assert len(payload) == 54 + stride * hh
        np.testing.assert_array_equal(feats, _hist(payload[54:]))


def test_decode_bmp_topdown_negative_height():
    payload = bytearray(encode_bmp(3, 2, b"abcdefgh" * 3))
    payload[22:26] = (-2).to_bytes(4, "little", signed=True)
    w, h, _ = _decode_bmp(bytes(payload))
    assert (w, h) == (3, 2)  # reported absolute


def test_decode_wav_pcm():
    w, h, feats = _decode_wav(WAV_PCM)
    assert (w, h) == (2, 16)  # channels, bits per sample
    np.testing.assert_array_equal(feats, _hist(bytes([10, 20, 10, 30])))


def test_decode_wav_rejects_non_pcm():
    mutated = bytearray(WAV_PCM)
    mutated[20] = 3  # IEEE float format tag
    with pytest.raises(NotImplementedError):
        _decode_wav(bytes(mutated))
    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxJUNK" + bytes(40))


def test_decode_payload_dispatch():
    assert _decode_payload(BMP_2X2, "image/bmp")[:2] == (2, 2)
    assert _decode_payload(WAV_PCM, "audio/wav")[:2] == (2, 16)
    with pytest.raises(NotImplementedError):
        _decode_payload(b"x", "video/mp4")


def test_spark_bmp_pipeline_parses_real_headers(spark):
    """docs_as_bmp_media -> decode_media over Spark: dims must come back
    out of the header bytes and match the synthesis rule per row."""
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 5, 40], "text": ["ACGT" * 10, "", "x" * 31, "y" * 95]}
    )
    docs = spark.createDataFrame(pdf)
    got = (
        decode_media(docs_as_bmp_media(docs))
        .select("doc_id", "width", "height", "byte_len")
        .orderBy("doc_id")
        .collect()
    )
    for row in got:
        text = pdf.set_index("doc_id")["text"][row["doc_id"]]
        w, hh = 1 + len(text) % 31, 1 + row["doc_id"] % 7
        assert (row["width"], row["height"]) == (w, hh)
        assert row["byte_len"] == 54 + (3 * w + 3) // 4 * 4 * hh


def test_sample_frames_matches_python_reference(spark):
    """The JVM sequence/substring/md5 plan must reproduce the per-row
    Python reference (the pre-vectorization semantics) exactly, including
    empty text, exact-multiple lengths, and a short tail frame."""
    texts = ["A" * 1024, "C" * 1000, "", "G" * 256, "T" * 2600, "AC" * 700]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    expected = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        n_frames = (len(text) + 255) // 256
        for i in range(0, n_frames, 4):
            frame = text[i * 256 : (i + 1) * 256]
            expected.append(
                (doc_id, i, len(frame), hashlib.md5(frame.encode()).hexdigest())
            )
    got = sorted(
        tuple(r)
        for r in sample_frames(spark.createDataFrame(pdf)).collect()
    )
    assert got == sorted(expected)


def test_decode_png_handbuilt_canonical():
    """A PNG assembled by hand from the spec (NOT via encode_png, so a
    shared encoder/decoder bug can't cancel): 2x2 RGB, row 0 filtered
    with Sub, row 1 with Up — both computed manually."""
    import struct
    import zlib

    from fasta_windows_spark.multimodal.decode import _png_pixels

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    row0 = bytes([10, 20, 30, 40, 50, 60])
    row1 = bytes([11, 22, 33, 44, 55, 66])
    # Sub on row0: first pixel verbatim, second minus first
    f0 = bytes([1]) + bytes([10, 20, 30, 30, 30, 30])
    # Up on row1: minus row0 bytewise
    f1 = bytes([2]) + bytes([(row1[i] - row0[i]) & 0xFF for i in range(6)])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(f0 + f1))
        + chunk(b"IEND", b"")
    )
    assert _png_pixels(png) == (2, 2, 3, row0 + row1)


def test_encode_decode_png_roundtrip_all_filters_and_channels():
    from fasta_windows_spark.multimodal.decode import _png_pixels, encode_png

    for channels in (1, 3, 4):
        for ft in range(5):
            w, h = 7, 4
            px = bytes((i * 37 + ft) % 256 for i in range(w * h * channels))
            got = _png_pixels(encode_png(w, h, px, channels=channels, filter_type=ft))
            assert got == (w, h, channels, px), (channels, ft)


def test_decode_png_rejects_unsupported_profiles():
    import pytest as _pytest

    from fasta_windows_spark.multimodal.decode import _png_pixels, encode_png

    with _pytest.raises(ValueError):
        _png_pixels(b"not a png at all....")
    png = bytearray(encode_png(2, 2, bytes(12)))
    png[8 + 8 + 8] = 16  # bit depth byte inside IHDR
    with _pytest.raises(NotImplementedError):
        _png_pixels(bytes(png))
    png = bytearray(encode_png(2, 2, bytes(12)))
    png[8 + 8 + 12] = 1  # interlace byte
    with _pytest.raises(NotImplementedError):
        _png_pixels(bytes(png))


def test_spark_png_pipeline_parses_real_headers(spark):
    """End-to-end: text -> real PNG payloads -> mapInPandas decode; dims
    must come back out of actual IHDR bytes after zlib inflate + filter
    reversal (every doc uses a different filter type via doc_id % 5)."""
    from fasta_windows_spark.multimodal.decode import (
        decode_media,
        docs_as_png_media,
    )

    docs = spark.createDataFrame(
        [(i, "word " * (i + 1)) for i in range(10)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decode_media(docs_as_png_media(docs)).collect()}
    for i in range(10):
        n = len(("word " * (i + 1)).encode())
        assert out[i]["width"] == 1 + n % 29
        assert out[i]["height"] == 1 + i % 5
