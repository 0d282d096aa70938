"""FASTA source tests: parse semantics (needletail/fw.rs record model) and
end-to-end window statistics over real FASTA input, incl. gzip."""

import gzip
import os

import pytest

from fasta_windows_spark.functions.udfs import window_stats
from fasta_windows_spark.kernels import page_window_stats
from fasta_windows_spark.sources.fasta import (
    fasta_as_documents,
    parse_fasta_text,
    read_fasta,
)

FASTA = """>chr1 Homo sapiens chromosome 1
ACGTacgtNNNN
acgtACGT
>chr2
GGGGCCCC
>empty_rec description only

>last no trailing newline
ACGT"""


def test_parse_fasta_text_records():
    df = parse_fasta_text(FASTA)
    assert list(df["seq_id"]) == ["chr1", "chr2", "empty_rec", "last"]
    assert list(df["description"]) == [
        "Homo sapiens chromosome 1",
        None,
        "description only",
        "no trailing newline",
    ]
    assert list(df["seq"]) == ["ACGTacgtNNNNacgtACGT", "GGGGCCCC", "", "ACGT"]


def test_parse_fasta_tab_delimited_header():
    """needletail splits the id at the FIRST whitespace of any kind
    (entropy.rs:109-113) — a tab-delimited header must not leak the tab
    into seq_id (ADVICE r2)."""
    df = parse_fasta_text(">id1\ttab description\there\nACGT\n")
    assert list(df["seq_id"]) == ["id1"]
    assert list(df["description"]) == ["tab description\there"]


def test_parse_fasta_crlf_and_errors():
    df = parse_fasta_text(">a r\r\nACGT\r\nACGT\r\n")
    assert list(df["seq"]) == ["ACGTACGT"]
    assert parse_fasta_text("").empty
    assert parse_fasta_text("   \n").empty
    with pytest.raises(ValueError):
        parse_fasta_text("ACGT\n>late header\nACGT\n")


def test_read_fasta_spark_plain_and_gzip(spark, tmp_path):
    plain = tmp_path / "a.fa"
    plain.write_text(FASTA)
    gz = tmp_path / "b.fa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(">gz1 zipped\nTTTTAAAA\nCCGG\n")
    got = {
        r["seq_id"]: (r["description"], r["seq"])
        for r in read_fasta(spark, str(tmp_path)).collect()
    }
    assert got["chr1"] == ("Homo sapiens chromosome 1", "ACGTacgtNNNNacgtACGT")
    assert got["gz1"] == ("zipped", "TTTTAAAACCGG")
    assert len(got) == 5


def test_fasta_window_stats_end_to_end(spark, tmp_path):
    # a reference-shaped run: FASTA in -> per-window stats out, verified
    # against the kernel applied directly to the parsed sequence
    seq = ("ACGTACGGTTCAacgtnN" * 40)[:700]
    (tmp_path / "g.fa").write_text(f">s1 d\n{seq[:300]}\n{seq[300:]}\n")
    docs = fasta_as_documents(spark, str(tmp_path / "g.fa"))
    ws = (
        window_stats(docs, id_cols=["doc_id"], window=100, f32=False)
        .orderBy("w_start")
        .collect()
    )
    expected = page_window_stats(seq, 100)
    assert len(ws) == len(expected) == 7
    for row, exp in zip(ws, expected):
        assert row["w_start"] == exp["start"] and row["w_end"] == exp["end"]
        assert row["gc_prop"] == pytest.approx(exp["gc_prop"], abs=1e-9)
        win = seq[exp["start"] : exp["end"]]
        assert row["cnt_a"] == win.count("A") + win.count("a")


def test_cli_reads_fasta(tmp_path, spark):
    (tmp_path / "in.fa").write_text(">s1 d\n" + "ACGT" * 50 + "\n")
    from fasta_windows_spark import cli

    out_dir = str(tmp_path / "fw_out")
    rc = cli.main(
        ["-f", str(tmp_path / "in.fa"), "-o", "f", "-w", "16", "--out-dir", out_dir]
    )
    assert rc == 0
    lines = open(os.path.join(out_dir, "f_freq_windows.tsv")).read().splitlines()
    assert len(lines) == 1 + 200 // 16 + 1  # header + ceil(200/16) windows
    assert lines[1].startswith("s1\t")


from hypothesis import given, settings
from hypothesis import strategies as st

_ids = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="._-"),
    min_size=1,
    max_size=12,
)
_descs = st.one_of(st.none(), st.text(alphabet="abc XYZ.", min_size=1, max_size=20))
_seqs = st.text(alphabet="ACGTNacgtnxy", min_size=0, max_size=300)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_ids, _descs, _seqs), min_size=1, max_size=8), st.integers(1, 80))
def test_parse_fasta_roundtrip_property(records, wrap):
    """Serialize arbitrary records (line-wrapped at any width) -> parse ->
    identical records. Pure-python parser property; no Spark session."""
    out = []
    for sid, desc, seq in records:
        header = f">{sid}" + (f" {desc.strip()}" if desc and desc.strip() else "")
        body = "\n".join(seq[i : i + wrap] for i in range(0, len(seq), wrap))
        out.append(header + ("\n" + body if body else ""))
    df = parse_fasta_text("\n".join(out) + "\n")
    assert list(df["seq_id"]) == [r[0] for r in records]
    expect_desc = [
        (d.strip() if d and d.strip() else None) for _, d, _ in records
    ]
    assert [x if x is not None else None for x in df["description"]] == expect_desc
    assert list(df["seq"]) == [r[2] for r in records]
