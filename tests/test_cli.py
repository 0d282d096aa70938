"""CLI surface test: the reference-flag entry point end-to-end."""

import os

from fasta_windows_spark.sources import pages as P
from fasta_windows_spark.sink_tsv import stats_header


def test_cli_default_mode_with_ctw_and_desc(tmp_path, spark):
    src = str(tmp_path / "pages")
    pdf = P.gen_pages(n_pages=12, n_hosts=3, min_len=20, max_len=60, seed=42)
    P.write_pages_parquet(pdf, src, n_files=1)

    from fasta_windows_spark import cli

    out_dir = str(tmp_path / "fw_out")
    # reuse the test session (cli.get_spark -> getOrCreate picks it up)
    rc = cli.main(
        ["-f", src, "-o", "t", "-w", "16", "-c", "-d", "--out-dir", out_dir]
    )
    assert rc == 0
    stats = open(os.path.join(out_dir, "t_freq_windows.tsv")).read().splitlines()
    assert stats[0] == stats_header(description=True, ctw=True)
    assert len(stats) > 1 and "No description." in stats[1]
    for f in ("mononuc", "dinuc", "trinuc", "tetranuc"):
        assert os.path.exists(os.path.join(out_dir, f"t_{f}_windows.tsv"))

    rc = cli.main(["-f", src, "-o", "t", "-w", "16", "-e", "--out-dir", out_dir])
    assert rc == 0
    bed = open(os.path.join(out_dir, "t_entropy.bed")).read().splitlines()
    assert len(bed) > 1 and len(bed[0].split("\t")) == 5


def test_cli_streaming_mode(tmp_path, spark):
    src = str(tmp_path / "pages")
    # ~25 min event-time span so 10-minute append windows actually close
    pdf = P.gen_pages(n_pages=600, n_hosts=4, min_len=50, max_len=120, seed=7)
    P.write_pages_parquet(pdf, src, n_files=2)

    from fasta_windows_spark import cli

    out_dir = str(tmp_path / "fw_out")
    rc = cli.main(["-f", src, "-o", "s", "--streaming", "--out-dir", out_dir])
    assert rc == 0
    got = spark.read.parquet(os.path.join(out_dir, "s_host_windows"))
    assert got.count() > 0
    assert {"host", "n_pages", "total_chars"} <= set(got.columns)
