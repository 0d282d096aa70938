#!/usr/bin/env python
"""Regenerate the committed CTW depth-6 golden fixtures.

Computes per-window CTW (depth 6) over the driver corpora with the
INDEPENDENT scalar implementation `ctw_bits_per_base` — the direct port of
the reference's sequential coder (kmeru8.rs:170-319) — using plain byte
slicing for the window geometry (no shared windowing code). The committed
JSONs are what `tests/test_ctw_golden.py` holds the vectorized lockstep
kernel and the driver-visible `doc_windows_ctw` query to: the depth-6
mixture gets a corpus-scale differential check even though it is not
ANSI-SQL-expressible (`no_oracle` at the driver). Two corpora are pinned:
sf0.001 (the smoke/entry corpus) and sf0.01 (the scale the driver's
CORRECTNESS harness actually runs).

Usage: python tests/gen_ctw6_fixture.py  (~30 s; only needed if a corpus
or the window size W changes — the fixtures are deterministic.)
"""

import json
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fasta_windows_spark.kernels import ctw_bits_per_base  # noqa: E402

W = 100  # contract.py window size for the documents table
FIX_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

CORPORA = {
    "/root/testdata/sf0.001": "ctw6_sf0001.json",
    "/root/testdata/sf0.01": "ctw6_sf001.json",
}


def main() -> None:
    os.makedirs(FIX_DIR, exist_ok=True)
    for sf_dir, fname in CORPORA.items():
        tbl = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        docs = sorted(
            zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()),
            key=lambda r: r[0],
        )
        rows = []
        for doc_id, text in docs:
            buf = (text or "").encode("utf-8")
            for start in range(0, len(buf), W):
                win = buf[start : start + W]
                rows.append([doc_id, start, ctw_bits_per_base(win, max_depth=6)])
        out = os.path.join(FIX_DIR, fname)
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "window": W, "max_depth": 6,
                       "n_windows": len(rows), "rows": rows}, f)
        print(f"wrote {out}: {len(rows)} windows")


if __name__ == "__main__":
    main()
