#!/usr/bin/env python
"""Regenerate the committed CTW depth-6 golden fixture.

Computes per-window CTW (depth 6) over the sf0.001 driver corpus with the
INDEPENDENT scalar implementation `ctw_bits_per_base` — the direct port of
the reference's sequential coder (kmeru8.rs:170-319) — using plain byte
slicing for the window geometry (no shared windowing code). The committed
JSON is what `tests/test_ctw_golden.py` holds the vectorized lockstep
kernel and the driver-visible `doc_windows_ctw` query to: the depth-6
mixture gets a corpus-scale differential check even though it is not
ANSI-SQL-expressible (`no_oracle` at the driver).

Usage: python tests/gen_ctw6_fixture.py  (~30 s; only needed if the corpus
or the window size W changes — the fixture is deterministic.)
"""

import json
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fasta_windows_spark.kernels import ctw_bits_per_base  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
W = 100  # contract.py window size for the documents table
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                   "ctw6_sf0001.json")


def main() -> None:
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
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
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"sf_dir": SF_DIR, "window": W, "max_depth": 6,
                   "n_windows": len(rows), "rows": rows}, f)
    print(f"wrote {OUT}: {len(rows)} windows")


if __name__ == "__main__":
    main()
