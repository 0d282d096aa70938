#!/usr/bin/env python
"""Regenerate the committed BPE merges table (functions/bpe_merges.txt).

Deterministic: trains on the sf0.001 documents table (doc_id order) with
lexicographic tie-breaks, so re-running reproduces the committed file
bit-for-bit (tests/test_bpe.py::test_committed_merges_reproducible pins
this). 40 merges — deliberately UNDER-trained on the toy corpus so typical
words encode to 2-5 subwords and the merge loop (and its recursive-CTE
oracle) is actually exercised; training to saturation (~89 merges) would
memorize every word as a single token and the counts would degenerate to
the pre-token counts.

Usage: python tests/gen_bpe_merges.py [sf_dir]
"""

import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from fasta_windows_spark.functions import bpe  # noqa: E402

N_MERGES = 40


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    texts = (
        duckdb.sql(
            f"select text from '{sf_dir}/documents.parquet' order by doc_id"
        )
        .df()["text"]
        .tolist()
    )
    merges = bpe.train_bpe(texts, n_merges=N_MERGES)
    bpe.save_merges(merges)
    print(f"wrote {len(merges)} merges to {bpe.MERGES_FILE}")


if __name__ == "__main__":
    main()
