"""docs_drop_provenance branch coverage: the fixture corpus has no exact
duplicates (verified via md5 groups at both scales), so the exact_dup
branch and the first-match precedence are pinned here on a synthetic
corpus written as parquet (the query reads documents + embeddings from
sf_dir)."""

import random

from fasta_windows_spark.contract import QUERIES

GOOD = "the apple banana cat dog egg fish goat hat ice jam kite lamp"


def test_drop_provenance_branches_and_precedence(spark, tmp_path):
    rng = random.Random(11)

    def vec(seed):
        r = random.Random(seed)
        return [r.uniform(-1, 1) for _ in range(64)]

    rows = []
    # doc 0: holdout (0 % 37 == 0) — holdout wins over everything
    rows.append((0, "holdout unique words zebra quince umbrella viola"))
    # doc 1: quality fail (too few tokens)
    rows.append((1, "short text"))
    # docs 2,3: exact duplicates (3 loses); both pass quality
    dup = GOOD + " number one"
    rows.append((2, dup))
    rows.append((3, dup))
    # docs 4..11: distinct good docs
    for i in range(4, 12):
        rows.append((i, GOOD + f" tail{i} marker{i} salt{rng.randint(0, 9)}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # embeddings: docs 4 and 5 identical -> 5 is the semantic dup (keep-
    # first); doc 3 ALSO gets doc 2's embedding so exact_dup must win the
    # precedence over semantic_dup for it
    emb = spark.createDataFrame(
        [
            (i, vec(2 if i == 3 else (4 if i == 5 else i)))
            for i, _ in rows
        ],
        "vec_id long, embedding array<double>",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    emb.write.parquet(f"{tmp_path}/embeddings.parquet")

    got = {
        r.doc_id: r.stage
        for r in QUERIES["docs_drop_provenance"](spark, str(tmp_path)).collect()
    }
    assert got[0] == "holdout"
    assert got[1] == "quality"
    assert got[2] == "kept"
    assert got[3] == "exact_dup"  # precedence: beats semantic_dup
    assert got[4] == "kept"
    assert got[5] == "semantic_dup"
    assert all(got[i] == "kept" for i in range(6, 12))
