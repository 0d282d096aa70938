"""Suite-wide plan invariants: sweep EVERY contract query's physical plan
(not just the individually plan-tested ones) so a future query with a
quadratic join or a row-at-a-time Python UDF fails here even without a
dedicated test."""

from fasta_windows_spark import contract
from fasta_windows_spark.plans.audit import audit_all
from tests.conftest import SF_DIR


def test_no_cartesian_product_and_no_row_python_anywhere(spark):
    rows = audit_all(spark, SF_DIR)
    assert len(rows) == len(contract.queries())
    cartesian = [n for n, c in rows.items() if c["cartesian"]]
    row_py = [n for n, c in rows.items() if c["row_py"]]
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    assert not row_py, f"row-at-a-time BatchEvalPython in: {row_py}"


def test_python_boundaries_are_vectorized_and_rare(spark):
    """Python appears only via Arrow-vectorized boundaries, and only in
    the operators whose work is inherently Python-shaped (the window
    kernel, codecs, BLAS top-k, PCA partials, zlib ratio)."""
    rows = audit_all(spark, SF_DIR)
    with_py = {n for n, c in rows.items() if c["arrow_py"]}
    allowed_prefixes = ("doc_windows_", "docs_media_", "docs_frame_")
    allowed_exact = {
        "emb_knn_topk",
        "emb_pca_project",
        "docs_compression_ratio",
        "doc_source_ngram_agg",
        # BPE encode runs over the DISTINCT pre-token set only (vocabulary-
        # sized, not corpus-sized) — tests/test_bpe.py pins that the Arrow
        # boundary sits above the dedup aggregate
        "docs_bpe_token_counts",
        "docs_bpe_pack_sequences",
        "docs_bpe_vocab",
        # tokenizer fertility composes the same vocabulary-only BPE encode
        "docs_tokenizer_fertility",
        # SemDeDup's in-cell pair scan is a per-cell exact integer GEMM
        # (applyInPandas, the PCA-Gramian precedent) — measured ~10x over
        # the interpreted zip_with/DECIMAL self-join it replaced; the
        # semantic clean-corpus composition inherits the same boundary
        "emb_semdedup",
        "docs_clean_corpus_semantic",
        # the provenance audit composes semdedup too (same GEMM boundary)
        "docs_drop_provenance",
    }
    unexpected = {
        n
        for n in with_py
        if not n.startswith(allowed_prefixes) and n not in allowed_exact
    }
    assert not unexpected, f"unexpected Python boundary in: {unexpected}"
