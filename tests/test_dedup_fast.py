"""Property tests for the xxhash64 MinHash throughput twin (no DuckDB
oracle possible — Spark-specific hash), and its banding behavior."""

import pandas as pd
import pyspark.sql.functions as F

from fasta_windows_spark.operators.dedup import (
    minhash_band_pairs,
    minhash_signatures,
    minhash_signatures_fast,
)

SIG_COLS = [f"sig_{i}" for i in range(8)]


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_fast_signatures_deterministic_and_dup_invariant(spark):
    base = "the quick brown fox jumps over the lazy dog " * 30
    docs = _docs(spark, [base, base, base + " tail changed a little bit here"])
    sigs = (
        minhash_signatures_fast(docs)
        .orderBy("doc_id")
        .select("doc_id", *SIG_COLS)
        .collect()
    )
    # exact duplicates => identical signatures
    assert [r[c] for r in sigs[:1] for c in SIG_COLS] == [
        sigs[1][c] for c in SIG_COLS
    ]
    # near-duplicate agrees on most permutations (shared shingle minima)
    agree = sum(sigs[0][c] == sigs[2][c] for c in SIG_COLS)
    assert agree >= 6, agree
    # a second run is bit-identical (xxhash64 is seeded deterministically)
    again = (
        minhash_signatures_fast(docs)
        .orderBy("doc_id")
        .select("doc_id", *SIG_COLS)
        .collect()
    )
    assert [tuple(r) for r in sigs] == [tuple(r) for r in again]


def test_fast_banding_finds_planted_near_dups(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(500)]
    uniques = [
        " ".join(rng.choice(words, size=200)) for _ in range(20)
    ]
    planted = uniques[5] + " one extra suffix token"
    docs = _docs(spark, uniques + [planted])  # doc 20 ~ doc 5
    pairs = minhash_band_pairs(minhash_signatures_fast(docs)).collect()
    assert (5, 20) in {(r["doc_a"], r["doc_b"]) for r in pairs}


def test_fast_and_md5_band_pairs_agree_on_clear_dups(spark):
    base = "alpha beta gamma delta epsilon zeta " * 40
    docs = _docs(spark, [base, base, "totally different content here " * 40])
    fast = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_band_pairs(minhash_signatures_fast(docs)).collect()
    }
    md5 = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_band_pairs(minhash_signatures(docs)).collect()
    }
    assert (0, 1) in fast and (0, 1) in md5
    assert (0, 2) not in fast and (0, 2) not in md5


def test_token_chunks_reconstruct_stream(spark):
    """Chunks of 128 tokens / 16 overlap must tile the token stream: chunk i
    starts at 112*i, lengths are full except the tail, and stripping the
    16-token overlap from chunks 1..n reconstructs the doc's tokens."""
    import hashlib

    import numpy as np

    from fasta_windows_spark.functions.text import token_chunks

    rng = np.random.default_rng(11)
    texts = [
        " ".join(f"t{rng.integers(0, 99)}" for _ in range(n))
        for n in (1, 15, 16, 17, 112, 128, 129, 240, 241, 1000)
    ]
    docs = _docs(spark, texts)
    out = (
        token_chunks(docs, chunk_tokens=128, overlap=16)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(texts)))
    for doc_id, rows in by_doc.items():
        toks = texts[doc_id].split(" ")
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        rebuilt = []
        for r in rows:
            assert r["tok_start"] == r["chunk_idx"] * 112
            chunk = toks[r["tok_start"] : r["tok_start"] + 128]
            assert r["n_chunk_tokens"] == len(chunk)
            assert r["chunk_md5"] == hashlib.md5(" ".join(chunk).encode()).hexdigest()
            rebuilt.extend(chunk if not rebuilt else chunk[16:])
        assert rebuilt == toks, doc_id


def test_widen_scan_adaptive(spark):
    from fasta_windows_spark.session import widen_scan

    target = spark.sparkContext.defaultParallelism
    tiny = spark.createDataFrame(pd.DataFrame({"x": range(10)}))
    narrow = tiny.coalesce(1)
    widened = widen_scan(narrow)
    assert widened.rdd.getNumPartitions() == target
    already = spark.range(0, 1000, 1, target + 4)
    assert widen_scan(already) is already  # no shuffle added when wide enough


def test_connected_components_chain_and_triangle(spark):
    """Pointer jumping must collapse a 64-node CHAIN (diameter 63 — the
    worst case for plain min-label propagation) within the default round
    budget, alongside a disjoint triangle and a singleton."""
    from fasta_windows_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(63)]          # 0-1-2-...-63
    tri = [(100, 101), (101, 102), (100, 102)]       # separate component
    pairs = spark.createDataFrame(
        pd.DataFrame(chain + tri, columns=["doc_a", "doc_b"])
    )
    nodes = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(64)) + [100, 101, 102, 999]})
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(pairs, nodes).collect()
    }
    assert all(got[i] == 0 for i in range(64)), "chain must collapse to 0"
    assert got[100] == got[101] == got[102] == 100
    assert got[999] == 999  # singleton stays its own component


def test_connected_components_raises_without_convergence(spark):
    """Refusing to return unconverged labels: with max_iter=1 a chain
    cannot reach its fixpoint and the operator must raise, not silently
    emit wrong components."""
    import pytest as _pytest

    from fasta_windows_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(20)], columns=["doc_a", "doc_b"])
    )
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(21))}))
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, nodes, max_iter=1)


def test_star_components_match_label_propagation(spark):
    """connected_components_star (alternating large-star/small-star,
    Kiveris et al. SoCC'14) must produce BIT-IDENTICAL labels to the
    min-label-propagation path on adversarial shapes: a 256-node chain
    (deep diameter), a triangle, a star already at its fixpoint, a
    randomized multi-component graph, and singletons."""
    import random

    from fasta_windows_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(255)]
    tri = [(300, 301), (301, 302), (300, 302)]
    star = [(400, v) for v in range(401, 410)]
    rng = random.Random(11)
    rand = [
        (500 + rng.randrange(40), 500 + rng.randrange(40)) for _ in range(70)
    ]
    rand = [(a, b) for a, b in rand if a != b]
    pairs = spark.createDataFrame(
        pd.DataFrame(chain + tri + star + rand, columns=["doc_a", "doc_b"])
    )
    all_ids = sorted(
        {x for e in chain + tri + star + rand for x in e} | {999}
    )
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": all_ids}))
    # the 256-chain needs ~log^2 rounds; 15 is far under propagation's 255
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components_star(pairs, nodes, max_iter=15).collect()
    }
    want = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(pairs, nodes).collect()
    }
    assert got == want
    assert all(got[i] == 0 for i in range(256))
    assert got[999] == 999


def test_star_components_raise_without_convergence(spark):
    """Same refusal policy as connected_components: max_iter=1 on a deep
    chain must raise, never return a half-contracted edge set as labels."""
    import pytest as _pytest

    from fasta_windows_spark.operators.dedup import connected_components_star

    pairs = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(40)], columns=["doc_a", "doc_b"])
    )
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(41))}))
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(pairs, nodes, max_iter=1)


def test_jaccard_hashed_shingles_equal_string_shingles(spark):
    """The xxhash64 shingle path must produce the IDENTICAL pair set and
    counts as the exact string path (collisions are ~2^-65-scale; any
    disagreement here is a logic bug, not a collision)."""
    from fasta_windows_spark.operators.dedup import rare_shingle_jaccard_pairs
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {
        tuple(r)
        for r in rare_shingle_jaccard_pairs(docs, hash_shingles=True).collect()
    }
    b = {
        tuple(r)
        for r in rare_shingle_jaccard_pairs(docs, hash_shingles=False).collect()
    }
    assert a == b and len(a) > 0


def test_cdc_chunks_tile_and_are_offset_invariant(spark):
    """CDC chunking invariants: chunks tile each document exactly, and a
    span shared by two documents at DIFFERENT offsets still produces
    identical interior chunks — the property fixed-stride shingling lacks
    (cut points depend only on local content)."""
    import hashlib
    import random

    from fasta_windows_spark.operators.dedup import cdc_chunks, duplicate_spans

    rng = random.Random(7)
    shared = "".join(rng.choice("abcdefgh ") for _ in range(600))
    pre_a = "".join(rng.choice("xyzuvw") for _ in range(137))   # misaligned
    pre_b = "".join(rng.choice("qrstmn") for _ in range(11))
    docs = spark.createDataFrame(
        [(1, pre_a + shared), (2, pre_b + shared)], "doc_id LONG, text STRING"
    )
    c = cdc_chunks(docs).toPandas()

    # tiling: per doc, starts are contiguous and lengths sum to len(text)
    for did, text in ((1, pre_a + shared), (2, pre_b + shared)):
        g = c[c.doc_id == did].sort_values("chunk_idx")
        assert g.start.iloc[0] == 0
        assert (g.start + g.chunk_len).iloc[-1] == len(text)
        assert (g.start.iloc[1:].to_numpy()
                == (g.start + g.chunk_len).iloc[:-1].to_numpy()).all()
        # hash really is the md5-56 prefix of the chunk text
        r = g.iloc[0]
        want = int(hashlib.md5(
            text[int(r.start):int(r.start + r.chunk_len)].encode()
        ).hexdigest()[:14], 16)
        assert int(r.h) == want

    # offset invariance: the two docs share interior chunks despite the
    # 137-vs-11 char prefix misalignment
    dup = duplicate_spans(docs).toPandas()
    assert (dup.n_docs == 2).all() and len(dup) >= 3
    # and the shared chunks cover most of the shared span
    covered = dup.chunk_len.sum()
    assert covered >= 0.6 * len(shared), (covered, len(shared))


def test_cdc_chunks_short_docs_yield_one_whole_text_chunk(spark):
    """Docs shorter than the gram window (ADVICE r3, medium): Spark's
    sequence(8, n-1) DESCENDS when n <= 8 — unguarded, it evaluated
    substring at zero/negative positions (counted from the string END),
    injecting out-of-order cut points and negative chunk_len rows. The
    guarded path must yield exactly one chunk = the whole text, matching
    DuckDB's empty range(8, n). Also pins the rewrite path end-to-end on
    a corpus mixing short and normal docs."""
    import hashlib

    from fasta_windows_spark.operators.dedup import (
        cdc_chunks,
        dedup_spans_keep_first,
    )

    rows = [
        (1, "a"),            # length 1
        (2, "abcdefg"),      # length 7 == window-1
        (3, "abcdefgh"),     # length 8 == window (n-1 = 7 < 8)
        (4, "abcdefghi"),    # length 9: one candidate position, may or may not cut
        (5, "xy" * 200),     # normal-length doc
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    c = cdc_chunks(docs).toPandas()

    assert (c.chunk_len > 0).all(), c
    assert (c.start >= 0).all(), c
    for did, text in rows:
        g = c[c.doc_id == did].sort_values("chunk_idx")
        assert g.start.iloc[0] == 0
        assert (g.start + g.chunk_len).iloc[-1] == len(text)
        if len(text) <= 8:
            assert len(g) == 1, (did, g)
            want = int(hashlib.md5(text.encode()).hexdigest()[:14], 16)
            assert int(g.h.iloc[0]) == want

    # the rewrite survives short docs: nothing duplicated here, so every
    # doc keeps all its chars and the cleaned md5 equals md5(text)
    r = dedup_spans_keep_first(docs).toPandas().set_index("doc_id")
    for did, text in rows:
        assert r.loc[did, "kept_chars"] == len(text)
        assert r.loc[did, "cleaned_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_bloom_bitmap_no_false_negatives_and_sane_fp_rate(spark):
    """Bloom contract: every inserted key probes true (no false
    negatives — the property the exactness argument rests on), and the
    false-positive rate at ~10 bits/key is small."""
    import pyspark.sql.functions as F

    from fasta_windows_spark.operators.dedup import (
        bloom_bitmap,
        bloom_might_contain,
    )

    n_bits = 1 << 14  # 16384 bits for 1000 keys ~ 16 bits/key
    keys = spark.range(1000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("shingle")
    )
    bm = bloom_bitmap(keys, "shingle", n_bits=n_bits, n_hashes=2)
    probe = spark.range(3000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("shingle")
    )
    hits = (
        probe.join(F.broadcast(bm))
        .where(bloom_might_contain("shingle", "bits", n_bits, 2))
        .select("shingle")
        .collect()
    )
    got = {r.shingle for r in hits}
    inserted = {f"key-{i}" for i in range(1000)}
    assert inserted <= got, "false negative — bloom is broken"
    fp = len(got - inserted) / 2000
    assert fp < 0.10, f"fp rate {fp}"


def test_bloom_decontaminate_equals_exact(spark):
    """End-to-end: the bloom-prefiltered operator returns EXACTLY the
    exact operator's rows (false positives removed by the confirm join)."""
    from fasta_windows_spark.operators.dedup import (
        decontaminate_overlap,
        decontaminate_overlap_bloom,
    )

    import random
    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    train = docs.where("doc_id % 5 != 0")
    hold = docs.where("doc_id % 5 = 0")
    exact = {
        tuple(r) for r in decontaminate_overlap(train, hold, shingle_words=3).collect()
    }
    bloom = {
        tuple(r)
        for r in decontaminate_overlap_bloom(
            train, hold, shingle_words=3, n_bits=1 << 12
        ).collect()
    }
    assert exact == bloom and len(exact) > 0


def test_containment_catches_subset_pairs_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted verbatim inside a
    much larger doc has full containment but tiny Jaccard."""
    from fasta_windows_spark.operators.dedup import (
        rare_shingle_containment_pairs,
        rare_shingle_jaccard_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(30))
    wrapper = quote + " " + " ".join(f"pad{i}" for i in range(400))
    others = [" ".join(f"o{d}x{i}" for i in range(40)) for d in range(3)]
    docs = _docs(spark, [quote, wrapper, *others])

    cont = rare_shingle_containment_pairs(docs, max_df=10, min_overlap=0.9)
    rows = {(r["doc_a"], r["doc_b"]): r for r in cont.collect()}
    assert set(rows) == {(0, 1)}
    r = rows[(0, 1)]
    # every shingle of the quote appears in the wrapper
    assert r["containment_a"] == 1.0
    assert r["overlap"] == 1.0
    assert r["containment_b"] < 0.1

    jac = rare_shingle_jaccard_pairs(docs, max_df=10, min_jaccard=0.4)
    assert jac.count() == 0  # symmetric Jaccard structurally misses it


def test_containment_partition_invariant(spark):
    from fasta_windows_spark.operators.dedup import rare_shingle_containment_pairs

    texts = [" ".join(f"w{(i * 7 + j) % 60}" for j in range(50)) for i in range(20)]
    docs = _docs(spark, texts)
    one = sorted(map(tuple, rare_shingle_containment_pairs(
        docs.coalesce(1), max_df=30, min_overlap=0.1).collect()))
    many = sorted(map(tuple, rare_shingle_containment_pairs(
        docs.repartition(11), max_df=30, min_overlap=0.1).collect()))
    assert one == many and len(one) > 0


def test_components_incremental_bridges_old_components(spark):
    """The hard incremental case: one new doc whose pairs bridge TWO
    previously-separate old components — the fold must relabel BOTH old
    clusters to the global min, exactly matching a from-scratch run."""
    from fasta_windows_spark.operators.dedup import (
        components_incremental,
        connected_components,
    )

    # old graph: {1,2} and {5,6} as separate components, 9 a singleton
    old_pairs = spark.createDataFrame(
        [(1, 2), (5, 6)], ["doc_a", "doc_b"]
    )
    old_nodes = spark.createDataFrame([(1,), (2,), (5,), (6,), (9,)], ["doc_id"])
    old_labels = connected_components(old_pairs, old_nodes)

    # increment: doc 10 pairs with 2 AND 5 (bridging), doc 20 isolated
    new_pairs = spark.createDataFrame([(10, 2), (10, 5)], ["doc_a", "doc_b"])
    new_nodes = spark.createDataFrame([(10,), (20,)], ["doc_id"])
    got = {
        r["doc_id"]: r["component_id"]
        for r in components_incremental(old_labels, new_pairs, new_nodes).collect()
    }

    full = connected_components(
        old_pairs.union(new_pairs), old_nodes.union(new_nodes)
    )
    want = {r["doc_id"]: r["component_id"] for r in full.collect()}
    assert got == want
    assert got[10] == got[1] == got[5] == 1  # bridged to the global min
    assert got[9] == 9 and got[20] == 20  # singletons untouched


def test_components_incremental_recrawled_doc_keeps_one_label(spark):
    """A doc present in BOTH old_labels and new_nodes (a re-crawl) must
    get exactly ONE label — its old rep — and its new edges must still
    fold in, matching a from-scratch run."""
    from fasta_windows_spark.operators.dedup import (
        components_incremental,
        connected_components,
    )

    old_pairs = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    old_nodes = spark.createDataFrame([(1,), (2,), (5,)], ["doc_id"])
    old_labels = connected_components(old_pairs, old_nodes)

    # doc 2 is re-crawled (appears in the increment) and now also pairs
    # with old singleton 5; doc 9 is genuinely new
    new_pairs = spark.createDataFrame([(2, 5)], ["doc_a", "doc_b"])
    new_nodes = spark.createDataFrame([(9,), (2,)], ["doc_id"])
    out = components_incremental(old_labels, new_pairs, new_nodes).collect()
    got = {}
    for r in out:
        assert r["doc_id"] not in got, f"duplicate label row for {r['doc_id']}"
        got[r["doc_id"]] = r["component_id"]

    full = connected_components(
        old_pairs.union(new_pairs), old_nodes.union(new_nodes)
    )
    want = {r["doc_id"]: r["component_id"] for r in full.collect()}
    assert got == want
    assert got[5] == 1  # folded through the re-crawled doc's old rep


def test_incremental_minhash_no_self_pairs_on_recrawl(spark):
    """A doc whose signature sits in both the increment and the index
    (a re-crawl) must not match ITSELF."""
    from fasta_windows_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signatures,
    )

    texts = ["alpha beta gamma delta epsilon zeta " * 5] * 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sigs = minhash_signatures(docs)
    out = incremental_minhash_pairs(sigs, sigs).collect()
    assert all(r["doc_new"] != r["doc_match"] for r in out)
    # orientation rule: a pair whose BOTH members are in the increment is
    # reported exactly ONCE, as the 'new' row (doc_new < doc_match) — no
    # mirrored 'index' duplicates
    assert [(r["doc_new"], r["doc_match"], r["match_src"]) for r in out] == [
        (0, 1, "new")
    ]


def test_incremental_minhash_changed_recrawl_keeps_index_pair(spark):
    """ADVICE r4 (dedup.py): if a re-crawled doc's content CHANGED between
    crawls, its new signature may band-match nothing while its indexed
    signature still matches another increment doc. Suppressing index
    matches by increment MEMBERSHIP would silently lose that real pair;
    the fix suppresses only pairs the new-vs-new join actually reproduces."""
    from fasta_windows_spark.operators.dedup import incremental_minhash_pairs

    cols = ["doc_id"] + [f"sig_{i}" for i in range(8)]
    # increment: doc 0 unchanged, doc 2 re-crawled with CHANGED content
    new_sigs = spark.createDataFrame(
        [
            (0, 1, 1, 1, 1, 9, 9, 9, 9),
            (2, 7, 7, 7, 7, 8, 8, 8, 8),  # new sig matches nothing
        ],
        cols,
    )
    # index: doc 2's OLD signature still band-matches doc 0 on band 0
    index_sigs = spark.createDataFrame(
        [
            (2, 1, 1, 1, 1, 3, 3, 3, 3),
            (5, 4, 4, 4, 4, 6, 6, 6, 6),  # unrelated index doc
        ],
        cols,
    )
    out = incremental_minhash_pairs(new_sigs, index_sigs).collect()
    got = {(r["doc_new"], r["doc_match"], r["match_src"]) for r in out}
    # the real near-dup pair (0, 2) survives, exactly once, least<greatest
    assert got == {(0, 2, "index")}


# ---------------------------------------------------------------------------
# eval_contamination: per-eval-doc dirty report (GPT-3 Appendix C direction)
# ---------------------------------------------------------------------------


def _py_eval_contamination(train_rows, hold_rows, k=3):
    def sh(text):
        toks = text.lower().split(" ")
        if len(toks) < k:
            return set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    tset = set()
    for _, t in train_rows:
        tset |= sh(t)
    out = {}
    for i, t in hold_rows:
        s = sh(t)
        if not s:
            continue
        shared = len(s & tset)
        out[i] = (len(s), shared, shared * 1000000 // len(s), int(shared > 0))
    return out


def test_eval_contamination_matches_python_reference(spark):
    from fasta_windows_spark.operators.dedup import eval_contamination

    train_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow"),
    ]
    hold_rows = [
        (100, "the quick brown fox sat still"),       # partially dirty
        (101, "entirely novel benchmark sentence here"),  # clean
        (102, "pack my box with five dozen liquor jugs"),  # fully dirty
        (103, "xy"),                                    # too short: excluded
    ]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    hold = spark.createDataFrame(hold_rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"], r["dirty_fp"], r["is_dirty"])
        for r in eval_contamination(train, hold).collect()
    }
    assert got == _py_eval_contamination(train_rows, hold_rows)
    assert got[102][3] == 1 and got[101][3] == 0


def test_eval_contamination_train_side_never_shuffles(spark):
    """The 100 TB invariant: the training shingle stream is filtered by a
    BROADCAST semi join in place — the only exchanges in the plan carry
    holdout-bounded rows (holdout shingles / contaminated survivors)."""
    from fasta_windows_spark.operators.dedup import eval_contamination
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    train = docs.where("doc_id % 37 <> 0")
    hold = docs.where("doc_id % 37 = 0")
    plan = (
        eval_contamination(train, hold)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
