"""Line-level cleaning and mixture weights: reference behavior + invariants."""

import math

import pyspark.sql.functions as F

from fasta_windows_spark.functions.text import filter_lines
from fasta_windows_spark.operators.sampling import mixture_weights

DOCS = [
    # (doc_id, text) — newline-delimited lines
    (0, "one two three four five six\nshort line\nthe slow boilerplate line here now"),
    (1, "a b c d e\nf g h i j k l"),
    (2, "tiny"),
    (3, "slow a b c d e f"),  # blocklisted word in a long-enough line
]


def _py_filter(text, min_words=5, blocklist=("slow",)):
    lines = text.split("\n")
    kept = [
        ln
        for ln in lines
        if len(ln.split(" ")) >= min_words
        and not any(w in ln.split(" ") for w in blocklist)
    ]
    return len(lines), len(kept), "\n".join(kept)


def test_filter_lines_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept_lines"], r["clean_text"])
        for r in filter_lines(df, min_words=5, blocklist=("slow",)).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_filter(text), doc_id


def test_filter_lines_project_false_rewrites_in_place(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = filter_lines(df, min_words=5, blocklist=("slow",), project=False)
    row = {r["doc_id"]: r for r in out.collect()}[0]
    assert row["text"] == _py_filter(DOCS[0][1])[2]
    assert set(out.columns) == {"doc_id", "text", "n_lines", "n_kept_lines"}


def test_mixture_weights_sum_to_one_and_order(spark):
    rows = [(i, "w " * (10 * (s + 1)), f"src{s}") for i, s in enumerate([0, 0, 1, 2, 2, 2])]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in mixture_weights(df, by="source").collect()}
    total = sum(r["weight"] for r in out.values())
    assert math.isclose(total, 1.0, abs_tol=1e-8)
    # alpha=0.5 compresses the spread: the biggest source's weight share is
    # smaller than its token share
    toks = {s: r["n_tokens"] for s, r in out.items()}
    big = max(toks, key=toks.get)
    assert out[big]["weight"] < toks[big] / sum(toks.values())
    # but ordering is preserved
    ws = sorted(out.values(), key=lambda r: r["n_tokens"])
    assert [r["weight"] for r in ws] == sorted(r["weight"] for r in ws)


def test_rank_profile_classifier_recovers_correlated_labels(spark):
    """On a corpus where the label DOES determine the text's character
    distribution (unlike the synthetic tables), the Cavnar-Trenkle rank
    classifier must recover every label — the machinery test the
    label-uncorrelated contract corpus can't provide. Also pins the
    sub-n-length guard: a 2-char doc produces no grams and drops out."""
    from fasta_windows_spark.functions.text import (
        char_ngram_profiles,
        classify_rank_profile,
    )

    rows = []
    # three "languages" with disjoint trigram inventories
    texts = {"aa": "abc abd abe abf", "bb": "xyz xyw xyv xyu", "cc": "qrs qrt qru qrv"}
    for lang, base in texts.items():
        for i in range(4):
            rows.append((len(rows), base + " " + base[i:], lang))
    rows.append((len(rows), "zz", "aa"))  # 2 chars: below n=3, must vanish
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    prof = char_ngram_profiles(docs, n=3, top=16)
    out = {
        r["doc_id"]: r["pred_lang"]
        for r in classify_rank_profile(docs, prof, n=3, top=16).collect()
    }
    expected = {r[0]: r[2] for r in rows[:-1]}
    assert out == expected


def test_registrable_domain_psl_semantics(spark):
    """Pins the PSL rules on crafted hosts: longest match wins (the
    private-registry entry blogspot.com beats com), a bare suffix has no
    registrable domain, an unknown TLD matches nothing, and deep
    subdomains collapse to eTLD+1."""
    from fasta_windows_spark.functions.text import with_registrable_domain

    hosts = [
        ("x.co.uk", "co.uk", "x.co.uk"),
        ("blog.blogspot.com", "blogspot.com", "blog.blogspot.com"),
        ("com", "com", None),
        ("foo.internal", None, None),
        ("deep.a.b.example.com", "com", "example.com"),
        ("uk", "uk", None),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in hosts], ["host"])
    got = {
        r.host: (r.public_suffix, r.registrable_domain)
        for r in with_registrable_domain(df).collect()
    }
    assert got == {h: (s, reg) for h, s, reg in hosts}


def test_collocation_pmi_planted_phrase(spark):
    """A planted always-together bigram must out-PMI independent fillers,
    and the value must equal the hand-computed expression exactly."""
    import math

    from fasta_windows_spark.functions.text import collocation_pmi

    # 8 docs: 'new york' 8 times; fillers a..d shuffled independently
    texts = [f"new york a{i % 2} b{i % 3} c{i % 2} d{i % 3}" for i in range(8)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = {(r["w1"], r["w2"]): (r["c_xy"], r["pmi"])
           for r in collocation_pmi(df, min_count=4).collect()}
    assert ("new", "york") in out
    c_xy, pmi = out[("new", "york")]
    n = 8 * 6          # total tokens
    m = 8 * 5          # total bigrams
    expected = round(math.log2((float(c_xy) * n * n) / (float(m) * 8 * 8)), 6)
    assert c_xy == 8 and pmi == expected
    assert all(pmi >= v[1] for v in out.values())


def test_collocation_pmi_partition_invariant(spark):
    from fasta_windows_spark.functions.text import collocation_pmi

    texts = [" ".join(f"t{(i * 11 + j) % 17}" for j in range(30)) for i in range(40)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    one = sorted(map(tuple, collocation_pmi(df.coalesce(1), min_count=3).collect()))
    many = sorted(map(tuple, collocation_pmi(df.repartition(9), min_count=3).collect()))
    assert one == many and len(one) > 0


def test_remove_boilerplate_lines_site_scoped(spark):
    """A unit recurring on >= min_site_docs pages of ONE site vanishes
    from every page of that site (including the first); a 2-page repeat
    survives; the same unit on 3 pages of DIFFERENT sites survives (the
    df count is per-site, distinct-doc)."""
    from fasta_windows_spark.functions.text import remove_boilerplate_lines

    # line_words=2 -> units are consecutive word PAIRS at even offsets
    rows = [
        # site A: "nav menu" leads 3 docs -> boilerplate there
        (0, "A", "nav menu alpha beta"),
        (1, "A", "nav menu gamma delta"),
        (2, "A", "nav menu nav menu"),  # twice in one doc: counts ONCE for df
        (3, "A", "unique pair here too"),
        # site B: same unit on only ONE page -> survives (per-site scope)
        (4, "B", "nav menu epsilon zeta"),
        (5, "B", "other words entirely here"),
        # site C: a 2-doc repeat stays below min_site_docs=3
        (6, "C", "footer text one two"),
        (7, "C", "footer text three four"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["clean_text"])
        for r in remove_boilerplate_lines(
            df, line_words=2, min_site_docs=3
        ).collect()
    }
    assert got[0] == (2, 1, "alpha beta")
    assert got[1] == (2, 1, "gamma delta")
    assert got[2] == (2, 2, "")          # all units boilerplate -> empty
    assert got[3] == (2, 0, "unique pair here too")
    assert got[4] == (2, 0, "nav menu epsilon zeta")  # site B untouched
    assert got[5] == (2, 0, "other words entirely here")
    assert got[6] == (2, 0, "footer text one two")
    assert got[7] == (2, 0, "footer text three four")


def test_trigram_surprisal_matches_python(spark):
    """Lockstep differential for the trigram JM mixture on a tiny corpus,
    independent of Spark and SQL."""
    import math
    from collections import Counter

    from fasta_windows_spark.functions.text import trigram_surprisal

    texts = {
        1: "the cat sat on the mat",
        2: "the cat ran on the mat",
        3: "a dog sat on a log today",
        4: "xy zq",  # < 3 tokens: excluded
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_trigrams, r.bits_per_trigram)
        for r in trigram_surprisal(df).collect()
    }
    assert 4 not in got

    trips, by_doc = [], {}
    for did, tx in texts.items():
        t = tx.split(" ")
        if len(t) < 3:
            continue
        g = [(t[i - 2], t[i - 1], t[i]) for i in range(2, len(t))]
        by_doc[did] = g
        trips += g
    c3 = Counter(trips)
    cctx = Counter((a, b) for a, b, _ in trips)
    c2b = Counter((b, c) for _, b, c in trips)
    c1p = Counter(b for _, b, _ in trips)
    c1c = Counter(c for _, _, c in trips)
    T = len(trips)
    for did, g in by_doc.items():
        s = sum(
            math.log2(
                0.6 * (c3[x] / cctx[(x[0], x[1])])
                + 0.3 * (c2b[(x[1], x[2])] / c1p[x[1]])
                + 0.1 * (c1c[x[2]] / T)
            )
            for x in g
        )
        assert got[did][0] == len(g)
        assert abs(got[did][1] - round(-s / len(g), 6)) < 1e-9
    # repeated trigram context scores lower than the one-off: doc 1/2 share
    # 'on the mat' structure; all three docs must produce positive bits
    assert all(v[1] > 0 for v in got.values())


# --- Luhn card audit ---------------------------------------------------------


def _py_luhn(s):
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        total += d if i % 2 == 0 else (d * 2 - 9 if d > 4 else d * 2)
    return total % 10 == 0


def test_luhn_validator_matches_reference(spark):
    """The JVM fold agrees with a textbook Luhn implementation on valid
    and invalid PANs of odd and even length."""
    from fasta_windows_spark.functions.text import luhn_card_audit

    cards = [
        "4111111111111111",   # valid (16, even)
        "4242424242424242",   # valid
        "1234567812345678",   # invalid
        "5555555555554444",   # valid
        "4111111111111112",   # invalid (last digit off by one)
        "4222222222222",      # valid (13 digits, odd length)
        "4222222222223",      # invalid
    ]
    df = spark.createDataFrame(
        [(i, f"card {c} end") for i, c in enumerate(cards)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.luhn_valid for r in luhn_card_audit(df).collect()}
    assert got == {i: _py_luhn(c) for i, c in enumerate(cards)}
    assert sum(got.values()) == 4


def test_luhn_audit_masks_and_length_filters(spark):
    """Runs outside 13-19 digits are ignored; masked output keeps only the
    last 4 digits; multiple candidates per doc all surface."""
    from fasta_windows_spark.functions.text import luhn_card_audit

    df = spark.createDataFrame(
        [(1, "short 123456789012 ok 4111111111111111 and 4242424242424242 "
             "toolong 12345678901234567890")],
        "doc_id long, text string",
    )
    rows = luhn_card_audit(df).collect()
    assert [(r.masked, r.n_digits) for r in rows] == [
        ("************1111", 16),
        ("************4242", 16),
    ]
    assert all("4111" not in r.masked[:-4] for r in rows)


# --- vocabulary growth -------------------------------------------------------


def test_vocab_growth_hand_corpus(spark):
    from fasta_windows_spark.functions.text import vocab_growth

    df = spark.createDataFrame(
        [
            (0, "a b a"),
            (1, "b c"),
            (2, "c d e"),
            (3, "a"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.checkpoint: (r.n_docs, r.n_tokens, r.vocab)
        for r in vocab_growth(df, checkpoints=(1, 2, 3, 4)).collect()
    }
    assert rows == {
        1: (1, 3, 2),   # docs {0}: tokens a b a, vocab {a,b}
        2: (2, 5, 3),   # + doc 1: +2 tokens, vocab {a,b,c}
        3: (3, 8, 5),   # + doc 2: +3 tokens, vocab {a,b,c,d,e}
        4: (4, 9, 5),   # + doc 3: +1 token, no new vocab
    }


def test_vocab_growth_monotone_on_corpus(spark):
    from fasta_windows_spark.functions.text import vocab_growth
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = vocab_growth(docs).orderBy("checkpoint").collect()
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs <= b.n_docs
        assert a.n_tokens <= b.n_tokens
        assert a.vocab <= b.vocab
    assert rows[-1].n_docs == 500 and rows[-1].vocab > 0
