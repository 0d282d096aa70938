"""Fixed-point PageRank: exact agreement with an independent pure-Python
reference, partition invariance, and structural sanity."""

import pyspark.sql.functions as F

from fasta_windows_spark.operators.graph import SCALE, pagerank


def _py_pagerank(edges, iterations=3, scale=SCALE):
    """Dict-based reference using the same integer recurrence, written
    against the spec (not the Spark code): floor division throughout."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        insum = {v: 0 for v in nodes}
        for s, d in edges:
            insum[d] += r[s] // out[s]
        dang = sum(r[v] for v in nodes if v not in out)
        r = {
            v: (scale * 15) // (100 * n)
            + (85 * (insum[v] + dang // n)) // 100
            for v in nodes
        }
    return r


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "a"), ("e", "d"),
    # 'f' is dangling (in-edges only)
    ("a", "f"), ("b", "f"),
]


def test_pagerank_matches_python_reference_exactly(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank_fp"] for r in pagerank(df).collect()}
    assert got == _py_pagerank(EDGES)


def test_pagerank_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    a = {r["node"]: r["rank_fp"] for r in pagerank(df).collect()}
    b = {r["node"]: r["rank_fp"] for r in pagerank(df.repartition(7)).collect()}
    assert a == b


def test_pagerank_ring_is_uniform(spark):
    # a directed ring: perfect symmetry => every node gets the same rank,
    # and total mass stays within floor-loss of SCALE
    ring = [(f"n{i}", f"n{(i + 1) % 8}") for i in range(8)]
    df = spark.createDataFrame(ring, ["src", "dst"])
    ranks = [r["rank_fp"] for r in pagerank(df).collect()]
    assert len(set(ranks)) == 1
    total = sum(ranks)
    # each of 8 nodes loses < 2 units per floor op, 3 iterations
    assert SCALE - 200 < total <= SCALE


def test_pagerank_sink_outranks_source(spark):
    # every node points at 'hub' -> hub must hold the highest rank
    star = [(f"s{i}", "hub") for i in range(5)]
    df = spark.createDataFrame(star, ["src", "dst"])
    got = {r["node"]: r["rank_fp"] for r in pagerank(df).collect()}
    assert got["hub"] == max(got.values())
    assert got["hub"] > got["s0"]


def test_pagerank_long_iteration_chain_with_lineage_truncation(spark):
    """7 iterations crosses the localCheckpoint threshold; the result must
    still match the reference exactly (checkpointing must not change the
    arithmetic)."""
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, iterations=7).collect()}
    assert got == _py_pagerank(EDGES, iterations=7)


def test_pagerank_plan_depth_bounded(spark):
    """Lineage is truncated EVERY iteration (VERDICT r3 "wrong" #4), so the
    returned plan's size must be independent of iteration count — a
    20-iteration run must not compile a 20-deep unrolled plan."""
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    p2 = pagerank(df, iterations=2)._jdf.queryExecution().optimizedPlan().toString()
    p6 = pagerank(df, iterations=6)._jdf.queryExecution().optimizedPlan().toString()
    # both plans start from the final iteration's checkpoint: same depth
    assert len(p6.splitlines()) == len(p2.splitlines()), (len(p2), len(p6))
    assert len(p6.splitlines()) < 30, p6


def test_pagerank_releases_its_caches(spark):
    """nodes/outdeg are unpersisted before return (ADVICE r3): repeated
    invocations must not accumulate CacheManager entries. (localCheckpoint
    RDD blocks are a different lifecycle — the ContextCleaner reclaims
    them on GC, same as connected_components — so the check targets the
    CacheManager, where the leak was.)"""
    cm = spark._jsparkSession.sharedState().cacheManager()

    def n_cached():
        return cm.numCachedEntries()

    df = spark.createDataFrame(EDGES, ["src", "dst"])
    before = n_cached()
    pagerank(df, iterations=2).count()
    pagerank(df, iterations=2).count()
    after = n_cached()
    assert after <= before, (before, after)


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

from fasta_windows_spark.operators.graph import hits


def _py_hits(edges, iterations=3, scale=SCALE):
    """Dict-based reference using the same integer recurrence, written
    against the spec: exact sums, L1 normalization via (x*scale)//total
    (Python ints are arbitrary-precision, so no widening needed here)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    h = {v: scale // n for v in nodes}
    a = {}
    for _ in range(iterations):
        a_raw = {}
        for s, d in edges:
            if s in h:
                a_raw[d] = a_raw.get(d, 0) + h[s]
        ta = sum(a_raw.values())
        a = {v: (x * scale) // ta for v, x in a_raw.items()}
        h_raw = {}
        for s, d in edges:
            if d in a:
                h_raw[s] = h_raw.get(s, 0) + a[d]
        th = sum(h_raw.values())
        h = {v: (x * scale) // th for v, x in h_raw.items()}
    return {v: (h.get(v, 0), a.get(v, 0)) for v in nodes}


def test_hits_matches_python_reference_exactly(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: (r["hub_fp"], r["auth_fp"]) for r in hits(df).collect()}
    assert got == _py_hits(EDGES)


def test_hits_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    one = {r["node"]: (r["hub_fp"], r["auth_fp"])
           for r in hits(df.coalesce(1)).collect()}
    many = {r["node"]: (r["hub_fp"], r["auth_fp"])
            for r in hits(df.repartition(13)).collect()}
    assert one == many


def test_hits_star_hub_vs_authority(spark):
    # star: 'hub' points at 4 leaves; leaves point nowhere.
    edges = [("hub", f"x{i}") for i in range(4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: (r["hub_fp"], r["auth_fp"]) for r in hits(df).collect()}
    # the center is a pure hub (all hub mass, zero authority); the leaves
    # split the authority mass equally and have zero hub score.
    assert got["hub"][0] == SCALE and got["hub"][1] == 0
    for i in range(4):
        assert got[f"x{i}"][0] == 0 and got[f"x{i}"][1] == SCALE // 4


def test_hits_plan_depth_bounded(spark):
    """Lineage is truncated every half-iteration, so the compiled plan of
    the result must not grow with the iteration count."""
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    p2 = hits(df, iterations=2)._jdf.queryExecution().executedPlan().treeString()
    p6 = hits(df, iterations=6)._jdf.queryExecution().executedPlan().treeString()
    assert len(p6.splitlines()) == len(p2.splitlines())
    assert len(p6.splitlines()) < 30


def test_hits_releases_its_caches(spark):
    jsc = spark.sparkContext._jsc.sc()

    def n_cached():
        return jsc.getPersistentRDDs().size()

    df = spark.createDataFrame(EDGES, ["src", "dst"])
    before = n_cached()
    hits(df).collect()
    hits(df).collect()
    # localCheckpoint RDDs are expected to persist (they ARE the data);
    # the nodes cache must not accumulate across invocations.
    assert n_cached() <= before + 8


# ---------------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------------

import pytest

from fasta_windows_spark.operators.graph import personalized_pagerank


def _py_ppr(edges, seeds, iterations=3, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    S = [v for v in nodes if v in set(seeds)]
    sc = len(S)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: (scale // sc if v in S else 0) for v in nodes}
    for _ in range(iterations):
        insum = {v: 0 for v in nodes}
        for s, d in edges:
            insum[d] += r[s] // out[s]
        dang = sum(r[v] for v in nodes if v not in out)
        r = {
            v: ((scale * 15) // (100 * sc) if v in S else 0)
            + (85 * (insum[v] + (dang // sc if v in S else 0))) // 100
            for v in nodes
        }
    return r


def test_ppr_matches_python_reference_exactly(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("e",), ("zz-not-in-graph",)], ["node"])
    got = {r["node"]: r["rank_fp"] for r in personalized_pagerank(df, seeds).collect()}
    assert got == _py_ppr(EDGES, ["a", "e"])


def test_ppr_mass_stays_near_seeds(spark):
    # two disconnected components; seeding only one must leave the other at 0
    edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["rank_fp"] for r in personalized_pagerank(df, seeds).collect()}
    assert got["x"] == 0 and got["y"] == 0
    assert got["a"] > 0 and got["b"] > 0


def test_ppr_rejects_seedless_graph(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("nope",)], ["node"])
    with pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(df, seeds)


def test_ppr_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("d",)], ["node"])
    one = {r["node"]: r["rank_fp"]
           for r in personalized_pagerank(df.coalesce(1), seeds).collect()}
    many = {r["node"]: r["rank_fp"]
            for r in personalized_pagerank(df.repartition(13), seeds).collect()}
    assert one == many


def test_pagerank_respects_caller_cached_edges(spark):
    """A caller-persisted edge frame must survive a pagerank() call (the
    operator only owns — and only releases — caches it created itself),
    so a following hits() on the same frame still reads the cache."""
    from fasta_windows_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    ).cache()
    edges.count()
    assert edges.storageLevel.useMemory
    pagerank(edges, iterations=1).collect()
    assert edges.storageLevel.useMemory, "caller's cache was evicted"
    edges.unpersist()


# ---------------------------------------------------------------------------
# bfs_hops: multi-source BFS crawl depth
# ---------------------------------------------------------------------------

from fasta_windows_spark.operators.graph import bfs_hops


def _py_bfs(edges, seeds, max_hops=3):
    """Dict-based reference written against the spec: min hop from the
    seed set, seeds at 0 even when absent from the edge table."""
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, max_hops + 1):
        nxt = set()
        for s, d in edges:
            if s in frontier and d not in dist:
                dist[d] = hop
                nxt.add(d)
        frontier = nxt
        if not frontier:
            break
    return dist


def test_bfs_matches_python_reference_exactly(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("e",)], ["node"])
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds).collect()}
    assert got == _py_bfs(EDGES, ["a", "e"])


def test_bfs_partition_invariant(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    a = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds).collect()}
    b = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges.repartition(7), seeds).collect()
    }
    assert a == b == _py_bfs(EDGES, ["a"])


def test_bfs_seed_absent_from_graph_still_at_zero(spark):
    # the crawl-frontier convention: a curated seed is trusted before any
    # link points at it (and an isolated seed reaches nothing)
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("zz",)], ["node"])
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds).collect()}
    assert got == {"zz": 0}


def test_bfs_min_wins_over_longer_path(spark):
    # b is reachable from seed a at hop 1 and via c->a->b at hop 3; the
    # min() fold must keep 1 (monotone settling — the frontier-only
    # expansion's correctness condition)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 5).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


# ---------------------------------------------------------------------------
# label_propagation: synchronous LPA communities
# ---------------------------------------------------------------------------

from fasta_windows_spark.operators.graph import label_propagation


def _py_lpa(edges, iterations=3):
    """Reference written against the spec: synchronous rounds over the
    undirected neighbor multiset-of-labels, max count, ties to min label."""
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    nodes = sorted({a for a, _ in und})
    lab = {v: v for v in nodes}
    for _ in range(iterations):
        cnt = {}
        for a, b in und:
            key = (a, lab[b])
            cnt[key] = cnt.get(key, 0) + 1
        new = {}
        for v in nodes:
            cands = [(c, l) for (a, l), c in cnt.items() if a == v]
            mx = max(c for c, _ in cands)  # max count, ties to min label
            new[v] = min(l for c, l in cands if c == mx)
        lab = new
    return lab


def test_lpa_matches_python_reference_exactly(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["label"] for r in label_propagation(df).collect()}
    assert got == _py_lpa(EDGES)


def test_lpa_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    a = {r["node"]: r["label"] for r in label_propagation(df).collect()}
    b = {
        r["node"]: r["label"]
        for r in label_propagation(df.repartition(7)).collect()
    }
    assert a == b


def test_lpa_two_cliques_bridged_find_two_communities(spark):
    # two triangles joined by one bridge edge: LPA must keep them as two
    # communities (each labeled by its minimum member)
    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    bridge = [("c", "x")]
    df = spark.createDataFrame(tri1 + tri2 + bridge, ["src", "dst"])
    got = {r["node"]: r["label"] for r in label_propagation(df, 3).collect()}
    assert got == _py_lpa(tri1 + tri2 + bridge, 3)
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]  # the bridge does not merge the cliques


# --- triangle counting -------------------------------------------------------

def _py_triangles(edges):
    """Brute-force reference: undirected simple graph, count triangles per
    node and floor fixed-point clustering coefficient."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nodes = sorted({x for e in und for x in e})
    nbr = {v: set() for v in nodes}
    for a, b in und:
        nbr[a].add(b)
        nbr[b].add(a)
    out = {}
    for v in nodes:
        deg = len(nbr[v])
        tri = sum(
            1
            for x in nbr[v]
            for y in nbr[v]
            if x < y and (min(x, y), max(x, y)) in und
        )
        cc = (2 * tri * 10**6) // (deg * (deg - 1)) if deg >= 2 else 0
        out[v] = (deg, tri, cc)
    return out


TRI_EDGES = [
    # K4 on a..d (4 triangles), a pendant e off a, and a disjoint
    # path f-g (zero triangles); one duplicate + one reversed edge to
    # exercise canonicalization.
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    ("d", "c"), ("a", "b"), ("a", "e"), ("f", "g"),
]


def test_triangle_counts_match_python_reference(spark):
    from fasta_windows_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(TRI_EDGES, ["src", "dst"])
    got = {
        r["node"]: (r["deg"], r["tri"], r["cc_fp"])
        for r in triangle_counts(df).collect()
    }
    assert got == _py_triangles(TRI_EDGES)
    # spot values: every K4 member touches C(3,2)=3 triangles; 'a' has an
    # extra pendant so deg 4, cc = 2*3/(4*3) = 0.5
    assert got["a"] == (4, 3, 500000)
    assert got["b"] == (3, 3, 1000000)
    assert got["e"] == (1, 0, 0)
    assert got["f"] == (1, 0, 0)


def test_triangle_counts_partition_invariant(spark):
    from fasta_windows_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(TRI_EDGES, ["src", "dst"])
    a = sorted(map(tuple, triangle_counts(df).collect()))
    b = sorted(map(tuple, triangle_counts(df.repartition(7)).collect()))
    assert a == b


def test_triangle_counts_triangle_free_graph(spark):
    from fasta_windows_spark.operators.graph import triangle_counts

    # C4 (square): every node deg 2, zero triangles, cc 0
    sq = [("p", "q"), ("q", "r"), ("r", "s"), ("s", "p")]
    df = spark.createDataFrame(sq, ["src", "dst"])
    rows = triangle_counts(df).collect()
    assert all(r["tri"] == 0 and r["cc_fp"] == 0 and r["deg"] == 2 for r in rows)


# --- k-core peeling ----------------------------------------------------------

KCORE_EDGES = [
    # K4 core a..d, plus a chain e-f-g hanging off a: peeling k=2 removes
    # g, then f, then e (one per ROUND — the boundedness is observable),
    # leaving the K4 with induced degree 3 each.
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    ("a", "e"), ("e", "f"), ("f", "g"),
]


def test_kcore_peel_rounds_are_observable(spark):
    from fasta_windows_spark.operators.graph import kcore_peel

    df = spark.createDataFrame(KCORE_EDGES, ["src", "dst"])
    # after 1 round only g (deg 1) is gone; f survives round 1 with deg 2
    r1 = {r["node"]: r["deg"] for r in kcore_peel(df, k=2, rounds=1).collect()}
    assert "g" not in r1 and r1["f"] == 1
    # fixpoint needs 3 peels: chain gone, K4 remains at induced deg 3
    r3 = {r["node"]: r["deg"] for r in kcore_peel(df, k=2, rounds=3).collect()}
    assert r3 == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_peel_reaches_fixpoint_at_contract_rounds(spark):
    """The production convergence probe: at test scale the contract's round
    count reaches the true fixpoint (rounds vs rounds+1 identical)."""
    from fasta_windows_spark.contract import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _host_edges_sparse,
    )
    from fasta_windows_spark.operators.graph import kcore_peel
    from tests.conftest import SF_DIR

    edges = _host_edges_sparse(spark, SF_DIR).cache()
    a = sorted(map(tuple, kcore_peel(edges, _KCORE_K, _KCORE_ROUNDS).collect()))
    b = sorted(map(tuple, kcore_peel(edges, _KCORE_K, _KCORE_ROUNDS + 1).collect()))
    edges.unpersist()
    assert a == b and len(a) > 0


# --- redirect chain resolution ----------------------------------------------

def test_resolve_chains_hand_chain(spark):
    from fasta_windows_spark.operators.graph import resolve_chains

    # chain 16->8->4->2->1 plus a side redirect 9->4: every source lands
    # on terminal 1 resp. 1, with exact hop counts
    edges = [(16, 8), (8, 4), (4, 2), (2, 1), (9, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["src"]: (r["dst"], r["hops"]) for r in resolve_chains(df, 3).collect()}
    assert got == {16: (1, 4), 8: (1, 3), 4: (1, 2), 2: (1, 1), 9: (1, 3)}


def test_resolve_chains_doubling_coverage(spark):
    from fasta_windows_spark.operators.graph import resolve_chains

    # a length-8 chain resolves fully in ceil(log2(8)) = 3 rounds but NOT
    # in 2 (pointer doubling covers 2^rounds links) — pins that the round
    # bound is the documented one
    chain = [(i, i - 1) for i in range(8, 0, -1)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    full = {r["src"]: (r["dst"], r["hops"]) for r in resolve_chains(df, 3).collect()}
    assert full[8] == (0, 8)
    short = {r["src"]: (r["dst"], r["hops"]) for r in resolve_chains(df, 2).collect()}
    assert short[8] != (0, 8)  # 2 rounds only cover 4 links


def test_resolve_chains_partition_invariant(spark):
    from fasta_windows_spark.operators.graph import resolve_chains

    edges = [(i, i // 3) for i in range(3, 200)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(map(tuple, resolve_chains(df, 4).collect()))
    b = sorted(map(tuple, resolve_chains(df.repartition(13), 4).collect()))
    assert a == b
