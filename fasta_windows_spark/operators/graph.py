"""Host-graph centrality: fixed-point integer PageRank over a (src, dst)
edge DataFrame.

Why this exists: a web-scale curation pipeline weights/filters documents by
the authority of their host (seed-list expansion, spam demotion, crawl
prioritization). The reference engine has no graph operator; this is part of
the training-data-pipeline surface the build brief asks for, alongside the
connected-components used by dedup (operators/dedup.py:348).

Why INTEGER fixed-point: PageRank is iterated floating-point sums, and
float addition is order-dependent — a distributed sum and a single-node
oracle would drift by ulps that compound across iterations. All rank mass
here is carried as BIGINT in units of 1/SCALE, every division is integer
floor division, and every sum is exact — so Spark and any other engine
(the DuckDB oracle in contract.py) produce BIT-IDENTICAL ranks, hashable
by the driver with no rounding protocol.

Scale notes (10^12 pages => ~10^8 hosts, ~10^9 host-level edges):
- edges and out-degrees are computed once and cached; each iteration is
  one partial-aggregated shuffle on dst (sum of BIGINT shares — map-side
  combine applies) plus a broadcast of the 1-row dangling-mass aggregate.
  Nothing driver-side except the node count (a scalar).
- rank updates join nodes->insum on the same key each round; on a
  bucketed lakehouse the edge table's dst-bucketing makes the per-round
  shuffle a local exchange.
- each iteration ends in an eager localCheckpoint, so plan depth is one
  iteration body regardless of the iteration count (a production run
  writes each round's ranks to a table for exactly the same reason); the
  per-iteration plan shape (broadcast dangling scalar, partial-aggregated
  insum) is pinned by tests against `pagerank_step`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SCALE = 10**12


def pagerank_step(
    nodes: DataFrame,
    edges: DataFrame,
    outdeg: DataFrame,
    ranks: DataFrame,
    n: int,
    teleport: int,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """One un-truncated PageRank iteration — the plan `pagerank` compiles
    per round before cutting lineage. Exposed separately so plan-shape
    tests can assert the iteration's physical strategy (1-row dangling
    aggregate combined via broadcast, rank sums partial-aggregated)
    without unrolling the whole loop."""
    shares = (
        ranks.join(outdeg, F.col("node") == F.col("od_node"), "inner")
        .select(F.col("node").alias("s"), F.expr("r div deg").alias("share"))
    )
    insum = (
        edges.join(shares, F.col("src") == F.col("s"), "inner")
        .groupBy(F.col("dst").alias("m_node"))
        .agg(F.sum("share").alias("insum"))
    )
    dangling = (
        ranks.join(outdeg, F.col("node") == F.col("od_node"), "left_anti")
        .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
    )
    return (
        nodes.join(insum, F.col("node") == F.col("m_node"), "left")
        .crossJoin(F.broadcast(dangling))
        .select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"({damping_num} * (coalesce(insum, 0)"
                    f" + (dang div {n}))) div {damping_den}"
                )
            ).cast("long").alias("r"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-point PageRank. `edges` must be distinct (src, dst) string
    pairs without self-loops. Returns (node, rank_fp) where rank_fp is the
    rank scaled by `scale` and floored — exact integer arithmetic
    throughout, so results are engine- and partitioning-independent.

    Update rule (all integer ops, `div` = floor division on positives):
      share(v)   = r(v) div outdeg(v)
      insum(u)   = sum over edges (v,u) of share(v)
      dangling   = sum of r(v) over nodes with no out-edges
      r'(u)      = (scale*(den-num)) div (den*N)
                   + (num * (insum(u) + dangling div N)) div den
    """
    # pin the edge table for the loop's scope: every iteration (and the
    # nodes/outdeg builds) re-joins it, and an uncached `edges` would
    # re-run its whole lineage — scan, derivation, DISTINCT shuffle —
    # once per round (the docstring's "computed once" contract). Only
    # take ownership when the CALLER hasn't persisted it: unpersisting a
    # caller-cached frame would evict their cache out from under a later
    # hits(edges)/pagerank(edges) call on the same frame.
    _own_edges = not (
        edges.storageLevel.useMemory or edges.storageLevel.useDisk
    )
    if _own_edges:
        edges = edges.cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()  # scalar only; ~1e8 rows reduce to one long at 10^12 docs
    # distinct column names everywhere: every derived frame re-joins `edges`,
    # and shared lineage makes same-named columns ambiguous to the analyzer
    outdeg = edges.groupBy(F.col("src").alias("od_node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).cache()
    teleport = (scale * (damping_den - damping_num)) // (damping_den * n)

    from ..staging import free_local_checkpoint

    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    for it in range(iterations):
        prev = ranks
        ranks = pagerank_step(
            nodes, edges, outdeg, ranks, n, teleport, damping_num, damping_den
        )
        # truncate lineage EVERY iteration (not every 5th): iterative plans
        # grow linearly, and the unrolled 3-iteration plan already carried
        # 205 exchanges / 66 scans — a user-supplied iterations=20 would
        # compile a 20-deep plan per action and recompute from the scan on
        # task retry. Eager materialization per round is the production
        # shape anyway (each round's ranks table IS the next round's input),
        # and it bounds plan depth independent of iteration count
        # (pinned by tests/test_graph.py::test_pagerank_plan_depth_bounded).
        ranks = ranks.localCheckpoint(eager=True)
        if it > 0:
            free_local_checkpoint(prev)  # superseded round's checkpoint RDD
    # the final ranks are checkpointed (lineage no longer references the
    # cached frames), so release them instead of leaking two cache entries
    # per invocation across the contract sweep / plan audit
    nodes.unpersist()
    outdeg.unpersist()
    if _own_edges:
        edges.unpersist()
    return ranks.select("node", F.col("r").alias("rank_fp"))


def hits(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg hubs-and-authorities) over distinct
    (src, dst) string edges. Returns (node, hub_fp, auth_fp), both scaled
    by `scale` so each score vector sums to ~`scale` (floor losses only).

    Why alongside PageRank: authority answers "who is pointed at by good
    hubs" — the seed-expansion / mirror-detection signal a crawl-curation
    pipeline uses where PageRank's random-surfer prior is the wrong model
    (e.g. hub pages that link out to many high-quality hosts carry no
    PageRank but define the collection).

    Why INTEGER fixed-point (same rationale as `pagerank` above): HITS is
    iterated sums + a global normalization, and float normalization makes
    results order- and engine-dependent. Here every raw score is an exact
    BIGINT sum; the per-iteration L1 normalization is
        x'(v) = (x_raw(v) * scale) div total
    computed in DECIMAL(38,0) (Spark) / HUGEINT (the DuckDB oracle) so the
    widened product is exact in both engines and the floor division is
    bit-identical (verified: identical quotients on 10^18-scale operands).

    Update rule per iteration (all integer ops):
      a_raw(u) = sum over edges (v,u) of h(v);  ta = sum of a_raw
      a(u)     = (a_raw(u) * scale) div ta
      h_raw(v) = sum over edges (v,u) of a(u);  th = sum of h_raw
      h(v)     = (h_raw(v) * scale) div th
    Nodes without in-edges have authority 0; without out-edges, hub 0.

    Scale shape (10^12 pages => ~10^8 hosts, ~10^9 host edges): each
    half-iteration is one partial-aggregated shuffle over the edge table
    joined to a node-sized score frame, plus a broadcast 1-row total —
    exactly `pagerank`'s per-round cost, twice. Score frames stay sparse
    during iteration (only nodes with nonzero raw sums); the dense 0-filled
    view is produced once at the end. Lineage is truncated every
    half-iteration via eager localCheckpoint, so plan depth is independent
    of the iteration count. Overflow bound: raw sums stay < 2^63 while
    scale * max_degree < 2^63 (scale=10^12 allows degree < ~9.2 * 10^6;
    pass a smaller scale for denser host graphs).
    """
    if iterations < 1:
        # `a` is only defined inside the loop; 0 iterations has no
        # meaningful authority vector (pagerank's 0-iteration analog is
        # the uniform init, but HITS scores require at least one pass)
        raise ValueError("hits requires iterations >= 1")

    def _rescale(raw: DataFrame, val: str) -> DataFrame:
        tot = raw.agg(F.sum(val).alias("tot"))
        out = raw.crossJoin(F.broadcast(tot)).select(
            "gn",
            F.expr(
                f"CAST((CAST({val} AS DECIMAL(38,0)) * {scale}) div tot AS BIGINT)"
            ).alias(val[:-4]),
        )
        return out.localCheckpoint(eager=True)

    # pin the edge table: six half-iteration joins plus the node build
    # would otherwise each re-run the caller's edge lineage (ownership
    # rule as in `pagerank`: don't evict a caller-persisted frame)
    _own_edges = not (
        edges.storageLevel.useMemory or edges.storageLevel.useDisk
    )
    if _own_edges:
        edges = edges.cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()  # scalar only
    h = nodes.select(F.col("node").alias("gn"), F.lit(scale // n).cast("long").alias("h"))
    a = None
    from ..staging import free_local_checkpoint

    for it in range(iterations):
        a_raw = (
            edges.join(h, F.col("src") == F.col("gn"), "inner")
            .groupBy(F.col("dst").alias("gn"))
            .agg(F.sum("h").cast("long").alias("a_raw"))
        )
        prev_a = a
        a = _rescale(a_raw, "a_raw")
        if prev_a is not None:
            free_local_checkpoint(prev_a)  # superseded: a was materialized
        h_raw = (
            edges.join(a, F.col("dst") == F.col("gn"), "inner")
            .groupBy(F.col("src").alias("gn"))
            .agg(F.sum("a").cast("long").alias("h_raw"))
        )
        prev_h = h
        h = _rescale(h_raw, "h_raw")
        if it > 0:
            free_local_checkpoint(prev_h)  # round-0 h is a plain select
    out = (
        nodes.join(h.withColumnRenamed("gn", "hn"), F.col("node") == F.col("hn"), "left")
        .join(a.withColumnRenamed("gn", "an"), F.col("node") == F.col("an"), "left")
        .select(
            "node",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub_fp"),
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth_fp"),
        )
    )
    out = out.localCheckpoint(eager=True)
    free_local_checkpoint(h)  # out is materialized; the score frames are dead
    free_local_checkpoint(a)
    nodes.unpersist()
    if _own_edges:
        edges.unpersist()
    return out


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-point PERSONALIZED PageRank: teleport mass returns to a seed
    set instead of uniformly to all nodes — the seed-expansion primitive
    (start from a curated list of trusted hosts, rank the rest of the web
    by proximity to it) and its dual, spam-neighborhood scoring from a
    spam seed list. `seeds` is a 1-column (node) DataFrame; seeds not in
    the graph are ignored.

    Same integer fixed-point contract as `pagerank` above (BIGINT units of
    1/scale, floor division, engine-exact). Update rule per iteration:
      share(v) = r(v) div outdeg(v);  insum(u) = sum over (v,u) of share(v)
      dang     = sum of r(v) over dangling v;  s = |seeds ∩ nodes|
      r'(u)    = [u∈S] * (scale*(den-num)) div (den*s)
                 + (num * (insum(u) + [u∈S]*(dang div s))) div den
    Initial mass: scale div s on each seed, 0 elsewhere.

    Scale shape identical to `pagerank`: one partial-agg shuffle per
    iteration plus a broadcast 1-row dangling scalar; the seed flag rides
    the node frame as one boolean column; lineage truncated every round.
    """
    # pin the edge table for the loop's scope (the `pagerank` rationale,
    # including its caller-ownership rule)
    _own_edges = not (
        edges.storageLevel.useMemory or edges.storageLevel.useDisk
    )
    if _own_edges:
        edges = edges.cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed_nodes = seeds.select(F.col(seeds.columns[0]).alias("sn")).distinct()
    nodes = nodes.join(
        seed_nodes, F.col("node") == F.col("sn"), "left"
    ).select("node", F.col("sn").isNotNull().alias("is_seed")).cache()
    s_count = nodes.where("is_seed").count()  # scalar only
    if s_count == 0:
        raise ValueError("no seed appears in the edge set")
    n_tele = (scale * (damping_den - damping_num)) // (damping_den * s_count)

    outdeg = edges.groupBy(F.col("src").alias("od_node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).cache()
    ranks = nodes.select(
        "node",
        "is_seed",
        F.when(F.col("is_seed"), F.lit(scale // s_count))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    from ..staging import free_local_checkpoint

    for it in range(iterations):
        prev = ranks
        shares = (
            ranks.join(outdeg, F.col("node") == F.col("od_node"), "inner")
            .select(F.col("node").alias("s"), F.expr("r div deg").alias("share"))
        )
        insum = (
            edges.join(shares, F.col("src") == F.col("s"), "inner")
            .groupBy(F.col("dst").alias("m_node"))
            .agg(F.sum("share").alias("insum"))
        )
        dangling = (
            ranks.join(outdeg, F.col("node") == F.col("od_node"), "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            nodes.join(insum, F.col("node") == F.col("m_node"), "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_seed",
                (
                    F.when(F.col("is_seed"), F.lit(n_tele)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_num} * (coalesce(insum, 0)"
                        f" + if(is_seed, dang div {s_count}, 0))) div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
        if it > 0:
            free_local_checkpoint(prev)  # superseded round's checkpoint RDD
    nodes.unpersist()
    outdeg.unpersist()
    if _own_edges:
        edges.unpersist()
    return ranks.select("node", F.col("r").alias("rank_fp"))


def anchor_terms(
    anchors: DataFrame,
    topk: int = 3,
    host_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target-host anchor-text profile: the `topk` most frequent
    lower-cased anchor terms pointing AT each host — "what the web calls
    this host", the classic relevance/spam-detection aggregate over
    `sources/warc.extract_anchor_pairs` output. Input rows are
    (host, anchor phrase); output (host, term, n, rank) with a
    deterministic total order (count desc, term asc — row_number, so the
    result set is unique and oracle-exact).

    Scale shape: one narrow explode (fan-out bounded by words-per-anchor,
    ~5), one partial-aggregated groupBy(host, term), then a row_number
    window partitioned by HOST — per-host term counts are bounded by the
    anchor vocabulary, so no partition is corpus-sized; there is no
    global sort anywhere."""
    from pyspark.sql import Window

    terms = anchors.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.lower(F.col(anchor_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    counts = terms.groupBy("host", "term").agg(F.count("*").alias("n"))
    wnd = Window.partitionBy("host").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= topk)
        .select("host", "term", F.col("n").cast("long").alias("n"),
                F.col("rank").cast("int").alias("rank"))
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from a seed host set over
    distinct (src, dst) string edges. Returns (node, hops) for every node
    reachable within `max_hops` hops; seeds are at hops 0 whether or not
    they appear in the edge table (the crawl-frontier convention — a seed
    list is trusted even before any link points at it).

    Why this exists: crawl-depth-from-seeds is the standard trust /
    quality prior in web curation (OPIC-style frontier scheduling, seed
    expansion, spam demotion by distance from a curated allowlist) and the
    natural batch twin of the politeness scheduler's frontier
    (streaming/scheduler.py). PageRank/HITS/PPR give continuous authority;
    hop distance is the discrete, exactly-verifiable counterpart.

    Exactness: hop counts are small integers produced by min() folds —
    no floats anywhere, so results are engine-, partitioning- and
    iteration-order-independent, and the DuckDB oracle's unrolled CTE
    recurrence matches bit-for-bit.

    Scale shape (10^12 pages => ~10^8 hosts, ~10^9 host edges): each
    round expands ONLY the frontier (rows settled in the previous round —
    hop values are monotone under min, so a node's hop never changes
    after it is first set). Per round: one join of the frontier against
    the edge table (shuffle on src — local exchange if the lakehouse
    buckets edges by src) and one partial-aggregated min() shuffle on
    node. Lineage is truncated every round via eager localCheckpoint
    (the pagerank/hits discipline), so plan depth is independent of
    `max_hops`; superseded rounds' checkpoint RDDs are freed eagerly.
    The early-stop probe is one count() on the frontier — a scalar job,
    the production shape for an unbounded-depth crawl sweep."""
    from ..staging import free_local_checkpoint

    _own_edges = not (
        edges.storageLevel.useMemory or edges.storageLevel.useDisk
    )
    if _own_edges:
        edges = edges.cache()
    dist = (
        seeds.select(F.col("node").cast("string").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("hops"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_hops):
        frontier = dist.where(F.col("hops") == it)
        if frontier.count() == 0:
            break  # frontier exhausted: deeper rounds are no-ops
        cand = edges.join(
            frontier, edges["src"] == frontier["node"], "inner"
        ).select(
            F.col("dst").alias("node"),
            F.lit(it + 1).cast("long").alias("hops"),
        )
        prev = dist
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(prev)
    if _own_edges:
        edges.unpersist()
    return dist


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over distinct
    (src, dst) string edges, treated as UNDIRECTED (mirror detection and
    link-farm discovery care about association, not direction). Returns
    (node, label) after `iterations` rounds; nodes start labeled with
    themselves and each round adopt the most frequent label among their
    neighbors, ties broken by MINIMUM label — the tie-break is what makes
    synchronous LPA deterministic (engine-, partitioning- and
    schedule-independent), so an unrolled SQL recurrence reproduces it
    bit-for-bit. Communities complement the dedup path's connected
    components (operators/dedup.py): CC answers "transitively linked at
    all?", LPA answers "densely linked together?" — the spam-cluster /
    site-family signal a curation pipeline thresholds on.

    Scale shape (10^8 hosts, ~10^9 undirected host edges): per round, one
    join of the edge table against the node-sized label frame (shuffle on
    the neighbor key; local exchange if the lakehouse buckets edges), one
    partial-aggregated count shuffle on (node, label), and a row_number
    window partitioned by NODE — per-node label counts are bounded by
    degree, so no partition is corpus-sized and there is no global sort.
    Lineage is truncated every round via eager localCheckpoint (the
    pagerank discipline); superseded rounds' checkpoint RDDs are freed."""
    from pyspark.sql import Window

    from ..staging import free_local_checkpoint

    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("me").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iterations):
        counts = (
            und.join(labels, und["b"] == labels["node"], "inner")
            .groupBy(F.col("a").alias("me"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        prev = labels
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("me").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(prev)
    und.unpersist()
    return labels


def triangle_counts(edges: DataFrame, cc_scale: int = 10**6) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient over
    distinct (src, dst) string edges, treated as UNDIRECTED.

    Why this exists: triangle density separates organically-linked site
    neighborhoods from link farms and mirror rings (spam nets are near-
    cliques; legitimate topical hubs are star-like) — the classic
    structural spam feature (Becchetti et al., "Efficient semi-streaming
    algorithms for local triangle counting", KDD 2008) a web curation
    pipeline thresholds on, complementing PageRank (authority), LPA
    (community) and k-core (coreness) over the same host graph.

    Algorithm — degree-ordered orientation (the MapReduce-standard form,
    Suri & Vassilvitskii, WWW 2011): orient every undirected edge from the
    endpoint that is SMALLER under the total order (degree, node) to the
    larger. Every triangle then has exactly one "apex" node with two
    out-edges, so counting (wedge e1.u->v, e2.u->w joined against closing
    oriented edge v->w) sees each triangle EXACTLY once — no /3, no /6
    correction, and out-degree under this orientation is bounded by
    O(sqrt(m)) regardless of raw skew, which is what keeps the wedge join
    from exploding on celebrity hosts at web scale.

    Exactness: counts are integers; the clustering coefficient is emitted
    as parts-per-cc_scale FLOOR fixed point (2*tri*cc_scale div
    deg*(deg-1)), so Spark and the DuckDB oracle agree bit-for-bit. The
    explicit (deg, node) tuple comparison is spelled as boolean arithmetic
    (not engine struct comparison) so both engines provably use the same
    total order.

    Scale shape (10^8 hosts, ~10^9 undirected host edges): canonical-edge
    dedup is one shuffle; degrees one partial-agg shuffle; the wedge join
    shuffles oriented edges on u (out-degree capped ~sqrt(m) by the
    orientation) and the closing probe is a join on the oriented edge key
    (v, w) — bucketable on a lakehouse. Per-node rollup is one
    partial-agg shuffle of triangle corners."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .cache()
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
        .cache()
    )
    e1 = ori.select(
        F.col("u").alias("w_u"), F.col("v").alias("w_v"), F.col("dv").alias("w_dv")
    )
    e2 = ori.select(
        F.col("u").alias("x_u"), F.col("v").alias("x_v"), F.col("dv").alias("x_dv")
    )
    wedges = e1.join(e2, F.col("w_u") == F.col("x_u"), "inner").where(
        (F.col("w_dv") < F.col("x_dv"))
        | ((F.col("w_dv") == F.col("x_dv")) & (F.col("w_v") < F.col("x_v")))
    )
    tri_rows = wedges.join(
        ori.select(F.col("u").alias("c_u"), F.col("v").alias("c_v")),
        (F.col("w_v") == F.col("c_u")) & (F.col("x_v") == F.col("c_v")),
        "inner",
    ).select(
        F.col("w_u").alias("x"), F.col("w_v").alias("y"), F.col("x_v").alias("z")
    )
    per_node = (
        tri_rows.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    out = (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
        )
        .select(
            "node",
            "deg",
            "tri",
            F.when(
                F.col("deg") >= 2,
                F.expr(f"(2 * tri * {cc_scale}L) div (deg * (deg - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("cc_fp"),
        )
    )
    return out


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded k-core peeling over distinct (src, dst) string edges,
    treated as UNDIRECTED: `rounds` synchronous rounds of "drop every node
    whose degree in the currently-surviving induced subgraph is < k".
    Returns (node, deg) for survivors, deg = induced degree after the last
    peel. Semantics are DEFINED as the bounded recurrence (the
    pagerank/HITS discipline in this module): a fixed round count makes
    the operator engine- and schedule-independent, so an unrolled SQL
    recurrence reproduces it bit-for-bit; a test pins that at test scale
    the chosen round count reaches the true fixpoint (rounds vs rounds+1
    equal), which is the production convergence probe.

    Why this exists: coreness is the robust density signal of the host
    graph — a k-core survives deleting any (k-1) neighbors, so link farms
    that inflate raw degree with throwaway pages do not inflate coreness
    without building a genuinely dense subgraph. Standard crawl-frontier /
    spam-demotion prior alongside triangles and PageRank.

    Scale shape: per round, the induced degree is ONE join of the edge
    table against the surviving-node set on each endpoint (semi-join
    shape, broadcastable once peeling shrinks the frontier) plus one
    partial-agg count shuffle; lineage is truncated per round via eager
    localCheckpoint and superseded rounds are freed."""
    from ..staging import free_local_checkpoint

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )

    def induced_deg(alive: DataFrame) -> DataFrame:
        sa = alive.select(F.col("node").alias("a"))
        sb = alive.select(F.col("node").alias("b"))
        live = und.join(sa, "a", "left_semi").join(sb, "b", "left_semi")
        return (
            live.select(F.col("a").alias("node"))
            .unionByName(live.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )

    alive = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        prev = alive
        alive = (
            induced_deg(alive)
            .where(F.col("deg") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(prev)
    out = induced_deg(alive)
    und.unpersist()
    return out


def resolve_chains(redirects: DataFrame, rounds: int) -> DataFrame:
    """Resolve redirect chains to their terminal target by pointer
    doubling: `rounds` synchronous rounds of ptr(x) <- ptr(ptr(x)) with
    exact hop accumulation, so chains up to 2^rounds links resolve in
    O(log chain) joins instead of O(chain) — the crawl-graph analog of
    path halving in union-find, and the reason a 10^12-row redirect table
    is resolvable at all (a sequential chase would need one full-table
    join per hop).

    Input: (src, dst) with ONE row per src (a functional graph — HTTP
    gives each URL at most one Location) and NO cycles (the caller's
    contract; a redirect cycle is a crawl error upstream fences out —
    bounded rounds also mean a cycle cannot hang the job, it just keeps
    doubling). Returns (src, dst, hops): the terminal URL every source
    ultimately lands on and the exact number of redirect edges traversed
    — what a curation pipeline needs to canonicalize url keys (dedup by
    final target) and to drop SEO redirect ladders (hops threshold).

    Exactness: hop counts are exact integers under synchronous doubling
    (jumping through node m adds exactly the hops m's pointer already
    covers), so the result is engine-, partitioning- and round-order
    independent once rounds >= ceil(log2(longest chain)) — the DuckDB
    recursive-CTE oracle walks the SAME chains one hop at a time and
    agrees bit-for-bit, which also pins that doubling introduces no
    off-by-one in hops.

    Scale shape: each round is ONE self-equi-join of the state on the
    pointer key (shuffle on ptr; partial state stays (node, ptr, hops) —
    ~3 longs/row, never the page text) and lineage is truncated per round
    via eager localCheckpoint with superseded rounds freed."""
    from ..staging import free_local_checkpoint

    state = redirects.select(
        F.col("src").alias("node"),
        F.col("dst").alias("ptr"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        m = state.select(
            F.col("node").alias("m_node"),
            F.col("ptr").alias("m_ptr"),
            F.col("hops").alias("m_hops"),
        )
        prev = state
        state = (
            state.join(m, state["ptr"] == m["m_node"], "left")
            .select(
                "node",
                F.coalesce("m_ptr", "ptr").alias("ptr"),
                (F.col("hops") + F.coalesce("m_hops", F.lit(0)))
                .cast("long")
                .alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(prev)
    return state.select(
        F.col("node").alias("src"), F.col("ptr").alias("dst"), "hops"
    )
