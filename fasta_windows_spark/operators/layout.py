"""Z-order (Morton) data layout: multi-dimensional clustering for scan
pruning at 100 TB.

A corpus partitioned by one column prunes scans on that column only. Bit-
interleaving two clustering coordinates into one Morton key and RANGE-
partitioning on it gives files that are simultaneously tight in BOTH
dimensions, so min/max file statistics (parquet footers, Iceberg manifest
ranges) prune scans filtered on either column — the OPTIMIZE ZORDER BY
operation of table formats, expressed as plain DataFrame ops.

Two faces, one key:

- `zorder_repartition` is the production operator: repartitionByRange on
  (zkey, id) + sortWithinPartitions, one range-exchange over sampled
  boundaries and a LOCAL sort — no global single-task sort anywhere. Its
  sampled range boundaries are nondeterministic by design (Spark's
  RangePartitioner samples), so it is pinned by plan-shape + per-file
  min/max tightness tests rather than an oracle.
- `zorder_files` is the oracle-exact verification twin: the same key, with
  file ids assigned by ntile over the (zkey, id) total order. ntile needs
  a global window (single partition) so it is the TWIN, not the production
  path — exact, deterministic, and cross-engine replayable in SQL.

The Morton key itself is pure integer bit arithmetic (16 bits per
coordinate → one BIGINT), identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def morton_sql(x: str, y: str, bits: int = 16, dialect: str = "spark") -> str:
    """Bit-interleave SQL for two non-negative ints already masked to
    `bits` bits: x occupies even bit positions, y odd. Generated as a
    closed-form sum (no loop at runtime); `dialect` picks the shift
    spelling (Spark's shiftleft/shiftright functions vs DuckDB's <<,>>)."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def doc_zorder_key(
    docs: DataFrame, bits: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, zx, zy, zkey): zx = document length clamped to `bits`
    bits, zy = a 16-bit md5 bucket of the source/host — the two columns a
    webtext corpus is most often filtered on (length cuts, per-host
    slices). One narrow JVM projection, zero shuffle.

    zx is least(n_chars, mask) — a saturating CLAMP, not a modulo mask: a
    70k-char page must sort with the long docs (zx monotone in length, so
    a length-cut filter rewrites to a zx range and per-file zx min/max
    stats locate long docs), where `& mask` would wrap it in among the
    short ones."""
    mask = (1 << bits) - 1
    return docs.select(
        id_col,
        F.expr(f"least(cast(n_chars as bigint), {mask})").alias("zx"),
        F.expr(
            f"cast(conv(substr(md5(source), 1, 4), 16, 10) as bigint) & {mask}"
        ).alias("zy"),
    ).withColumn("zkey", F.expr(morton_sql("zx", "zy", bits, "spark")))


def zorder_files(
    docs: DataFrame, n_files: int = 16, bits: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Oracle-exact twin (module docstring): equal-count file assignment
    by ntile over the (zkey, id) total order."""
    keyed = doc_zorder_key(docs, bits, id_col)
    w = Window.orderBy("zkey", id_col)
    return keyed.withColumn("file_id", F.ntile(n_files).over(w))


def zorder_repartition(
    docs: DataFrame, n_files: int = 16, bits: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Production layout pass: range-exchange on (zkey, id) into n_files
    write tasks, each locally sorted, ready for a partitioned write whose
    parquet footer min/max on zx and zy are tight per file."""
    keyed = doc_zorder_key(docs, bits, id_col)
    return keyed.repartitionByRange(n_files, "zkey", id_col).sortWithinPartitions(
        "zkey", id_col
    )


def zorder_oracle_sql(n_files: int = 16, bits: int = 16) -> str:
    mask = (1 << bits) - 1
    z = morton_sql("zx", "zy", bits, "duckdb")
    return f"""
WITH keyed AS (
  SELECT doc_id,
         least(n_chars, {mask}) AS zx,
         ('0x' || substr(md5(source), 1, 4))::BIGINT & {mask} AS zy
  FROM documents
),
z AS (SELECT doc_id, zx, zy, {z} AS zkey FROM keyed)
SELECT doc_id, zx, zy, zkey,
       ntile({n_files}) OVER (ORDER BY zkey, doc_id) AS file_id
FROM z
"""


# --- consistent-hash sharding (ring with virtual nodes) ---
#
# The layout primitive for a LIVING index: md5-ring assignment with V
# virtual nodes per shard, so growing the fleet from S to S+1 shards
# moves ~1/(S+1) of documents (vs ~S/(S+1) under mod-hashing) — the
# difference between re-indexing 14% and re-indexing 86% of 10^12 docs.
# Everything is exact integer arithmetic on 32-bit md5 positions: the
# owner of a key is the ring node minimizing the clockwise distance
# (pos - p) mod 2^32, evaluated as ONE packed array_min over the ring
# literal (metadata-sized: S*V entries ride the plan, the kmeans-centroid
# pattern) — no join, no shuffle, cross-engine bit-identical.

RING_MOD = 1 << 32


def _md5_32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def ring_nodes(n_shards: int, v_nodes: int = 8) -> list:
    """[(pos, shard)] for the ring — python md5 mirrors the SQL md5 the
    oracle builds the same ring with. Positions must be distinct for the
    argmin tie-break to be moot; asserted (a collision would need two of
    S*V 32-bit hashes to collide — if it ever fires, bump v-node labels)."""
    nodes = [
        (_md5_32(f"s{s}:v{v}"), s)
        for s in range(n_shards)
        for v in range(v_nodes)
    ]
    assert len({p for p, _ in nodes}) == len(nodes), "ring position collision"
    return nodes


def _ring_owner_expr(nodes: list, p_col: str) -> str:
    """SQL: shard owning position ``p_col`` — packed argmin of clockwise
    distance over the ring literal."""
    n_shards = max(s for _, s in nodes) + 1
    ring = (
        "array("
        + ",".join(f"struct({p}L as pos, {s} as sh)" for p, s in nodes)
        + ")"
    )
    return (
        f"cast(pmod(array_min(transform({ring}, r -> "
        f"pmod(r.pos - {p_col}, {RING_MOD}) * {n_shards} + r.sh)), "
        f"{n_shards}) as bigint)"
    )


def consistent_shard_assign(
    df: DataFrame,
    n_shards: int,
    v_nodes: int = 8,
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, p, shard): ring position of every key (32-bit md5) and the
    shard owning it. One narrow JVM projection — the ring is plan
    literals; nothing shuffles."""
    nodes = ring_nodes(n_shards, v_nodes)
    return df.select(
        F.col(key_col),
        F.expr(
            f"cast(conv(substring(md5(cast({key_col} as string)), 1, 8), "
            f"16, 10) as bigint)"
        ).alias("p"),
    ).select(
        key_col, "p", F.expr(_ring_owner_expr(nodes, "p")).alias("shard")
    )


def reshard_audit(
    df: DataFrame,
    n_shards: int,
    v_nodes: int = 8,
    key_col: str = "doc_id",
) -> DataFrame:
    """One-row audit of growing S -> S+1 shards: how many keys move under
    the consistent ring (expected ~n/(S+1) — only keys whose arc the new
    shard's v-nodes split) vs under naive mod-hashing (expected ~n*S/(S+1)
    — almost everything). Fractions in exact 1e-6 floor fixed point. The
    S+1 ring is a SUPERSET of the S ring (v-node labels depend only on
    the shard id), which is precisely the consistent-hashing contract."""
    a = ring_nodes(n_shards, v_nodes)
    b = ring_nodes(n_shards + 1, v_nodes)
    assert set(a) <= set(b)
    base = df.select(
        F.expr(
            f"cast(conv(substring(md5(cast({key_col} as string)), 1, 8), "
            f"16, 10) as bigint)"
        ).alias("p")
    )
    both = base.select(
        "p",
        F.expr(_ring_owner_expr(a, "p")).alias("s_old"),
        F.expr(_ring_owner_expr(b, "p")).alias("s_new"),
        F.pmod(F.col("p"), F.lit(n_shards)).alias("m_old"),
        F.pmod(F.col("p"), F.lit(n_shards + 1)).alias("m_new"),
    )
    return both.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("s_old") != F.col("s_new"), 1).otherwise(0))
        .cast("long")
        .alias("moved_ring"),
        F.sum(F.when(F.col("m_old") != F.col("m_new"), 1).otherwise(0))
        .cast("long")
        .alias("moved_mod"),
    ).select(
        "n_docs",
        "moved_ring",
        "moved_mod",
        F.expr("cast(moved_ring * 1000000 div n_docs as bigint)").alias(
            "moved_ring_fp"
        ),
        F.expr("cast(moved_mod * 1000000 div n_docs as bigint)").alias(
            "moved_mod_fp"
        ),
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "file_id",
    bytes_col: str = "bytes",
    group_size: int = 4096,
) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE/rewrite-data-files step
    of a lakehouse table): bin files into compaction groups of
    ~``target_bytes`` by CUMULATIVE size over the file order — group =
    floor(exclusive-prefix-sum / target). Grouping contiguous-in-layout
    files (z-order file ids here) is deliberate: a compacted output file
    spans an unbroken zkey range, so the post-compaction footer min/max
    stay exactly as tight as before — compaction never undoes clustering.

    Returns (file, bytes, cum_before, cgroup). Scale shape: the file
    table is metadata-sized even at 10^12 docs (millions of rows), and
    the prefix sum is the packing.running_offset segmented scan — no
    single-partition window even on metadata."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    from .packing import running_offset

    placed = running_offset(
        files.select(F.col(file_col), F.col(bytes_col).cast("long")),
        order_col=file_col,
        val_col=bytes_col,
        out_col="cum_before",
        group_size=group_size,
    )
    return placed.select(
        file_col,
        bytes_col,
        "cum_before",
        F.expr(f"cum_before div {int(target_bytes)}").alias("cgroup"),
    )


def partitioned_write(
    docs: DataFrame, out_dir: str, by: str = "lang"
) -> None:
    """Hive-style partitioned corpus layout (out/<by>=<value>/part-*.parquet):
    the directory-level coarse sibling of the z-order FILE-level clustering
    above. Partition columns prune at PLANNING time for literal predicates
    and at RUNTIME via dynamic partition pruning when the predicate arrives
    through a join (see dpp_join_probe) — at 10^12 rows, lang/source/date
    partitioning is the difference between scanning a corpus and scanning
    a directory."""
    docs.write.mode("overwrite").partitionBy(by).parquet(out_dir)


def dpp_join_probe(
    spark, out_dir: str, dim_rows: list, by: str = "lang"
) -> DataFrame:
    """A fact-dim join whose partition filter is only known at RUNTIME:
    the dim side is filtered, and Spark's dynamic partition pruning
    injects the dim's `by` values as a subquery filter into the fact
    scan — so only matching partition directories are read.
    tests/test_layout_dpp.py asserts the plan carries the
    dynamicpruning subquery AND that pruning actually skipped files."""
    fact = spark.read.parquet(out_dir)
    dim = spark.createDataFrame(dim_rows, f"{by} string, keep int").where("keep = 1")
    return fact.join(dim, by).groupBy(by).count()


def range_partition_audit(
    docs: DataFrame, key_col: str = "n_chars", buckets: int = 8
) -> DataFrame:
    """Would repartitionByRange(key) balance? The audit a 10^12-row sort
    or range-bucketed write deserves BEFORE paying the shuffle: exact
    percentile split points (the boundaries a range partitioner would
    pick from a perfect sample), per-bucket row counts and key ranges,
    and each bucket's load as parts-per-million of corpus (1e6/buckets
    == perfectly balanced). A heavy bucket here = a straggler task there.

    Plan: ONE typed-buffer percentile aggregate broadcast as a 1-row
    split table (at 10^12 rows use the approx_percentile twin — the
    events_value_percentiles tolerance protocol), then a narrow bucket
    projection + partial-agg groupBy. No sort, no range shuffle — the
    audit costs two scans of one column."""
    from pyspark.sql import functions as F

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    qs = [i / buckets for i in range(1, buckets)]
    splits = docs.agg(
        F.percentile(key_col, qs).alias("splits"),
        F.count("*").alias("n_total"),
    )
    bucket = " + ".join(
        f"(CASE WHEN {key_col} > splits[{i}] THEN 1 ELSE 0 END)"
        for i in range(buckets - 1)
    )
    return (
        docs.select(key_col)
        .crossJoin(F.broadcast(splits))
        .selectExpr(f"cast({bucket} as bigint) AS bucket", key_col, "n_total")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min(key_col).cast("long").alias("key_min"),
            F.max(key_col).cast("long").alias("key_max"),
            F.first("n_total").alias("_n"),
        )
        .selectExpr(
            "bucket",
            "n_rows",
            "key_min",
            "key_max",
            "cast(n_rows * 1000000 DIV _n as bigint) AS load_ppm",
        )
        .orderBy("bucket")
    )
