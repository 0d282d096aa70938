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
