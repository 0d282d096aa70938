"""Robots-exclusion gating for the crawl frontier: apply per-host
path-prefix allow/disallow rules to a URL table under RFC 9309 semantics —
the most specific (longest) matching rule wins, allow wins ties, and a URL
with no matching rule is allowed.

This is the missing third leg of the crawl-native surface: sources/cdx.py
plans WHAT to fetch, streaming/scheduler.py decides WHEN (politeness
slots, whose crawl-delay stand-in already models the robots.txt
Crawl-delay line), and this module decides WHETHER — the compliance gate
every fetch list must pass before it becomes traffic.

Semantics are encoded arithmetically so the verdict is hash-checkable:
each matching rule scores ``length(prefix) * 2 + allow`` and the winner is
a plain MAX — longer prefixes dominate by construction, and at equal
length the allow rule's +1 wins, exactly RFC 9309's least-restrictive tie
rule. No regex, no UDF: prefix matching is a JVM ``startswith`` and the
verdict is integer arithmetic on the packed score.

100 TB shape: one equi-join frontier-to-rules on host (co-keyed — a real
deployment buckets both tables by host, making it shuffle-free; broadcast
when the ruleset fits) followed by one partial-aggregated MAX per URL.
Rule rows per host are small by nature (robots.txt files are KBs), so the
join fan-out is bounded; the URL table's payload columns ride the grouping
keys and never widen the shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Gate ``urls`` (id, host, path) under ``rules`` (host, prefix,
    allow: 0/1). Returns one row per input URL with ``matched_len`` (the
    winning rule's prefix length, 0 when no rule matches) and ``allowed``
    (0/1) — callers keep the frontier with ``.where("allowed = 1")`` or
    route the blocked slice to a compliance audit.

    The winner is max(length(prefix)*2 + allow) over matching rules:
    longest prefix first, allow beating disallow at equal length, default
    allow when nothing matches — RFC 9309 precedence as one MAX.
    """
    r = rules.select(
        F.col(host_col).alias("_rh"),
        F.col("prefix").alias("_rp"),
        F.col("allow").cast("long").alias("_ra"),
    )
    j = urls.join(r, urls[host_col] == F.col("_rh"), "left")
    hit = F.col(path_col).startswith(F.col("_rp"))
    score = F.when(
        hit, F.length("_rp").cast("long") * 2 + F.col("_ra")
    )
    g = (
        j.groupBy(id_col, host_col, path_col)
        .agg(F.max(score).alias("_best"))
    )
    return g.select(
        id_col,
        host_col,
        path_col,
        F.coalesce(
            F.expr("_best div 2"), F.lit(0).cast("long")
        ).alias("matched_len"),
        F.coalesce(
            F.pmod(F.col("_best"), F.lit(2)), F.lit(1).cast("long")
        ).alias("allowed"),
    )
