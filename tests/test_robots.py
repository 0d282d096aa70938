"""Robots-exclusion gate (operators/robots.py): RFC 9309 precedence on
hand-built rule tables — longest prefix wins, allow wins length ties,
default allow, per-host isolation."""

import pyspark.sql.functions as F

from fasta_windows_spark.operators.robots import robots_filter


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, host string, path string")


def _rules(spark, rows):
    return spark.createDataFrame(rows, "host string, prefix string, allow long")


def test_longest_prefix_wins(spark):
    u = _urls(spark, [(1, "h", "/a/b/c")])
    r = _rules(spark, [("h", "/a", 1), ("h", "/a/b", 0)])
    row = robots_filter(u, r).collect()[0]
    assert (row.matched_len, row.allowed) == (4, 0)


def test_allow_wins_length_tie(spark):
    u = _urls(spark, [(1, "h", "/a/x")])
    r = _rules(spark, [("h", "/a", 0), ("h", "/a", 1)])
    row = robots_filter(u, r).collect()[0]
    assert (row.matched_len, row.allowed) == (2, 1)


def test_no_match_default_allow(spark):
    u = _urls(spark, [(1, "h", "/zz"), (2, "other", "/a")])
    r = _rules(spark, [("h", "/a", 0)])
    rows = {x.doc_id: x for x in robots_filter(u, r).collect()}
    assert (rows[1].matched_len, rows[1].allowed) == (0, 1)
    # rules are host-scoped: host 'other' has no rules at all
    assert (rows[2].matched_len, rows[2].allowed) == (0, 1)


def test_disallow_then_deeper_allow_override(spark):
    # the classic robots.txt pattern: Disallow /private, Allow /private/pub
    u = _urls(
        spark,
        [(1, "h", "/private/x"), (2, "h", "/private/pub/x"), (3, "h", "/ok")],
    )
    r = _rules(spark, [("h", "/private", 0), ("h", "/private/pub", 1)])
    rows = {x.doc_id: x for x in robots_filter(u, r).collect()}
    assert rows[1].allowed == 0
    assert rows[2].allowed == 1 and rows[2].matched_len == 12
    assert rows[3].allowed == 1 and rows[3].matched_len == 0


def test_every_url_survives_exactly_once(spark):
    u = _urls(spark, [(i, "h", f"/p{i % 3}") for i in range(30)])
    r = _rules(spark, [("h", "/p0", 0), ("h", "/p1", 1)])
    out = robots_filter(u, r)
    assert out.count() == 30
    agg = out.agg(F.sum("allowed").alias("s")).collect()[0]
    assert agg.s == 20  # /p0 blocked (10 docs), /p1 + unmatched /p2 pass


def test_robots_gate_runs_on_stream(spark, tmp_path):
    """The gate is a join + aggregate over static rules — verify the SAME
    call runs on readStream micro-batches and emits rows identical to the
    batch face (complete mode: the agg re-emits per batch)."""
    import pyspark.sql.types as T

    rows = [(i, "h", f"/p{i % 3}/x") for i in range(40)]
    src = str(tmp_path / "urls")
    schema = "doc_id long, host string, path string"
    spark.createDataFrame(rows, schema).write.parquet(src)
    rules = _rules(spark, [("h", "/p0", 0), ("h", "/p1/x", 1), ("h", "/p1", 0)])

    batch = {
        r.doc_id: (r.matched_len, r.allowed)
        for r in robots_filter(
            spark.createDataFrame(rows, schema), rules
        ).collect()
    }
    stream = spark.readStream.schema(
        T._parse_datatype_string(schema)
    ).parquet(src)
    out = robots_filter(stream, rules)
    q = (
        out.writeStream.format("memory")
        .queryName("robots_stream")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: (r.matched_len, r.allowed)
        for r in spark.sql("select * from robots_stream").collect()
    }
    assert got == batch
