"""plans/prefix.py unit tests: the two-phase bucket-prefix running sums
must reproduce a global-window exclusive cumulative bit-identically —
checked against DuckDB's window function on the same data, including
negative values (floor-div bucketing) and multi-column sums."""

import os
import sys

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans.prefix import ladder_with_below, with_exclusive_prefix
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_ladder_below_matches_duckdb_window(spark):
    sup = load_tables(spark, SF_DIR, ("supplier",))["supplier"]
    v = sup.select(F.expr("CAST(FLOOR(s_acctbal * 100) AS BIGINT)").alias("c"))
    got = {
        r["c"]: (r["t"], r["below"])
        for r in ladder_with_below(v, "c", bucket_size=10_000).collect()
    }
    want = {
        c: (t, below)
        for c, t, below in duckdb.sql(
            f"""
            WITH v AS (SELECT CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS c
                       FROM read_parquet('{SF_DIR}/supplier.parquet')),
                 lad AS (SELECT c, COUNT(*) AS t FROM v GROUP BY c)
            SELECT c, t, COALESCE(SUM(t) OVER (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            FROM lad
            """
        ).fetchall()
    }
    assert got == want


def test_negative_values_bucket_by_floor_division(spark):
    # `div` truncates toward zero, which would order bucket -0 wrongly;
    # the helper's DECIMAL floor-div must keep negative values strictly
    # before the positives.
    vals = [-25_001, -10_000, -1, 0, 1, 9_999, 10_000, 25_001]
    v = spark.createDataFrame([(c,) for c in vals for _ in range(2)], "c long")
    got = {
        r["c"]: r["below"]
        for r in ladder_with_below(v, "c", bucket_size=10_000).collect()
    }
    assert got == {c: 2 * i for i, c in enumerate(vals)}


def test_multi_sum_and_descending(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    lad = (
        ev.select(F.expr("CAST(FLOOR(value) AS BIGINT)").alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("t"), F.sum(F.lit(2)).alias("t2"))
    )
    up = with_exclusive_prefix(
        lad, "c", {"below": "t", "below2": "t2"}, bucket_size=25
    )
    rows = {r["c"]: r for r in up.collect()}
    want = {
        c: (b, b2)
        for c, b, b2 in duckdb.sql(
            f"""
            WITH lad AS (
              SELECT CAST(FLOOR(value) AS BIGINT) AS c, COUNT(*) AS t,
                     SUM(2) AS t2
              FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY c)
            SELECT c,
                   COALESCE(SUM(t) OVER w, 0), COALESCE(SUM(t2) OVER w, 0)
            FROM lad
            WINDOW w AS (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            """
        ).fetchall()
    }
    assert {c: (r["below"], r["below2"]) for c, r in rows.items()} == want

    down = with_exclusive_prefix(
        lad, "c", {"above": "t"}, bucket_size=25, descending=True
    )
    want_down = {
        c: a
        for c, a in duckdb.sql(
            f"""
            WITH lad AS (
              SELECT CAST(FLOOR(value) AS BIGINT) AS c, COUNT(*) AS t
              FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY c)
            SELECT c, COALESCE(SUM(t) OVER (ORDER BY c DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            FROM lad
            """
        ).fetchall()
    }
    assert {r["c"]: r["above"] for r in down.collect()} == want_down


def test_grid_window_is_the_only_unpartitioned_one(spark):
    """The helper's plan must contain exactly one unpartitioned Window —
    the bounded bucket-grid prefix — and one partitioned (bucket-local)
    Window."""
    sup = load_tables(spark, SF_DIR, ("supplier",))["supplier"]
    v = sup.select(F.expr("CAST(FLOOR(s_acctbal * 100) AS BIGINT)").alias("c"))
    df = ladder_with_below(v, "c", bucket_size=10_000)
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        yield node
        if node.nodeName() == "AdaptiveSparkPlan":
            yield from walk(node.executedPlan())
            return
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    wins = [n for n in walk(plan) if n.nodeName() == "Window"]
    unpart = [n for n in wins if n.partitionSpec().isEmpty()]
    assert len(unpart) == 1
    assert len(wins) == 2
