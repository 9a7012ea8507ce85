"""Bucketed co-located join: the 100 TB shuffle-avoidance pattern.

At cluster scale, repeatedly joining fact tables on the same key should pay
the partitioning cost ONCE (bucketed write), after which every join is
exchange-free. This test proves the engine's session config + table layout
actually deliver that: orders ⋈ lineitem bucketed by the order key plans
with ZERO Exchange operators, while the plain-parquet join shuffles both
sides.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse.dir is static per-JVM; explicit per-table paths avoid it
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    t = load_tables(spark, SF_DIR, ("orders", "lineitem"))
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", os.path.join(wh, "orders_b")
    ).saveAsTable("orders_b")
    t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", os.path.join(wh, "lineitem_b")
    ).saveAsTable("lineitem_b")
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _join(spark, left, right):
    return (
        spark.table(left)
        .join(
            spark.table(right),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_is_exchange_free(bucketed):
    spark = bucketed
    # broadcast would bypass the bucketing path at this tiny SF — disable to
    # observe the sort-merge-on-buckets plan the big-data case would use.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            _join(spark, "orders_b", "lineitem_b")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # plan strings print top-down: the final agg (and its legitimate
        # Exchange on the grouping key) come FIRST; the join region is the
        # tail after the partial agg — that's where bucketing must have
        # eliminated both shuffles.
        _, _, join_region = plan.partition("partial_count")
        assert "Exchange" not in join_region, join_region
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_shuffles_for_contrast(bucketed):
    spark = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = load_tables(spark, SF_DIR, ("orders", "lineitem"))
        plan = (
            t["orders"]
            .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        _, _, join_region = plan.partition("partial_count")
        assert "Exchange" in join_region  # both sides shuffle without bucketing
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_result_matches_plain(bucketed):
    spark = bucketed
    want = {
        (r["o_orderpriority"], r["n"])
        for r in _plain_join_rows(spark)
    }
    got = {
        (r["o_orderpriority"], r["n"])
        for r in _join(spark, "orders_b", "lineitem_b").collect()
    }
    assert got == want


def _plain_join_rows(spark):
    t = load_tables(spark, SF_DIR, ("orders", "lineitem"))
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
