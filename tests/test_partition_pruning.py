"""Partition pruning: the other half of the 100 TB layout story.

A date-partitioned fact table must let Catalyst prune partitions at plan
time — a day-filtered query should list ONLY the matching partition
directories, not scan-and-discard. This test writes events partitioned by
day and asserts the executed scan shows the partition filter with a pruned
file set, plus result equality against the unpartitioned path.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_by_day") / "events")
    events = load_tables(spark, SF_DIR, ("events",))["events"]
    events.withColumn(
        "day", F.to_date(F.date_trunc("day", F.col("ts")))
    ).write.partitionBy("day").parquet(path)
    return path


def test_day_filter_prunes_partitions(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    n_days = df.select("day").distinct().count()
    assert n_days > 1, "need multiple partitions to observe pruning"

    # static partition pruning happens in the optimizer, independent of
    # AQE — but AQE's stage wrappers hide the FileSourceScanExec node, so
    # switch it off for the observation only.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def selected_partitions(q):
            scan = q._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
            return scan.selectedPartitions().partitionCount()

        one_day = df.filter(F.col("day") == F.lit("2024-01-02")).groupBy(
            "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "day#" in plan.split("PartitionFilters")[1].split("]")[0]

        pruned = selected_partitions(one_day)
        total = selected_partitions(df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))
        assert pruned == 1, pruned
        assert total == n_days, (total, n_days)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_partitioned_result_matches_unpartitioned(spark, partitioned_events):
    part = (
        spark.read.parquet(partitioned_events)
        .filter(F.col("day") == F.lit("2024-01-02"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    flat = (
        load_tables(spark, SF_DIR, ("events",))["events"]
        .filter(
            F.to_date(F.date_trunc("day", F.col("ts"))) == F.lit("2024-01-02")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["event_type"], r["n"]) for r in part.collect()}
    want = {(r["event_type"], r["n"]) for r in flat.collect()}
    assert got == want and got
