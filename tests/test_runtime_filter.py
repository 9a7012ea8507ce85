"""Runtime-filter scale evidence: Spark's runtime bloom-filter injection
(SPARK-32268) is the mechanism that turns a selective dimension filter into
a pre-shuffle probe on the fact side of a shuffled join — at 100 TB it is
what keeps a 0.1%-selective part⋈lineitem join from shuffling all of
lineitem. The session leaves the feature enabled
(spark.sql.optimizer.runtime.bloomFilter.enabled=true); its size
thresholds (application side ≥ 10 GiB scan by default) are tuned for real
clusters, so this test scales them down to the local fixture to prove the
injection actually fires under this session's configuration."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_bloom_filter_enabled_by_default(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )


def test_bloom_filter_injected_on_selective_dim_join(spark):
    """With the size thresholds scaled to the fixture, a selective part
    filter joined to lineitem must inject a might_contain() runtime filter
    on the fact side's join key."""
    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables

    t = load_tables(spark, SF_DIR, ("lineitem", "part"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffled join
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        dim = t["part"].where(F.col("p_brand") == "Brand#23").select("p_partkey")
        j = (
            t["lineitem"]
            .join(dim, t["lineitem"].l_partkey == dim.p_partkey)
            .agg(F.sum("l_quantity"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
