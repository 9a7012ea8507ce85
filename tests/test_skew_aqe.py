"""AQE skew-join engagement, pinned (r8 verdict ask #6's skew leg).

Three facts worth regression-pinning, each discovered against real
executed plans (not docs):

1. With a hot join key, AQE's OptimizeSkewedJoin splits the skewed
   partition (``SortMergeJoin(skew=true)`` + ``AQEShuffleRead .. skewed``)
   — the runtime re-plan a 100× deploy relies on for residual skew the
   catalog's salting patterns don't cover.
2. The rule only pattern-matches a join whose children are
   Sort-over-shuffle DIRECTLY: a dimension deduplicated by an aggregate
   between its shuffle and the join defeats the rewrite entirely.  At
   scale, skew-prone joins must therefore consume pre-materialized (or
   bucketed) dimensions — one reason the catalog's shared substrates are
   persisted tables rather than inline aggregates.
3. Detection reads COMPRESSED map-output sizes after column pruning: a
   hot partition of bare sequential keys compresses under the byte
   threshold and silently loses the rewrite — the payload must actually
   flow through the join for the skew to be visible (it does in every
   real query; the test keeps a digest column live to model that).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1048576",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1048576",
}


@pytest.fixture()
def skew_session(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_fact(spark):
    """1M rows, half collapsed onto one hot key, with an incompressible
    digest payload so the hot partition's compressed shuffle bytes
    actually exceed the detection threshold (fact 3 above)."""
    return spark.range(1_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 50_000)
        .alias("pk"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )


def _dim_parquet(spark, tmp_path):
    path = str(tmp_path / "dim")
    spark.range(50_000).select(
        F.col("id").alias("pk"), (F.col("id") * 2).alias("m")
    ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _final_plan(df) -> str:
    df.collect()  # AQE final plan materializes on the SAME QueryExecution
    return df._jdf.queryExecution().executedPlan().toString()


def test_skew_join_engages_on_materialized_dim(skew_session, tmp_path):
    spark = skew_session
    dim = _dim_parquet(spark, tmp_path)
    j = (
        _skewed_fact(spark)
        .join(dim, "pk")
        .agg(F.count("*").alias("n"), F.sum(F.length("v")).alias("b"))
    )
    plan = _final_plan(j)
    assert "skew=true" in plan, "OptimizeSkewedJoin did not engage"
    assert "skewed" in plan  # AQEShuffleRead marks the split partition


def test_inline_dim_aggregate_defeats_the_skew_rewrite(skew_session, tmp_path):
    spark = skew_session
    dim_rows = _dim_parquet(spark, tmp_path)
    # the same dimension, but deduplicated INLINE: the aggregate sits
    # between the dim's shuffle and the join and blocks the pattern match
    dim = dim_rows.groupBy("pk").agg(F.max("m").alias("m"))
    j = (
        _skewed_fact(spark)
        .join(dim, "pk")
        .agg(F.count("*").alias("n"), F.sum(F.length("v")).alias("b"))
    )
    plan = _final_plan(j)
    assert "skew=true" not in plan


def test_bare_key_shuffle_compresses_below_detection(skew_session, tmp_path):
    spark = skew_session
    dim = _dim_parquet(spark, tmp_path)
    # count(*) lets Catalyst prune the payload: the hot partition is bare
    # sequential longs, compresses under the 1 MiB threshold, no rewrite
    j = _skewed_fact(spark).join(dim, "pk").agg(F.count("*").alias("n"))
    plan = _final_plan(j)
    assert "skew=true" not in plan
