"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog lives in ``kafka_sink_spark.plans``; see SURVEY.md §2 for the
operator inventory each entry covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session settings to a driver-provided session (the driver
    builds its own SparkSession; the nanos-parquet flag must be set before any
    read — it is a static-ish conf, so set via runtime conf where possible)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.caseSensitive", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full sink pipeline
    (decode → map → route → final-state replay) on the events stream."""
    _configure(spark)
    from kafka_sink_spark.plans import QUERIES

    return QUERIES["sink_upsert_replay"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    from kafka_sink_spark.plans import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every oracle-checkable query (pre-registered views:
    region nation customer supplier part orders lineitem events documents
    embeddings). Queries absent here (now()/LSH-pair pipelines) get the
    driver's rows-only check."""
    from kafka_sink_spark.plans import ORACLES

    return dict(ORACLES)
