"""Streaming analytics tests: windowed aggregation, session windows, and the
custom stateful operator, each replayed from a file stream with
trigger(availableNow=True) and diffed against the batch/oracle result."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables
from kafka_sink_spark.streaming.analytics import (
    hourly_rollup_stream,
    running_user_profile,
    sessionize_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _event_stream(spark, tmp_path):
    events = load_tables(spark, SF_DIR, ("events",))["events"]
    src = str(tmp_path / "events_src")
    events.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).write.mode("overwrite").parquet(src)
    return spark.readStream.schema(EVENT_SCHEMA).parquet(src)


def _run_to_memory(spark, df, name, ckpt, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None, q.exception()
    return spark.table(name)


def test_hourly_rollup_stream_matches_batch(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    # complete mode: append would (correctly) hold back windows the final
    # watermark hasn't closed; for the batch diff we want every window.
    out = _run_to_memory(
        spark,
        hourly_rollup_stream(stream),
        "hourly_stream_out",
        str(tmp_path / "ckpt"),
        mode="complete",
    )
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value_millionths"])
        for r in out.collect()
    }
    batch = QUERIES["events_hourly_rollup"](spark, SF_DIR)
    exp = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value_millionths"])
        for r in batch.collect()
    }
    assert got == exp


def test_sliding_rollup_stream_matches_batch_twin(spark, tmp_path):
    """The REAL sliding-window streaming query (availableNow replay) must
    emit exactly the batch twin's buckets — certifying the 4x overlap
    expansion under streaming execution, not just batch."""
    from kafka_sink_spark.streaming.analytics import sliding_rollup_stream
    from pyspark.sql import functions as F

    stream = _event_stream(spark, tmp_path)
    out = _run_to_memory(
        spark,
        sliding_rollup_stream(stream),
        "sliding_stream_out",
        str(tmp_path / "ckpt_sliding"),
        mode="complete",
    )
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value_millionths"])
        for r in out.collect()
    }
    twin = QUERIES["stream_sliding_rollup_twin"](spark, SF_DIR).select(
        F.timestamp_micros(F.col("bucket_start_us")).alias("bucket_start"),
        "event_type",
        "n_events",
        "sum_value_millionths",
    )
    exp = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value_millionths"])
        for r in twin.collect()
    }
    assert got == exp


def test_running_ewma_state_survives_microbatch_boundary(spark, tmp_path):
    """The stateful EWMA must carry its ≤15-value state ACROSS micro-batches:
    the events split into two time-ordered files, replayed one file per
    trigger, and the union of emissions must equal the batch events_ewma
    result exactly — any state loss at the boundary would reset n_window
    and shift every post-boundary ewma."""
    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables
    from kafka_sink_spark.streaming.analytics import running_ewma

    events = load_tables(spark, SF_DIR, ("events",))["events"]
    sel = events.select("event_id", "ts", "user_id", "value")
    src = str(tmp_path / "ewma_src")
    # two single-file writes in TIME order (per-user order is what matters;
    # the ts split guarantees it): the file source processes them oldest
    # mtime first with maxFilesPerTrigger=1 → two micro-batches.
    tcut = sel.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    sel.filter(F.col("ts") <= tcut).coalesce(1).write.mode("append").parquet(src)
    sel.filter(F.col("ts") > tcut).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = _run_to_memory(
        spark,
        running_ewma(stream),
        "ewma_stream_out",
        str(tmp_path / "ckpt_ewma"),
        mode="append",
    )
    got = {r["event_id"]: (r["n_window"], r["ewma"]) for r in out.collect()}
    exp = {
        r["event_id"]: (r["n_window"], r["ewma"])
        for r in QUERIES["events_ewma"](spark, SF_DIR).collect()
    }
    assert got == exp


def test_sessionize_stream_matches_batch(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    out = _run_to_memory(
        spark,
        sessionize_stream(stream),
        "session_stream_out",
        str(tmp_path / "ckpt"),
        mode="complete",
    )
    got = (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    got_rows = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in got.collect()}
    batch = QUERIES["events_sessionize"](spark, SF_DIR)
    exp_rows = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()}
    assert got_rows == exp_rows


def test_running_user_profile_state(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    out = _run_to_memory(
        spark,
        running_user_profile(stream),
        "profile_stream_out",
        str(tmp_path / "ckpt"),
        mode="update",
    )
    # update mode: take the LAST emission per user (highest running total).
    got = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events_total").alias("n_events_total"),
            F.max("last_event_id").alias("last_event_id"),
        )
    )
    events = load_tables(spark, SF_DIR, ("events",))["events"]
    exp = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events_total"),
        F.max("event_id").alias("last_event_id"),
    )
    got_rows = {r["user_id"]: (r["n_events_total"], r["last_event_id"]) for r in got.collect()}
    exp_rows = {r["user_id"]: (r["n_events_total"], r["last_event_id"]) for r in exp.collect()}
    assert got_rows == exp_rows


def test_interval_join_stream_matches_batch(spark, tmp_path):
    from kafka_sink_spark.streaming.analytics import interval_join_stream

    stream = _event_stream(spark, tmp_path)
    anchors = stream.filter(F.col("event_type") == "purchase")
    probes = stream.filter(F.col("event_type") == "click")
    out = _run_to_memory(
        spark,
        interval_join_stream(anchors, probes),
        "interval_join_out",
        str(tmp_path / "ckpt_ij"),
    )
    got = {(r["anchor_id"], r["probe_id"], r["gap_us"]) for r in out.collect()}

    events = load_tables(spark, SF_DIR, ("events",))["events"]
    a = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("a_user_id"),
        F.col("event_id").alias("anchor_id"),
        F.col("ts").alias("a_ts"),
    )
    p = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("probe_id"),
        F.col("ts").alias("p_ts"),
    )
    batch = a.join(
        p,
        F.expr("a_user_id = p_user_id AND p_ts BETWEEN a_ts - INTERVAL 1 HOUR AND a_ts"),
    ).select(
        "anchor_id",
        "probe_id",
        (F.unix_micros(F.col("a_ts")) - F.unix_micros(F.col("p_ts"))).alias("gap_us"),
    )
    exp = {(r["anchor_id"], r["probe_id"], r["gap_us"]) for r in batch.collect()}
    assert got == exp and len(got) > 0


def test_dedup_stream_drops_replayed_records(spark, tmp_path):
    from kafka_sink_spark.streaming.analytics import dedup_stream

    events = load_tables(spark, SF_DIR, ("events",))["events"]
    src = str(tmp_path / "dup_src")
    sel = events.select("event_id", "ts", "user_id", "event_type", "value")
    # two identical files in the source dir = an at-least-once replay
    sel.write.mode("overwrite").parquet(src)
    sel.write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = _run_to_memory(
        spark,
        dedup_stream(stream, ["event_id"]),
        "dedup_stream_out",
        str(tmp_path / "ckpt_dd"),
    )
    n_distinct = sel.count()
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct


def test_gopher_filter_stream_matches_batch(spark, tmp_path):
    """Stateless quality filtering runs unchanged on a stream: gopher_flags
    is a pure projection, so readStream → flags ≡ the batch result row for
    row. This is the streaming path for filter-at-ingest curation."""
    from kafka_sink_spark.extensions.text import gopher_flags

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    src = str(tmp_path / "docs_src")
    docs.select("doc_id", "lang", "text").write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, lang string, text string").parquet(src)

    out = _run_to_memory(
        spark,
        gopher_flags(stream),
        "gopher_stream_out",
        str(tmp_path / "gopher_ckpt"),
    )
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    want = {r["doc_id"]: r.asDict() for r in gopher_flags(docs).collect()}
    assert got == want


def test_enrich_rollup_stream_across_microbatches(spark, tmp_path):
    """The stream-static enrichment rollup must accumulate ACROSS
    micro-batches (two files, one per trigger) and its complete-mode final
    state must equal the plain batch join+rollup — proving the static side
    re-resolves per micro-batch and the aggregation state carries over."""
    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables
    from kafka_sink_spark.streaming.analytics import enrich_rollup_stream

    t = load_tables(spark, SF_DIR, ("events", "customer"))
    sel = t["events"].select("event_id", "ts", "user_id", "event_type", "value")
    src = str(tmp_path / "enrich_src")
    tcut = sel.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    sel.filter(F.col("ts") <= tcut).coalesce(1).write.mode("append").parquet(src)
    sel.filter(F.col("ts") > tcut).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = _run_to_memory(
        spark,
        enrich_rollup_stream(stream, t["customer"]),
        "enrich_stream_out",
        str(tmp_path / "ckpt_enrich"),
        mode="complete",
    )
    got = {
        (r.mktsegment, r.event_type): (r.n_events, r.sum_value_millionths)
        for r in out.collect()
    }
    exp = {
        (r.c_mktsegment, r.event_type): (r.n, r.s)
        for r in t["events"]
        .join(t["customer"], F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias("s"),
        )
        .collect()
    }
    assert got == exp
