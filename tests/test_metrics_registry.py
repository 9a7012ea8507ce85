"""Streaming metrics-bridge test: file-source stream → foreachBatch →
REAL cassandra writer (fake driver session) → SinkMetricsListener →
SinkMetricsRegistry, asserting the reference's counter/histogram names
and values after the run (KAF-72 accessor surface,
SimpleEndToEndSimulacronIT.java:636-682 + :859-874 batch histograms).

This is also the full physical end-to-end: decode → map → route →
write_routed's batching/frame accounting → metrics, in one stream.
"""

import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.config import ColumnSpec, SinkConfig, TableConfig, TableSchema
from kafka_sink_spark.mapping.parser import parse_mapping
from kafka_sink_spark.session import load_tables
from kafka_sink_spark.streaming.listener import SinkMetricsListener
from kafka_sink_spark.streaming.pipeline import SinkMetrics, start_sink_stream
from kafka_sink_spark.streaming.registry import SinkMetricsRegistry

from tests.test_cassandra_writer import FakeSession, _factory_for, _read_log

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

RECORD_SCHEMA = (
    "topic string, partition int, offset long, timestamp timestamp, "
    "key string, value string"
)


def _stage_records(spark, tmpdir: str) -> int:
    """events → Kafka-shaped records; every 10th to an unknown topic."""
    events = load_tables(spark, SF_DIR, ("events",))["events"]
    records = events.select(
        F.when(F.col("event_id") % 10 == 0, F.lit("other"))
        .otherwise(F.lit("events"))
        .alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        # A modest key space so same-partition-key batching (W8) kicks in
        # and the batchSizeHistogram sees frames > 1; a sparse set of
        # unique (negative) keys forces standalone EXECUTE frames too.
        F.when(F.col("event_id") % 97 == 1, -F.col("event_id"))
        .otherwise(F.col("event_id") % 50)
        .cast("string")
        .alias("key"),
        F.col("props").alias("value"),
    )
    records.write.mode("overwrite").parquet(tmpdir)
    return records.where(F.col("topic") == "events").count()


def test_registry_names_and_values_after_stream_run(spark, tmp_path):
    src = str(tmp_path / "records")
    ckpt = str(tmp_path / "ckpt")
    log_dir = str(tmp_path / "wire")
    os.makedirs(log_dir)
    n_good = _stage_records(spark, src)

    schema = TableSchema(
        "ks",
        "user_events",
        [ColumnSpec("pk", "bigint", primary_key=True), ColumnSpec("kcol", "int")],
    )
    table = TableConfig(
        "events", "ks", "user_events", parse_mapping("pk=key, kcol=value.k")
    )
    cfg = SinkConfig(tables=[table])

    from kafka_sink_spark.operators.cassandra_writer import write_routed

    factory = _factory_for(log_dir)

    def writer(routed, tbl, sch):
        return write_routed(routed, tbl, sch, cfg, factory)

    metrics = SinkMetrics()
    registry = SinkMetricsRegistry()
    listener = SinkMetricsListener(metrics, emit=registry.update)
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src)
        q = start_sink_stream(
            spark,
            stream,
            cfg,
            {("ks", "user_events"): schema},
            ckpt,
            writer,
            value_schemas={"events": StructType([StructField("k", IntegerType())])},
            metrics=metrics,
            trigger_once=True,
        )
        assert q.awaitTermination(240)
        # The listener bus is asynchronous — wait for the progress event
        # to reach the registry instead of sleeping a fixed amount.
        deadline = time.monotonic() + 30
        while not registry.latest and time.monotonic() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    # -- reference accessor surface (KAF-72) -------------------------------
    assert registry.get_record_counter("events", "ks.user_events") == n_good
    assert registry.get_failed_record_counter("events", "ks.user_events") == 0
    assert registry.get_failed_with_unknown_topic() > 0
    assert registry.get_record_rate("events", "ks.user_events") > 0

    # -- batch histograms (KAF-99) -----------------------------------------
    sizes = registry.get_batch_size_histogram("events", "ks.user_events")
    assert sizes.count > 0
    # 50 keys over hundreds of records → real multi-statement frames.
    assert sizes.max > 1
    assert sum(frame * n for frame, n in sizes.buckets.items()) == n_good

    in_bytes = registry.get_batch_size_in_bytes_histogram("events", "ks.user_events")
    # One update per statement, like the reference histogram.
    assert in_bytes.count == n_good
    assert in_bytes.min > 0 and in_bytes.max >= in_bytes.min
    assert in_bytes.mean and in_bytes.min <= in_bytes.mean <= in_bytes.max

    # -- flat exposition names --------------------------------------------
    names = registry.metric_names()
    assert names == [
        "events/ks.user_events/batchSizeHistogram",
        "events/ks.user_events/batchSizeInBytesHistogram",
        "events/ks.user_events/failedRecordCount",
        "events/ks.user_events/recordCount",
        "failedWithUnknownTopic",
    ]
    assert registry.value("events/ks.user_events/recordCount") == n_good
    assert registry.value("failedWithUnknownTopic") > 0
    assert registry.value("events/ks.user_events/batchSizeHistogram").count == sizes.count

    # -- per-batch pairing + wire evidence --------------------------------
    assert registry.by_batch  # snapshots keyed by batch id
    wire = _read_log(log_dir)
    assert any(line.startswith("BATCH") for line in wire)
    assert any(line.startswith("EXECUTE") for line in wire)


def test_registry_accepts_bare_snapshots():
    m = SinkMetrics()
    m.bump("t|ks.tbl", 7)
    m.bump("t|ks.tbl", 2, failed=True)
    reg = SinkMetricsRegistry()
    reg.update(m.snapshot())
    assert reg.get_record_counter("t", "ks.tbl") == 7
    assert reg.get_failed_record_counter("t", "ks.tbl") == 2
    assert reg.get_batch_size_histogram("t", "ks.tbl").count == 0
    assert "t/ks.tbl/recordCount" in reg.metric_names()


def test_dropwizard_bridge_exports_names_and_values_after_stream_run(
    spark, tmp_path
):
    """The JMX-shaped export (r8 verdict ask #5): after a REAL stream run
    through the physical writer, the DropwizardBridge exposes live
    codahale-style Counters/Histograms under the reference's metric names
    (recordCount, failedRecordCount, batchSizeHistogram,
    batchSizeInBytesHistogram per topic|ks.table + global
    failedWithUnknownTopic) and renders JMX ObjectNames for each."""
    from kafka_sink_spark.streaming.registry import DropwizardBridge

    src = str(tmp_path / "records")
    ckpt = str(tmp_path / "ckpt")
    log_dir = str(tmp_path / "wire")
    os.makedirs(log_dir)
    n_good = _stage_records(spark, src)

    schema = TableSchema(
        "ks",
        "user_events",
        [ColumnSpec("pk", "bigint", primary_key=True), ColumnSpec("kcol", "int")],
    )
    table = TableConfig(
        "events", "ks", "user_events", parse_mapping("pk=key, kcol=value.k")
    )
    cfg = SinkConfig(tables=[table])

    from kafka_sink_spark.operators.cassandra_writer import write_routed

    factory = _factory_for(log_dir)

    def writer(routed, tbl, sch):
        return write_routed(routed, tbl, sch, cfg, factory)

    metrics = SinkMetrics()
    registry = SinkMetricsRegistry()
    bridge = DropwizardBridge(registry)
    # setup-time registration: counters exist (zero) before the first batch
    bridge.register_table("events", "ks.user_events")
    pre = bridge.counters()
    assert pre["events/ks.user_events/recordCount"].getCount() == 0
    assert pre["failedWithUnknownTopic"].getCount() == 0

    listener = SinkMetricsListener(metrics, emit=registry.update)
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src)
        q = start_sink_stream(
            spark,
            stream,
            cfg,
            {("ks", "user_events"): schema},
            ckpt,
            writer,
            value_schemas={"events": StructType([StructField("k", IntegerType())])},
            metrics=metrics,
            trigger_once=True,
        )
        assert q.awaitTermination(240)
        deadline = time.monotonic() + 30
        while not registry.latest and time.monotonic() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    # live counter views reflect the run without re-wiring
    counters = bridge.counters()
    assert counters["events/ks.user_events/recordCount"].getCount() == n_good
    assert counters["events/ks.user_events/failedRecordCount"].getCount() == 0
    assert counters["failedWithUnknownTopic"].getCount() > 0
    # the PRE-run views are live too (same registry): zero → n_good
    assert pre["events/ks.user_events/recordCount"].getCount() == n_good

    hists = bridge.histograms()
    size_h = hists["events/ks.user_events/batchSizeHistogram"]
    snap = size_h.getSnapshot()
    assert size_h.getCount() > 0
    assert snap.getMax() > 1  # real multi-statement frames occurred
    assert snap.getMin() >= 1
    assert snap.getMin() <= snap.getMean() <= snap.getMax()
    bytes_h = hists["events/ks.user_events/batchSizeInBytesHistogram"]
    assert bytes_h.getCount() == n_good  # one update per statement
    assert bytes_h.getSnapshot().getMin() > 0

    # JMX ObjectName rendering + one-scrape export
    assert bridge.object_name("events/ks.user_events/recordCount") == (
        "kafka.sink.spark:type=sink-metrics,topic=events,"
        "keyspace=ks,table=user_events,name=recordCount"
    )
    assert bridge.object_name("failedWithUnknownTopic") == (
        "kafka.sink.spark:type=sink-metrics,name=failedWithUnknownTopic"
    )
    scrape = bridge.export()
    assert (
        scrape[
            "kafka.sink.spark:type=sink-metrics,topic=events,"
            "keyspace=ks,table=user_events,name=recordCount"
        ]
        == n_good
    )
    hist_val = scrape[
        "kafka.sink.spark:type=sink-metrics,topic=events,"
        "keyspace=ks,table=user_events,name=batchSizeInBytesHistogram"
    ]
    assert hist_val["count"] == n_good and hist_val["min"] > 0
