"""Source-layer tests: Kafka option construction/normalization and the gated
Avro decode path (the spark-avro jar is absent in this environment — the
gating itself is the behavior under test; struct-mode decode downstream of
from_avro is exercised with a pre-parsed struct column)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_sink_spark.config import parse_sink_config
from kafka_sink_spark.operators.records import VALUE_LITERAL, VALUE_PARSED, decode_records
from kafka_sink_spark.sources.avro import (
    AvroNotAvailable,
    avro_available,
    decode_avro_records,
)
from kafka_sink_spark.sources.kafka import kafka_source_options, normalize_kafka_records


def test_kafka_source_options():
    cfg = parse_sink_config(
        {
            "topic.t1.ks.a.mapping": "pk=key",
            "topic.t2.ks.b.mapping": "pk=key",
            "datastax-java-driver.kafka.max.poll.records": "5000",
        }
    )
    opts = kafka_source_options(cfg, "broker:9092")
    assert opts["subscribe"] == "t1,t2"
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["includeHeaders"] == "true"
    assert opts["kafka.max.poll.records"] == "5000"  # consumer passthrough


def test_normalize_kafka_records(spark):
    raw = spark.createDataFrame(
        [("t", 0, 1, None, b"k1", b'{"a":1}', [("h1", b"v1")])],
        "topic string, partition int, offset long, timestamp timestamp, "
        "key binary, value binary, headers array<struct<key:string,value:binary>>",
    )
    rec = normalize_kafka_records(raw).collect()[0]
    assert rec["key"] == "k1" and rec["value"] == '{"a":1}'
    assert rec["headers"] == {"h1": "v1"}


def test_avro_gated_with_clear_error(spark):
    assert avro_available(spark) is False  # jar not bundled here
    rec = spark.createDataFrame([(b"x", b"y")], "key binary, value binary")
    with pytest.raises(AvroNotAvailable, match="spark-avro"):
        decode_avro_records(
            rec,
            '{"type":"record","name":"r","fields":[{"name":"a","type":"int"}]}',
        )


def test_struct_mode_decode(spark):
    """Mode 1 (what decoded Avro becomes): a struct value IS the parsed
    namespace; the literal channel stays null."""
    df = spark.createDataFrame(
        [(1, (5, "x"))], "key long, value struct<a:int,b:string>"
    )
    d = decode_records(df)
    row = d.select(VALUE_PARSED, VALUE_LITERAL).collect()[0]
    assert (row[0]["a"], row[0]["b"]) == (5, "x")
    assert row[1] is None
