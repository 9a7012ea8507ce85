"""Kafka source: SinkConfig → a Structured Streaming DataFrame with the
canonical record columns.

The reference subscribes via the Connect runtime (``topics=t1,t2``,
reference: dist/conf/cassandra-sink-standalone.properties.sample:5-6;
CassandraSinkTask.java:81-88 receives the records). Spark's Kafka source
replaces all of that: one ``readStream`` covers every configured topic;
parallelism is Kafka-partition driven exactly like the reference's task model
(CassandraSinkConnector.taskConfigs returns identical configs — scaling is
purely partition parallelism, CassandraSinkConnector.java:81-87).

The kafka-sql connector jars are not present in this container, so the
builder is exercised up to option construction in tests; the returned
DataFrame creation is attempted only when the package resolves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_sink_spark.config import SinkConfig
from kafka_sink_spark.operators.records import headers_from_entries


def kafka_source_options(
    config: SinkConfig, bootstrap_servers: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """Build the Kafka source options from the connector config."""
    topics = sorted({t.topic for t in config.tables})
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
        "includeHeaders": "true",
        # at-least-once: offsets tracked by Spark checkpoint, not Kafka commit
        "failOnDataLoss": "false",
    }
    # Driver-config passthrough (sample:227-259): kafka.* consumer settings.
    for k, v in config.driver_settings.items():
        if k.startswith("kafka."):
            opts[k] = v
    return opts


def normalize_kafka_records(raw: DataFrame) -> DataFrame:
    """Kafka source schema → canonical record columns.

    key/value arrive as BINARY: cast to STRING for the JSON/literal decode
    path (Avro payloads would instead flow through from_avro upstream of
    decode_records). Headers become a name→value map (values kept as binary,
    cast at mapping time per target column)."""
    cols = [
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    ]
    if "headers" in raw.columns:
        cols.append(
            F.when(F.col("headers").isNotNull(),
                   headers_from_entries(
                       F.transform(
                           F.col("headers"),
                           lambda h: F.struct(
                               h.getField("key").alias("key"),
                               h.getField("value").cast("string").alias("value"),
                           ),
                       )
                   )).alias("headers")
        )
    return raw.select(*cols)


def kafka_records_stream(
    spark: SparkSession,
    config: SinkConfig,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from Kafka with canonical record columns. Requires the
    spark-sql-kafka package on the classpath."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(config, bootstrap_servers, starting_offsets).items():
        reader = reader.option(k, v)
    return normalize_kafka_records(reader.load())
