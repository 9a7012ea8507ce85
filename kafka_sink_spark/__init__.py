"""kafka_sink_spark — a PySpark-native engine with the query and data-processing
capabilities of the DataStax Apache Kafka Connector (datastax/kafka-sink).

The reference is a Kafka Connect sink that maps Kafka records through a
declarative mapping DSL + codec layer into Cassandra writes
(reference: sink/src/main/java/com/datastax/oss/kafka/sink/CassandraSinkTask.java:81-88).
This package re-expresses that entire surface as Spark DataFrame transforms:

- ``config``            connector configuration model (topic.<t>.<ks>.<tbl>.* keys)
- ``mapping``           the mapping DSL parser + compiler (Mapping.g4 equivalent)
- ``operators.records`` record decode: Struct / JSON-with-literal-fallback / raw / headers
- ``functions.codecs``  the scalar conversion library (C1–C17 of SURVEY.md §2.4)
- ``operators.writes``  write semantics: insert/delete/counter routing, TTL/writetime,
                        last-write-wins upsert replay, partition-key batching
- ``streaming``         Structured Streaming shell (foreachBatch, error policy, metrics)
- ``sources``           Kafka source config + batch record adapters; Cassandra writer
- ``extensions``        beyond-parity training-data operators: dedup, similarity
                        search, text analysis, multimodal columns

Everything is declarative DataFrame/SQL so Catalyst handles pushdown, pruning
and codegen; Python UDFs appear only where Spark has no builtin (timeuuid v1,
locale-aware parsing) and are Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from kafka_sink_spark.session import get_spark  # noqa: F401
