from kafka_sink_spark.sources.kafka import kafka_records_stream  # noqa: F401
from kafka_sink_spark.sources.cassandra import (  # noqa: F401
    CassandraWriter,
    cassandra_available,
)
