from kafka_sink_spark.sources.kafka import (  # noqa: F401
    kafka_records_stream,
    kafka_source_options,
    normalize_kafka_records,
)
from kafka_sink_spark.sources.avro import (  # noqa: F401
    AvroNotAvailable,
    avro_available,
    decode_avro_records,
)
