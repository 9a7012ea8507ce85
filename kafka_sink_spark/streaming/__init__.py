from kafka_sink_spark.streaming.pipeline import (  # noqa: F401
    SinkMetrics,
    start_sink_stream,
    process_micro_batch,
)
from kafka_sink_spark.streaming.listener import SinkMetricsListener  # noqa: F401
