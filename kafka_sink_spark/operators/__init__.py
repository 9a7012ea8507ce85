from kafka_sink_spark.operators.records import decode_records  # noqa: F401
from kafka_sink_spark.operators.writes import (  # noqa: F401
    add_ttl_writetime,
    replay_final_state,
    route_writes,
)
