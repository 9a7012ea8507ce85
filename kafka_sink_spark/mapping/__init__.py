from kafka_sink_spark.mapping.parser import (  # noqa: F401
    MappingEntry,
    MappingError,
    parse_mapping,
)

# NOTE: mapping.compiler is imported lazily by callers (it depends on config,
# which depends on mapping.parser — importing it here would be circular).
