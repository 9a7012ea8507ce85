from kafka_sink_spark.functions.timeuuid import now_timeuuid  # noqa: F401
from kafka_sink_spark.functions import codecs  # noqa: F401
