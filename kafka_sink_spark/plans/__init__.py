from kafka_sink_spark.plans.queries import ORACLES, QUERIES  # noqa: F401
import kafka_sink_spark.plans.analytics  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.parity_extra  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_extra  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_tpch2  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_curation  # noqa: F401,E402  (registers into the catalog)
