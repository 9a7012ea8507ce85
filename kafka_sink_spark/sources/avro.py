"""Avro (Connect Struct) decode path — mode 1 of the record model.

The reference's Struct mode receives Kafka Connect ``Struct`` values carrying
an Avro schema (SURVEY §1.2; reference:
sink/src/test/java/com/datastax/oss/kafka/sink/metadata/MetadataCreatorTest.java:45-66).
Spark-first equivalent: ``from_avro(value, schema_json)`` turns the binary
payload into a typed struct column, and ``decode_records`` then treats it as
the parsed namespace unchanged (mode-1 branch in operators/records.py).

The spark-avro data source is a separate jar (``org.apache.spark:spark-avro``)
that is NOT bundled in this container — decoding is gated behind
``avro_available``; ``decode_avro_records`` raises a clear error when the jar
is missing. The rest of the pipeline (mapping, codecs, routing, writers) is
schema-typed and identical for JSON-parsed and Avro-parsed structs, which the
struct-mode tests in tests/test_sink_pipeline.py exercise without the jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class AvroNotAvailable(RuntimeError):
    """Raised when the spark-avro data source is not on the classpath."""


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro jar is loaded (from_avro usable)."""
    from pyspark.sql.avro.functions import from_avro

    schema = '{"type":"record","name":"probe","fields":[{"name":"a","type":"int"}]}'
    try:
        # Analysis (not execution) is enough to detect the missing source.
        df = spark.range(1).select(from_avro(F.lit(bytearray(b"\x02")), schema))
        df.schema  # forces analysis
        return True
    except Exception:
        return False


def decode_avro_records(
    records: DataFrame,
    value_avro_schema: str,
    key_avro_schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Replace binary key/value columns with Avro-decoded structs, then run
    the standard record decode (struct mode).

    ``value_avro_schema`` / ``key_avro_schema`` are Avro schema JSON strings
    (what the reference gets from Schema Registry). ``options`` passes
    through to ``from_avro`` (e.g. {"mode": "PERMISSIVE"}).
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover
        raise AvroNotAvailable(
            "pyspark.sql.avro is not importable in this environment"
        ) from exc

    from kafka_sink_spark.operators.records import decode_records

    try:
        out = records.withColumn(
            "value", from_avro(F.col("value"), value_avro_schema, options or {})
        )
        if key_avro_schema is not None:
            out = out.withColumn(
                "key", from_avro(F.col("key"), key_avro_schema, options or {})
            )
        out.schema  # force analysis so a missing jar fails HERE, clearly
    except Exception as exc:
        raise AvroNotAvailable(
            "the spark-avro data source is not loaded; add the "
            "org.apache.spark:spark-avro jar matching your Spark version "
            "(spark.jars.packages) to enable Struct/Avro decode"
        ) from exc
    return decode_records(out)
