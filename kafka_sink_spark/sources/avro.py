"""Avro (Connect Struct) decode path — mode 1 of the record model.

The reference's Struct mode receives Kafka Connect ``Struct`` values carrying
an Avro schema (SURVEY §1.2; reference:
sink/src/test/java/com/datastax/oss/kafka/sink/metadata/MetadataCreatorTest.java:45-66).
Spark-first equivalent: ``from_avro(value, schema_json)`` turns the binary
payload into a typed struct column, and ``decode_records`` then treats it as
the parsed namespace unchanged (mode-1 branch in operators/records.py).

The spark-avro data source is a separate jar (``org.apache.spark:spark-avro``)
that is NOT bundled in this container — ``decode_avro_records`` prefers
``from_avro`` (JVM, vectorized) and, when the jar is absent, falls back to
the pure-Python wire codec in ``sources/avro_python.py`` (Arrow-batched
``mapInPandas``; ~UDF speed, real Avro binary). The rest of the pipeline
(mapping, codecs, routing, writers) is schema-typed and identical for
JSON-parsed and Avro-parsed structs.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def _is_missing_avro_source(exc: Exception) -> bool:
    """True only for the 'spark-avro jar absent' analysis failure; genuine
    schema/column errors must propagate rather than silently demote the job
    to the ~100x-slower Python wire codec."""
    msg = str(exc)
    return (
        "AVRO_NOT_LOADED" in msg  # Spark 4.x error class
        or "FAILED_FIND_DATA_SOURCE" in msg
        or "Failed to find data source" in msg  # Spark 3.x wording
    )


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
    allow_python_fallback: bool = True,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Replace binary key/value columns with Avro-decoded structs, then run
    the standard record decode (struct mode).

    ``value_avro_schema`` / ``key_avro_schema`` are Avro schema JSON strings
    (what the reference gets from Schema Registry). ``options`` passes
    through to ``from_avro`` (e.g. {"mode": "PERMISSIVE"}) and to the
    Python fallback, which honors the same parse modes.

    ``corrupt_col``: when set (meaningful with mode=PERMISSIVE), adds a
    boolean column marking records whose VALUE payload was non-null but
    failed to decode — distinguishing corrupt records (ignoreErrors
    territory) from genuine null-value tombstones (delete-on-null routing).
    Works identically on the JVM and fallback paths, since both turn a
    corrupt payload into a null struct under PERMISSIVE.

    Decode path: ``from_avro`` when the spark-avro jar is loaded (JVM,
    vectorized — the 100 TB path); otherwise the pure-Python wire codec
    (sources/avro_python.py, Arrow-batched) unless ``allow_python_fallback``
    is False, in which case AvroNotAvailable is raised.
    """
    from kafka_sink_spark.operators.records import decode_records

    _WAS_NULL = "__value_was_null"
    if corrupt_col is not None:
        records = records.withColumn(_WAS_NULL, F.col("value").isNull())

    def finish(decoded_records: DataFrame) -> DataFrame:
        out = decode_records(decoded_records)
        if corrupt_col is not None:
            out = out.withColumn(
                corrupt_col,
                F.col("value").isNull() & ~F.col(_WAS_NULL),
            ).drop(_WAS_NULL)
        return out

    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError:  # pragma: no cover
        from_avro = None

    if from_avro is not None:
        try:
            out = records.withColumn(
                "value", from_avro(F.col("value"), value_avro_schema, options or {})
            )
            if key_avro_schema is not None:
                out = out.withColumn(
                    "key", from_avro(F.col("key"), key_avro_schema, options or {})
                )
            out.schema  # force analysis so a missing jar fails HERE
            return finish(out)
        except Exception as exc:
            if not _is_missing_avro_source(exc):
                raise  # real schema/column error — do not mask it
            logger.warning(
                "spark-avro data source not loaded (%s); falling back to the "
                "pure-Python Avro wire codec (Arrow-batched, ~100x slower — "
                "add org.apache.spark:spark-avro for the JVM path)",
                type(exc).__name__,
            )

    if not allow_python_fallback:
        raise AvroNotAvailable(
            "the spark-avro data source is not loaded; add the "
            "org.apache.spark:spark-avro jar matching your Spark version "
            "(spark.jars.packages) to enable JVM Struct/Avro decode"
        )
    from kafka_sink_spark.sources.avro_python import decode_avro_column

    # honor from_avro's parse-mode option in the fallback too
    mode = (options or {}).get("mode", "FAILFAST")
    out = decode_avro_column(records, "value", value_avro_schema, mode=mode)
    if key_avro_schema is not None:
        out = decode_avro_column(out, "key", key_avro_schema, mode=mode)
    return finish(out)
