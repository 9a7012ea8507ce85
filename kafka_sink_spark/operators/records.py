"""Record decode: Kafka record columns → mapped field namespaces.

The reference decodes each record's key and value independently into one of
three modes (reference:
sink/src/test/java/com/datastax/oss/kafka/sink/metadata/MetadataCreatorTest.java:45-155):

1. Struct (Connect/Avro schema) → typed fields
2. String that parses as JSON      → JSON fields
3. String that does NOT parse      → the whole string as ONE literal field
   ("shouldTreatStringLiterallyIfItIsIncorrectJSON", MetadataCreatorTest.java:104-116)
4. Anything else (raw primitive / bytes / list) → single ``__self`` pseudo-field
   (RawData.FIELD_NAME; reference: record/StructDataTest.java:43-46)

Spark-first realization: mode 1 is ``from_avro``/typed columns, modes 2–3 are
``from_json`` in PERMISSIVE mode with a corrupt-record column providing the
literal fallback, mode 4 is a plain ``cast``. All JVM-side, no Python UDFs —
the whole decode stays inside WholeStageCodegen.

Canonical record DataFrame (what ``spark.readStream.format("kafka")`` yields,
plus ``headers`` as a map):

    topic STRING, partition INT, offset LONG, timestamp TIMESTAMP,
    key STRING|BINARY|*, value STRING|BINARY|*, headers MAP<STRING, STRING>
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"

# Decoded namespace columns added to the record DataFrame.
KEY_PARSED = "_key_parsed"
KEY_LITERAL = "_key_literal"
VALUE_PARSED = "_value_parsed"
VALUE_LITERAL = "_value_literal"
HEADERS_MAP = "headers"

# The reference's pseudo-field for whole-raw-value (RawData.FIELD_NAME).
RAW_FIELD = "__self"


def decode_records(
    records: DataFrame,
    value_schema: StructType | None = None,
    key_schema: StructType | None = None,
) -> DataFrame:
    """Add decoded key/value namespace columns to a record DataFrame.

    - With a schema: JSON decode with literal fallback (modes 2-3).
      ``from_json`` in PERMISSIVE mode with ``columnNameOfCorruptRecord``
      yields the raw text in the corrupt column when the input is not valid
      JSON; that surfaces as the literal-fallback field while the parsed
      struct is nulled for such rows (MetadataCreatorTest.java:69-116).
    - Without a schema: raw mode — the bare column IS the single field
      (mode 4); whole-key/value mapping reads it directly.
    - If the key/value column is already a struct (the Avro/Connect path after
      ``from_avro``), it is used as the parsed namespace unchanged (mode 1).

    Keeps every original column (topic/partition/offset/timestamp/headers) so
    downstream stages can use record metadata (writetime, routing).

    Perf note: the raw ``from_json`` result is materialized under its own
    alias in a FIRST projection and only referenced (3×) in the second —
    CollapseProject refuses to inline a non-cheap multiply-referenced alias,
    so the JSON parse runs exactly once per record instead of once per
    referencing expression.
    """
    out = records
    for col_name, schema, parsed_name, literal_name in (
        ("key", key_schema, KEY_PARSED, KEY_LITERAL),
        ("value", value_schema, VALUE_PARSED, VALUE_LITERAL),
    ):
        if col_name not in records.columns:
            continue
        dtype = dict(records.dtypes)[col_name]
        if dtype.startswith("struct"):
            # Mode 1: already a typed struct (Avro path).
            out = out.withColumn(parsed_name, F.col(col_name)).withColumn(
                literal_name, F.lit(None).cast("string")
            )
        elif schema is not None:
            schema_with_corrupt = StructType(
                [f for f in schema.fields]
                + [StructType().add(CORRUPT_COL, StringType()).fields[0]]
            )
            raw_name = f"_{col_name}_parsed_raw"
            # Stage 1: parse once.
            out = out.withColumn(
                raw_name,
                F.from_json(
                    F.col(col_name).cast("string"),
                    schema_with_corrupt,
                    {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
                ),
            )
            # Stage 2: derive parsed/literal from the staged parse.
            source = F.col(col_name)
            is_corrupt = F.col(raw_name).getField(CORRUPT_COL).isNotNull()
            out = out.select(
                "*",
                F.when(source.isNotNull() & ~is_corrupt, F.col(raw_name))
                .otherwise(F.lit(None))
                .alias(parsed_name),
                F.when(source.isNotNull() & is_corrupt, source.cast("string"))
                .otherwise(F.lit(None))
                .alias(literal_name),
            ).drop(raw_name)
        # Raw mode: no namespace columns; the compiler reads the bare column.
    return out


def headers_from_entries(headers_array: Column) -> Column:
    """Kafka source headers come as ARRAY<STRUCT<key,value>>; the reference
    addresses them by name (HeadersCCMIT.java:119-242) → map for O(1) lookup."""
    return F.map_from_entries(headers_array)
