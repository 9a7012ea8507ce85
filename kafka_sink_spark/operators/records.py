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


def _json_with_literal_fallback(
    source: Column, schema: StructType
) -> tuple[Column, Column]:
    """Return (parsed_struct, literal_string) implementing JSON-or-literal.

    ``from_json`` in PERMISSIVE mode with ``columnNameOfCorruptRecord`` yields
    the raw text in the corrupt column when the input is not valid JSON; we
    surface that as the literal-fallback field and null out the parsed struct
    for such rows, matching reference mode selection
    (MetadataCreatorTest.java:69-116).
    """
    schema_with_corrupt = StructType(
        [f for f in schema.fields] + [StructType().add(CORRUPT_COL, StringType()).fields[0]]
    )
    parsed_all = F.from_json(
        source.cast("string"),
        schema_with_corrupt,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    is_corrupt = parsed_all.getField(CORRUPT_COL).isNotNull()
    parsed = F.when(source.isNotNull() & ~is_corrupt, parsed_all).otherwise(F.lit(None))
    literal = F.when(source.isNotNull() & is_corrupt, source.cast("string")).otherwise(
        F.lit(None)
    )
    return parsed, literal


def decode_records(
    records: DataFrame,
    value_schema: StructType | None = None,
    key_schema: StructType | None = None,
) -> DataFrame:
    """Add decoded key/value namespace columns to a record DataFrame.

    - With a schema: JSON decode with literal fallback (modes 2-3).
    - Without a schema: raw mode — the bare column IS the single field
      (mode 4); whole-key/value mapping reads it directly.
    - If the key/value column is already a struct (the Avro/Connect path after
      ``from_avro``), it is used as the parsed namespace unchanged (mode 1).

    Keeps every original column (topic/partition/offset/timestamp/headers) so
    downstream stages can use record metadata (writetime, routing).
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
            parsed, literal = _json_with_literal_fallback(F.col(col_name), schema)
            out = out.withColumn(parsed_name, parsed).withColumn(literal_name, literal)
        # Raw mode: no namespace columns; the compiler reads the bare column.
    return out


def headers_from_entries(headers_array: Column) -> Column:
    """Kafka source headers come as ARRAY<STRUCT<key,value>>; the reference
    addresses them by name (HeadersCCMIT.java:119-242) → map for O(1) lookup."""
    return F.map_from_entries(headers_array)
