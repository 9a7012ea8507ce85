"""Mapping DSL parser tests — semantics pinned by the reference's grammar and
error messages (Mapping.g4, HeadersCCMIT.java:245-265, KeyValueRecordTest.java:113-119).
"""

import pytest

from kafka_sink_spark.mapping.parser import MappingEntry, MappingError, parse_mapping


def test_simple_mapping():
    entries = parse_mapping("bigintcol=value.bigint, intcol=value.int")
    assert entries == [
        MappingEntry("bigintcol", "value", "bigint"),
        MappingEntry("intcol", "value", "int"),
    ]


def test_whole_key_value():
    entries = parse_mapping("bigintcol=key, udtcol=value")
    assert entries[0] == MappingEntry("bigintcol", "key", None)
    assert entries[1] == MappingEntry("udtcol", "value", None)


def test_whole_value_and_cherry_pick():
    # StructEndToEndCCMIT.java:495-523: udtcol=value, intcol=value.udtmem1
    entries = parse_mapping("udtcol=value, intcol=value.udtmem1")
    assert entries[0].path is None
    assert entries[1].path == "udtmem1"


def test_header_field():
    entries = parse_mapping("col1=header.h1")
    assert entries[0] == MappingEntry("col1", "header", "h1")


def test_bare_header_invalid():
    # HeadersCCMIT.java:245-265
    with pytest.raises(MappingError, match="field names in mapping"):
        parse_mapping("col1=header")


def test_now_function():
    entries = parse_mapping("loaded_at=now(), pk=key")
    assert entries[0].is_function
    assert entries[0].source_name == "now()"


def test_unknown_function_rejected():
    with pytest.raises(MappingError, match=r"now\(\)"):
        parse_mapping("loaded_at=later()")


def test_unknown_prefix_rejected():
    # KeyValueRecordTest.java:113-119
    with pytest.raises(MappingError):
        parse_mapping("col1=nonsense.f1")


def test_quoted_column_and_field():
    # KAF-83 (StructEndToEndCCMIT.java:611-668): quoted case-sensitive names
    # with spaces/dots/dashes on both sides.
    entries = parse_mapping(
        '"bigint col"="key.bigint field", "boolean-col"="key.boolean-field", '
        '"INT COL"="value.INT FIELD", "TEXT.COL"="value.TEXT.FIELD"'
    )
    assert entries[0].column == "bigint col"
    assert entries[0].namespace == "key"
    assert entries[0].path == "bigint field"
    assert entries[2].column == "INT COL"
    assert entries[3].path == "TEXT.FIELD"  # first-dot split only


def test_doubled_quote_escape():
    entries = parse_mapping('"a""b"=value.f1')
    assert entries[0].column == 'a"b'


def test_inner_quoted_field():
    entries = parse_mapping('col1=value."field.with.dots"')
    assert entries[0].path == "field.with.dots"


def test_unquoted_column_lowercased():
    # Unquoted CQL identifiers are case-insensitive → canonical lower case.
    entries = parse_mapping("BigIntCol=value.bigint")
    assert entries[0].column == "bigintcol"


def test_ttl_timestamp_targets():
    entries = parse_mapping("pk=key, __ttl=value.ttlcol, __timestamp=value.tscol")
    assert entries[1].column == "__ttl"
    assert entries[2].column == "__timestamp"


def test_duplicate_column_rejected():
    with pytest.raises(MappingError, match="duplicate"):
        parse_mapping("a=value.x, a=value.y")


def test_empty_mapping_rejected():
    with pytest.raises(MappingError):
        parse_mapping("   ")


def test_trailing_comma_rejected():
    with pytest.raises(MappingError):
        parse_mapping("a=value.x,")
