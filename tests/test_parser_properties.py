"""Property-based tests for the mapping DSL parser (hypothesis): arbitrary
identifier content survives quoting round-trips, and the parser never
mis-splits on crafted separators inside quoted identifiers."""

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.mapping.parser import parse_mapping

# Quoted identifiers may contain anything; quotes are escaped by doubling
# (reference grammar Mapping.g4:67-69).
ident_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=30
)
plain_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,20}", fullmatch=True)


def q(s: str) -> str:
    return '"' + s.replace('"', '""') + '"'


@settings(max_examples=200, deadline=None)
@given(col=ident_text, field=ident_text)
def test_quoted_roundtrip(col, field):
    mapping = f"{q(col)}=value.{q(field)}"
    entries = parse_mapping(mapping)
    assert len(entries) == 1
    e = entries[0]
    assert e.column == col
    assert e.namespace == "value"
    assert e.path == field


@settings(max_examples=200, deadline=None)
@given(cols=st.lists(plain_ident, min_size=1, max_size=6, unique_by=str.lower))
def test_multi_entry_roundtrip(cols):
    mapping = ", ".join(f"{c}=value.{c}" for c in cols)
    entries = parse_mapping(mapping)
    assert [e.column for e in entries] == [c.lower() for c in cols]
    assert all(e.namespace == "value" for e in entries)
    # unquoted paths keep their case (field names are data, not CQL ids)
    assert [e.path for e in entries] == list(cols)


@settings(max_examples=200, deadline=None)
@given(field=st.text(alphabet='."=, abcXYZ-', min_size=1, max_size=20))
def test_adversarial_quoted_fields_never_mis_split(field):
    """Dots, commas, equals, quotes inside a QUOTED field are content, not
    syntax (KAF-83/84)."""
    mapping = f"c={q('value.' + field)}"
    entries = parse_mapping(mapping)
    assert len(entries) == 1
    assert entries[0].namespace == "value"
    assert entries[0].path == field
