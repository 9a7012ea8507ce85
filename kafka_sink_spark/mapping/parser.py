"""Parser for the reference's mapping DSL.

Grammar reproduced from the reference ANTLR grammar
(reference: sink/src/main/antlr4/com/datastax/oss/kafka/generated/schema/Mapping.g4:22-73):

    mapping     : mappedEntry ( ',' mappedEntry )* ;
    mappedEntry : column '=' field ;
    column      : identifier | quotedIdentifier ;
    field       : ( 'key' | 'value' | 'header' ) ( '.' path )?
                | quotedIdentifier | function ;
    function    : 'now()' ;

Semantics pinned by reference tests:

- Field names must be ``key``, ``value``, or start with ``key.`` / ``value.`` /
  ``header.``, or be a supported function (whitelist exactly ``[now()]``) —
  error text per reference
  sink/src/it/java/com/datastax/oss/kafka/sink/ccm/HeadersCCMIT.java:261-264.
- Bare ``header`` (whole-headers) is invalid — only ``header.<name>``
  (reference: HeadersCCMIT.java:245-265).
- Quoted identifiers: double quotes with doubled-quote escaping; quoted names
  may contain spaces, dots, dashes, and are case-sensitive
  (reference: Mapping.g4:67-69; StructEndToEndCCMIT.java:611-668 KAF-83;
  RawDataEndToEndCCMIT.java:322-360 KAF-84).
- Only ONE level of nesting is addressable: ``value.f1.f2`` is a field literally
  named ``f1.f2`` inside value, not two levels of traversal
  (reference comment: StructEndToEndCCMIT.java:653-654).
- Special target columns ``__ttl`` and ``__timestamp`` select per-row TTL /
  writetime (reference: WriteTimestampAndTtlCCMIT.java:74-160, 297-416).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class MappingError(ValueError):
    """Raised for mapping strings the reference would reject with ConfigException."""


# Exactly the reference's error message (HeadersCCMIT.java:261-264).
_FIELD_ERROR = (
    "field names in mapping must be 'key', 'value', or start with 'key.' or "
    "'value.' or 'header.', or be one of supported functions: '[now()]'"
)

TTL_TARGET = "__ttl"
TIMESTAMP_TARGET = "__timestamp"

_UNQUOTED_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


@dataclass(frozen=True)
class MappingEntry:
    """One ``column=field`` pair.

    ``namespace`` is one of ``key | value | header | function``.
    ``path`` is the field name inside the namespace, or None for whole-key /
    whole-value projection, or the function name for functions.
    ``column_quoted`` / ``path_quoted`` record whether the user quoted the
    identifier (quoted ⇒ case-sensitive exact match; unquoted column names are
    lower-cased like CQL identifiers).
    """

    column: str
    namespace: str
    path: str | None
    column_quoted: bool = False
    path_quoted: bool = False

    @property
    def is_function(self) -> bool:
        return self.namespace == "function"

    @property
    def source_name(self) -> str:
        """Canonical qualified field name, e.g. ``value.f1`` or ``now()``."""
        if self.namespace == "function":
            return f"{self.path}()"
        if self.path is None:
            return self.namespace
        return f"{self.namespace}.{self.path}"


class _Tokenizer:
    """Character-level scanner handling quoted identifiers with '""' escapes."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self) -> None:
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def eof(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.text)

    def peek(self) -> str:
        self.skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def expect(self, ch: str) -> None:
        self.skip_ws()
        if self.pos >= len(self.text) or self.text[self.pos] != ch:
            raise MappingError(
                f"invalid mapping syntax at position {self.pos}: expected {ch!r} "
                f"in {self.text!r}"
            )
        self.pos += 1

    def quoted_identifier(self) -> str:
        # Opening quote already peeked; consume it.
        assert self.text[self.pos] == '"'
        self.pos += 1
        out: list[str] = []
        while self.pos < len(self.text):
            ch = self.text[self.pos]
            if ch == '"':
                if self.pos + 1 < len(self.text) and self.text[self.pos + 1] == '"':
                    out.append('"')  # doubled-quote escape (Mapping.g4:67-69)
                    self.pos += 2
                    continue
                self.pos += 1
                return "".join(out)
            out.append(ch)
            self.pos += 1
        raise MappingError(f"unterminated quoted identifier in {self.text!r}")

    def unquoted_until(self, stops: str) -> str:
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] not in stops:
            self.pos += 1
        return self.text[start : self.pos].strip()


def _parse_field(tok: _Tokenizer) -> tuple[str, str | None, bool]:
    """Parse the right-hand side. Returns (namespace, path, path_quoted)."""
    tok.skip_ws()
    if tok.peek() == '"':
        # Entirely-quoted field: the quoted text itself is 'ns.path' where the
        # dotted split happens on the FIRST dot only (one nesting level).
        raw = tok.quoted_identifier()
        ns, path = _split_field(raw)
        return ns, path, True
    # ns."quoted path": the path is scanned with the real quote rules, so
    # commas/equals/doubled-quotes inside are content, not syntax (KAF-84).
    for ns in ("key", "value", "header"):
        if tok.text.startswith(ns + '."', tok.pos):
            tok.pos += len(ns) + 1  # consume 'ns.'
            path = tok.quoted_identifier()
            if not path:
                raise MappingError(_FIELD_ERROR)
            return ns, path, True
    raw = tok.unquoted_until(",").strip()
    if raw == "now()":
        return "function", "now", False
    if raw.endswith("()"):
        raise MappingError(_FIELD_ERROR)
    ns, path = _split_field(raw)
    return ns, path, False


def _split_field(raw: str) -> tuple[str, str | None]:
    if raw == "key" or raw == "value":
        return raw, None
    if raw == "header":
        # Whole-headers projection is invalid (HeadersCCMIT.java:245-265).
        raise MappingError(_FIELD_ERROR)
    for ns in ("key", "value", "header"):
        prefix = ns + "."
        if raw.startswith(prefix):
            path = raw[len(prefix) :]
            # Inside an entirely-quoted field the text after 'ns.' is the
            # field name LITERALLY (quote characters included) — the
            # ns."quoted" form is scanned separately in _parse_field.
            if not path:
                raise MappingError(_FIELD_ERROR)
            return ns, path
    raise MappingError(_FIELD_ERROR)


def parse_mapping(mapping: str) -> list[MappingEntry]:
    """Parse a full mapping string into entries.

    >>> parse_mapping("bigintcol=value.bigint, intcol=value.int")
    [MappingEntry(column='bigintcol', namespace='value', path='bigint', ...), ...]
    """
    if mapping is None or not mapping.strip():
        raise MappingError("mapping is empty")
    tok = _Tokenizer(mapping)
    entries: list[MappingEntry] = []
    seen: set[str] = set()
    while True:
        tok.skip_ws()
        if tok.peek() == '"':
            column = tok.quoted_identifier()
            column_quoted = True
        else:
            column = tok.unquoted_until("=").strip()
            column_quoted = False
            if not column or not _UNQUOTED_IDENT.fullmatch(column):
                raise MappingError(
                    f"invalid column name {column!r} in mapping {mapping!r}"
                )
            # Unquoted CQL identifiers are case-insensitive → canonical lower.
            column = column.lower()
        tok.expect("=")
        ns, path, path_quoted = _parse_field(tok)
        if column in seen:
            raise MappingError(f"duplicate column {column!r} in mapping")
        seen.add(column)
        entries.append(
            MappingEntry(
                column=column,
                namespace=ns,
                path=path,
                column_quoted=column_quoted,
                path_quoted=path_quoted,
            )
        )
        if tok.eof():
            return entries
        tok.expect(",")
        if tok.eof():
            raise MappingError(f"trailing comma in mapping {mapping!r}")
