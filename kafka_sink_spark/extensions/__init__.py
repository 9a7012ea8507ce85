"""Beyond-reference-parity operators for large-scale training-data pipelines:
deduplication, similarity search, text analysis, multimodal columns.

These are NOT reference surface (the reference has no joins/aggs at all —
SURVEY §2.7); they are the north-star extensions designed partition-first for
100 TB scale: no driver-side collects, broadcast-able small sides, deterministic
hashing so results are reproducible and oracle-checkable.
"""
