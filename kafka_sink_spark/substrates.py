"""Central registry of the session-scoped substrate memo caches.

Every entry is a module-level dict that memoizes a *materialized* shared
substrate (persisted or checkpointed DataFrames, or tuples/lists of them)
per (applicationId, input-plan, hyperparameters) key.  The memos exist so
that K consumers of the same corpus pass pay for ONE build per session —
the architecturally right shape at scale — but they also mean a
min-of-reps benchmark only ever publishes *warm* per-query numbers (the
first rep of the first consumer pays the build; the min drops it).

This registry makes that accounting auditable (r14 verdict ask #1):

- ``clear_all()`` drops every memo entry and unpersists the cached frames,
  so ``SPARK_GRAFT_BENCH_COLD=1`` bench runs re-pay every substrate build
  inside every rep — the honest cold single-query cost.
- ``sizes()`` reports how many entries each cache holds, so a bench run
  can publish which substrates were actually materialized.

The two non-substrate module caches are deliberately NOT listed:
``session._RELATION_CACHE`` memoizes *unmaterialized* parquet relations
(pure schema-inference driver roundtrips — nothing is computed or stored),
and ``operators.cassandra_writer._BUNDLE_CACHE`` holds a config string.

tests/test_substrate_registry.py scans the package source for
``*_CACHE`` declarations and fails if a new substrate cache is added
without registering it here.
"""

from __future__ import annotations

import importlib

# (module, attribute) for every substrate memo cache in the package.
SUBSTRATE_CACHES: list[tuple[str, str]] = [
    ("kafka_sink_spark.extensions.dedup", "_CC_CACHE"),
    ("kafka_sink_spark.extensions.similarity", "_COMPONENT_CACHE"),
    ("kafka_sink_spark.extensions.similarity", "_LLOYD_CACHE"),
    ("kafka_sink_spark.extensions.similarity", "_TRAINED_DIST_CACHE"),
    ("kafka_sink_spark.extensions.similarity", "_IVFPQ_INDEX_CACHE"),
    ("kafka_sink_spark.plans.analytics_assoc", "_SH_CACHE"),
    ("kafka_sink_spark.plans.analytics_corpus", "_BIGRAM_CACHE"),
    ("kafka_sink_spark.plans.analytics_corpus", "_DSIR_CACHE"),
    ("kafka_sink_spark.plans.analytics_curation", "_SHINGLE_CACHE"),
    ("kafka_sink_spark.plans.analytics_fusion", "_BM25_POSTING_CACHE"),
    ("kafka_sink_spark.plans.analytics_inference", "_LP_CACHE"),
    ("kafka_sink_spark.plans.analytics_matching", "_ORIENT_CACHE"),
    ("kafka_sink_spark.plans.analytics_matching", "_TRIANGLE_CACHE"),
    ("kafka_sink_spark.plans.analytics_mining", "_EDGE_CACHE"),
    ("kafka_sink_spark.plans.analytics_mining", "_RANK_CACHE"),
    ("kafka_sink_spark.plans.analytics_profiles", "_SUPPORT_CACHE"),
    ("kafka_sink_spark.plans.analytics_quality", "_SPAN_HASH_CACHE"),
    ("kafka_sink_spark.plans.analytics_retrieval", "_BM25_SCORED_CACHE"),
    ("kafka_sink_spark.plans.analytics_sanitize", "_EXCISION_CACHE"),
    ("kafka_sink_spark.plans.analytics_sanitize", "_LINE_CACHE"),
    ("kafka_sink_spark.plans.analytics_sanitize", "_CLS_SCORED_CACHE"),
    ("kafka_sink_spark.plans.analytics_stats", "_XQ_CACHE"),
    ("kafka_sink_spark.plans.analytics_weblm", "_KN_SCORED_CACHE"),
    ("kafka_sink_spark.plans.analytics_weblm", "_DOC_TRIGRAM_CACHE"),
]


def _caches() -> list[tuple[str, dict]]:
    out = []
    for mod_name, attr in SUBSTRATE_CACHES:
        mod = importlib.import_module(mod_name)
        out.append((f"{mod_name.rsplit('.', 1)[-1]}.{attr}", getattr(mod, attr)))
    return out


def _unpersist(value) -> None:
    """Unpersist a cache value: a DataFrame, or a tuple/list/dict of them.
    Checkpointed frames have no cached plan to unpersist — dropping the
    reference is enough to force a rebuild."""
    if isinstance(value, (tuple, list)):
        for v in value:
            _unpersist(v)
        return
    if isinstance(value, dict):
        for v in value.values():
            _unpersist(v)
        return
    unpersist = getattr(value, "unpersist", None)
    if callable(unpersist):
        try:
            unpersist(False)
        except Exception:
            pass  # session already stopped / never persisted


def clear_all() -> int:
    """Drop every substrate memo and unpersist its frames. Returns the
    number of entries cleared."""
    n = 0
    for _, cache in _caches():
        for value in cache.values():
            _unpersist(value)
        n += len(cache)
        cache.clear()
    return n


def sizes() -> dict[str, int]:
    """Entry count per cache (only non-empty ones) — bench provenance."""
    return {name: len(c) for name, c in _caches() if c}
