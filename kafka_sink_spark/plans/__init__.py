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
import kafka_sink_spark.plans.analytics_paths  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_fusion  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_inference  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_frontier  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_measures  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_matching  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_assoc  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_digest  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_novelty  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_probes  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_evaluation  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_insights  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_structure  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_release  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_coverage  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_robust  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_profiles  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_resampling  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_estimation  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_governance  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_lateness  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_experimentation  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_readability  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_ranking  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_replay  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_manifest  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_segments  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_survival  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_dispersion  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_bias  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_loadqa  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_affinity  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_hapax  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_geometry  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_tails  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_information  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_payload  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_annqa  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_tuning  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_budget  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_decomp  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_assurance  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_retrieval  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_hamming  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_guardrails  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_refinement  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_weblm  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_sanitize  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_webpipe  # noqa: F401,E402  (registers into the catalog)

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The verify driver checks the FIRST 50 registered queries each round, in
# registration order, so this list decides which queries get an *official*
# CORRECTNESS_r* row.  A query's FIRST official row outranks a
# re-certification (a missing first row cannot be recovered later), and
# out-of-window queries are covered every round by the full
# tools/driver_check.py sweep (REPLICA_r*.md) plus the judge's own replica
# run.
#
# Round-14 rotation: per the r13 verdict's #3 ask — the 2 round-13 webpipe
# queries with ZERO official rows lead the window (first-row priority;
# dual-SF replica green in r13 + the judge's own sf0.01/sf0.001 runs),
# followed by the full 35-query r7-cohort remainder (the oldest official
# rows left in the catalog, untouched since CORRECTNESS_r7), then the 13
# registration-order-first r8-cohort queries.  After this window lands,
# every catalog query has an official row and no query's last official
# certification is older than r8 (37 r8-stale queries remain for r15).
# Cohort membership is computed from the CORRECTNESS_r01..r13 history:
# latest-official-round per query, oldest first, catalog order within a
# cohort.
# The list is kept at EXACTLY 50 entries (window size; enforced by
# tests/test_catalog_contract.py); everything else follows in original
# registration order and stays locally gated by tools/driver_check.py +
# tests/test_entry_oracle.py over all oracle-paired queries at sf0.01.
# ---------------------------------------------------------------------------

DRIVER_PRIORITY: list[str] = [
    # -- 2 round-13 webpipe queries, zero official rows (first-row priority) --
    "pipeline_web_curation_report",
    "pipeline_web_stage_ladder",
    # -- the 35-query r7-cohort remainder (oldest official rows left) --
    "stream_hourly_rollup_twin",
    "parts_price_size_skyline",
    "supplier_revenue_hhi",
    "events_chisq_contingency",
    "orders_shipping_sla",
    "lineitem_bloom_fpr",
    "stream_countmin_twin",
    "lineitem_histogram_quantiles",
    "orders_priority_sample",
    "lineitem_price_gini",
    "events_cusum_changepoint",
    "orders_benford_digits",
    "events_runs_test",
    "events_hll_estimate",
    "lineitem_ks_test",
    "orders_mann_whitney",
    "knn_mips",
    "stream_hll_twin",
    "events_k_anonymity",
    "orders_cohort_revenue_retention",
    "parts_assortativity",
    "lineitem_cramers_v",
    "orders_interarrival_cv",
    "pipeline_release_audit",
    "orders_abc_classification",
    "parts_kcore",
    "events_pettitt_changepoint",
    "lineitem_welch_ttest",
    "orders_anova_f",
    "events_theil_sen_trend",
    "events_bowley_skewness",
    "parts_graph_cohesion",
    "parts_link_prediction",
    "orders_weekday_profile",
    "events_value_drift_tvd",
    # -- 13 registration-order-first r8-cohort queries --
    "docs_source_entropy",
    "docs_flesch_readability",
    "lineitem_abc_xyz",
    "parts_rich_club",
    "events_bootstrap_ci",
    "docs_cohens_kappa",
    "lineitem_gini_split",
    "parts_bfs_depths",
    "embedding_knn_reciprocity",
    "corpus_zipf_alpha",
    "knn_label_ndcg",
    "docs_kmv_jaccard",
    "stream_drift_twin",
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
