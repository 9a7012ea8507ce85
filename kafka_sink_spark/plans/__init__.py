from kafka_sink_spark.plans.queries import ORACLES, QUERIES  # noqa: F401
import kafka_sink_spark.plans.analytics  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.parity_extra  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_extra  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_tpch2  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_curation  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_quality  # noqa: F401,E402  (registers into the catalog)
import kafka_sink_spark.plans.analytics_training  # noqa: F401,E402  (registers into the catalog)

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The verify driver checks the FIRST 50 registered queries each round, in
# registration order, so this list decides which queries get an *official*
# CORRECTNESS_r* row.  Round-5 ordering: (a) the five queries that errored
# in r04 under the micros-NTZ testdata regression (fixed this round — a
# green row re-certifies the fix driver-side), (b) the 14 operators new in
# round 5 (first driver row each), (c) the two regression-core entries
# r04's oversized 52-entry list pushed out of the window, then (d) a
# timestamp-sensitive regression core (date-predicate TPC-H, events
# family, sink temporal paths) — every query there reads the ts/date
# columns whose parquet type changed.  The list is kept at EXACTLY 50
# entries (window size; enforced by tests/test_catalog_contract.py);
# everything else follows in original registration order and stays locally
# gated by tools/driver_check.py + tests/test_entry_oracle.py — all 113
# oracle-paired queries are green there at sf0.01 (and the 14 new ones
# also at sf0.1).
# ---------------------------------------------------------------------------

DRIVER_PRIORITY: list[str] = [
    # -- errored in r04 (micros-NTZ testdata regression; fixed this round) --
    "events_range_window",
    "events_asof_attribution",
    "sink_daterange_precision",
    "sink_json_map",
    "sink_upsert_replay",
    # -- new queries this round (first driver row) --
    "docs_gopher_filter",
    "corpus_bigram_lift",
    "dedup_survivors",
    "events_retention_cohorts",
    "knn_pq",
    "docs_repeated_spans",
    "orders_market_basket",
    "corpus_source_report",
    "events_user_rfm",
    "corpus_bpe_pair_counts",
    "events_dau_wau",
    "dedup_cluster_sizes",
    "events_engagement_matrix",
    "events_markov_transitions",
    # -- pushed out of r04's window by the 52-entry list --
    "sink_counter_accrual",
    "sink_avro_struct_decode",
    # -- timestamp-sensitive regression core (date-predicate TPC-H) --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_with_returns",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_priority_class",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q20_part_suppliers",
    # -- timestamp-sensitive regression core (events family) --
    "events_hourly_rollup",
    "events_sessionize",
    "events_topk_per_user",
    "events_rolling_window",
    "events_pivot_daily",
    "events_cube_rollup",
    "events_funnel_conversion",
    "events_set_ops",
    "events_salted_rollup",
    "events_value_band_join",
    "events_value_ntile",
    # -- timestamp-sensitive regression core (sink temporal paths) --
    "sink_codec_temporals",
    "sink_timestamp_mapping",
    "sink_ttl_writetime",
    # -- flagship coverage of the remaining operator families --
    "pipeline_training_data",
    "sink_avro_union_decode",
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
