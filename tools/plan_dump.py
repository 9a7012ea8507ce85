"""Regenerate PLANS.md: formatted physical plans for the headline queries.

Evidence artifact for plan-quality review — shows pushdown/pruning, partial
aggregation, broadcast choices, and shuffle placement without re-running
anything. Usage:

    python tools/plan_dump.py            # writes PLANS.md at the repo root
    python tools/plan_dump.py q1_pricing_summary knn_pq   # subset to stdout
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

HEADLINERS = [
    # connector hot path
    "sink_json_map",
    "sink_upsert_replay",
    # TPC-H shapes
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    # events analytics
    "events_salted_rollup",
    "events_range_window",
    "events_retention_cohorts",
    "events_dau_wau",
    "events_markov_transitions",
    "events_engagement_matrix",
    # curation / dedup / similarity
    "docs_gopher_filter",
    "docs_repeated_spans",
    "dedup_minhash_pairs",
    "knn_pq",
    "corpus_bigram_lift",
    "pipeline_training_data",
    # round-6 wave
    "docs_gopher_repetition",
    "docs_maximal_spans",
    "knn_pq_trained",
    "knn_ivf_trained",
    "events_value_outliers",
    "corpus_source_report",  # shows the persisted span-hash frontier reuse
    "stream_sessionize_twin",
    "stream_interval_join_twin",
    "knn_ivf_pq",
    "docs_language_id",
    "dedup_containment",
    # round-6c corpus wave
    "dedup_semantic",
    "docs_dsir_weights",
    "docs_lm_predictability",
    "embedding_quantize_int8",
    "dedup_minhash_accuracy",
    # round-6d series wave
    "stream_sliding_rollup_twin",
    "events_ewma",
    "knn_label_vote",
    "corpus_vocab_growth",
    "events_ewma_anomaly",
    "corpus_bpe_merge_apply",
    "pipeline_curation_v2",  # shows the shared persisted bigram substrate
    # round-6e mining wave
    "corpus_heavy_hitters",  # MG candidates (no shuffle) + broadcast recount
    "docs_winnowing",  # single doc-keyed Exchange for the whole query
    "docs_chunk_overlap",  # zero-shuffle scan-side projection chain
    "parts_copurchase_pagerank",  # cached src-partitioned edges, 3 iterations
    # round-6f stats wave
    "embedding_power_iteration",  # checkpointed direction (lineage truncated)
    "docs_train_split_report",
    "events_user_skew_topk",  # TakeOrderedAndProject, no global sort
    "events_gap_median",  # one shared user-keyed Exchange
    # round-6g/6h/6i waves
    "docs_keyword_topk",  # WindowGroupLimit top-3 per doc
    "lineitem_zorder_layout",  # zero-wide-shuffle Morton projection
    "events_top_paths",  # TakeOrderedAndProject + closed-form denominator
    "knn_rank_fusion",  # broadcast queries, 3 windows / 1 Exchange
    "orders_open_backlog",  # two-phase prefix sum (no calendar sort)
    "events_anomaly_seasonal",  # broadcast cell stats
    "events_ab_test",  # single six-sum aggregation, no join
    "events_trend_slope",  # five sufficient statistics, map-side combined
    "parts_label_propagation",  # WindowGroupLimit arg-max per round
    # round-6j/6k waves
    "parts_price_size_skyline",  # prefix-min rewrite, no self-join
    "corpus_skipgram_cooccurrence",  # bounded fan-out + term-keyed joins
    "docs_simpson_diversity",  # two partial-combined aggs, no window
    # round-6l matching wave
    "parts_copurchase_triangles",  # persisted oriented edges, equi-join wedges
    "customer_fuzzy_pairs",  # block-key equi-join, no cartesian
    "events_scd2_state",  # one shared user-keyed Exchange for both windows
    "events_mad_outliers",  # broadcast per-type stats, rank-selected medians
    # round-6m association wave
    "dedup_ppjoin_pairs",  # prefix-posting equi-join, no all-pairs stage
    "orders_itemset_triples",  # Apriori-pruned candidates, broadcast semi-join
    "events_countmin_accuracy",  # broadcast d x w counter table
    "lineitem_bloom_fpr",  # <=m-row bit table, broadcast probes
    "lineitem_histogram_quantiles",  # no rangepartitioning exchange anywhere
    "orders_priority_sample",  # TakeOrderedAndProject top-k, broadcast scalars
    "docs_ngram_novelty",  # reuses the persisted shingle postings
    "events_cusum_changepoint",  # one type-keyed window pass + top-1 rank
    "orders_benford_digits",  # 9-key count + single-row broadcast
    "lineitem_price_gini",  # two-phase rank-weighted sum, no global sort
    "events_runs_test",  # two type-keyed windows + broadcast medians
    # round-9 representatives
    "orders_hill_tail_index",  # TakeOrderedAndProject top-200, grid readout
    "supplier_lorenz_curve",  # two-phase bucket-prefix rank, 9-row broadcast probe
    "multimodal_payload_entropy",  # scan-bound byte explode, <=256-group rollup
    "knn_recall_vs_planes",  # bucket-local candidate joins, broadcast exact shortlist
    "dedup_minhash_band_tuning",  # one signature build, three band-bucket self-joins
    # round-7a probes wave
    "events_hll_estimate",
    "lineitem_ks_test",
    "events_autocorrelation",
    "embedding_jl_distortion",
    "docs_term_dispersion",
    # round-7b evaluation wave
    "corpus_rank_biased_overlap",
    "orders_mann_whitney",
    "docs_mattr",
    # round-8 waves
    "knn_mrr",  # broadcast panel + WindowGroupLimit top-k
    "lineitem_theil_index",  # checkpointed rollup, octave-log2 terms
    "lineitem_sampled_quantile_error",  # md5 bottom-k TakeOrdered + grid prefix
    "customer_rfm_segments",  # three bounded grid-prefix ranks, no global sort
    "multimodal_chunk_manifest",  # zero-shuffle binary slicing + md5
    "lineitem_shipping_hazard",  # descending grid prefix life table
    "embedding_prefix_dim_recall",  # two broadcast-panel scans, bounded join
    "knn_mips",
    # round-7c insights wave
    "docs_keyphrase_rake",
    "embedding_centroid_silhouette",
    # round-7d structure wave
    "docs_spearman_rho",
    "parts_assortativity",
    "orders_interarrival_cv",
    # round-7e capstone
    "pipeline_release_audit",  # three gates, one shuffle per boundary
    # round-7f coverage wave
    "orders_abc_classification",  # two-phase bucket-prefix cumulative
    "parts_kcore",  # synchronized peeling on the persisted edge substrate
    "events_pettitt_changepoint",  # rank ladder + per-type U_t cumulative
    "lineitem_welch_ttest",  # one partial-combined pass, single-row decimal math
    "events_theil_sen_trend",  # bounded days^2 pair join, nearest-rank median
    "parts_graph_cohesion",  # degree-ordered triangle enumeration, one row
    "parts_link_prediction",  # two-hop RA scores, anti-join, TakeOrderedAndProject
    "events_value_drift_tvd",  # one histogram pass, constant-grid arithmetic
    "events_bootstrap_ci",  # 40x replicate projection, no shuffle before the b-key agg
    "lineitem_gini_split",  # one histogram pass + 32-row bounded prefix scoring
    "parts_bfs_depths",  # localCheckpointed frontier rounds on the edge substrate
    "corpus_zipf_alpha",  # WindowGroupLimit rank extraction + constant-point OLS
    "knn_label_ndcg",  # broadcast query panel, per-query WindowGroupLimit
    "docs_kmv_jaccard",  # one shingle shuffle, bottom-k rank filter
    "customer_decile_lift",  # two-phase bucket-prefix rank, no global sort
    "orders_seasonal_strength",  # calendar-bounded decomposition, one DEC38 ratio
    "events_cuped_variance_reduction",  # one fact shuffle, user-grid passes after
    "lineitem_xbar_control",  # day-partitioned WindowGroupLimit subgroups
    "events_t_closeness",  # one (class,band) count; EMD on the bit-length grid
    "lineitem_conformal_interval",  # one scan + broadcast fit + bucket-prefix rank pick
    "docs_ccnet_paragraph_dedup",  # one hash-histogram shuffle, rollup census
    "embedding_mmr_rerank",  # one corpus dot pass, checkpointed greedy rounds
    "docs_bm25_topk",  # zero-shuffle tf/dl projection + scalar broadcast + TopK
    "parts_hits_authority",  # edge dedup + 4 key-partitioned exchanges, TopK per side
    "lineitem_kfold_cv",  # one (grp,fold) aggregate, closed-form refit, broadcast join
    "events_cem_att",  # one 7x24-grid aggregate, grid arithmetic after
    # round-10e/10f waves
    "knn_binary_hamming",  # 24B/row sign-code scan, broadcast probe, WindowGroupLimit
    "knn_binary_recall",  # two broadcast shortlists joined on the query grid
    "docs_blocklist_rate",  # zero-shuffle lambda screen, |sources| rollup
    "events_page_hinkley",  # 3 cumulative windows on ONE per-type sort
    "events_sprt",  # same single sort; constant-increment LLR walk
    "orders_cmh_test",  # orders<->customer shuffle join, 25-strata rollup
    "parts_modularity",  # shared LP labels, node-keyed degree/label joins
    "docs_qlm_topk",  # zero-shuffle tf/dl pass + ppb-staged scalar broadcast + TopK
    "lineitem_hilbert_layout",  # 8 xy2d rounds in one codegen span, 16-group agg
    # round-10g/10h waves
    "embedding_residual_vq",  # two Lloyd fits (broadcast codebook joins), residual persisted
    "knn_map",  # knn-family scan + per-query <=5-row cumulative window
    "docs_dsir_ess",  # persisted DSIR pipeline + one two-moment aggregate
    "docs_hybrid_rrf",  # two TopK-capped sides, constant-size RRF fusion join
    "stream_sprt_twin",  # applyInPandasWithState, 4-int state per type
    # round-11a wave
    "docs_url_canonical_dedup",  # one codegen canonicalize projection + host-keyed rollup
    "docs_kn_bigram_nll",  # vocab-bounded count joins over persisted bigrams
    "docs_hybrid_rrf_indexed",  # IVF-PQ cells + posting-list BM25, RRF fusion
    # round-12 waves
    "docs_span_excision",  # 60-bit span-hash joins, position coverage, per-doc rollup
    "docs_line_dedup",  # hash-partitioned occurrence-rank window, per-doc rollup
    "docs_quality_classifier",  # one explode + per-doc rollup; weights = bucket-id arithmetic
    "docs_sanitize_pipeline",  # three persisted per-doc frames, doc-keyed joins
    "docs_quality_signal_agreement",  # three certified frames onto a 41-cell grid
]


def main() -> int:
    from kafka_sink_spark import get_spark
    from kafka_sink_spark.plans import QUERIES

    names = sys.argv[1:] or HEADLINERS
    spark = get_spark(app_name="plan-dump")
    sections = []
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        sections.append(f"## {name}\n\n```\n{buf.getvalue().rstrip()}\n```\n")
    body = (
        "# PLANS — formatted physical plans of the headline queries\n\n"
        f"Generated by `python tools/plan_dump.py` at {SF_DIR} "
        "(plan SHAPE is scale-invariant; AQE may resize at runtime).\n"
        "Read for: `PushedFilters`/`ReadSchema` pruning, `partial_*` "
        "map-side combines, explicit broadcasts, and shuffle placement.\n\n"
        + "\n".join(sections)
    )
    if sys.argv[1:]:
        print(body)
    else:
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
        with open(out, "w") as f:
            f.write(body)
        print(f"wrote {out} ({len(names)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
