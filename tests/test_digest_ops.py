"""Behavior + plan invariants for the round-6n digest wave
(plans/analytics_digest.py): two-phase exact quantiles + histogram
estimate.  Cross-engine value equality is covered by test_entry_oracle /
tools/driver_check."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_digest import _HQ_BUCKETS, _HQ_QS
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _reference(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    cents = sorted(int(math.floor(r.l_extendedprice * 100)) for r in li)
    lo, hi, n = cents[0], cents[-1], len(cents)
    width = (hi - lo) // _HQ_BUCKETS + 1
    out = {}
    for q in _HQ_QS:
        r = (q * (n - 1)) // 100 + 1
        exact = cents[r - 1]
        bucket = (exact - lo) // width
        est = lo + bucket * width + width // 2
        diff = est - exact
        err = (
            (diff * 1_000_000) // exact
            if diff >= 0
            else -((-diff * 1_000_000) // exact)
        )
        out[q] = (n, exact, est, err)
    return out, width


def test_quantiles_match_reference_python(spark):
    expected, _ = _reference(spark)
    got = {
        r.q: (r.n, r.exact_cents, r.est_cents, r.err_ppm)
        for r in QUERIES["lineitem_histogram_quantiles"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_estimate_within_one_bucket(spark):
    """The mid-bucket estimate can never be off by more than one bucket
    width from the exact value it brackets."""
    _, width = _reference(spark)
    for r in QUERIES["lineitem_histogram_quantiles"](spark, SF_DIR).collect():
        assert abs(r.est_cents - r.exact_cents) <= width


def test_no_global_sort_of_fact_table(spark):
    """The whole point: exact quantiles WITHOUT a global ORDER BY — the
    plan must contain no range-partitioned exchange (what a global sort
    plans); bucket-local sorts and the bounded single-partition histogram
    cumsum are the only ordering allowed."""
    plan = (
        QUERIES["lineitem_histogram_quantiles"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan


# --------------------------------------------------------------------------
# orders_priority_sample
# --------------------------------------------------------------------------


def test_priority_sample_matches_reference_python(spark):
    import hashlib

    from kafka_sink_spark.plans.analytics_digest import _POW30, _PS_K

    orders = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = []
    for r in orders:
        w = int(math.floor(r.o_totalprice * 100))
        u30 = md5_60(f"ps:{r.o_orderkey}") // _POW30 + 1
        rows.append((w * _POW30 // u30, r.o_orderkey, w))
    rows.sort(key=lambda t: (-t[0], t[1]))
    tau = rows[_PS_K][0] // _POW30
    exact_total = sum(w for _, _, w in rows)
    est_total = sum(max(w, tau) for _, _, w in rows[:_PS_K])
    diff = est_total - exact_total
    err = (
        (diff * 1_000_000) // exact_total
        if diff >= 0
        else -((-diff * 1_000_000) // exact_total)
    )
    expected = {
        rk: (okey, w, max(w, tau), len(rows), exact_total, est_total, err)
        for rk, (_, okey, w) in enumerate(rows[:_PS_K], 1)
    }
    got = {
        r.rk: (
            r.o_orderkey,
            r.w_cents,
            r.ht_cents,
            r.n,
            r.exact_total,
            r.est_total,
            r.err_ppm,
        )
        for r in QUERIES["orders_priority_sample"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_priority_sample_ht_properties(spark):
    """HT estimators are never below the raw weight, and the sample is
    exactly k rows (given n > k)."""
    from kafka_sink_spark.plans.analytics_digest import _PS_K

    rows = QUERIES["orders_priority_sample"](spark, SF_DIR).collect()
    assert len(rows) == _PS_K
    for r in rows:
        assert r.ht_cents >= r.w_cents
        assert r.n > _PS_K


def test_priority_sample_plan_uses_takeordered(spark):
    """Top-(k+1) selection must be TakeOrderedAndProject (per-partition
    top-k + merge), not a global sort of the orders table."""
    plan = (
        QUERIES["orders_priority_sample"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------------------------------
# lineitem_price_gini
# --------------------------------------------------------------------------


def test_gini_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    cents = sorted(int(math.floor(r.l_extendedprice * 100)) for r in li)
    n = len(cents)
    total = sum(cents)
    t = sum(i * c for i, c in enumerate(cents, 1))
    expected = (n, total, (2 * t * 1_000_000) // (n * total) - ((n + 1) * 1_000_000) // n)
    row = QUERIES["lineitem_price_gini"](spark, SF_DIR).collect()[0]
    assert (row.n, row.total_cents, row.gini_ppm) == expected


def test_gini_bounds_and_plan(spark):
    """Gini of a positive distribution lies in [0, 1e6); the plan must
    contain no range-partitioned exchange (no global sort)."""
    df = QUERIES["lineitem_price_gini"](spark, SF_DIR)
    row = df.collect()[0]
    assert 0 <= row.gini_ppm < 1_000_000
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
