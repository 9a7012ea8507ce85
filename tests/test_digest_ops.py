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
