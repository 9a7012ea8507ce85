"""Unit gates for bench.py's regression-comparison logic.

The r11 verdict required two demonstrations:
- ask #5: a seeded 2x slowdown in ONE sub-second query is caught even
  though it sits below the 0.5 s absolute floor of the per-query rule
  (docs_blocklist_rate drifted to 1.95x unflagged in r11);
- ask #2: a uniform host-mode slowdown (the r10/r11 graph-family
  bimodality) is cancelled by canary normalization instead of producing
  phantom regressions, while a genuine plan regression survives it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    COHORT_FLAG,
    MEMBER_FLAG,
    compare_to_baseline,
)


def _flat_baseline(n_big=5, n_small=30):
    base = {f"big{i}": 3.0 for i in range(n_big)}
    base.update({f"small{i}": 0.25 for i in range(n_small)})
    return base


def test_seeded_2x_subsecond_query_is_caught():
    base = _flat_baseline()
    times = dict(base)
    times["small7"] = 0.5  # 2x, but only +0.25 s — old gate blind spot
    cmp = compare_to_baseline(times, base)
    assert cmp["flagged"] == []  # the absolute-floor rule still misses it
    assert cmp["member_flagged"] == ["small7"]  # the cohort member rule does
    assert 2.0 > MEMBER_FLAG


def test_broad_subsecond_drift_trips_cohort_sum_gate():
    base = _flat_baseline()
    # every sub-second query drifts 1.3x — no individual query crosses
    # either per-query rule, but the cohort sum does
    times = {n: (t * 1.3 if t < 1.0 else t) for n, t in base.items()}
    cmp = compare_to_baseline(times, base)
    assert cmp["flagged"] == []
    assert cmp["member_flagged"] == []
    assert cmp["cohort_flagged"]
    assert cmp["cohort_ratio"] > COHORT_FLAG


def test_host_mode_slowdown_is_cancelled_by_canary():
    base = _flat_baseline()
    # the whole suite lands in a 1.9x host mode — the canary measures it,
    # normalization cancels it, nothing is flagged
    times = {n: t * 1.9 for n, t in base.items()}
    cmp = compare_to_baseline(times, base, canary_ratio=1.9)
    assert cmp["flagged"] == []
    assert cmp["member_flagged"] == []
    assert not cmp["cohort_flagged"]
    assert all(abs(v - 1.0) < 0.01 for v in cmp["normalized"].values())
    # raw ratios are still published for auditability
    assert all(abs(v - 1.9) < 0.01 for v in cmp["raw"].values())


def test_genuine_regression_survives_canary_normalization():
    base = _flat_baseline()
    times = dict(base)
    times["big0"] = 6.0  # true 2x plan regression on a 3 s query
    cmp = compare_to_baseline(times, base, canary_ratio=1.0)
    assert cmp["flagged"] == ["big0"]
    # ... and in a modestly slow host mode it still flags (2x / 1.2 > 1.5)
    times_mode = {n: t * 1.2 for n, t in times.items()}
    cmp2 = compare_to_baseline(times_mode, base, canary_ratio=1.2)
    assert cmp2["flagged"] == ["big0"]


def test_cohort_gate_ignores_queries_at_or_above_one_second():
    base = {"exactly1s": 1.0, "small0": 0.2}
    times = {"exactly1s": 5.0, "small0": 0.2}
    cmp = compare_to_baseline(times, base)
    assert cmp["cohort"] == ["small0"]
    assert not cmp["cohort_flagged"]
