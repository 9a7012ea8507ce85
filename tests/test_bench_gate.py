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
    CANARY_WARN,
    COHORT_FLAG,
    COHORT_RETRY_CAP,
    MEMBER_FLAG,
    cohort_retry_candidates,
    cohort_vs_anchor,
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


def test_tripped_cohort_gate_yields_retry_candidates():
    """r12 ADVICE: a transient contention burst spread across many small
    queries must get a re-measure before the cohort flag is final — the
    worst-drifting members are returned, capped, worst-first."""
    base = _flat_baseline()
    times = {n: (t * 1.3 if t < 1.0 else t) for n, t in base.items()}
    times["small3"] = base["small3"] * 1.6  # the worst drifter leads
    cmp = compare_to_baseline(times, base)
    assert cmp["cohort_flagged"]
    cands = cohort_retry_candidates(cmp)
    assert cands[0] == "small3"
    assert 0 < len(cands) <= COHORT_RETRY_CAP
    assert all(cmp["normalized"][n] > 1.1 for n in cands)
    # an untripped gate retries nothing
    calm = compare_to_baseline(dict(base), base)
    assert cohort_retry_candidates(calm) == []


def test_two_consecutive_repins_still_show_drift_vs_anchor():
    """r12 verdict ask #5: the rolling wholesale re-pin launders ~10%/round
    compounding drift into each fresh baseline; the FIXED anchor does not.
    Simulate two rounds of +10% drift with a re-pin between them: each
    round reads ~1.1x against its own rolling pin, but the anchor readout
    shows the compounded 1.21x."""
    anchor = _flat_baseline()
    round1 = {n: t * 1.1 for n, t in anchor.items()}
    # rolling gate, round 1: vs the anchor-era pin -> 1.1x
    cmp1 = compare_to_baseline(round1, anchor)
    assert abs(cmp1["cohort_ratio"] - 1.1) < 0.01
    # wholesale re-pin: round1 becomes the new rolling baseline
    repinned = dict(round1)
    round2 = {n: t * 1.1 for n, t in round1.items()}
    cmp2 = compare_to_baseline(round2, repinned)
    assert abs(cmp2["cohort_ratio"] - 1.1) < 0.01  # drift laundered
    assert not cmp2["cohort_flagged"]              # rolling gate is blind
    vs_anchor = cohort_vs_anchor(round2, anchor)
    assert abs(vs_anchor["ratio_normalized"] - 1.21) < 0.01  # anchor is not
    # and a genuine host mode measured against the ANCHOR's canary pin is
    # still divided out rather than read as drift
    hosty = {n: t * 1.5 for n, t in anchor.items()}
    vs = cohort_vs_anchor(hosty, anchor, canary_ratio_anchor=1.5)
    assert abs(vs["ratio_normalized"] - 1.0) < 0.01


def test_anchor_membership_comes_from_anchor_pins():
    anchor = {"small0": 0.5, "big0": 4.0, "retired": 0.3}
    times = {"small0": 0.6, "big0": 9.0}  # 'retired' left the catalog
    vs = cohort_vs_anchor(times, anchor)
    assert vs["n"] == 1                    # big0 >= 1 s, retired absent
    assert abs(vs["ratio_normalized"] - 1.2) < 0.01


def test_canary_warn_threshold_is_between_modes():
    """The backstop (r12 ADVICE, medium) must fire on the observed ~1.9-2.6x
    host modes AND on a masked suite-wide regression of the same size, but
    not on the ~1.05-1.2x session jitter every round shows."""
    assert 1.2 < CANARY_WARN < 1.9
