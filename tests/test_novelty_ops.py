"""Behavior + plan invariants for the round-6o novelty wave
(plans/analytics_novelty.py): n-gram novelty, CUSUM change points.
Cross-engine value equality is covered by test_entry_oracle /
tools/driver_check."""

import hashlib
import math
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingle_sets(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    sets = {}
    for d in docs:
        toks = [t for t in re.split(r"\s+", d.text) if t]
        if len(toks) >= 3:
            grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        else:
            grams = [" ".join(toks)]
        sets[d.doc_id] = {_md5_60(g) for g in grams}
    return sets


def test_novelty_matches_reference_python(spark):
    sets = _shingle_sets(spark)
    first = {}
    for doc_id in sorted(sets):
        for h in sets[doc_id]:
            first.setdefault(h, doc_id)
    expected = {}
    for doc_id, hs in sets.items():
        novel = sum(1 for h in hs if first[h] == doc_id)
        expected[doc_id] = (len(hs), novel, novel * 1_000_000 // len(hs))
    got = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty_ppm)
        for r in QUERIES["docs_ngram_novelty"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_novelty_first_doc_is_fully_novel(spark):
    """The lowest doc_id can only contain first occurrences."""
    rows = {r.doc_id: r for r in QUERIES["docs_ngram_novelty"](spark, SF_DIR).collect()}
    first_doc = min(rows)
    assert rows[first_doc].novelty_ppm == 1_000_000
    for r in rows.values():
        assert 0 <= r.n_novel <= r.n_shingles


def test_cusum_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    by_type = defaultdict(list)
    for r in events:
        by_type[r.event_type].append(
            (r.ts, r.event_id, int(math.floor(r.value * 1_000_000)))
        )
    expected = {}
    for t, rows in by_type.items():
        rows.sort()
        n = len(rows)
        total = sum(v for _, _, v in rows)
        s = 0
        best = None
        for idx, (ts, eid, v) in enumerate(rows, 1):
            s += v
            abs_d = abs(n * s - idx * total)
            key = (-abs_d, idx)
            if best is None or key < best[0]:
                best = (key, idx, eid, ts, abs_d)
        _, idx, eid, ts, abs_d = best
        expected[t] = (n, idx, eid, ts, abs_d // n)
    got = {
        r.event_type: (
            r.n,
            r.t_at_max,
            r.changepoint_event_id,
            r.changepoint_ts,
            r.max_cusum_dev_us,
        )
        for r in QUERIES["events_cusum_changepoint"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_cusum_one_row_per_type(spark):
    rows = QUERIES["events_cusum_changepoint"](spark, SF_DIR).collect()
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types))
    for r in rows:
        assert 1 <= r.t_at_max <= r.n
        assert r.max_cusum_dev_us >= 0


# --------------------------------------------------------------------------
# orders_benford_digits
# --------------------------------------------------------------------------


def test_benford_matches_reference_python(spark):
    from kafka_sink_spark.plans.analytics_novelty import _BENFORD_PPM

    orders = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    obs = defaultdict(int)
    for r in orders:
        obs[int(str(int(math.floor(r.o_totalprice * 100)))[0])] += 1
    n = sum(obs.values())
    expected = {}
    for d, c in obs.items():
        exp = _BENFORD_PPM[d]
        diff = c * 1_000_000 - n * exp
        expected[d] = (c, n, c * 1_000_000 // n, exp, diff * diff // (n * exp))
    got = {
        r.digit: (r.obs, r.n, r.obs_ppm, r.exp_ppm, r.chisq_cell_ppm)
        for r in QUERIES["orders_benford_digits"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_benford_constants_are_a_probability_measure(spark):
    from kafka_sink_spark.plans.analytics_novelty import _BENFORD_PPM

    assert sum(_BENFORD_PPM.values()) == 1_000_000
    assert sorted(_BENFORD_PPM) == list(range(1, 10))
    # monotone decreasing, as Benford requires
    vals = [_BENFORD_PPM[d] for d in range(1, 10)]
    assert vals == sorted(vals, reverse=True)
    rows = QUERIES["orders_benford_digits"](spark, SF_DIR).collect()
    assert all(1 <= r.digit <= 9 for r in rows)
    assert all(r.chisq_cell_ppm >= 0 for r in rows)


# --------------------------------------------------------------------------
# events_runs_test
# --------------------------------------------------------------------------


def test_runs_test_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    by_type = defaultdict(list)
    for r in events:
        by_type[r.event_type].append(
            (r.ts, r.event_id, int(math.floor(r.value * 1_000_000)))
        )
    expected = {}
    for t, rows in by_type.items():
        n = len(rows)
        med = sorted(v for _, _, v in rows)[(n + 1) // 2 - 1]
        signs = [1 if v > med else 0 for _, _, v in sorted(rows)]
        n1 = sum(signs)
        n2 = n - n1
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        exp_ppm = 1_000_000 + (2 * n1 * n2 * 1_000_000) // n
        d = runs * n - (n + 2 * n1 * n2)
        z2 = d * d * (n - 1) * 1_000_000 // (2 * n1 * n2 * (2 * n1 * n2 - n))
        expected[t] = (n, n1, n2, runs, exp_ppm, z2)
    got = {
        r.event_type: (r.n, r.n_above, r.n_below, r.runs, r.expected_runs_ppm, r.z2_ppm)
        for r in QUERIES["events_runs_test"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_runs_test_invariants(spark):
    rows = QUERIES["events_runs_test"](spark, SF_DIR).collect()
    for r in rows:
        assert r.n_above + r.n_below == r.n
        assert 1 <= r.runs <= r.n
        assert r.z2_ppm >= 0
        # the lower median guarantees at least half the values are <= it
        assert r.n_below >= r.n_above
