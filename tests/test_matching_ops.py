"""Behavior + plan invariants for the round-6l matching wave
(plans/analytics_matching.py): degree-ordered triangles, wildcard-blocked
fuzzy pairs, SCD2 interval compaction, MAD robust outliers.  Cross-engine
value equality is covered by test_entry_oracle / tools/driver_check."""

import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_matching import _MAD_TOPK, _SCD2_BAND
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# parts_copurchase_triangles
# --------------------------------------------------------------------------


def _ref_graph(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj[a].add(b)
                adj[b].add(a)
    return adj


def test_triangles_match_reference_python(spark):
    adj = _ref_graph(spark)
    tri = Counter()
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:  # each triangle once: a < b < c
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    got = {
        r.part_key: (r.triangles, r.degree, r.lcc_ppm)
        for r in QUERIES["parts_copurchase_triangles"](spark, SF_DIR).collect()
    }
    expected = {
        a: (
            tri[a],
            len(adj[a]),
            tri[a] * 2_000_000 // (len(adj[a]) * (len(adj[a]) - 1))
            if len(adj[a]) >= 2
            else None,
        )
        for a in tri
    }
    assert got == expected


def test_triangles_lcc_bounds(spark):
    """Every reported part is in ≥1 triangle; LCC ∈ (0, 1e6]."""
    rows = QUERIES["parts_copurchase_triangles"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.triangles >= 1
        assert r.degree >= 2  # a triangle needs two neighbors
        assert 0 < r.lcc_ppm <= 1_000_000


# --------------------------------------------------------------------------
# customer_fuzzy_pairs
# --------------------------------------------------------------------------


def test_fuzzy_pairs_match_bruteforce(spark):
    names = {
        r.c_custkey: r.c_name
        for r in load_tables(spark, SF_DIR, ("customer",))["customer"].collect()
    }
    expected = set()
    keys = sorted(names)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            na, nb = names[a], names[b]
            if len(na) == len(nb):
                diffs = [p for p, (x, y) in enumerate(zip(na, nb)) if x != y]
                if len(diffs) == 1:
                    expected.add((a, b, diffs[0] - 9 + 1, 1))
    got = {
        (r.custkey_a, r.custkey_b, r.diff_pos, r.lev)
        for r in QUERIES["customer_fuzzy_pairs"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_fuzzy_pairs_no_cartesian(spark):
    """Blocking must plan as an equi-join on the masked key — never a
    cartesian/broadcast-nested-loop all-pairs comparison."""
    plan = _plan(spark, "customer_fuzzy_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# events_scd2_state
# --------------------------------------------------------------------------


def test_scd2_matches_reference_python(spark):
    import math

    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append((r.ts, r.event_id, int(math.floor(r.value)) // _SCD2_BAND))
    expected = {}
    for u, rows in by_user.items():
        rows.sort()
        runs = []
        for ts, _eid, band in rows:
            if runs and runs[-1][0] == band:
                runs[-1][2] = ts
                runs[-1][3] += 1
            else:
                runs.append([band, ts, ts, 1])
        for seq, (band, vf, vt, n) in enumerate(runs, 1):
            expected[(u, seq)] = (band, vf, vt, n)
    got = {
        (r.user_id, r.run_seq): (r.state_band, r.valid_from, r.valid_to, r.n_events)
        for r in QUERIES["events_scd2_state"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_scd2_intervals_are_disjoint_and_ordered(spark):
    rows = QUERIES["events_scd2_state"](spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        assert r.valid_from <= r.valid_to
        by_user[r.user_id].append((r.run_seq, r.valid_from, r.valid_to, r.state_band))
    for runs in by_user.values():
        runs.sort()
        for (s1, _f1, t1, b1), (s2, f2, _t2, b2) in zip(runs, runs[1:]):
            assert s2 == s1 + 1
            assert f2 > t1  # strictly later; runs never overlap
            assert b2 != b1  # maximal runs: consecutive runs change state


# --------------------------------------------------------------------------
# events_mad_outliers
# --------------------------------------------------------------------------


def test_mad_matches_reference_python(spark):
    import math

    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    by_type = defaultdict(list)
    for r in events:
        by_type[r.event_type].append(
            (int(math.floor(r.value * 1_000_000)), r.event_id)
        )
    expected = {}
    for t, vs in by_type.items():
        n = len(vs)
        med = sorted(v for v, _ in vs)[(n + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v, _ in vs)
        mad = devs[(n + 1) // 2 - 1]
        top = sorted(((abs(v - med), eid, v) for v, eid in vs), key=lambda x: (-x[0], x[1]))
        for rk, (dev, eid, v) in enumerate(top[:_MAD_TOPK], 1):
            z = dev * 1_000_000 // mad if mad > 0 else None
            expected[(t, rk)] = (eid, v, dev, n, med, mad, z)
    got = {
        (r.event_type, r.rk): (
            r.event_id,
            r.v_us,
            r.dev_us,
            r.n,
            r.median_us,
            r.mad_us,
            r.robust_z_ppm,
        )
        for r in QUERIES["events_mad_outliers"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_mad_plan_broadcasts_per_type_stats(spark):
    """The tiny per-type median/MAD tables must join back by broadcast —
    no shuffle of the full events table against a 5-row stats table."""
    plan = _plan(spark, "events_mad_outliers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
