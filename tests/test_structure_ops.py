"""Behavior + plan invariants for the round-7d structure wave
(plans/analytics_structure.py): Spearman rho, assortativity, Cramér's V,
interarrival CV. Cross-engine value equality is covered by
test_entry_oracle / tools/driver_check."""

import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _trunc_div(num: int, den: int) -> int:
    return num // den if num >= 0 else -((-num) // den)


# ---------------------------------------------------------------------------
# docs_spearman_rho
# ---------------------------------------------------------------------------


def test_spearman_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    xs, ys = [], []
    for d in docs:
        xs.append(d.n_chars)
        ys.append(len([t for t in re.split(r"\s+", d.text) if t]))

    def ranks2(vals):
        cnt = Counter(vals)
        below = {}
        run = 0
        for v in sorted(cnt):
            below[v] = run
            run += cnt[v]
        return [2 * below[v] + cnt[v] + 1 for v in vals]

    rx, ry = ranks2(xs), ranks2(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    qx = sum(v * v for v in rx)
    qy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = n * sxy - sx * sy
    den = (n * qx - sx * sx) * (n * qy - sy * sy)
    expected = _trunc_div(num * num * 1_000_000 if num >= 0 else -(num * num * 1_000_000), den)
    rows = QUERIES["docs_spearman_rho"](spark, SF_DIR).collect()
    assert len(rows) == 1
    assert rows[0].n == n
    assert rows[0].rho2_signed_ppm == expected
    # lengths in chars and tokens are strongly positively correlated
    assert rows[0].rho2_signed_ppm > 500_000


# ---------------------------------------------------------------------------
# parts_assortativity
# ---------------------------------------------------------------------------


def test_assortativity_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    neighbors = defaultdict(set)
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    neighbors[a].add(b)
    edges = {(a, b) for a, ns in neighbors.items() for b in ns if a < b}
    deg = {v: len(ns) for v, ns in neighbors.items()}
    m = len(edges)
    sjk = sum(deg[a] * deg[b] for a, b in edges)
    s2 = sum(deg[a] + deg[b] for a, b in edges)
    q2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    num = 4 * m * sjk - s2 * s2
    den = 2 * m * q2 - s2 * s2
    expected = _trunc_div(num * 1_000_000, den)
    rows = QUERIES["parts_assortativity"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_nodes, r.n_edges) == (len(deg), m)
    assert r.r_ppm == expected
    assert -1_000_000 <= r.r_ppm <= 1_000_000


# ---------------------------------------------------------------------------
# lineitem_cramers_v
# ---------------------------------------------------------------------------


def test_cramers_v_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    obs: Counter = Counter()
    for r in li:
        obs[(r.l_returnflag, r.l_linestatus)] += 1
    rows_m: Counter = Counter()
    cols_m: Counter = Counter()
    for (rf, ls), c in obs.items():
        rows_m[rf] += c
        cols_m[ls] += c
    n = sum(obs.values())
    chisq = sum(
        (n * o - rows_m[rf] * cols_m[ls]) ** 2 * 1_000_000
        // (n * rows_m[rf] * cols_m[ls])
        for (rf, ls), o in obs.items()
    )
    v2 = chisq * 1000 // (n * min(len(rows_m) - 1, len(cols_m) - 1))
    r = QUERIES["lineitem_cramers_v"](spark, SF_DIR).collect()[0]
    assert (r.n, r.n_rows_cat, r.n_cols_cat) == (n, len(rows_m), len(cols_m))
    assert r.chisq_ppm == chisq
    assert r.v2_ppb == v2
    assert 0 <= r.v2_ppb <= 1_000_000_000


# ---------------------------------------------------------------------------
# orders_interarrival_cv
# ---------------------------------------------------------------------------


def test_interarrival_cv_matches_reference_python(spark):
    import calendar

    orders = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    by_cust = defaultdict(list)
    # calendar.timegm gives exact UTC epoch seconds (naive datetimes from the
    # UTC session; datetime.timestamp() would apply the local tz)
    for r in orders:
        d = r.o_orderdate
        epoch_us = calendar.timegm(d.timetuple()) * 1_000_000 + d.microsecond
        by_cust[r.o_custkey].append(epoch_us)
    expected = {}
    for cust, ts in by_cust.items():
        ts.sort()
        gaps = [(b - a) // 86_400_000_000 for a, b in zip(ts, ts[1:])]
        if len(gaps) < 2 or sum(gaps) <= 0:
            continue
        n, s = len(gaps), sum(gaps)
        q = sum(g * g for g in gaps)
        expected[cust] = (n, s, (n * q - s * s) * 1_000_000 // (s * s))
    got = {
        r.o_custkey: (r.n_gaps, r.total_gap_days, r.cv2_ppm)
        for r in QUERIES["orders_interarrival_cv"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_interarrival_cv_plan_single_window(spark):
    plan = _plan(spark, "orders_interarrival_cv")
    assert "SinglePartition" not in plan  # lag window is customer-keyed
    assert "CartesianProduct" not in plan
    for r in QUERIES["orders_interarrival_cv"](spark, SF_DIR).collect():
        assert r.cv2_ppm >= 0
