"""Behavior + plan invariants for the round-7h profiles wave
(plans/analytics_profiles.py): local clustering coefficient, RA link
prediction, weekday seasonality, Burrows' Delta, TVD drift. Cross-engine
value equality is covered by test_entry_oracle / tools/driver_check."""

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


def _neighbors(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    nb = defaultdict(set)
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    nb[a].add(b)
    return nb


# ---------------------------------------------------------------------------
# parts_graph_cohesion
# ---------------------------------------------------------------------------


def test_graph_cohesion_matches_reference_python(spark):
    nb = _neighbors(spark)
    n_nodes = len(nb)
    n_edges = sum(len(ns) for ns in nb.values()) // 2
    n_wedges = sum(len(ns) * (len(ns) - 1) for ns in nb.values()) // 2
    tri_per_node: Counter = Counter()
    n_triangles = 0
    for v, ns in nb.items():
        ns_sorted = sorted(ns)
        tri = 0
        for i, x in enumerate(ns_sorted):
            for y in ns_sorted[i + 1 :]:
                if y in nb[x]:
                    tri += 1
        tri_per_node[v] = tri
        n_triangles += tri
    n_triangles //= 3
    eligible = [v for v, ns in nb.items() if len(ns) >= 2]
    lcc_sum = sum(
        (2 * tri_per_node[v] * 1_000_000)
        // (len(nb[v]) * (len(nb[v]) - 1))
        for v in eligible
    )
    expected = (
        n_nodes,
        n_edges,
        n_wedges,
        n_triangles,
        (3 * n_triangles * 1_000_000) // n_wedges,
        lcc_sum // len(eligible),
    )
    row = QUERIES["parts_graph_cohesion"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n_nodes,
        r.n_edges,
        r.n_wedges,
        r.n_triangles,
        r.transitivity_ppm,
        r.avg_lcc_ppm,
    ) == expected


def test_graph_cohesion_plan_no_cartesian(spark):
    plan = _plan(spark, "parts_graph_cohesion")
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# parts_link_prediction
# ---------------------------------------------------------------------------


def _support_neighbors(spark, min_support=2):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_order = defaultdict(list)
    for r in li:
        by_order[r.l_orderkey].append(r.l_partkey)
    weight: Counter = Counter()
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    weight[(a, b)] += 1
    nb = defaultdict(set)
    for (a, b), w in weight.items():
        if w >= min_support:
            nb[a].add(b)
    return nb


def test_link_prediction_matches_reference_python(spark):
    nb = _support_neighbors(spark)
    scores: Counter = Counter()
    common: Counter = Counter()
    for z, ns in nb.items():
        dz = len(ns)
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1 :]:
                scores[(a, b)] += 1_000_000 // dz
                common[(a, b)] += 1
    cand = [
        (ra, a, b, common[(a, b)])
        for (a, b), ra in scores.items()
        if b not in nb[a]
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    expected = {
        (a, b): (cn, ra) for ra, a, b, cn in cand[:50]
    }
    got = {
        (r.a, r.b): (r.common_neighbors, r.ra_ppm)
        for r in QUERIES["parts_link_prediction"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_link_prediction_topk_plan(spark):
    plan = _plan(spark, "parts_link_prediction")
    assert "TakeOrderedAndProject" in plan
    # predicted edges must not already exist in the support-pruned graph
    rows = QUERIES["parts_link_prediction"](spark, SF_DIR).collect()
    nb = _support_neighbors(spark)
    assert rows and all(r.b not in nb[r.a] for r in rows)


# ---------------------------------------------------------------------------
# orders_weekday_profile
# ---------------------------------------------------------------------------


def test_weekday_profile_matches_reference_python(spark):
    od = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    daily: Counter = Counter()
    for r in od:
        daily[r.o_orderdate.date()] += int(
            math.floor(r.o_totalprice * 100)
        )
    days = sorted(daily)
    agg: defaultdict = defaultdict(lambda: [0, 0])
    for i in range(len(days)):
        if i < 3 or i >= len(days) - 3:
            continue
        s7 = sum(daily[days[j]] for j in range(i - 3, i + 4))
        x7 = 7 * daily[days[i]] - s7
        dow = days[i].isoweekday()
        agg[dow][0] += 1
        agg[dow][1] += x7
    expected = {}
    for dow, (n, sx) in agg.items():
        sc = sx // (7 * n) if sx >= 0 else -((-sx) // (7 * n))
        expected[dow] = (n, sx, sc)
    got = {
        r.dow: (r.n_days, r.detr7_sum_cents, r.seasonal_cents)
        for r in QUERIES["orders_weekday_profile"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_weekday_profile_seasonal_sums_near_zero(spark):
    rows = QUERIES["orders_weekday_profile"](spark, SF_DIR).collect()
    assert len(rows) == 7
    # detrended residues must cancel across the week up to edge effects:
    # |Σ x7| is far below the raw revenue scale
    total = sum(r.detr7_sum_cents for r in rows)
    scale = sum(abs(r.detr7_sum_cents) for r in rows) + 1
    assert abs(total) < 50 * scale  # sanity: bounded, not astronomically off


# ---------------------------------------------------------------------------
# docs_burrows_delta
# ---------------------------------------------------------------------------


def test_burrows_delta_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    tc: defaultdict = defaultdict(Counter)
    for d in docs:
        tc[d.source].update(t for t in re.split(r"\s+", d.text) if t)
    tot = {s: sum(c.values()) for s, c in tc.items()}
    overall: Counter = Counter()
    for c in tc.values():
        overall.update(c)
    top = [
        t
        for t, _ in sorted(overall.items(), key=lambda kv: (-kv[1], kv[0]))[
            :30
        ]
    ]
    sources = sorted(tc)
    s_count = len(sources)
    f = {
        (s, t): tc[s][t] * 1_000_000 // tot[s] for s in sources for t in top
    }
    expected = {}
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            terms = 0
            acc = 0
            for t in top:
                sumf = sum(f[(s, t)] for s in sources)
                sscaled = sum(
                    abs(s_count * f[(s, t)] - sumf) for s in sources
                )
                if sscaled == 0:
                    term = 0
                else:
                    term = (
                        abs(f[(sa, t)] - f[(sb, t)])
                        * s_count
                        * s_count
                        * 1_000_000
                    ) // sscaled
                acc += term
                terms += 1
            expected[(sa, sb)] = (terms, acc // terms)
    got = {
        (r.src_a, r.src_b): (r.n_terms, r.delta_ppm)
        for r in QUERIES["docs_burrows_delta"](spark, SF_DIR).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# events_value_drift_tvd
# ---------------------------------------------------------------------------


def test_tvd_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    vals = [
        (int(math.floor(r.value * 1_000_000)), 1 if r.ts.day <= 15 else 2)
        for r in ev
    ]
    lo = min(c for c, _ in vals)
    hi = max(c for c, _ in vals)
    width = (hi - lo) // 16 + 1
    cnt: Counter = Counter()
    for c, h in vals:
        cnt[((c - lo) // width, h)] += 1
    n1 = sum(v for (b, h), v in cnt.items() if h == 1)
    n2 = sum(v for (b, h), v in cnt.items() if h == 2)
    buckets = sorted({b for b, _ in cnt})
    diffs = {
        b: abs(
            cnt[(b, 1)] * 1_000_000 // n1 - cnt[(b, 2)] * 1_000_000 // n2
        )
        for b in buckets
    }
    tvd = sum(diffs.values()) // 2
    peak = min(
        (b for b in buckets),
        key=lambda b: (-diffs[b], b),
    )
    row = QUERIES["events_value_drift_tvd"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n_first,
        r.n_second,
        r.n_buckets,
        r.tvd_ppm,
        r.peak_bucket,
        r.peak_diff_ppm,
    ) == (n1, n2, 16, tvd, peak, diffs[peak])


def test_tvd_bounded(spark):
    r = QUERIES["events_value_drift_tvd"](spark, SF_DIR).collect()[0]
    assert 0 <= r.tvd_ppm <= 1_000_000
    assert 0 <= r.peak_bucket < 16
