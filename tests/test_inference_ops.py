"""Behavior + plan invariants for the round-6i inference wave
(plans/analytics_inference.py): A/B significance, OLS trend, label
propagation. Cross-engine value equality is covered by test_entry_oracle /
tools/driver_check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_inference import _LP_ITERS

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# events_ab_test
# --------------------------------------------------------------------------


def test_ab_test_matches_reference_python(spark):
    """Exact-arithmetic cross-check of arm sums, means, and the z²>4 flag."""
    import hashlib
    import math
    from collections import defaultdict

    from kafka_sink_spark.session import load_tables

    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    cells = defaultdict(lambda: {0: [], 1: []})
    for e in events:
        arm = int(hashlib.md5(str(e.user_id).encode()).hexdigest()[:15], 16) % 2
        cells[e.event_type][arm].append(math.floor(e.value * 1_000_000))
    expected = {}
    for et, arms in cells.items():
        a, b = arms[0], arms[1]
        if not a or not b:
            continue
        na, nb = len(a), len(b)
        sa, sb = sum(a), sum(b)
        qa, qb = sum(x * x for x in a), sum(x * x for x in b)
        lhs = (sa * nb - sb * na) ** 2 * na * nb
        rhs = 4 * (nb**3 * (na * qa - sa * sa) + na**3 * (nb * qb - sb * sb))
        expected[et] = (
            na,
            nb,
            round(sa / na / 1e6, 6),
            round(sb / nb / 1e6, 6),
            1 if lhs > rhs else 0,
        )
    got = {
        r.event_type: (r.n_a, r.n_b, r.mean_a, r.mean_b, r.significant)
        for r in QUERIES["events_ab_test"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_ab_test_single_aggregation_no_join(spark):
    plan = _plan(spark, "events_ab_test")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------------------------------------
# events_trend_slope
# --------------------------------------------------------------------------


def test_trend_slope_matches_reference_python(spark):
    import math
    from collections import defaultdict

    from kafka_sink_spark.session import load_tables

    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    import datetime

    epoch = datetime.date(1970, 1, 1)
    cells = defaultdict(list)
    for e in events:
        t = (e.ts.date() - epoch).days
        cells[e.event_type].append((t, math.floor(e.value * 1_000_000)))
    expected = {}
    for et, pts in cells.items():
        n = len(pts)
        st = sum(t for t, _ in pts)
        sx = sum(x for _, x in pts)
        stt = sum(t * t for t, _ in pts)
        stx = sum(t * x for t, x in pts)
        num, den = n * stx - st * sx, n * stt - st * st
        if den == 0:
            continue
        expected[et] = (n, num, den, round(num / den / 1e6, 6))
    got = {
        r.event_type: (r.n, r.slope_num, r.slope_den, r.slope_per_day)
        for r in QUERIES["events_trend_slope"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_trend_slope_consistency(spark):
    """The rendered float slope must equal num/den to rounding."""
    for r in QUERIES["events_trend_slope"](spark, SF_DIR).collect():
        assert r.slope_per_day == round(r.slope_num / r.slope_den / 1e6, 6)
        assert r.slope_den > 0  # time has positive variance


# --------------------------------------------------------------------------
# parts_label_propagation
# --------------------------------------------------------------------------


def test_label_propagation_matches_reference_python(spark):
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables

    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    pairs = (
        li.alias("a")
        .join(li.alias("b"), F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .collect()
    )
    out_edges = defaultdict(list)
    for r in pairs:
        out_edges[r.src].append(r.dst)
    label = {v: v for v in out_edges}
    for _ in range(_LP_ITERS):
        new = {}
        in_labels = defaultdict(Counter)
        for src, dsts in out_edges.items():
            for d in dsts:
                in_labels[d][label[src]] += 1
        for node, cnts in in_labels.items():
            new[node] = min(
                cnts, key=lambda lb: (-cnts[lb], lb)
            )  # majority, min-label tie
        label = new
    expected = defaultdict(list)
    for node, lb in label.items():
        expected[lb].append(node)
    expected = {
        lb: (len(ns), min(ns), max(ns)) for lb, ns in expected.items()
    }
    got = {
        r.community: (r.n_parts, r.min_part, r.max_part)
        for r in QUERIES["parts_label_propagation"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_label_propagation_argmax_is_group_limited(spark):
    """The per-node arg-max runs as a partial-combined max(struct) — no
    Sort/Window pass at all; each LP round's two aggregations share one
    nd-keyed exchange (r14: replaced the WindowGroupLimit rank-1 shape,
    4.2 s -> 2.4 s warm on the sf0.1 graph)."""
    plan = _plan(spark, "parts_label_propagation")
    assert "partial_max" in plan
    assert "WindowGroupLimit" not in plan
    assert "CartesianProduct" not in plan
