"""Behavior + plan invariants for the round-6h fusion wave
(plans/analytics_fusion.py): RRF hybrid ranking, interval-stabbing
backlog, seasonal anomaly flags. Cross-engine value equality is covered by
test_entry_oracle / tools/driver_check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_fusion import (
    _RRF_K,
    _RRF_QUERIES,
    _RRF_TOPK,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# knn_rank_fusion
# --------------------------------------------------------------------------


def test_rank_fusion_matches_reference_python(spark):
    """Bit-exact RRF against a Python reference: milli-quantized integer L2
    ranks, 6-dp cosine ranks, integer-division fused scores."""
    import math

    from kafka_sink_spark.session import load_tables

    rows = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    vecs = {r.vec_id: [float(v) for v in r.embedding] for r in rows}
    milli = {i: [math.floor(x * 1000.0) for x in v] for i, v in vecs.items()}
    expected = {}
    for qid in [i for i in vecs if i < _RRF_QUERIES]:
        scored = []
        for nid, v in vecs.items():
            if nid == qid:
                continue
            dot = sum(a * b for a, b in zip(vecs[qid], v))
            cos = round(
                dot
                / (
                    math.sqrt(sum(a * a for a in vecs[qid]))
                    * math.sqrt(sum(b * b for b in v))
                ),
                6,
            )
            d2 = sum((a - b) ** 2 for a, b in zip(milli[qid], milli[nid]))
            scored.append((nid, cos, d2))
        by_cos = {n: i + 1 for i, (n, _, _) in enumerate(
            sorted(scored, key=lambda t: (-t[1], t[0])))}
        by_l2 = {n: i + 1 for i, (n, _, _) in enumerate(
            sorted(scored, key=lambda t: (t[2], t[0])))}
        fused = sorted(
            (
                (
                    n,
                    1_000_000 // (_RRF_K + by_cos[n])
                    + 1_000_000 // (_RRF_K + by_l2[n]),
                )
                for n, _, _ in scored
            ),
            key=lambda t: (-t[1], t[0]),
        )[:_RRF_TOPK]
        expected[qid] = [
            (rk + 1, n, s, by_cos[n], by_l2[n])
            for rk, (n, s) in enumerate(fused)
        ]
    got = {}
    for r in QUERIES["knn_rank_fusion"](spark, SF_DIR).collect():
        got.setdefault(r.query_id, []).append(
            (r.rank, r.neighbor_id, r.fused_score, r.rank_cos, r.rank_l2)
        )
    for qid in expected:
        assert sorted(got[qid]) == expected[qid], qid


def test_rank_fusion_single_exchange_broadcast_queries(spark):
    """One broadcast join (queries), and all three rank windows share the
    query_id partitioning: exactly one shuffle Exchange."""
    plan = _plan(spark, "knn_rank_fusion")
    assert "BroadcastNestedLoopJoin" in plan  # query block broadcast
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------------------------------------
# orders_open_backlog
# --------------------------------------------------------------------------


def test_backlog_matches_reference_python(spark):
    from collections import defaultdict

    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables

    t = load_tables(spark, SF_DIR, ("lineitem", "orders"))
    closes = {
        r.l_orderkey: r.close_d
        for r in t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("close_d"))
        .collect()
    }
    deltas = defaultdict(lambda: [0, 0])
    import datetime

    for r in t["orders"].select("o_orderkey", F.to_date("o_orderdate").alias("d")).collect():
        if r.o_orderkey not in closes:
            continue
        deltas[r.d][0] += 1
        deltas[closes[r.o_orderkey] + datetime.timedelta(days=1)][1] += 1
    expected = {}
    running = 0
    for day in sorted(deltas):
        opened, closed = deltas[day]
        running += opened - closed
        expected[str(day)] = (opened, closed, running)
    got = {
        r.day: (r.n_opened, r.n_closed, r.open_orders)
        for r in QUERIES["orders_open_backlog"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_backlog_never_negative_and_ends_at_zero(spark):
    rows = sorted(
        QUERIES["orders_open_backlog"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    assert all(r.open_orders >= 0 for r in rows)
    assert rows[-1].open_orders == 0  # every order eventually closes
    assert sum(r.n_opened for r in rows) == sum(r.n_closed for r in rows)


def test_backlog_two_phase_no_global_sort_of_days(spark):
    """The only single-partition window runs over bucket totals (~#days/64
    rows); the day-level cumulative is partitioned by bucket."""
    plan = _plan(spark, "orders_open_backlog")
    assert "Window [sum" in plan or "RunningWindowFunction" in plan
    assert "Exchange SinglePartition" in plan  # the tiny bucket-prefix table


# --------------------------------------------------------------------------
# events_anomaly_seasonal
# --------------------------------------------------------------------------


def test_seasonal_flags_match_reference_python(spark):
    from collections import defaultdict

    from kafka_sink_spark.session import load_tables

    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    import math

    cells = defaultdict(list)
    for e in events:
        xm = math.floor(e.value * 1_000_000)
        cells[(e.event_type, e.ts.hour)].append((e.event_id, xm))
    expected = set()
    for (_et, _h), rows in cells.items():
        n = len(rows)
        s = sum(x for _, x in rows)
        q = sum(x * x for _, x in rows)
        for eid, x in rows:
            if (n * x - s) ** 2 > 9 * (n * q - s * s):
                expected.add(eid)
    got = {
        r.event_id
        for r in QUERIES["events_anomaly_seasonal"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # non-degenerate at this SF


def test_seasonal_differs_from_global_outliers(spark):
    """The seasonal baseline must actually change the verdict for at least
    one event relative to the global per-type 3-sigma flag — otherwise the
    finer keyspace is decorative."""
    seasonal = {
        r.event_id
        for r in QUERIES["events_anomaly_seasonal"](spark, SF_DIR).collect()
    }
    global_ = {
        r.event_id
        for r in QUERIES["events_value_outliers"](spark, SF_DIR).collect()
        if r.is_outlier == 1
    }
    assert seasonal != global_


def test_seasonal_broadcast_stats_no_wide_join(spark):
    plan = _plan(spark, "events_anomaly_seasonal")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
