"""Behavior + plan invariants for the round-6g paths wave
(plans/analytics_paths.py): keyword extraction, Z-order layout, path
mining. Cross-engine value equality is covered by test_entry_oracle /
tools/driver_check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_paths import (
    _KW_TOPK,
    _PATH_TOPK,
    _Z_BITS,
    _Z_BUCKET_SHIFT,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# docs_keyword_topk
# --------------------------------------------------------------------------


def test_keyword_topk_matches_reference_python(spark):
    import re
    from collections import Counter, defaultdict

    from kafka_sink_spark.session import load_tables

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    n = len(docs)
    tf = {d.doc_id: Counter(re.findall(r"[a-z]+", d.text.lower())) for d in docs}
    df = defaultdict(int)
    for counts in tf.values():
        for term in counts:
            df[term] += 1
    expected = {}
    for doc_id, counts in tf.items():
        scored = sorted(
            ((t, c, (c * n * 1_000_000) // df[t]) for t, c in counts.items()),
            key=lambda x: (-x[2], x[0]),
        )[:_KW_TOPK]
        expected[doc_id] = [
            (rk + 1, t, c, df[t], s) for rk, (t, c, s) in enumerate(scored)
        ]
    got = defaultdict(list)
    for r in QUERIES["docs_keyword_topk"](spark, SF_DIR).collect():
        got[r.doc_id].append((r.rank, r.term, r.tf, r.df, r.score))
    for doc_id in expected:
        assert sorted(got[doc_id]) == expected[doc_id], doc_id


def test_keyword_topk_window_group_limit(spark):
    """The rank<=3 filter must push a WindowGroupLimit below the doc-keyed
    exchange so the window never sees the full scored table."""
    plan = _plan(spark, "docs_keyword_topk")
    assert "WindowGroupLimit" in plan


# --------------------------------------------------------------------------
# lineitem_zorder_layout
# --------------------------------------------------------------------------


def test_zorder_buckets_partition_rows_and_bound_both_dims(spark):
    from kafka_sink_spark.session import load_tables

    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    n = li.count()
    rows = QUERIES["lineitem_zorder_layout"](spark, SF_DIR).collect()
    assert sum(r.n_rows for r in rows) == n
    assert 1 <= len(rows) <= 1 << (2 * _Z_BITS - _Z_BUCKET_SHIFT)
    # Each top-level Z bucket fixes the top 2 bits of BOTH dimensions, so
    # each envelope spans at most ~a quarter of either key range (+1 slack
    # for the max-quantile edge).
    p_hi = max(r.p_max for r in rows)
    s_hi = max(r.s_max for r in rows)
    for r in rows:
        assert r.p_max - r.p_min <= p_hi // 4 + 2
        assert r.s_max - r.s_min <= s_hi // 4 + 2


def test_zorder_morton_code_reference(spark):
    """Spot-check the Morton interleave against a Python reference on the
    bucketed keys."""
    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables

    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    pm, sm = li.agg(F.max("l_partkey"), F.max("l_suppkey")).collect()[0]
    sample = li.limit(20).collect()

    def morton(bp, bs):
        z = 0
        for i in range(_Z_BITS):
            z |= ((bp >> i) & 1) << (2 * i)
            z |= ((bs >> i) & 1) << (2 * i + 1)
        return z

    expected_buckets = set()
    for r in sample:
        bp = r.l_partkey * (1 << _Z_BITS) // (pm + 1)
        bs = r.l_suppkey * (1 << _Z_BITS) // (sm + 1)
        expected_buckets.add(morton(bp, bs) >> _Z_BUCKET_SHIFT)
    got_buckets = {
        r.z_bucket for r in QUERIES["lineitem_zorder_layout"](spark, SF_DIR).collect()
    }
    assert expected_buckets <= got_buckets


def test_zorder_zero_wide_shuffle(spark):
    plan = _plan(spark, "lineitem_zorder_layout")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the scalar max cross join


# --------------------------------------------------------------------------
# events_top_paths
# --------------------------------------------------------------------------


def test_top_paths_matches_reference_python(spark):
    from collections import Counter, defaultdict

    from kafka_sink_spark.session import load_tables

    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    by_user = defaultdict(list)
    for e in events:
        by_user[e.user_id].append((e.ts, e.event_id, e.event_type))
    paths = Counter()
    for evs in by_user.values():
        evs.sort()
        types = [t for _, _, t in evs]
        for a, b, c in zip(types, types[1:], types[2:]):
            paths[f"{a}>{b}>{c}"] += 1
    total = sum(paths.values())
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:_PATH_TOPK]
    rows = sorted(
        QUERIES["events_top_paths"](spark, SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.path, r.cnt) for r in rows] == top
    for r in rows:
        assert r.share_ppm == r.cnt * 1_000_000 // total


def test_top_paths_take_ordered_single_user_window(spark):
    plan = _plan(spark, "events_top_paths")
    assert "TakeOrderedAndProject" in plan
    # both lead()s share one Window node
    assert plan.count("Window") - plan.count("WindowGroupLimit") <= 2
