"""Behavior + plan invariants for the round-6m association wave
(plans/analytics_assoc.py): PPJoin prefix-filtered similarity join, Apriori
triples, Count-Min accuracy.  Cross-engine value equality is covered by
test_entry_oracle / tools/driver_check."""

import hashlib
import os
import re
import sys
from collections import Counter, defaultdict
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_assoc import (
    _CM_D,
    _CM_TOPK,
    _CM_W,
    _PP_T_PPM,
    _TRIPLE_MINSUP,
)
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# dedup_ppjoin_pairs
# --------------------------------------------------------------------------


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


def test_ppjoin_matches_bruteforce(spark):
    sets = _shingle_sets(spark)
    expected = {}
    keys = sorted(sets)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a]) + len(sets[b]) - inter
            if inter * 1_000_000 >= _PP_T_PPM * uni:
                expected[(a, b)] = (inter, uni, inter * 1_000_000 // uni)
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.n_union, r.jaccard_ppm)
        for r in QUERIES["dedup_ppjoin_pairs"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # the corpus plants near-dups; the join must find them


def test_ppjoin_no_cartesian(spark):
    """Candidates must come from the prefix-posting equi-join, never an
    all-pairs comparison."""
    plan = _plan(spark, "dedup_ppjoin_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# orders_itemset_triples
# --------------------------------------------------------------------------


def test_triples_match_bruteforce(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    counts = Counter()
    for items in baskets.values():
        for trip in combinations(sorted(items), 3):
            counts[trip] += 1
    expected = {t: c for t, c in counts.items() if c >= _TRIPLE_MINSUP}
    got = {
        (r.item_a, r.item_b, r.item_c): r.support
        for r in QUERIES["orders_itemset_triples"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_triples_downward_closure(spark):
    """Every reported triple's three sub-pairs must each reach min support
    (the Apriori property the pruning relies on)."""
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    pair_counts = Counter()
    for items in baskets.values():
        for p in combinations(sorted(items), 2):
            pair_counts[p] += 1
    for r in QUERIES["orders_itemset_triples"](spark, SF_DIR).collect():
        for p in combinations((r.item_a, r.item_b, r.item_c), 2):
            assert pair_counts[p] >= _TRIPLE_MINSUP


# --------------------------------------------------------------------------
# events_countmin_accuracy
# --------------------------------------------------------------------------


def test_countmin_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    exact = Counter(r.user_id for r in events)
    counters = defaultdict(int)
    for u, c in exact.items():
        for i in range(_CM_D):
            counters[(i, _md5_60(f"cm{i}:{u}") % _CM_W)] += c
    expected = {}
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CM_TOPK]
    for rk, (u, c) in enumerate(top, 1):
        est = min(counters[(i, _md5_60(f"cm{i}:{u}") % _CM_W)] for i in range(_CM_D))
        expected[(rk, u)] = (c, est, est - c, (est - c) * 1_000_000 // c)
    got = {
        (r.rk, r.user_id): (r.exact_cnt, r.cm_est, r.overcount, r.err_ppm)
        for r in QUERIES["events_countmin_accuracy"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_countmin_never_undercounts(spark):
    """CM estimates are upper bounds: overcount ≥ 0 for every key."""
    rows = QUERIES["events_countmin_accuracy"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= _CM_TOPK  # sf0.001 has fewer than TOPK users
    for r in rows:
        assert r.cm_est >= r.exact_cnt
        assert r.overcount == r.cm_est - r.exact_cnt


# --------------------------------------------------------------------------
# lineitem_bloom_fpr
# --------------------------------------------------------------------------


def test_bloom_matches_reference_python(spark):
    from kafka_sink_spark.plans.analytics_assoc import _BF_K, _BF_M

    t = load_tables(spark, SF_DIR, ("lineitem", "part"))
    members = {
        r.l_partkey
        for r in t["lineitem"].collect()
        if r.l_returnflag == "R" and r.l_quantity >= 50
    }
    bits = {(i, _md5_60(f"bf{i}:{pk}") % _BF_M) for pk in members for i in range(_BF_K)}
    universe = [r.p_partkey for r in t["part"].collect()]
    fp = fn = tp = 0
    for pk in universe:
        positive = all((i, _md5_60(f"bf{i}:{pk}") % _BF_M) in bits for i in range(_BF_K))
        if pk in members:
            tp += positive
            fn += not positive
        else:
            fp += positive
    n_non = len(universe) - len(members)
    row = QUERIES["lineitem_bloom_fpr"](spark, SF_DIR).collect()[0]
    assert (
        row.m_bits,
        row.k,
        row.bits_set,
        row.n_members,
        row.n_nonmembers,
        row.n_false_neg,
        row.n_false_pos,
        row.fpr_ppm,
    ) == (
        _BF_M,
        _BF_K,
        len(bits),
        len(members),
        n_non,
        fn,
        fp,
        fp * 1_000_000 // n_non,
    )


def test_bloom_never_false_negative(spark):
    """Structural Bloom invariant: every member probe is positive."""
    row = QUERIES["lineitem_bloom_fpr"](spark, SF_DIR).collect()[0]
    assert row.n_false_neg == 0
    assert row.bits_set <= row.m_bits


# --------------------------------------------------------------------------
# stream_countmin_twin
# --------------------------------------------------------------------------


def test_stream_countmin_equals_batch_counters(spark):
    """The availableNow streaming replay's final counter table must equal
    the batch-computed counters (mergeable sketch state across
    micro-batches)."""
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    counters = defaultdict(int)
    for r in events:
        for i in range(_CM_D):
            counters[(i, _md5_60(f"cm{i}:{r.user_id}") % _CM_W)] += 1
    got = {
        (r.i, r.bucket): r.cnt
        for r in QUERIES["stream_countmin_twin"](spark, SF_DIR).collect()
    }
    assert got == dict(counters)
    assert sum(got.values()) == len(events) * _CM_D
