"""Behavior + plan invariants for the round-7f coverage wave
(plans/analytics_coverage.py): Good-Turing, vocab coverage, ABC classes,
k-core. Cross-engine value equality is covered by test_entry_oracle /
tools/driver_check."""

import hashlib
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


def _tokens(text: str) -> list:
    return [t for t in re.split(r"\s+", text) if t]


def _shingles(text: str) -> list:
    toks = _tokens(text)
    if len(toks) >= 3:
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    else:
        grams = [" ".join(toks)]
    return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]


# ---------------------------------------------------------------------------
# corpus_good_turing
# ---------------------------------------------------------------------------


def test_good_turing_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    counts: Counter = Counter()
    for d in docs:
        counts.update(_shingles(d.text))
    ff: Counter = Counter(counts.values())
    n_tokens = sum(counts.values())
    expected = {}
    for r in range(1, 6):
        if r not in ff:
            continue
        n_r, n_r1 = ff[r], ff.get(r + 1, 0)
        expected[r] = (
            n_r,
            n_r1,
            (r + 1) * n_r1 * 1_000_000 // n_r,
            r * n_r * 1_000_000 // n_tokens,
        )
    got = {
        r.r: (r.n_types, r.next_n_types, r.r_star_ppm, r.mass_ppm)
        for r in QUERIES["corpus_good_turing"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # the shingle domain must produce low-count rows


# ---------------------------------------------------------------------------
# corpus_vocab_coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    counts: Counter = Counter()
    for d in docs:
        counts.update(_tokens(d.text))
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    n_tokens = sum(counts.values())
    expected = {}
    for k in (10, 100, 1000):
        covered = sum(c for _, c in ordered[:k])
        expected[k] = (len(counts), covered, covered * 1_000_000 // n_tokens)
    got = {
        r.k: (r.n_types, r.covered_tokens, r.coverage_ppm)
        for r in QUERIES["corpus_vocab_coverage"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        QUERIES["corpus_vocab_coverage"](spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [10, 100, 1000]
    assert all(a.coverage_ppm <= b.coverage_ppm for a, b in zip(rows, rows[1:]))
    assert rows[-1].coverage_ppm <= 1_000_000


# ---------------------------------------------------------------------------
# orders_abc_classification
# ---------------------------------------------------------------------------


def test_abc_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    rev: Counter = Counter()
    for r in li:
        rev[r.l_partkey] += int(math.floor(r.l_extendedprice * 100))
    total = sum(rev.values())
    cum = 0
    classes: dict = defaultdict(lambda: [0, 0])
    for pk, v in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += v
        cls = "A" if cum * 100 <= 80 * total else (
            "B" if cum * 100 <= 95 * total else "C"
        )
        classes[cls][0] += 1
        classes[cls][1] += v
    expected = {
        cls: (n, v, v * 1_000_000 // total) for cls, (n, v) in classes.items()
    }
    got = {
        r.abc: (r.n_parts, r.revenue_cents, r.share_ppm)
        for r in QUERIES["orders_abc_classification"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_abc_no_global_sort_exchange(spark):
    """The cumulative rank must use the two-phase bucket pattern — never a
    rangepartitioning exchange over all parts."""
    plan = _plan(spark, "orders_abc_classification")
    assert "rangepartitioning" not in plan.lower()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# parts_kcore
# ---------------------------------------------------------------------------


def test_kcore_matches_reference_python(spark):
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
    alive = {v for v, ns in neighbors.items() if len(ns) >= 3}
    for _ in range(4):
        alive = {
            v for v in alive if len(neighbors[v] & alive) >= 3
        }
    expected = {v: len(neighbors[v] & alive) for v in alive}
    got = {
        r.node: r.core_degree
        for r in QUERIES["parts_kcore"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_kcore_is_subgraph_with_min_degree_or_converging(spark):
    """After the fixed peeling rounds every emitted node's in-core degree
    is >= k whenever the peel converged; at minimum the core is a subset
    of the k-degree-filtered node set and degrees are positive."""
    rows = QUERIES["parts_kcore"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.core_degree >= 1
    plan = _plan(spark, "parts_kcore")
    assert "CartesianProduct" not in plan
