"""Behavior + plan invariants for the round-8g bias wave
(plans/analytics_bias.py): dedup survivor-quality audit, discount
elasticity, priority-mix KL.  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _log2_ppm(x: int) -> int:
    b = x.bit_length() - 1
    p = 1 << b
    return b * 1_000_000 + ((x - p) * 1_000_000) // p


def _sdiv(a: int, b: int) -> int:
    return a // b if a >= 0 else -((-a) // b)


# ---------------------------------------------------------------------------
# dedup_survivor_quality
# ---------------------------------------------------------------------------


def test_survivor_audit_consistent_with_certified_pieces(spark):
    assign = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    }
    flags = {
        r["doc_id"]: (r["n_words"], r["ok_all"])
        for r in QUERIES["docs_gopher_filter"](spark, SF_DIR).collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])  # n, words, pass
    for doc, (w, ok) in flags.items():
        if doc not in assign:
            cohort = "singleton"
        elif doc == assign[doc]:
            cohort = "survivor"
        else:
            cohort = "removed"
        a = agg[cohort]
        a[0] += 1
        a[1] += w
        a[2] += ok
    got = {r["cohort"]: r for r in QUERIES["dedup_survivor_quality"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for cohort, (n, w, ok) in agg.items():
        row = got[cohort]
        assert row["n_docs"] == n
        assert row["total_words"] == w
        assert row["mean_words_ppm"] == (w * 1_000_000) // n
        assert row["gopher_pass_ppm"] == (ok * 1_000_000) // n
    # the census must cover the whole corpus
    assert sum(a[0] for a in agg.values()) == len(flags)


# ---------------------------------------------------------------------------
# lineitem_discount_elasticity
# ---------------------------------------------------------------------------


def test_elasticity_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n, qty, price_cents
    for r in li:
        pct = int(round(float(r["l_discount"]) * 100))
        a = agg[pct]
        a[0] += 1
        a[1] += int(math.floor(float(r["l_quantity"])))
        a[2] += int(math.floor(float(r["l_extendedprice"]) * 100))
    n_total = sum(a[0] for a in agg.values())
    got = {r["discount_pct"]: r for r in QUERIES["lineitem_discount_elasticity"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for pct, (n, q, p) in agg.items():
        row = got[pct]
        assert row["n_items"] == n
        assert row["mean_qty_ppm"] == (q * 1_000_000) // n
        assert row["mean_price_cents"] == p // n
        assert row["item_share_ppm"] == (n * 1_000_000) // n_total


# ---------------------------------------------------------------------------
# orders_priority_kl_by_nation
# ---------------------------------------------------------------------------


def test_priority_kl_matches_reference_python(spark):
    t = load_tables(spark, SF_DIR, ("orders", "customer"))
    nation = {r["c_custkey"]: r["c_nationkey"] for r in t["customer"].collect()}
    nc = Counter()
    for r in t["orders"].select("o_custkey", "o_orderpriority").collect():
        nc[(nation[r["o_custkey"]], r["o_orderpriority"])] += 1
    tn = Counter()
    gc = Counter()
    for (n, p), c in nc.items():
        tn[n] += c
        gc[p] += c
    tg = sum(nc.values())
    got = {r["nation"]: r for r in QUERIES["orders_priority_kl_by_nation"](spark, SF_DIR).collect()}
    assert set(got) == set(tn)
    for n in tn:
        # r10 bounded probability-ratio convention (1e12 fixed point)
        kl = sum(
            _sdiv(
                c
                * (
                    _log2_ppm(max(c * 10**12 // tn[n], 1))
                    - _log2_ppm(max(gc[p] * 10**12 // tg, 1))
                ),
                tn[n],
            )
            for (nn, p), c in nc.items()
            if nn == n
        )
        row = got[n]
        assert row["n_orders"] == tn[n]
        assert row["kl_ppm_bits"] == kl, n


def test_priority_kl_dimension_join_unhinted(spark):
    df = QUERIES["orders_priority_kl_by_nation"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly the three bounded-grid broadcasts (nation totals, priority
    # totals, single-row grand total) — the SF-scaling customer dimension
    # join itself stays unhinted
    assert analyzed.count("ResolvedHint") == 3
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
