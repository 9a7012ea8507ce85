"""Behavior + plan invariants for the round-8d segmentation wave
(plans/analytics_segments.py): lang-id confusion, cosine threshold
sweep, RFM quintiles.  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.extensions.text import LANG_MARKERS
from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# docs_langid_confusion
# ---------------------------------------------------------------------------


def _ref_lang_id(text: str) -> str:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    best, best_score = "und", 0
    for lang in ("en", "de", "es", "fr"):
        s = sum(1 for t in toks if t in LANG_MARKERS[lang])
        if s > best_score:
            best, best_score = lang, s
    return best


def test_langid_confusion_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    m = Counter()
    tot = Counter()
    for r in docs:
        pred = _ref_lang_id(r["text"])
        m[(r["lang"], pred)] += 1
        tot[r["lang"]] += 1
    got = {
        (r["true_lang"], r["pred_lang"]): (r["n_docs"], r["share_ppm"])
        for r in QUERIES["docs_langid_confusion"](spark, SF_DIR).collect()
    }
    want = {
        k: (n, (n * 1_000_000) // tot[k[0]]) for k, n in m.items()
    }
    assert got == want
    # shares per true language sum to ~1e6 (truncation can only lose)
    per_true = defaultdict(int)
    for (t, _), (_, share) in got.items():
        per_true[t] += share
    for t, s in per_true.items():
        assert 1_000_000 - len(tot) * 2 <= s <= 1_000_000


# ---------------------------------------------------------------------------
# embedding_threshold_sweep
# ---------------------------------------------------------------------------


def test_threshold_sweep_is_monotone_and_anchored(spark):
    rows = {r["threshold_ppm"]: r for r in QUERIES["embedding_threshold_sweep"](spark, SF_DIR).collect()}
    assert set(rows) == {0, 100_000, 200_000, 300_000, 400_000}
    counts = [rows[t]["n_pairs"] for t in sorted(rows)]
    assert counts == sorted(counts, reverse=True)  # monotone non-increasing
    n_cand = {r["n_candidates"] for r in rows.values()}
    assert len(n_cand) == 1  # one shared candidate census
    # the 0.3 row must agree with the certified near-dup pair query
    neardup = QUERIES["embedding_cosine_neardup"](spark, SF_DIR).count()
    assert rows[300_000]["n_pairs"] == neardup


def test_threshold_sweep_no_cartesian(spark):
    plan = _plan(spark, "embedding_threshold_sweep")
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# customer_rfm_segments
# ---------------------------------------------------------------------------


def test_rfm_matches_reference_python(spark):
    orders = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    cust = {}
    for r in orders:
        ck = r["o_custkey"]
        d = r["o_orderdate"]
        sp = int(math.floor(float(r["o_totalprice"]) * 100))
        if ck not in cust:
            cust[ck] = [d, 0, 0]
        c = cust[ck]
        c[0] = max(c[0], d)
        c[1] += 1
        c[2] += sp
    ref_d = max(c[0] for c in cust.values())
    n = len(cust)
    recs = {ck: (ref_d - c[0]).days for ck, c in cust.items()}

    def quintile(order):
        out = {}
        for i, ck in enumerate(order):
            out[ck] = ((i * 5) // n) + 1
        return out

    rq = quintile(sorted(cust, key=lambda ck: (recs[ck], ck)))
    fq = quintile(sorted(cust, key=lambda ck: (-cust[ck][1], ck)))
    mq = quintile(sorted(cust, key=lambda ck: (-cust[ck][2], ck)))
    want = defaultdict(lambda: [0, 0])
    for ck, c in cust.items():
        w = want[(rq[ck], fq[ck], mq[ck])]
        w[0] += 1
        w[1] += c[2]
    got = {
        (r["r_q"], r["f_q"], r["m_q"]): (r["n_customers"], r["spend_cents"])
        for r in QUERIES["customer_rfm_segments"](spark, SF_DIR).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert sum(v[0] for v in got.values()) == n


def test_rfm_plan_uses_grid_prefix_not_global_sort(spark):
    df = QUERIES["customer_rfm_segments"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        yield node
        if node.nodeName() == "AdaptiveSparkPlan":
            yield from walk(node.executedPlan())
            return
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    unpart = [
        n
        for n in walk(plan)
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty()
    ]
    # exactly the three bounded grid prefixes — never a customer-table sort
    assert len(unpart) == 3
    assert "rangepartitioning" not in plan.toString().lower()
