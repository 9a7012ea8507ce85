"""Behavior + plan invariants for the round-8a ranking wave
(plans/analytics_ranking.py): MRR@10, Kendall τ-b, Theil T index.
Cross-engine value equality is covered by test_entry_oracle /
tools/driver_check; these tests recompute each statistic independently
in plain Python and pin the plan shapes."""

import math
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _tokens(text: str) -> list:
    return [t for t in re.split(r"\s+", text) if t]


def _log2_ppm(x: int) -> int:
    """Octave-interpolated log2 in ppm-bits (the catalog's log-free log2)."""
    b = x.bit_length() - 1
    p = 1 << b
    return b * 1_000_000 + ((x - p) * 1_000_000) // p


def _sdiv(a: int, b: int) -> int:
    return a // b if a >= 0 else -((-a) // b)


# ---------------------------------------------------------------------------
# knn_mrr
# ---------------------------------------------------------------------------


def test_mrr_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    vecs = {r["vec_id"]: (r["embedding"], r["label"]) for r in emb}
    got = {
        r["query_id"]: (r["label"], r["first_rel_rank"], r["rr_ppm"])
        for r in QUERIES["knn_mrr"](spark, SF_DIR).collect()
    }
    for qid in [v for v in vecs if v < 100]:
        qe, ql = vecs[qid]
        qn = math.sqrt(sum(x * x for x in qe))
        sims = []
        for nid, (ce, cl) in vecs.items():
            if nid == qid:
                continue
            dot = sum(a * b for a, b in zip(qe, ce))
            cn = math.sqrt(sum(x * x for x in ce))
            sims.append((round(dot / (qn * cn), 6), nid, cl))
        sims.sort(key=lambda t: (-t[0], t[1]))
        frr = 0
        for rank, (_, _, cl) in enumerate(sims[:10], start=1):
            if cl == ql:
                frr = rank
                break
        rr = 1_000_000 // frr if frr else 0
        assert got[qid] == (ql, frr, rr), qid
    assert len(got) == min(100, len(vecs))


def test_mrr_plan_is_panel_shaped(spark):
    plan = _plan(spark, "knn_mrr")
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # per-query top-k pushdown


# ---------------------------------------------------------------------------
# corpus_kendall_tau
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    ca: Counter = Counter()
    cb: Counter = Counter()
    tot: Counter = Counter()
    for r in docs:
        half = r["doc_id"] % 2
        for t in _tokens(r["text"]):
            tot[t] += 1
            (ca if half == 0 else cb)[t] += 1
    panel = sorted(tot, key=lambda t: (-tot[t], t))[:100]
    c = d = ta = tb = n0 = 0
    for i in range(len(panel)):
        for j in range(len(panel)):
            if panel[i] < panel[j]:
                n0 += 1
                da = ca[panel[i]] - ca[panel[j]]
                db = cb[panel[i]] - cb[panel[j]]
                if da * db > 0:
                    c += 1
                elif da * db < 0:
                    d += 1
                if da == 0:
                    ta += 1
                if db == 0:
                    tb += 1
    diff = c - d
    tau = _sdiv(
        (1 if diff >= 0 else -1) * diff * diff * 1_000_000,
        (n0 - ta) * (n0 - tb),
    )
    (row,) = QUERIES["corpus_kendall_tau"](spark, SF_DIR).collect()
    assert (
        row["concordant"],
        row["discordant"],
        row["ties_a"],
        row["ties_b"],
        row["tau_b2_signed_ppm"],
    ) == (c, d, ta, tb, tau)


def test_kendall_panel_is_take_ordered(spark):
    plan = _plan(spark, "corpus_kendall_tau")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# lineitem_theil_index
# ---------------------------------------------------------------------------


def test_theil_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    rev: Counter = Counter()
    for r in li:
        rev[r["l_partkey"]] += int(
            math.floor(float(r["l_extendedprice"]) * (1 - float(r["l_discount"])) * 100)
        )
    xs = [v for v in rev.values() if v > 0]
    n, s = len(xs), sum(xs)
    # r10 bounded probability-ratio convention: lg(revenue share) −
    # lg(uniform share), both in 1e12 fixed point
    q_lg = _log2_ppm(max(10**12 // n, 1))
    t_sum = sum(
        _sdiv(x * (_log2_ppm(max(x * 10**12 // s, 1)) - q_lg), s)
        for x in xs
    )
    nats = _sdiv(t_sum * 693_147, 1_000_000)
    (row,) = QUERIES["lineitem_theil_index"](spark, SF_DIR).collect()
    assert (row["n_parts"], row["total_cents"]) == (n, s)
    assert row["theil_ppm_bits"] == t_sum
    assert row["theil_nats_ppm"] == nats
    # revenue concentration over TPC-H parts is mild but nonzero
    assert row["theil_nats_ppm"] > 0


def test_theil_single_fact_scan(spark):
    # the parts rollup is localCheckpointed, so the lineitem scan runs
    # once at build time and the plan reads the checkpointed RDD
    plan = _plan(spark, "lineitem_theil_index")
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert "partial_sum" in plan
