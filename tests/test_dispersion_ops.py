"""Behavior + plan invariants for the round-8f dispersion wave
(plans/analytics_dispersion.py): Fano factor, OOV rate, prefix-dim
recall.  Cross-engine equality is covered by test_entry_oracle /
tools/driver_check."""

import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# events_fano_factor
# ---------------------------------------------------------------------------


def test_fano_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    hours = [r["ts"].replace(minute=0, second=0, microsecond=0) for r in events]
    span = int((max(hours) - min(hours)).total_seconds() // 3600) + 1
    cnt = Counter(
        (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        for r in events
    )
    agg = defaultdict(lambda: [0, 0, 0])  # s, s2, active
    for (t, _), c in cnt.items():
        a = agg[t]
        a[0] += c
        a[1] += c * c
        a[2] += 1
    got = {r["event_type"]: r for r in QUERIES["events_fano_factor"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for t, (s, s2, active) in agg.items():
        row = got[t]
        assert row["n_hours"] == span
        assert row["n_active"] == active
        assert row["n_events"] == s
        assert row["fano_ppm"] == ((span * s2 - s * s) * 1_000_000) // (span * s)
        # sparse hourly counts over a long span are strongly over-dispersed
        assert row["fano_ppm"] > 0


# ---------------------------------------------------------------------------
# docs_oov_rate
# ---------------------------------------------------------------------------


def test_oov_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    vocab = set()
    for r in docs:
        if r["doc_id"] % 2 == 0:
            vocab.update(t for t in re.split(r"\s+", r["text"]) if t)
    per_src = defaultdict(Counter)
    for r in docs:
        if r["doc_id"] % 2 == 1:
            for t in re.split(r"\s+", r["text"]):
                if t:
                    per_src[r["source"]][t] += 1
    got = {r["source"]: r for r in QUERIES["docs_oov_rate"](spark, SF_DIR).collect()}
    assert set(got) == set(per_src)
    for src, c in per_src.items():
        n_tok = sum(c.values())
        n_oov_tok = sum(v for t, v in c.items() if t not in vocab)
        n_typ = len(c)
        n_oov_typ = sum(1 for t in c if t not in vocab)
        row = got[src]
        assert row["n_tokens"] == n_tok
        assert row["n_oov_tokens"] == n_oov_tok
        assert row["n_types"] == n_typ
        assert row["n_oov_types"] == n_oov_typ
        assert row["oov_token_ppm"] == (n_oov_tok * 1_000_000) // n_tok
        assert row["oov_type_ppm"] == (n_oov_typ * 1_000_000) // n_typ


# ---------------------------------------------------------------------------
# embedding_prefix_dim_recall
# ---------------------------------------------------------------------------


def test_prefix_recall_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb}

    def topk(qid, dim):
        qe = vecs[qid][:dim]
        qn = math.sqrt(sum(x * x for x in qe))
        sims = []
        for nid, v in vecs.items():
            if nid == qid:
                continue
            ce = v[:dim]
            cn = math.sqrt(sum(x * x for x in ce))
            sims.append(
                (round(sum(a * b for a, b in zip(qe, ce)) / (qn * cn), 6), nid)
            )
        sims.sort(key=lambda t: (-t[0], t[1]))
        return {nid for _, nid in sims[:5]}

    got = {r["query_id"]: r for r in QUERIES["embedding_prefix_dim_recall"](spark, SF_DIR).collect()}
    qids = [v for v in vecs if v < 100]
    assert set(got) == set(qids)
    for qid in qids:
        overlap = len(topk(qid, 64) & topk(qid, 16))
        row = got[qid]
        assert row["n_overlap"] == overlap, qid
        assert row["recall_ppm"] == (overlap * 1_000_000) // 5


def test_prefix_recall_plan_no_cartesian(spark):
    df = QUERIES["embedding_prefix_dim_recall"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
