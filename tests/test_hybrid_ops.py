"""Behavior invariants for the round-10h wave: hybrid BM25+dense RRF
(plans/analytics_fusion.py) against a full pure-Python reference, and
the streaming SPRT twin against the batch catalog query."""

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_fusion import (
    _HY_K,
    _HY_QVEC,
    _HY_RRF_C,
    _HY_SIDE_TOPK,
)
from kafka_sink_spark.plans.analytics_retrieval import _BM25_TERMS
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _lg2_octave_ppm(x: int) -> int:
    assert x > 0
    e = x.bit_length() - 1
    return e * 1_000_000 + ((x - (1 << e)) * 1_000_000) // (1 << e)


def _bm25_reference(docs):
    toks = {
        r["doc_id"]: [w for w in re.split(r"\s+", r["text"]) if w]
        for r in docs
    }
    T = sum(len(t) for t in toks.values())
    n = len(toks)
    df = [
        sum(1 for t in toks.values() if term in t) for term in _BM25_TERMS
    ]
    idf = [
        _lg2_octave_ppm(2 * n + 2) - _lg2_octave_ppm(2 * d + 1) for d in df
    ]
    scored = {}
    for doc_id, t in toks.items():
        dl = len(t)
        score = 0
        n_terms = 0
        for i, term in enumerate(_BM25_TERMS):
            tf = t.count(term)
            if tf > 0:
                n_terms += 1
                tfc = (44 * tf * T * 1_000_000) // (
                    20 * tf * T + 6 * T + 18 * dl * n
                )
                score += idf[i] * tfc // 1_000_000
        if n_terms > 0:
            scored[doc_id] = score
    ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
    return {doc_id: rk for rk, (doc_id, _) in enumerate(ranked[:_HY_SIDE_TOPK], 1)}


def _dense_reference(emb):
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}
    q = vecs[_HY_QVEC]
    nq = math.sqrt(sum(x * x for x in q))
    sims = []
    for vid, v in vecs.items():
        if vid == _HY_QVEC:
            continue
        dot = 0.0
        for a, b in zip(q, v):
            dot += a * b
        nc = math.sqrt(sum(x * x for x in v))
        sims.append((round(dot / (nq * nc), 6), vid))
    sims.sort(key=lambda t: (-t[0], t[1]))
    return {vid: rk for rk, (_, vid) in enumerate(sims[:_HY_SIDE_TOPK], 1)}


def test_hybrid_rrf_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    lex = _bm25_reference(docs)
    dense = _dense_reference(emb)
    fused = {}
    for doc_id in set(lex) | set(dense):
        rrf = 0
        if doc_id in lex:
            rrf += 1_000_000 // (_HY_RRF_C + lex[doc_id])
        if doc_id in dense:
            rrf += 1_000_000 // (_HY_RRF_C + dense[doc_id])
        fused[doc_id] = rrf
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:_HY_K]
    rows = sorted(
        QUERIES["docs_hybrid_rrf"](spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == _HY_K
    for rank, (doc_id, rrf) in enumerate(expect, 1):
        r = rows[rank - 1]
        assert (r["rank"], r["doc_id"], r["rrf_ppm"]) == (rank, doc_id, rrf)
        assert r["rank_lex"] == lex.get(doc_id, 0)
        assert r["rank_dense"] == dense.get(doc_id, 0)
    # fusion actually fuses: the top-k must contain at least one doc per side
    assert any(r["rank_lex"] > 0 for r in rows)
    assert any(r["rank_dense"] > 0 for r in rows)


def test_stream_sprt_twin_equals_batch_query(spark):
    batch = {
        r["event_type"]: tuple(r)
        for r in QUERIES["events_sprt"](spark, SF_DIR).collect()
    }
    stream = {
        r["event_type"]: tuple(r)
        for r in QUERIES["stream_sprt_twin"](spark, SF_DIR).collect()
    }
    assert batch == stream
    # the twin actually decided something on the driver corpus
    assert any(r[-1] != 0 for r in stream.values())
