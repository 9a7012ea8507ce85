"""Behavior invariants for the round-10f wave: Hilbert layout
(plans/analytics_paths.py), Dirichlet query-likelihood retrieval
(plans/analytics_retrieval.py), and the Wald SPRT
(plans/analytics_guardrails.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check; these pin each operator
against an independent pure-Python reference."""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_guardrails import (
    _SPRT_A_PPM,
    _SPRT_B_PPM,
    _SPRT_BOUND_PPM,
    _SPRT_THRESHOLD,
)
from kafka_sink_spark.plans.analytics_paths import _H_BITS, _H_BUCKET_SHIFT, _H_N
from kafka_sink_spark.plans.analytics_retrieval import (
    _QLM_K,
    _QLM_MU,
    _QLM_SCALE,
    _QLM_TERMS,
)
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# Hilbert layout
# --------------------------------------------------------------------------


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_index_is_a_true_hilbert_curve():
    """Bijectivity + unit-step adjacency on a small grid — the property
    that distinguishes Hilbert from Morton (Z-order jumps)."""
    n = 16
    pos = {}
    for x in range(n):
        for y in range(n):
            d = _xy2d(n, x, y)
            assert d not in pos
            pos[d] = (x, y)
    assert len(pos) == n * n
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_layout_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].select(
        "l_partkey", "l_suppkey"
    ).collect()
    pm = max(r["l_partkey"] for r in li)
    sm = max(r["l_suppkey"] for r in li)
    agg = {}
    for r in li:
        bp = r["l_partkey"] * _H_N // (pm + 1)
        bs = r["l_suppkey"] * _H_N // (sm + 1)
        b = _xy2d(_H_N, bp, bs) // (1 << _H_BUCKET_SHIFT)
        a = agg.setdefault(
            b,
            [0, r["l_partkey"], r["l_partkey"], r["l_suppkey"], r["l_suppkey"]],
        )
        a[0] += 1
        a[1] = min(a[1], r["l_partkey"])
        a[2] = max(a[2], r["l_partkey"])
        a[3] = min(a[3], r["l_suppkey"])
        a[4] = max(a[4], r["l_suppkey"])
    rows = {
        r["h_bucket"]: r
        for r in QUERIES["lineitem_hilbert_layout"](spark, SF_DIR).collect()
    }
    assert set(rows) == set(agg)
    for b, (n, p0, p1, s0, s1) in agg.items():
        r = rows[b]
        assert (r["n_rows"], r["p_min"], r["p_max"], r["s_min"], r["s_max"]) == (
            n, p0, p1, s0, s1,
        ), b
        assert r["envelope_area"] == (p1 - p0 + 1) * (s1 - s0 + 1)
    # 8 bits -> 16-bit index -> exactly 16 possible top-level buckets
    assert set(agg) <= set(range(16))


# --------------------------------------------------------------------------
# Dirichlet query-likelihood retrieval
# --------------------------------------------------------------------------


def _lg2_octave_ppm(x: int) -> int:
    assert x > 0
    e = x.bit_length() - 1
    return e * 1_000_000 + ((x - (1 << e)) * 1_000_000) // (1 << e)


def test_qlm_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    toks = {r["doc_id"]: [w for w in re.split(r"\s+", r["text"]) if w] for r in docs}
    T = sum(len(t) for t in toks.values())
    cf = [sum(t.count(term) for t in toks.values()) for term in _QLM_TERMS]
    p = [c * _QLM_SCALE // T for c in cf]
    lg_scale = _lg2_octave_ppm(_QLM_SCALE)
    scored = []
    for doc_id, t in toks.items():
        dl = len(t)
        score = 0
        for i, term in enumerate(_QLM_TERMS):
            tf = t.count(term)
            score += (
                _lg2_octave_ppm(tf * _QLM_SCALE + _QLM_MU * p[i])
                - _lg2_octave_ppm(dl + _QLM_MU)
                - lg_scale
            )
        scored.append((-score, doc_id, dl, score))
    scored.sort()
    expect = scored[:_QLM_K]
    rows = sorted(
        QUERIES["docs_qlm_topk"](spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == _QLM_K
    for rank, (_, doc_id, dl, score) in enumerate(expect, start=1):
        r = rows[rank - 1]
        assert (r["rank"], r["doc_id"], r["dl"], r["score_ppm_bits"]) == (
            rank, doc_id, dl, score,
        )
    # Dirichlet smoothing scores every doc: all scores strictly negative
    assert all(r["score_ppm_bits"] < 0 for r in rows)


# --------------------------------------------------------------------------
# Wald SPRT
# --------------------------------------------------------------------------


def test_sprt_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    series = defaultdict(list)
    for r in events:
        series[r["event_type"]].append(
            (r["ts"], r["event_id"], 1 if r["value"] > _SPRT_THRESHOLD else 0)
        )
    rows = {r["event_type"]: r for r in QUERIES["events_sprt"](spark, SF_DIR).collect()}
    assert set(rows) == set(series)
    for et, xs in series.items():
        xs.sort()
        k = 0
        decision_t = decision = 0
        llr = 0
        for t, (_, _, succ) in enumerate(xs, start=1):
            k += succ
            llr = k * _SPRT_A_PPM + (t - k) * _SPRT_B_PPM
            if decision_t == 0:
                if llr >= _SPRT_BOUND_PPM:
                    decision_t, decision = t, 1
                elif llr <= -_SPRT_BOUND_PPM:
                    decision_t, decision = t, -1
        r = rows[et]
        assert r["n"] == len(xs)
        assert r["k"] == k
        assert r["llr_final_ppm"] == llr, et
        assert r["decision_t"] == decision_t, et
        assert r["decision"] == decision, et
