"""Behavior invariants for the round-10d retrieval/validation wave
(plans/analytics_retrieval.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check; these tests pin each query
against an independent pure-Python replica of the published algorithm.
"""

import hashlib
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_retrieval import (
    _BM25_K,
    _BM25_TERMS,
    _CV_K,
    _HITS_TOP,
)
from kafka_sink_spark.plans.analytics_readability import octave_log2_ppm
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------


def _bm25_replica(spark):
    docs = load_tables(spark, SF_DIR, ("documents",)).get("documents").collect()
    rows = []
    for r in docs:
        toks = [t for t in r["text"].split() if t]
        tf = [sum(1 for t in toks if t == term) for term in _BM25_TERMS]
        rows.append((int(r["doc_id"]), len(toks), tf))
    T = sum(dl for _d, dl, _tf in rows)
    n = len(rows)
    df = [
        sum(1 for _d, _dl, tf in rows if tf[i] > 0)
        for i in range(len(_BM25_TERMS))
    ]
    idf = [
        octave_log2_ppm(2 * n + 2) - octave_log2_ppm(2 * df[i] + 1)
        for i in range(len(_BM25_TERMS))
    ]
    scored = []
    for doc_id, dl, tf in rows:
        score, nt = 0, 0
        for i in range(len(_BM25_TERMS)):
            if tf[i] > 0:
                nt += 1
                tfc = (44 * tf[i] * T * 1_000_000) // (
                    20 * tf[i] * T + 6 * T + 18 * dl * n
                )
                score += (idf[i] * tfc) // 1_000_000
        if nt > 0:
            scored.append((doc_id, dl, score, nt))
    scored.sort(key=lambda t: (-t[2], t[0]))
    return [
        (rank, doc_id, dl, score, nt)
        for rank, (doc_id, dl, score, nt) in enumerate(
            scored[:_BM25_K], start=1
        )
    ]


def test_bm25_matches_python_replica(spark):
    expect = _bm25_replica(spark)
    got = sorted(
        (
            r["rank"],
            r["doc_id"],
            r["dl"],
            r["score_micro_bits"],
            r["n_terms"],
        )
        for r in QUERIES["docs_bm25_topk"](spark, SF_DIR).collect()
    )
    assert got == expect
    # idf is the Lucene variant — always positive — so a doc matching the
    # rare term should outrank pure common-term docs; scores descend
    scores = [s for _r, _d, _dl, s, _n in got]
    assert scores == sorted(scores, reverse=True)


# --------------------------------------------------------------------------
# HITS
# --------------------------------------------------------------------------


def _hits_replica(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",)).get("lineitem").collect()
    edges = {(int(r["l_suppkey"]), int(r["l_partkey"])) for r in li}
    a1 = Counter(p for _s, p in edges)
    h1 = defaultdict(int)
    for s, p in edges:
        h1[s] += a1[p]
    a2 = defaultdict(int)
    for s, p in edges:
        a2[p] += h1[s]
    out = []
    for node_type, scores in (("hub", h1), ("authority", a2)):
        mx = max(scores.values())
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_HITS_TOP]
        for rank, (node, sc) in enumerate(top, start=1):
            out.append((node_type, node, rank, sc, sc * 1_000_000 // mx))
    return sorted(out)


def test_hits_matches_python_replica(spark):
    expect = _hits_replica(spark)
    got = sorted(
        (r["node_type"], r["node_id"], r["rank"], r["score"], r["score_ppm"])
        for r in QUERIES["parts_hits_authority"](spark, SF_DIR).collect()
    )
    assert got == expect
    # rank 1 per type carries ppm == 1e6 (max-normalized)
    tops = {t: p for t, _n, rk, _s, p in got if rk == 1}
    assert tops == {"hub": 1_000_000, "authority": 1_000_000}


# --------------------------------------------------------------------------
# K-fold CV
# --------------------------------------------------------------------------


def _cv_replica(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",)).get("lineitem").collect()
    rows = [
        (
            int(r["l_quantity"]),
            int(math.floor(r["l_extendedprice"])),
            _md5_60(f"{r['l_orderkey']}|{r['l_linenumber']}") % _CV_K,
        )
        for r in li
    ]
    sse = Counter()
    n_test = Counter()
    for f in range(_CV_K):
        # the DIRECT leave-fold-out fit — independent of the closed form
        sums, cnts = Counter(), Counter()
        for g, y, fold in rows:
            if fold != f:
                sums[g] += y
                cnts[g] += 1
        fit = {g: sums[g] // cnts[g] for g in sums}
        for g, y, fold in rows:
            if fold == f:
                sse[str(f)] += (y - fit[g]) ** 2
                n_test[str(f)] += 1
    sse["*"] = sum(sse[str(f)] for f in range(_CV_K))
    n_test["*"] = sum(n_test[str(f)] for f in range(_CV_K))
    return {
        k: (n_test[k], sse[k], sse[k] * 1_000_000 // n_test[k]) for k in sse
    }


def test_kfold_closed_form_equals_direct_refit(spark):
    expect = _cv_replica(spark)
    got = {
        r["fold"]: (r["n_test"], r["sse_dollars2"], r["mse_micro"])
        for r in QUERIES["lineitem_kfold_cv"](spark, SF_DIR).collect()
    }
    assert got == expect
    assert set(got) == {str(f) for f in range(_CV_K)} | {"*"}


# --------------------------------------------------------------------------
# CEM ATT
# --------------------------------------------------------------------------


def _cem_replica(spark):
    ev = load_tables(spark, SF_DIR, ("events",)).get("events").collect()
    bins = defaultdict(lambda: [0, 0, 0, 0])  # n_t, n_c, s_t, s_c
    for r in ev:
        if r["event_type"] not in ("purchase", "view"):
            continue
        dow = r["ts"].date().isoweekday()
        cell = bins[(dow, r["ts"].hour)]
        cents = int(math.floor(r["value"] * 100))
        if r["event_type"] == "purchase":
            cell[0] += 1
            cell[2] += cents
        else:
            cell[1] += 1
            cell[3] += cents

    def ssdiv(num, den):
        return num // den if num >= 0 else -((-num) // den)

    out = {}
    tot_t = tot_c = tot_m = tot_contrib = 0
    for (dow, hod), (n_t, n_c, s_t, s_c) in bins.items():
        matched = 1 if n_t > 0 and n_c > 0 else 0
        if matched:
            num = (s_t * n_c - n_t * s_c) * 1_000_000
            diff = ssdiv(num, n_c * max(n_t, 1))
            contrib = ssdiv(num, n_c)
            tot_t += n_t
            tot_c += n_c
            tot_m += 1
            tot_contrib += contrib
        else:
            diff = 0
        out[(dow, hod)] = (n_t, n_c, matched, diff)
    out[(-1, -1)] = (tot_t, tot_c, tot_m, ssdiv(tot_contrib, tot_t))
    return out


def test_cem_att_matches_python_replica(spark):
    expect = _cem_replica(spark)
    got = {
        (r["dow"], r["hod"]): (
            r["n_treated"],
            r["n_control"],
            r["matched"],
            r["diff_micro"],
        )
        for r in QUERIES["events_cem_att"](spark, SF_DIR).collect()
    }
    assert got == expect
    # ATT row aggregates exactly the matched strata
    att = got[(-1, -1)]
    assert att[0] == sum(
        v[0] for k, v in got.items() if k != (-1, -1) and v[2] == 1
    )
