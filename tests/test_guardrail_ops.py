"""Behavior invariants for the round-10e waves: binary-quantized ANN
(plans/analytics_hamming.py), pipeline guardrails
(plans/analytics_guardrails.py), and LP-community modularity
(plans/analytics_inference.py::parts_modularity).  Cross-engine
equality is covered by test_entry_oracle / tools/driver_check; these
pin each operator against an INDEPENDENT pure-Python reference
computation plus its structural invariants."""

import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_guardrails import (
    _BLOCKLIST,
    _CMH_EXPOSED_PRIORITIES,
    _CMH_OUTCOME_THRESHOLD,
    _PH_LAMBDA_US,
)
from kafka_sink_spark.plans.analytics_hamming import _BQ_K, _BQ_QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# Binary-quantized ANN
# --------------------------------------------------------------------------


def _sign_codes(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    codes = {}
    for r in emb:
        code = 0
        for d, x in enumerate(r["embedding"]):
            if x > 0:
                code |= 1 << d
        codes[r["vec_id"]] = code
    return codes


def test_binary_hamming_matches_reference_python(spark):
    codes = _sign_codes(spark)
    expect = {}
    for q in range(_BQ_QUERIES):
        ranked = sorted(
            (
                (bin(codes[q] ^ c).count("1"), nid)
                for nid, c in codes.items()
                if nid != q
            )
        )[:_BQ_K]
        expect[q] = ranked
    rows = QUERIES["knn_binary_hamming"](spark, SF_DIR).collect()
    assert len(rows) == _BQ_QUERIES * _BQ_K
    got = defaultdict(list)
    for r in rows:
        got[r["query_id"]].append((r["rank"], r["neighbor_id"], r["hamming"]))
    for q, ranked in expect.items():
        g = sorted(got[q])
        assert [(i + 1, nid, h) for i, (h, nid) in enumerate(ranked)] == g, q


def test_binary_recall_consistent_with_shortlists(spark):
    ham = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["knn_binary_hamming"](spark, SF_DIR).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["knn_bruteforce"](spark, SF_DIR).collect()
    }
    rows = {r["query_id"]: r for r in QUERIES["knn_binary_recall"](spark, SF_DIR).collect()}
    per = {q: 0 for q in range(_BQ_QUERIES)}
    for q, n in exact:
        if (q, n) in ham:
            per[q] += 1
    for q, hits in per.items():
        assert rows[q]["hits"] == hits
        assert rows[q]["recall_ppm"] == hits * 1_000_000 // _BQ_K
    total = rows[-1]
    assert total["hits"] == sum(per.values())
    assert total["recall_ppm"] == (
        sum(per.values()) * 1_000_000 // (_BQ_QUERIES * _BQ_K)
    )


# --------------------------------------------------------------------------
# Blocklist screen
# --------------------------------------------------------------------------


def test_blocklist_rate_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, flagged, hits, tokens
    bl = set(_BLOCKLIST)
    for r in docs:
        toks = re.findall(r"[a-z]+", r["text"].lower())
        hits = sum(1 for w in toks if w in bl)
        a = agg[r["source"]]
        a[0] += 1
        a[1] += 1 if hits else 0
        a[2] += hits
        a[3] += len(toks)
    rows = {r["source"]: r for r in QUERIES["docs_blocklist_rate"](spark, SF_DIR).collect()}
    assert set(rows) == set(agg)
    for src, (nd, nf, nh, nt) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["n_flagged"], r["n_hits"], r["n_tokens"]) == (
            nd, nf, nh, nt,
        ), src
        assert r["flagged_ppm"] == nf * 1_000_000 // nd
        assert r["hits_per_mtoken"] == nh * 1_000_000 // nt


# --------------------------------------------------------------------------
# Page–Hinkley drift alarm
# --------------------------------------------------------------------------


def test_page_hinkley_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    series = defaultdict(list)
    for r in events:
        series[r["event_type"]].append(
            (r["ts"], r["event_id"], int(r["value"] * 1_000_000 // 1))
        )
    rows = {r["event_type"]: r for r in QUERIES["events_page_hinkley"](spark, SF_DIR).collect()}
    assert set(rows) == set(series)
    for et, xs in series.items():
        xs.sort()
        s = m = 0
        min_m = 0
        max_ph, t_at_max, alarm_t = -1, 0, 0
        for t, (_, _, v) in enumerate(xs, start=1):
            s += v
            m += v - s // t
            if t == 1:
                min_m = m
            ph = m - min_m
            if ph > max_ph:
                max_ph, t_at_max = ph, t
            if alarm_t == 0 and ph > _PH_LAMBDA_US:
                alarm_t = t
            min_m = min(min_m, m)
        r = rows[et]
        assert r["n"] == len(xs)
        assert r["max_ph_us"] == max_ph, et
        assert r["t_at_max"] == t_at_max, et
        assert r["alarm_t"] == alarm_t, et
        assert r["alarmed"] == (1 if alarm_t else 0)
        # PH is a nonneg envelope statistic by construction
        assert max_ph >= 0


# --------------------------------------------------------------------------
# Cochran–Mantel–Haenszel stratified test
# --------------------------------------------------------------------------


def test_cmh_matches_reference_python(spark):
    t = load_tables(spark, SF_DIR, ("orders", "customer", "nation"))
    nation = {r["n_nationkey"]: r["n_name"] for r in t["nation"].collect()}
    cust = {r["c_custkey"]: nation[r["c_nationkey"]] for r in t["customer"].collect()}
    strata = defaultdict(lambda: [0, 0, 0, 0])  # n, a, r1, c1
    for r in t["orders"].collect():
        e = 1 if r["o_orderpriority"] in _CMH_EXPOSED_PRIORITIES else 0
        y = 1 if r["o_totalprice"] > _CMH_OUTCOME_THRESHOLD else 0
        s = strata[cust[r["o_custkey"]]]
        s[0] += 1
        s[1] += e * y
        s[2] += e
        s[3] += y
    rows = {r["nation"]: r for r in QUERIES["orders_cmh_test"](spark, SF_DIR).collect()}
    assert set(rows) == set(strata) | {"*"}
    sum_dev = sum_v = 0
    for nat, (n, a, r1, c1) in strata.items():
        e_ppm = r1 * c1 * 1_000_000 // n
        v_ppb = ((r1 * (n - r1) // n) * (c1 * (n - c1) // (n - 1)) * 1_000_000_000) // n
        dev = a * 1_000_000 - e_ppm
        r = rows[nat]
        assert (r["n"], r["a"], r["r1"], r["c1"]) == (n, a, r1, c1), nat
        assert r["e_ppm"] == e_ppm
        assert r["v_ppb"] == v_ppb
        assert r["dev_ppm"] == dev
        assert r["cmh_ppm"] == 0
        sum_dev += dev
        sum_v += v_ppb
    tot = rows["*"]
    assert tot["dev_ppm"] == sum_dev
    assert tot["v_ppb"] == sum_v
    assert tot["cmh_ppm"] == (sum_dev * sum_dev) // (sum_v * 1000)


# --------------------------------------------------------------------------
# LP-community modularity
# --------------------------------------------------------------------------


def _lp_reference(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[b].append(a)  # labels flow src -> dst
    labels = {n: n for n in {a for a, _ in edges}}
    for _ in range(3):
        nxt = {}
        for node, ins in nbrs.items():
            cnt = Counter(labels[s] for s in ins)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[node] = best[0]
        labels = nxt
    return edges, labels


def test_modularity_matches_reference_python(spark):
    edges, labels = _lp_reference(spark)
    ee = len(edges)
    deg = Counter(a for a, _ in edges)
    comm = defaultdict(lambda: [0, 0, 0])  # n_parts, internal, degree_sum
    for n, l in labels.items():
        comm[l][0] += 1
        comm[l][2] += deg[n]
    for a, b in edges:
        if labels[a] == labels[b]:
            comm[labels[a]][1] += 1
    rows = {r["community"]: r for r in QUERIES["parts_modularity"](spark, SF_DIR).collect()}
    assert set(rows) == set(comm) | {-1}
    q_total = 0
    for c, (np_, ie, ds) in comm.items():
        contrib = ie * 1_000_000 // ee - ds * ds * 1_000_000 // (ee * ee)
        r = rows[c]
        assert (r["n_parts"], r["internal_edges"], r["degree_sum"]) == (np_, ie, ds), c
        assert r["q_contrib_ppm"] == contrib
        q_total += contrib
    tot = rows[-1]
    # every directed edge's src degree is counted exactly once
    assert tot["degree_sum"] == ee
    assert tot["internal_edges"] <= ee
    assert tot["q_contrib_ppm"] == q_total
    # modularity is bounded in (-1, 1)
    assert -1_000_000 < q_total < 1_000_000


def test_modularity_consistent_with_label_propagation(spark):
    lp = {r["community"]: r for r in QUERIES["parts_label_propagation"](spark, SF_DIR).collect()}
    mod = {r["community"]: r for r in QUERIES["parts_modularity"](spark, SF_DIR).collect()}
    mod.pop(-1)
    assert set(lp) == set(mod)
    for c, r in lp.items():
        assert mod[c]["n_parts"] == r["n_parts"]
