"""Behavior invariants for the round-10g wave
(plans/analytics_refinement.py): residual VQ against a full pure-Python
Lloyd reference, MAP consistency with the certified brute-force
shortlist, and ESS consistency with the certified DSIR weights."""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_refinement import (
    _MAP_K,
    _MAP_QUERIES,
    _RVQ_DIM,
    _RVQ_ITERS,
    _RVQ_K1,
    _RVQ_K2,
)
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# Residual VQ vs a pure-Python Lloyd reference
# --------------------------------------------------------------------------


def _lloyd_fit(rows, k, iterations):
    """rows: {vid: [x0..x63]} fixed-point ints.  Returns the trained
    codebook {j: [c0..c63]} mirroring extensions/similarity.py (seed =
    first k vids, integer mean updates, ties to low j, empty cells drop)."""
    cent = {vid: list(rows[vid]) for vid in sorted(rows) if vid < k}
    cent = {int(j): v for j, v in cent.items()}
    for _ in range(iterations):
        groups = defaultdict(list)
        for vid, x in rows.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(x, c)), j)
                for j, c in cent.items()
            )
            groups[best[1]].append(x)
        def _tzdiv(a, b):
            # Spark `div` truncates toward zero (component sums can be
            # negative); Python // floors — do it exactly
            q = abs(a) // b
            return q if a >= 0 else -q

        cent = {
            j: [_tzdiv(sum(col), len(xs)) for col in zip(*xs)]
            for j, xs in groups.items()
        }
    return cent


def _assign(rows, cent):
    out = {}
    for vid, x in rows.items():
        d, j = min(
            (sum((a - b) * (a - b) for a, b in zip(x, c)), j)
            for j, c in cent.items()
        )
        out[vid] = (j, d)
    return out


def test_residual_vq_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    rows = {
        r["vec_id"]: [round(float(x) * 1_000_000) for x in r["embedding"]]
        for r in emb
    }
    assert all(len(v) == _RVQ_DIM for v in rows.values())
    cb1 = _lloyd_fit(rows, _RVQ_K1, _RVQ_ITERS)
    a1 = _assign(rows, cb1)
    res = {
        vid: [a - b for a, b in zip(rows[vid], cb1[j])]
        for vid, (j, _) in a1.items()
    }
    cb2 = _lloyd_fit(res, _RVQ_K2, _RVQ_ITERS)
    a2 = _assign(res, cb2)
    agg = defaultdict(lambda: [0, 0, 0])
    for vid, (cell, d1) in a1.items():
        a = agg[cell]
        a[0] += 1
        a[1] += d1
        a[2] += a2[vid][1]
    got = {
        r["cell"]: r
        for r in QUERIES["embedding_residual_vq"](spark, SF_DIR).collect()
    }
    assert set(got) == set(agg) | {-1}
    for cell, (n, d1, d2) in agg.items():
        r = got[cell]
        assert (r["n_vectors"], r["d1_sum"], r["d2_sum"]) == (n, d1, d2), cell
        assert r["d2_over_d1_ppm"] == d2 * 1_000_000 // d1
    tot = got[-1]
    assert tot["n_vectors"] == sum(a[0] for a in agg.values())
    assert tot["d1_sum"] == sum(a[1] for a in agg.values())
    assert tot["d2_sum"] == sum(a[2] for a in agg.values())
    # the second stage must buy distortion back on the pooled corpus
    assert tot["d2_sum"] < tot["d1_sum"]


# --------------------------------------------------------------------------
# MAP consistency with the certified brute-force shortlist
# --------------------------------------------------------------------------


def test_map_consistent_with_bruteforce_and_labels(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    labels = {r["vec_id"]: r["label"] for r in emb}
    knn = defaultdict(dict)
    for r in QUERIES["knn_bruteforce"](spark, SF_DIR).collect():
        knn[r["query_id"]][r["rank"]] = r["neighbor_id"]
    rows = {r["query_id"]: r for r in QUERIES["knn_map"](spark, SF_DIR).collect()}
    assert set(rows) == set(range(min(_MAP_QUERIES, 10))) | set(rows) | {-1}
    ap_sum = 0
    n_q = 0
    for q, ranked in knn.items():
        ql = labels[q]
        R = sum(1 for v, l in labels.items() if l == ql and v != q)
        hits = 0
        num = 0
        for rk in sorted(ranked):
            if labels[ranked[rk]] == ql:
                hits += 1
                num += hits * 1_000_000 // rk
        ap = 0 if R == 0 else num // min(_MAP_K, R)
        r = rows[q]
        assert r["n_relevant"] == R, q
        assert r["ap_ppm"] == ap, q
        assert 0 <= r["ap_ppm"] <= 1_000_000
        ap_sum += ap
        n_q += 1
    # knn_bruteforce covers 10 queries; knn_map covers _MAP_QUERIES — the
    # pooled row must equal the mean over ALL its per-query rows
    per = [r for q, r in rows.items() if q != -1]
    assert rows[-1]["ap_ppm"] == sum(r["ap_ppm"] for r in per) // _MAP_QUERIES
    assert len(per) == _MAP_QUERIES


# --------------------------------------------------------------------------
# ESS consistency with the certified DSIR weights
# --------------------------------------------------------------------------


def test_ess_consistent_with_dsir_weights(spark):
    w = [
        r["score_fixed"] // r["n_grams"]
        for r in QUERIES["docs_dsir_weights"](spark, SF_DIR).collect()
    ]
    r = QUERIES["docs_dsir_ess"](spark, SF_DIR).collect()[0]
    n = len(w)
    s1 = sum(w)
    s2 = sum(x * x for x in w)
    ess = s1 * s1 // s2
    assert r["n_docs"] == n
    assert r["sum_w_ppm"] == s1
    assert r["sum_w2_ppm2"] == s2
    assert r["ess_docs"] == ess
    assert r["ess_ratio_ppm"] == ess * 1_000_000 // n
    # sanity: 1 <= ESS <= n
    assert 1 <= ess <= n
