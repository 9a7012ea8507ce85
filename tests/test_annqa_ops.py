"""Behavior invariants for the round-9d ANN-QA wave
(plans/analytics_annqa.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _vectors(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}


def _micro(v):
    return [round(x * 1_000_000) for x in v]


def test_distance_margin_matches_reference_python(spark):
    vecs = _vectors(spark)
    micro = {vid: _micro(v) for vid, v in vecs.items()}
    got = {
        r["query_id"]: r
        for r in QUERIES["knn_distance_margin"](spark, SF_DIR).collect()
    }
    assert set(got) == set(range(32))
    for q in range(32):
        dists = sorted(
            (
                (sum((a - b) ** 2 for a, b in zip(micro[q], micro[n])), n)
                for n in micro
                if n != q
            )
        )[:5]
        row = got[q]
        assert row["nn_id"] == dists[0][1]
        assert row["d1_fix"] == dists[0][0]
        assert row["dk_fix"] == dists[4][0]
        assert row["margin_ppm"] == dists[0][0] * 1_000_000 // max(dists[4][0], 1)
        assert 0 <= row["margin_ppm"] <= 1_000_000


def _cosine6(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return round(dot / (na * nb), 6)


def test_ivf_balance_matches_reference_python(spark):
    vecs = _vectors(spark)
    cents = {c: vecs[c] for c in range(8)}
    assign = Counter()
    for vid, v in vecs.items():
        best = max(cents, key=lambda c: (_cosine6(v, cents[c]), -c))
        assign[best] += 1
    total = sum(assign.values())
    got = {
        r["cell"]: r
        for r in QUERIES["embedding_ivf_balance"](spark, SF_DIR).collect()
    }
    assert set(got) == set(assign)
    for cell, n in assign.items():
        row = got[cell]
        assert row["n_vecs"] == n
        assert row["share_ppm"] == n * 1_000_000 // total
        assert row["load_factor_ppm"] == n * 8 * 1_000_000 // total
    assert sum(r["n_vecs"] for r in got.values()) == len(vecs)


def test_recall_vs_planes_matches_reference_python(spark):
    from kafka_sink_spark.extensions.similarity import hyperplanes

    vecs = _vectors(spark)
    exact = {}
    for q in range(10):
        ranked = sorted(
            ((_cosine6(vecs[q], vecs[n]), -n) for n in vecs if n != q),
            reverse=True,
        )[:5]
        exact[q] = {-n for _, n in ranked}
    got = {
        r["n_planes"]: r
        for r in QUERIES["knn_recall_vs_planes"](spark, SF_DIR).collect()
    }
    assert set(got) == {4, 8}
    for np_ in (4, 8):
        planes = hyperplanes(64, np_)

        def bucket(v):
            return sum(
                (1 << i)
                for i, p in enumerate(planes)
                if sum(x * y for x, y in zip(v, p)) > 0
            )

        buckets = {vid: bucket(v) for vid, v in vecs.items()}
        hits = 0
        for q in range(10):
            cands = [
                n for n in vecs if n != q and buckets[n] == buckets[q]
            ]
            ranked = sorted(
                ((_cosine6(vecs[q], vecs[n]), -n) for n in cands), reverse=True
            )[:5]
            hits += len({-n for _, n in ranked} & exact[q])
        row = got[np_]
        assert row["hits"] == hits, np_
        assert row["recall_ppm"] == hits * 1_000_000 // 50
    # fewer planes -> bigger buckets -> recall can only help on this corpus
    assert got[4]["recall_ppm"] >= got[8]["recall_ppm"]
