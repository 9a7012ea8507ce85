"""Behavior invariants for the round-8k embedding-geometry wave
(plans/analytics_geometry.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

DIM = 64


def _milli(vec):
    return [math.floor(float(x) * 1000) for x in vec]


def _load_vecs(spark):
    rows = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    return [(r["vec_id"], r["label"], _milli(r["embedding"])) for r in rows]


def test_participation_ratio_matches_reference_python(spark):
    vecs = _load_vecs(spark)
    groups = defaultdict(list)
    for _, lbl, m in vecs:
        groups[str(lbl)].append(m)
        groups["*"].append(m)
    got = {
        r["label_key"]: r
        for r in QUERIES["embedding_participation_ratio"](spark, SF_DIR).collect()
    }
    assert set(got) == set(groups)
    for key, ms in groups.items():
        n = len(ms)
        vs = []
        for d in range(DIM):
            s = sum(m[d] for m in ms)
            q = sum(m[d] * m[d] for m in ms)
            vs.append(n * q - s * s)
        total = sum(vs)
        ssq = sum(v * v for v in vs)
        maxv = max(vs)
        top_dim = vs.index(maxv)  # first == lowest dim on ties
        row = got[key]
        assert row["n_vecs"] == n
        assert row["total_var"] == total
        assert row["pr_milli"] == ((total * total * 1000) // ssq if ssq else 0)
        assert row["top_dim"] == top_dim
        assert row["top_share_ppm"] == (
            (maxv * 1_000_000) // total if total else 0
        )
        # PR is bounded by the dimensionality
        assert 1000 <= row["pr_milli"] <= DIM * 1000


def test_hubness_histogram_consistent_with_certified_buckets(spark):
    hist = QUERIES["embedding_knn_hubness"](spark, SF_DIR).collect()
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in QUERIES["embedding_lsh_buckets"](spark, SF_DIR).collect()
    }
    n_corpus = len(buckets)
    sizes = Counter(buckets.values())
    # total vectors partition across in-degree groups
    assert sum(r["n_vecs"] for r in hist) == n_corpus
    # total graph edges: each query contributes min(k, |bucket|-1) edges
    expected_edges = sum(min(5, sizes[b] - 1) for b in buckets.values())
    assert sum(r["in_degree"] * r["n_vecs"] for r in hist) == expected_edges
    for r in hist:
        assert r["share_ppm"] == (r["n_vecs"] * 1_000_000) // n_corpus
        assert r["in_degree"] >= 0


def test_relative_contrast_matches_reference_python(spark):
    vecs = _load_vecs(spark)
    panel = [(vid, lbl, m) for vid, lbl, m in vecs if vid < 64]
    got = {
        r["query_id"]: r
        for r in QUERIES["embedding_relative_contrast"](spark, SF_DIR).collect()
    }
    assert set(got) == {vid for vid, _, _ in panel}
    for vid, lbl, qm in panel:
        d2s = [
            sum((a - b) * (a - b) for a, b in zip(qm, cm))
            for cid, _, cm in vecs
            if cid != vid
        ]
        row = got[vid]
        assert row["label"] == lbl
        assert row["n_others"] == len(d2s)
        assert row["min_d2"] == min(d2s)
        assert row["mean_d2"] == sum(d2s) // len(d2s)
        if min(d2s) > 0:
            assert row["rc_ppm"] == (sum(d2s) * 1_000_000) // (
                len(d2s) * min(d2s)
            )
            assert row["rc_ppm"] >= 1_000_000  # mean >= min always
        else:
            assert row["rc_ppm"] is None
