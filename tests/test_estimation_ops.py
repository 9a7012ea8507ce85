"""Behavior + plan invariants for the round-7j estimation wave
(plans/analytics_estimation.py): Zipf alpha, NDCG@5, KMV Jaccard,
streaming drift twin, item-item Jaccard. Cross-engine value equality is
covered by test_entry_oracle / tools/driver_check."""

import hashlib
import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_W_PPM = (1000000, 630929, 500000, 430676, 386852)


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _tokens(text: str) -> list:
    return [t for t in re.split(r"\s+", text) if t]


def _shingle_hashes(text: str) -> set:
    toks = _tokens(text)
    if len(toks) >= 3:
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    else:
        grams = [" ".join(toks)]
    return {
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    }


# ---------------------------------------------------------------------------
# corpus_zipf_alpha
# ---------------------------------------------------------------------------


def test_zipf_alpha_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    counts: Counter = Counter()
    for d in docs:
        counts.update(_tokens(d.text))
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = []
    for g in range(13):
        rk = 2**g
        if rk > len(ordered):
            break
        f = ordered[rk - 1][1]
        lg = f.bit_length() - 1
        y = lg * 1_000_000 + ((f - (1 << lg)) * 1_000_000) // (1 << lg)
        pts.append((g, y))
    n = len(pts)
    sx = sum(g for g, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(g * g for g, _ in pts)
    sxy = sum(g * y for g, y in pts)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    alpha = (-num) // den if num <= 0 else -(num // den)
    row = QUERIES["corpus_zipf_alpha"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n_points, r.vocab, r.alpha_ppm) == (n, len(counts), alpha)


def test_zipf_alpha_positive_for_text(spark):
    r = QUERIES["corpus_zipf_alpha"](spark, SF_DIR).collect()[0]
    assert r.alpha_ppm > 0  # frequencies must decay with rank


# ---------------------------------------------------------------------------
# knn_label_ndcg
# ---------------------------------------------------------------------------


def test_ndcg_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    labels = {r.vec_id: r.label for r in emb}
    ids = sorted(vecs)
    cum = [0]
    for w in _W_PPM:
        cum.append(cum[-1] + w)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            ),
            6,
        )

    expected = {}
    for q in [i for i in ids if i < 100]:
        sims = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in ids if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        dcg = sum(
            _W_PPM[i]
            for i, (_, c) in enumerate(sims)
            if labels[c] == labels[q]
        )
        r_total = sum(
            1 for c in ids if c != q and labels[c] == labels[q]
        )
        idcg = cum[min(5, r_total)]
        ndcg = 0 if r_total == 0 else dcg * 1_000_000 // idcg
        expected[q] = (labels[q], r_total, dcg, idcg, ndcg)
    got = {
        r.query_id: (r.label, r.n_relevant, r.dcg_ppm, r.idcg_ppm, r.ndcg_ppm)
        for r in QUERIES["knn_label_ndcg"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_ndcg_bounded(spark):
    rows = QUERIES["knn_label_ndcg"](spark, SF_DIR).collect()
    assert len(rows) == 100
    for r in rows:
        assert 0 <= r.ndcg_ppm <= 1_000_000
        assert r.dcg_ppm <= r.idcg_ppm


# ---------------------------------------------------------------------------
# docs_kmv_jaccard
# ---------------------------------------------------------------------------


def test_kmv_jaccard_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    a: set = set()
    b: set = set()
    for d in docs:
        side = a if int(d.source[3:]) < 10 else b
        side.update(_shingle_hashes(d.text))
    union = a | b
    inter = a & b
    exact = len(inter) * 1_000_000 // len(union)
    bottomk = sorted(union)[:256]
    k_used = len(bottomk)
    k_both = sum(1 for h in bottomk if h in inter)
    est = k_both * 1_000_000 // k_used
    err = est - exact
    row = QUERIES["docs_kmv_jaccard"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.k,
        r.n_a,
        r.n_b,
        r.exact_jaccard_ppm,
        r.kmv_jaccard_ppm,
        r.err_ppm,
    ) == (k_used, len(a), len(b), exact, est, err)


# ---------------------------------------------------------------------------
# stream_drift_twin
# ---------------------------------------------------------------------------


def test_stream_drift_twin_equals_batch(spark):
    batch = QUERIES["events_value_drift_tvd"](spark, SF_DIR).collect()
    stream = QUERIES["stream_drift_twin"](spark, SF_DIR).collect()
    assert len(batch) == len(stream) == 1
    assert batch[0].asDict() == stream[0].asDict()


# ---------------------------------------------------------------------------
# parts_jaccard_similarity
# ---------------------------------------------------------------------------


def test_jaccard_similarity_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_order = defaultdict(list)
    for r in li:
        by_order[r.l_orderkey].append(r.l_partkey)
    weight: Counter = Counter()
    for parts in by_order.values():
        for x in parts:
            for y in parts:
                if x != y:
                    weight[(x, y)] += 1
    nb = defaultdict(set)
    for (x, y), w in weight.items():
        if w >= 2:
            nb[x].add(y)
    common: Counter = Counter()
    for z, ns in nb.items():
        ns_sorted = sorted(ns)
        for i, x in enumerate(ns_sorted):
            for y in ns_sorted[i + 1 :]:
                common[(x, y)] += 1
    scored = [
        (
            cn * 1_000_000 // (len(nb[x]) + len(nb[y]) - cn),
            x,
            y,
            cn,
            len(nb[x]),
            len(nb[y]),
        )
        for (x, y), cn in common.items()
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expected = {
        (x, y): (cn, da, db, j) for j, x, y, cn, da, db in scored[:50]
    }
    got = {
        (r.a, r.b): (r.common_neighbors, r.degree_a, r.degree_b, r.jaccard_ppm)
        for r in QUERIES["parts_jaccard_similarity"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_jaccard_similarity_topk_plan(spark):
    plan = _plan(spark, "parts_jaccard_similarity")
    assert "TakeOrderedAndProject" in plan
