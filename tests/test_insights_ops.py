"""Behavior + plan invariants for the round-7c insights wave
(plans/analytics_insights.py): RAKE keyphrases, k-anonymity, centroid
silhouette, revenue cohorts. Cross-engine value equality is covered by
test_entry_oracle / tools/driver_check."""

import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _tokens(text: str) -> list:
    return [t for t in re.split(r"\s+", text) if t]


# ---------------------------------------------------------------------------
# docs_keyphrase_rake
# ---------------------------------------------------------------------------


def _rake_reference(docs):
    corpus: Counter = Counter()
    for d in docs:
        corpus.update(_tokens(d.text))
    stops = set(sorted(corpus, key=lambda t: (-corpus[t], t))[:20])
    # candidate phrases per doc: maximal non-stop runs
    doc_phrases = defaultdict(list)  # doc_id -> list of word lists
    for d in docs:
        run = []
        for t in _tokens(d.text):
            if t in stops:
                if run:
                    doc_phrases[d.doc_id].append(run)
                run = []
            else:
                run.append(t)
        if run:
            doc_phrases[d.doc_id].append(run)
    freq: Counter = Counter()
    degree: Counter = Counter()
    for phrases in doc_phrases.values():
        for ph in phrases:
            for w in ph:
                freq[w] += 1
                degree[w] += len(ph)
    expected = {}
    for doc_id, phrases in doc_phrases.items():
        scored = {}
        for ph in phrases:
            text = " ".join(ph)
            score = sum(degree[w] * 1_000_000 // freq[w] for w in ph)
            prev = scored.get(text)
            if prev is None or score > prev[1] or (
                score == prev[1] and len(ph) > prev[0]
            ):
                scored[text] = (max(len(ph), prev[0] if prev else 0),
                                max(score, prev[1] if prev else 0))
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))
        for rk, (text, (plen, score)) in enumerate(ranked[:3], 1):
            expected[(doc_id, rk)] = (text, plen, score)
    return expected


def test_rake_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    expected = _rake_reference(docs)
    got = {
        (r.doc_id, r.rk): (r.phrase, r.n_words, r.score_ppm)
        for r in QUERIES["docs_keyphrase_rake"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_rake_phrases_contain_no_stopwords(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    corpus: Counter = Counter()
    for d in docs:
        corpus.update(_tokens(d.text))
    stops = set(sorted(corpus, key=lambda t: (-corpus[t], t))[:20])
    for r in QUERIES["docs_keyphrase_rake"](spark, SF_DIR).collect():
        assert not (set(r.phrase.split(" ")) & stops), r.phrase
        assert r.n_words == len(r.phrase.split(" "))
        assert 1 <= r.rk <= 3


# ---------------------------------------------------------------------------
# events_k_anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    classes: Counter = Counter()
    for r in events:
        classes[(r.user_id // 10, r.event_type, r.ts.hour)] += 1
    bands: dict = defaultdict(lambda: [0, 0])
    for sz in classes.values():
        band = "1" if sz == 1 else "2-4" if sz <= 4 else "5-9" if sz <= 9 else "10+"
        bands[band][0] += 1
        bands[band][1] += sz
    total = sum(v[1] for v in bands.values())
    expected = {
        band: (n_cls, n_rows, n_rows * 1_000_000 // total)
        for band, (n_cls, n_rows) in bands.items()
    }
    got = {
        r.k_band: (r.n_classes, r.n_rows, r.rows_ppm)
        for r in QUERIES["events_k_anonymity"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_k_anonymity_shares_sum_to_one(spark):
    rows = QUERIES["events_k_anonymity"](spark, SF_DIR).collect()
    # truncation loses at most (bands-1) ppm
    assert 1_000_000 - len(rows) < sum(r.rows_ppm for r in rows) <= 1_000_000
    plan = _plan(spark, "events_k_anonymity")
    assert "partial_count" in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# embedding_centroid_silhouette
# ---------------------------------------------------------------------------


def _half_up_1e6(x: float) -> int:
    return int(math.floor(abs(x) * 1_000_000.0 + 0.5)) * (1 if x >= 0 else -1)


def test_silhouette_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    xm = {r.vec_id: [_half_up_1e6(float(x)) for x in r.embedding] for r in emb}
    label = {r.vec_id: r.label for r in emb}
    sums: dict = defaultdict(lambda: [0] * 64)
    counts: Counter = Counter()
    for vid, v in xm.items():
        counts[label[vid]] += 1
        for i, x in enumerate(v):
            sums[label[vid]][i] += x
    per_label = defaultdict(list)
    for vid, v in xm.items():
        q = {}
        for l, s in sums.items():
            n_l = counts[l]
            a2 = sum((n_l * v[i] - s[i]) ** 2 for i in range(64))
            q[l] = a2 // (n_l * n_l)
        q_a = q[label[vid]]
        q_b = min(
            (ql, l) for l, ql in q.items() if l != label[vid]
        )[0]
        mx = max(q_a, q_b)
        if mx == 0:
            s_ppm = 0
        elif q_b >= q_a:
            s_ppm = (q_b - q_a) * 1_000_000 // mx
        else:
            s_ppm = -((q_a - q_b) * 1_000_000 // mx)
        per_label[label[vid]].append(s_ppm)
    expected = {}
    for l, vals in per_label.items():
        tot = sum(vals)
        mean = tot // len(vals) if tot >= 0 else -((-tot) // len(vals))
        expected[l] = (len(vals), mean, min(vals),
                       sum(1 for v in vals if v < 0))
    got = {
        r.label: (r.n_vecs, r.mean_s_ppm, r.min_s_ppm, r.n_negative)
        for r in QUERIES["embedding_centroid_silhouette"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_silhouette_bounds_and_plan(spark):
    rows = QUERIES["embedding_centroid_silhouette"](spark, SF_DIR).collect()
    for r in rows:
        assert -1_000_000 <= r.min_s_ppm <= 1_000_000
        assert -1_000_000 <= r.mean_s_ppm <= 1_000_000
        assert 0 <= r.n_negative <= r.n_vecs
    plan = _plan(spark, "embedding_centroid_silhouette")
    assert "BroadcastHashJoin" in plan  # label sums broadcast to the corpus
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# orders_cohort_revenue_retention
# ---------------------------------------------------------------------------


def test_cohort_revenue_matches_reference_python(spark):
    orders = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    month = {}
    rows = []
    for r in orders:
        m = r.o_orderdate.year * 12 + r.o_orderdate.month
        rows.append((r.o_custkey, m, int(math.floor(r.o_totalprice * 100))))
        month[r.o_custkey] = min(month.get(r.o_custkey, m), m)
    cells: dict = defaultdict(lambda: [set(), 0])
    for cust, m, cents in rows:
        key = (month[cust], m - month[cust])
        cells[key][0].add(cust)
        cells[key][1] += cents
    expected = {}
    for (cohort, age), (custs, cents) in cells.items():
        base = cells[(cohort, 0)][1]
        expected[(cohort, age)] = (len(custs), cents,
                                   cents * 1_000_000 // base)
    got = {
        (r.cohort_m, r.age): (r.n_customers, r.revenue_cents, r.retention_ppm)
        for r in QUERIES["orders_cohort_revenue_retention"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_cohort_age_zero_is_full_retention(spark):
    rows = QUERIES["orders_cohort_revenue_retention"](spark, SF_DIR).collect()
    for r in rows:
        assert r.age >= 0
        if r.age == 0:
            assert r.retention_ppm == 1_000_000
