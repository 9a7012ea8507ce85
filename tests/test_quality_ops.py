"""Edge-case units for the round-5 curation ops: Gopher quality flags and
end-to-end dedup survivors. (corpus_bigram_lift is covered by its oracle +
plan invariant; its math is plain integer ratios.)"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_sink_spark.extensions import dedup, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_gopher_flags_rule_boundaries(spark):
    rows = [
        # passes every rule: 10 in-range words incl. 2 stopwords
        (1, "en", "the quick brown fox jumps over the lazy dog again"),
        # too few words
        (2, "en", "the short one"),
        # symbol-heavy: >10% of words are #tags or contain ellipses
        (3, "en", "#a #b #c wait... the and words here are too few ok fine yes"),
        # no stopwords at all
        (4, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # empty text: 0 words -> fails word floor, ratios are 0 not NaN
        (5, "en", ""),
    ]
    out = {
        r["doc_id"]: r
        for r in text.gopher_flags(_docs(spark, rows), min_words=10).collect()
    }
    assert out[1]["ok_all"] == 1
    assert out[2]["ok_words"] == 0 and out[2]["ok_all"] == 0
    assert out[3]["ok_symbols"] == 0
    assert out[3]["symbol_ratio"] > 0.1
    assert out[4]["ok_stopwords"] == 0 and out[4]["n_stop"] == 0
    assert out[5]["n_words"] == 0
    assert out[5]["mean_word_len"] == 0.0  # guarded division, no NaN
    assert out[5]["ok_all"] == 0


def test_gopher_stopwords_case_insensitive():
    # flag math only; spark fixture reused via test above — here just assert
    # the configured stopword list is lowercase (the rule lowercases tokens)
    assert all(s == s.lower() for s in text.STOPWORDS)


def test_dedup_survivors_keeps_min_and_singletons(spark):
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (10, "en", dup),
        (11, "en", dup),          # exact dup of 10 -> removed
        (12, "en", dup + " iota"),  # near dup of 10 -> removed at low threshold
        (20, "en", "totally different words nothing shared here at all"),
    ]
    out = dedup.dedup_survivors(_docs(spark, rows), threshold=0.2)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [10, 20]  # min doc_id survives; singleton untouched


def test_dedup_survivors_no_pairs_is_identity(spark):
    rows = [
        (1, "en", "one two three four five six seven eight"),
        (2, "en", "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    out = dedup.dedup_survivors(_docs(spark, rows), threshold=0.2)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_knn_pq_excludes_self_and_ranks_deterministically(spark):
    from kafka_sink_spark.extensions import similarity

    # 8 vectors, dim 4, M=2 subspaces of 2, K=2 codewords: vec i is a ramp
    # around i so nearest-by-ADC ordering is predictable and tie-free.
    rows = [(i, [float(i), float(i) + 0.5, float(i) * 2, float(i) * 2 + 0.5]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.knn_pq(
        emb, k=3, n_queries=2, m_subspaces=2, k_codewords=2, dim=4
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert all(r["neighbor_id"] != qid for r in rs)  # self excluded
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        dists = [r["adist"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert dists == sorted(dists)  # rank follows ascending distance


def test_gopher_flags_random_sweep_vs_python_reference(spark):
    """Seeded-random sweep: gopher_flags must agree with a direct Python
    recomputation of every signal and flag on arbitrary token soups."""
    import random

    rng = random.Random(424242)
    alphabet = ["the", "a", "of", "to", "zz", "q", "#tag", "wait...", "12345",
                "alpha", "beta", "gamma", "verylongwordindeed", "x"]
    rows = []
    for doc_id in range(60):
        n = rng.randint(0, 40)
        rows.append((doc_id, "en", " ".join(rng.choice(alphabet) for _ in range(n))))
    got = {
        r["doc_id"]: r.asDict()
        for r in text.gopher_flags(_docs(spark, rows), min_words=10).collect()
    }
    stop = set(text.STOPWORDS)
    for doc_id, _, txt in rows:
        toks = [t for t in txt.split() if t]
        nw = max(len(toks), 1)
        mean_len = round(sum(len(t) for t in toks) / nw, 6)
        sym = round(sum(1 for t in toks if t.startswith("#") or "..." in t) / nw, 6)
        alpha = round(sum(1 for t in toks if any(c.isalpha() for c in t.lower())) / nw, 6)
        nstop = sum(1 for t in toks if t.lower() in stop)
        g = got[doc_id]
        assert g["n_words"] == len(toks), doc_id
        assert abs(g["mean_word_len"] - mean_len) < 1e-9, doc_id
        assert abs(g["symbol_ratio"] - sym) < 1e-9, doc_id
        assert abs(g["alpha_frac"] - alpha) < 1e-9, doc_id
        assert g["n_stop"] == nstop, doc_id
        assert g["ok_words"] == int(10 <= len(toks) <= 100_000), doc_id
        assert g["ok_all"] == (
            g["ok_words"] * g["ok_mean_len"] * g["ok_symbols"]
            * g["ok_alpha"] * g["ok_stopwords"]
        ), doc_id


def test_knn_pq_random_sweep_vs_numpy_adc(spark):
    """Seeded-random sweep: the full PQ pipeline (codebook, encoding, ADC,
    ranking) must match a NumPy reference that applies the same fixed-point
    rule."""
    import numpy as np

    from kafka_sink_spark.extensions import similarity

    rng = np.random.default_rng(20260813)
    n, dim, m_sub, k_cw, n_q, topk = 40, 16, 4, 8, 3, 4
    sub = dim // m_sub
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = similarity.knn_pq(
        emb, k=topk, n_queries=n_q, m_subspaces=m_sub, k_codewords=k_cw, dim=dim
    ).collect()

    v = vecs.astype(np.float64)

    def dfix(a, b):  # fixed-point squared L2, same fold order is exact here
        return int(round(float(((a - b) ** 2).sum()) * 1e6))

    codes = {}
    for vid in range(n):
        for m in range(m_sub):
            sl = slice(m * sub, (m + 1) * sub)
            best = min(
                (dfix(v[vid][sl], v[j][sl]), j) for j in range(k_cw)
            )
            codes[(vid, m)] = best[1]
    expect = {}
    for q in range(n_q):
        cand = []
        for vid in range(n):
            if vid == q:
                continue
            afix = sum(
                dfix(v[q][m * sub:(m + 1) * sub],
                     v[codes[(vid, m)]][m * sub:(m + 1) * sub])
                for m in range(m_sub)
            )
            cand.append((afix, vid))
        cand.sort()
        for rank, (afix, vid) in enumerate(cand[:topk], 1):
            expect[(q, rank)] = (vid, round(afix / 1e6, 6))

    assert len(got) == n_q * topk
    for r in got:
        evid, eadist = expect[(r["query_id"], r["rank"])]
        assert r["neighbor_id"] == evid, (r, evid)
        assert abs(r["adist"] - eadist) < 1e-6, (r, eadist)


def _write_events_file(d, rows):
    """Single-FILE parquet like the driver testdata (load_tables reads the
    file's schema with pyarrow, so a Spark directory write won't do)."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["ts"] = pd.to_datetime(df["ts"])
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )


def test_markov_transitions_edge_cases(spark):
    import tempfile

    from kafka_sink_spark.plans import QUERIES

    # users: 10 has a deterministic 3-event chain, 20 has a single event (no
    # transition), 30 has two simultaneous events (tie broken by event_id)
    rows = [
        (1, "2024-01-01 00:00:00", 10, "a", 1.0, ""),
        (2, "2024-01-01 00:01:00", 10, "b", 1.0, ""),
        (3, "2024-01-01 00:02:00", 10, "c", 1.0, ""),
        (4, "2024-01-01 00:00:00", 20, "a", 1.0, ""),
        (5, "2024-01-01 00:00:00", 30, "x", 1.0, ""),
        (6, "2024-01-01 00:00:00", 30, "y", 1.0, ""),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events_file(d, rows)
        out = {
            (r["from_type"], r["to_type"]): r
            for r in QUERIES["events_markov_transitions"](spark, d).collect()
        }
    assert set(out) == {("a", "b"), ("b", "c"), ("x", "y")}
    assert out[("a", "b")]["n"] == 1 and out[("a", "b")]["p"] == 1.0
    # user 20's lone event contributes no transition; x->y follows event_id


def test_engagement_matrix_one_sided_users(spark):
    import tempfile

    from kafka_sink_spark.plans import QUERIES

    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 2.0, ""),
        (2, "2024-01-01 00:01:00", 2, "purchase", 5.0, ""),
        (3, "2024-01-01 00:02:00", 3, "click", 1.0, ""),
        (4, "2024-01-01 00:03:00", 3, "purchase", 7.0, ""),
        (5, "2024-01-01 00:04:00", 4, "error", 9.0, ""),  # neither side
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events_file(d, rows)
        out = {
            r["user_id"]: r
            for r in QUERIES["events_engagement_matrix"](spark, d).collect()
        }
    assert set(out) == {1, 2, 3}  # user 4 never clicks or buys
    assert out[1]["segment"] == "browser_only" and out[1]["n_purchases"] == 0
    assert out[2]["segment"] == "buyer_only" and out[2]["n_clicks"] == 0
    assert out[3]["segment"] == "engaged"
    assert abs(out[3]["purchase_value"] - 7.0) < 1e-6
