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
