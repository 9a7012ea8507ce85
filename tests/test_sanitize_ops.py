"""Behavior invariants for the round-12a wave (plans/analytics_sanitize.py):
span excision, line dedup, and the hashed linear quality classifier against
hand-computed micro-fixtures and a pure-Python reference scorer."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_sanitize import (
    _CLS_BIAS_MICRO,
    _CLS_BUCKETS,
    _CLS_WMASK,
    _CLS_WMOD,
    _CLS_WMUL,
)


def _docs_fixture(spark, tmp_path, rows):
    """Write a documents.parquet micro-fixture and return its sf_dir."""
    df = spark.createDataFrame(
        [
            (i, t, "en", f"src{i % 2}", len(t))
            for i, t in enumerate(rows)
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


@pytest.fixture()
def span_fixture(spark, tmp_path):
    # doc 0 and doc 1 share the 8-token span "a b c d e f g h";
    # doc 2 is short (no spans) and untouched.
    return _docs_fixture(
        spark,
        tmp_path,
        [
            "a b c d e f g h x y z",
            "p q a b c d e f g h",
            "one two three",
        ],
    )


def test_span_excision_micro(spark, span_fixture):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["docs_span_excision"](spark, span_fixture).collect()
    }
    # doc 0: span covers positions 0-7 (8 single-char tokens), keeps x y z
    assert rows[0]["n_tokens"] == 11
    assert rows[0]["n_removed_tokens"] == 8
    assert rows[0]["removed_chars"] == 8
    assert rows[0]["kept_chars"] == 3
    # doc 1: same span at positions 2-9, keeps p q
    assert rows[1]["n_tokens"] == 10
    assert rows[1]["n_removed_tokens"] == 8
    assert rows[1]["kept_chars"] == 2
    # doc 2: under 8 tokens — no spans, nothing excised
    assert rows[2]["n_removed_tokens"] == 0
    assert rows[2]["removed_ppm"] == 0
    # ppm uses char mass: doc 0 removed 8 of 11 token chars
    assert rows[0]["removed_ppm"] == 8 * 1_000_000 // 11


def test_excision_length_dist_consistent(spark, span_fixture):
    per = QUERIES["docs_span_excision"](spark, span_fixture).collect()
    dist = QUERIES["docs_excision_length_dist"](
        spark, span_fixture
    ).collect()
    assert sum(r["n_docs"] for r in dist) == len(per)
    assert sum(r["removed_chars"] for r in dist) == sum(
        r["removed_chars"] for r in per
    )


@pytest.fixture()
def line_fixture(spark, tmp_path):
    ws = " ".join(f"w{i}" for i in range(10))
    us = " ".join(f"u{i}" for i in range(10))
    # doc 0: the boilerplate line (first occurrence — kept)
    # doc 1: same line + a unique line (dup removed, unique kept)
    # doc 2: the same line TWICE (both occurrences are later than doc 0's
    #        — both removed; within-doc repeats count as occurrences too)
    return _docs_fixture(spark, tmp_path, [ws, f"{ws} {us}", f"{ws} {ws}"])


def test_line_dedup_first_occurrence_kept(spark, line_fixture):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["docs_line_dedup"](spark, line_fixture).collect()
    }
    assert rows[0]["n_lines"] == 1
    assert rows[0]["n_removed_lines"] == 0
    assert rows[1]["n_lines"] == 2
    assert rows[1]["n_removed_lines"] == 1  # the boilerplate copy
    assert rows[2]["n_lines"] == 2
    assert rows[2]["n_removed_lines"] == 2  # both later occurrences
    assert rows[2]["kept_chars"] == 0


def _py_score(text: str) -> tuple[int, int]:
    """Pure-Python reference for the classifier score."""
    t = [w for w in text.split() if w]
    terms = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
    ws = []
    for term in terms:
        f = int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % _CLS_BUCKETS
        ws.append(((f * _CLS_WMUL) % _CLS_WMASK) % _CLS_WMOD)
    n = len(ws)
    return n, sum(ws) * 1_000_000 // n - _CLS_BIAS_MICRO


def test_classifier_matches_python_reference(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "spark shuffles partition keys",
        "one",
    ]
    sf = _docs_fixture(spark, tmp_path, texts)
    rows = {
        r["doc_id"]: r
        for r in QUERIES["docs_quality_classifier"](spark, sf).collect()
    }
    for i, text in enumerate(texts):
        n, score = _py_score(text)
        assert rows[i]["n_feats"] == n, text
        assert rows[i]["score_micro"] == score, text
        assert rows[i]["keep"] == (1 if score >= 0 else 0)


def test_keep_rate_consistent_with_per_doc(spark, tmp_path):
    texts = [f"alpha beta w{i} gamma delta epsilon" for i in range(8)]
    sf = _docs_fixture(spark, tmp_path, texts)
    per = QUERIES["docs_quality_classifier"](spark, sf).collect()
    agg = QUERIES["docs_classifier_keep_rate"](spark, sf).collect()
    assert sum(r["n_docs"] for r in agg) == len(per)
    assert sum(r["kept_docs"] for r in agg) == sum(r["keep"] for r in per)
    for srow in agg:
        scores = [
            r["score_micro"] for r in per if r["doc_id"] % 2 == int(srow["source"][3:])
        ]
        assert srow["min_score_micro"] == min(scores)
        assert srow["max_score_micro"] == max(scores)
        shifted = sum(s + _CLS_BIAS_MICRO for s in scores)
        assert (
            srow["mean_score_micro"]
            == shifted // len(scores) - _CLS_BIAS_MICRO
        )


def test_sanitize_pipeline_consistent_with_stages(spark, tmp_path):
    ws = " ".join(f"w{i}" for i in range(10))
    texts = [
        "a b c d e f g h x y z",
        "p q a b c d e f g h",
        ws,
        f"{ws} extra tokens here",
    ]
    sf = _docs_fixture(spark, tmp_path, texts)
    pipe = QUERIES["docs_sanitize_pipeline"](spark, sf).collect()
    exc = QUERIES["docs_span_excision"](spark, sf).collect()
    lin = QUERIES["docs_line_dedup"](spark, sf).collect()
    cls = QUERIES["docs_quality_classifier"](spark, sf).collect()
    assert sum(r["n_docs"] for r in pipe) == len(texts)
    assert sum(r["span_removed_chars"] for r in pipe) == sum(
        r["removed_chars"] for r in exc
    )
    assert sum(r["line_removed_chars"] for r in pipe) == sum(
        r["removed_chars"] for r in lin
    )
    assert sum(r["cls_kept_docs"] for r in pipe) == sum(r["keep"] for r in cls)
    kept = {r["doc_id"]: r["keep"] for r in cls}
    assert sum(r["surviving_chars"] for r in pipe) == sum(
        r["kept_chars"] for r in exc if kept[r["doc_id"]]
    )


def test_stream_line_dedup_twin_matches_batch_ledger(spark, tmp_path):
    ws = " ".join(f"w{i}" for i in range(10))
    us = " ".join(f"u{i}" for i in range(10))
    sf = _docs_fixture(spark, tmp_path, [ws, f"{ws} {us}", f"{ws} {ws}"])
    hist = {
        r["n_occurrences"]: r
        for r in QUERIES["stream_line_dedup_twin"](spark, sf).collect()
    }
    # ws occurs 4x (docs 0,1,2,2), us once
    assert hist[4]["n_lines"] == 1
    assert hist[4]["survivor_doc_sum"] == 0  # first occurrence is doc 0
    assert hist[1]["n_lines"] == 1
    assert hist[1]["survivor_doc_sum"] == 1  # us first appears in doc 1


def test_quality_signal_agreement_consistency(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_sink_spark.plans.analytics_weblm import _kn_scored

    rows = QUERIES["docs_quality_signal_agreement"](spark, sf_dir).collect()
    # bounded bucket grid: scores live in [-1e9, 1e9] -> buckets 0..40
    assert all(0 <= r["score_bucket"] <= 40 for r in rows)
    # every held-out KN-scored doc lands in exactly one bucket (the
    # classifier and span frames cover all docs with >= 1 token)
    n_heldout = _kn_scored(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_heldout
    # ppm fractions are fractions
    assert all(0 <= r["dup_span_ppm"] <= 1_000_000 for r in rows)
    assert all(r["kn_nll_ppm_bits"] > 0 for r in rows)


def test_k_sweep_monotone_and_consistent_with_excision(spark, sf_dir):
    rows = QUERIES["docs_excision_k_sweep"](spark, sf_dir).collect()
    per_k = {}
    for r in rows:
        per_k.setdefault(r["span_k"], [0, 0])
        per_k[r["span_k"]][0] += r["removed_tokens"]
        per_k[r["span_k"]][1] += r["n_docs_affected"]
    ks = sorted(per_k)
    assert ks == [8, 12, 16]
    # longer spans can only excise less (every k+d-span is inside k-spans)
    assert per_k[8][0] >= per_k[12][0] >= per_k[16][0]
    assert per_k[8][1] >= per_k[12][1] >= per_k[16][1]
    # the k=8 point of the sweep IS the certified excision transform
    exc = QUERIES["docs_span_excision"](spark, sf_dir).collect()
    assert per_k[8][0] == sum(r["n_removed_tokens"] for r in exc)


def test_stream_classifier_keep_twin_matches_batch(spark, sf_dir):
    twin = {
        r["source"]: r
        for r in QUERIES["stream_classifier_keep_twin"](spark, sf_dir).collect()
    }
    batch = {
        r["source"]: r
        for r in QUERIES["docs_classifier_keep_rate"](spark, sf_dir).collect()
    }
    assert set(twin) == set(batch)
    for src, b in batch.items():
        assert twin[src]["n_docs"] == b["n_docs"], src
        assert twin[src]["kept_docs"] == b["kept_docs"], src
        assert twin[src]["keep_ppm"] == b["keep_ppm"], src


def test_decontaminate_drops_copy_keeps_disjoint(spark, tmp_path):
    # doc 0 is the benchmark proxy (doc_id % 97 == 0); doc 1 copies it
    # verbatim (every rare shingle shared -> dropped), doc 2 is disjoint
    # (kept).  All shingles here are rare (DF-cap inactive), so the rule
    # reduces to the plain 5% overlap on this fixture.
    bench_text = "alpha bravo charlie delta echo foxtrot golf hotel"
    sf = _docs_fixture(
        spark, tmp_path,
        [bench_text, bench_text, "uniq1 uniq2 uniq3 uniq4 uniq5 uniq6"],
    )
    rep = {r["source"]: r
           for r in QUERIES["docs_decontaminate_report"](spark, sf).collect()}
    # docs 1 (src1) and 2 (src0) are the training spine
    assert sum(r["n_train_docs"] for r in rep.values()) == 2
    assert rep["src1"]["n_dropped"] == 1      # the verbatim copy
    assert rep["src0"]["n_dropped"] == 0      # the disjoint doc survives
    assert rep["src0"]["surviving_tokens"] == 6
    assert rep["src1"]["surviving_tokens"] == 0


def test_decontaminate_spine_excludes_benchmark(spark, sf_dir):
    rep = QUERIES["docs_decontaminate_report"](spark, sf_dir).collect()
    from kafka_sink_spark.session import load_tables
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n_train = docs.where("doc_id % 97 <> 0").count()
    assert sum(r["n_train_docs"] for r in rep) == n_train
    assert all(r["n_dropped"] <= r["n_train_docs"] for r in rep)
