"""Behavior invariants for the round-11a wave (plans/analytics_weblm.py +
extensions/web.py): URL canonicalization pinned case-by-case and in
Spark↔DuckDB lockstep, the held-out Kneser-Ney bigram LM against a full
pure-Python reference, and plan hygiene for the indexed hybrid RRF."""

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.extensions.web import canonicalize_url
from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_weblm import (
    _CANON_DUCK,
    _KN_KEEP_QBITS,
    _LG1E12,
)
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Adversarial raw URLs with hand-written expected (host, curl) — the
# normalization contract of extensions.web.canonicalize_url.
_CASES = [
    # scheme/host case + fragment
    ("HTTPS://WWW.Foo.Example.COM/a/b#frag", "foo.example.com",
     "foo.example.com/a/b"),
    # default ports stripped (both)
    ("http://www.foo.example.com:80/a", "foo.example.com",
     "foo.example.com/a"),
    ("https://foo.example.com:443/a", "foo.example.com",
     "foo.example.com/a"),
    # non-default port kept (hosts differing by real port stay distinct)
    ("http://foo.example.com:8080/a", "foo.example.com:8080",
     "foo.example.com:8080/a"),
    # trailing slashes trimmed, root preserved
    ("http://foo.example.com/a/b///", "foo.example.com",
     "foo.example.com/a/b"),
    ("http://foo.example.com/", "foo.example.com", "foo.example.com/"),
    ("http://foo.example.com", "foo.example.com", "foo.example.com/"),
    # tracking params dropped, survivors sorted, empty query collapses
    ("http://foo.example.com/a?utm_source=x&b=2&a=1", "foo.example.com",
     "foo.example.com/a?a=1&b=2"),
    ("http://foo.example.com/a?utm_campaign=x&fbclid=abc", "foo.example.com",
     "foo.example.com/a"),
    ("http://foo.example.com/a?z=9&a=1#s", "foo.example.com",
     "foo.example.com/a?a=1&z=9"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in _CASES], ["raw_url"])
    got = df.select(*canonicalize_url(df.raw_url)).collect()
    for (raw, host, curl), row in zip(_CASES, got):
        assert row["host"] == host, raw
        assert row["curl"] == curl, raw


def test_canonicalize_spark_duck_lockstep(spark):
    """The _CANON_DUCK oracle chain and the Spark column expression must
    produce identical (host, curl) on every adversarial case — this is
    the pin that keeps the two canonicalizers from drifting."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE raw AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{u}')" for i, (u, _, _) in enumerate(_CASES))
        + ") AS t(doc_id, raw_url)"
    )
    duck = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute(
            f"WITH {_CANON_DUCK} SELECT doc_id, host, curl FROM canon"
        ).fetchall()
    )
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(_CASES)], ["doc_id", "raw_url"]
    )
    for row in df.select("doc_id", *canonicalize_url(df.raw_url)).collect():
        assert duck[row["doc_id"]] == (row["host"], row["curl"])


# --------------------------------------------------------------------------
# Pure-Python Kneser-Ney reference
# --------------------------------------------------------------------------


def _lg2_octave_ppm(x: int) -> int:
    assert x > 0
    e = x.bit_length() - 1
    return e * 1_000_000 + ((x - (1 << e)) * 1_000_000) // (1 << e)


def _kn_reference(docs):
    """(per_doc, per_source) NLL from raw (doc_id, source, text) rows —
    the independent third implementation of the held-out KN bigram LM."""
    bigrams = {}
    for doc_id, _, text in docs:
        toks = [w for w in re.split(r"\s+", text) if w]
        bigrams[doc_id] = list(zip(toks, toks[1:]))
    c12, c1, n1, nc = {}, {}, {}, {}
    for doc_id, bg in bigrams.items():
        if doc_id % 10 < 8:
            for pair in bg:
                c12[pair] = c12.get(pair, 0) + 1
    for (w1, w2), c in c12.items():
        c1[w1] = c1.get(w1, 0) + c
        n1[w1] = n1.get(w1, 0) + 1
        nc[w2] = nc.get(w2, 0) + 1
    B = len(c12)
    per_doc = {}
    for doc_id, bg in bigrams.items():
        if doc_id % 10 < 8 or not bg:
            continue
        nll = 0
        for w1, w2 in bg:
            if w1 not in c1:
                p_pt = max(nc.get(w2, 0) * 10**12 // B, 1)
            else:
                num = max(4 * c12.get((w1, w2), 0) - 3, 0) * B
                num += 3 * n1[w1] * nc.get(w2, 0)
                p_pt = max(num * 10**12 // (4 * c1[w1] * B), 1)
            assert 1 <= p_pt < 10**12
            nll += _LG1E12 - _lg2_octave_ppm(p_pt)
        per_doc[doc_id] = (len(bg), nll)
    return per_doc


def test_kn_nll_matches_python_reference(spark):
    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_tables(spark, SF_DIR, ("documents",))["documents"]
        .select("doc_id", "source", "text")
        .collect()
    ]
    per_doc = _kn_reference(docs)
    src = {d: s for d, s, _ in docs}
    expect = {}
    for doc_id, (n_bg, nll) in per_doc.items():
        e = expect.setdefault(src[doc_id], [0, 0, 0])
        e[0] += 1
        e[1] += n_bg
        e[2] += nll
    got = {
        r["source"]: r
        for r in QUERIES["docs_kn_bigram_nll"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for s, (n_docs, n_bg, nll) in expect.items():
        assert got[s]["n_docs"] == n_docs, s
        assert got[s]["n_bigrams"] == n_bg, s
        assert got[s]["nll_ppm_bits"] == nll // n_bg, s


def test_kn_filter_consistent_with_reference(spark):
    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_tables(spark, SF_DIR, ("documents",))["documents"]
        .select("doc_id", "source", "text")
        .collect()
    ]
    per_doc = _kn_reference(docs)
    expect = {}
    for n_bg, nll in per_doc.values():
        q = (nll // n_bg) // 62500
        expect[q] = expect.get(q, 0) + 1
    rows = QUERIES["docs_kn_perplexity_filter"](spark, SF_DIR).collect()
    got = {r["qbits"]: r["n_docs"] for r in rows}
    assert got == expect
    for r in rows:
        assert r["keep"] == (r["qbits"] < _KN_KEEP_QBITS)
    assert sum(got.values()) == len(per_doc)


def test_kn_probability_mass_bounded(spark):
    """Model sanity: for every seen context w1, the KN probabilities over
    its OBSERVED continuations sum to < 1 (the discount mass plus unseen
    continuations make up the rest) — the invariant that makes the NLL a
    proper scoring rule."""
    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_tables(spark, SF_DIR, ("documents",))["documents"]
        .select("doc_id", "source", "text")
        .collect()
    ]
    c12 = {}
    for doc_id, _, text in docs:
        if doc_id % 10 < 8:
            toks = [w for w in re.split(r"\s+", text) if w]
            for pair in zip(toks, toks[1:]):
                c12[pair] = c12.get(pair, 0) + 1
    c1, n1, nc = {}, {}, {}
    for (w1, w2), c in c12.items():
        c1[w1] = c1.get(w1, 0) + c
        n1[w1] = n1.get(w1, 0) + 1
        nc[w2] = nc.get(w2, 0) + 1
    B = len(c12)
    by_w1 = {}
    for (w1, w2), c in c12.items():
        num = max(4 * c - 3, 0) * B + 3 * n1[w1] * nc[w2]
        by_w1[w1] = by_w1.get(w1, 0) + num * 10**12 // (4 * c1[w1] * B)
    assert by_w1 and all(total < 10**12 for total in by_w1.values())


def test_hybrid_indexed_plan_and_shape(spark):
    df = QUERIES["docs_hybrid_rrf_indexed"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        # every fused row must come from at least one input list, and the
        # RRF score must be the exact integer recombination of its ranks
        assert r["rank_lex"] > 0 or r["rank_dense"] > 0
        want = 0
        if r["rank_lex"] > 0:
            want += 1_000_000 // (60 + r["rank_lex"])
        if r["rank_dense"] > 0:
            want += 1_000_000 // (60 + r["rank_dense"])
        assert r["rrf_ppm"] == want


def test_url_dedup_counts_consistent(spark):
    rows = QUERIES["docs_url_canonical_dedup"](spark, SF_DIR).collect()
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    assert sum(r["n_urls"] for r in rows) == docs.count()
    for r in rows:
        assert 0 < r["n_canonical"] <= r["n_urls"]
        assert r["dup_ppm"] == (
            (r["n_urls"] - r["n_canonical"]) * 1_000_000 // r["n_urls"]
        )
    # the synthetic noise classes guarantee real collapses somewhere
    assert any(r["n_canonical"] < r["n_urls"] for r in rows)


def test_host_fuzzy_counts_consistent(spark):
    rows = QUERIES["docs_host_fuzzy_dedup"](spark, SF_DIR).collect()
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["dup_docs"] == r["n_docs"] - r["n_clusters"]
        assert 0 < r["n_clusters"] <= r["n_docs"]


def test_url_dedup_plan_pruned_and_no_cartesian(spark):
    """The canonicalization pass must read only (doc_id, source) — never
    the text column — and plan no cartesian product."""
    df = QUERIES["docs_url_canonical_dedup"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and all("text" not in l for l in read), read


def test_kn_plan_no_cartesian(spark):
    """The KN scoring joins are equi-joins on word keys plus ONE broadcast
    1-row total — never a cartesian product."""
    for name in ("docs_kn_bigram_nll", "docs_kn_perplexity_filter"):
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


# --------------------------------------------------------------------------
# Round-11b: trigram KN, mirror detection, hybrid recall
# --------------------------------------------------------------------------


def _kn3_reference(docs):
    """Pure-Python interpolated KN trigram NLL per held-out doc."""
    toks = {
        d: [w for w in re.split(r"\s+", t) if w] for d, _, t in docs
    }
    c12, c1, n1, nc = {}, {}, {}, {}
    c123, c12dot, n1_12 = {}, {}, {}
    for d, tk in toks.items():
        if d % 10 < 8:
            for pair in zip(tk, tk[1:]):
                c12[pair] = c12.get(pair, 0) + 1
            for tri in zip(tk, tk[1:], tk[2:]):
                c123[tri] = c123.get(tri, 0) + 1
    for (w1, w2), c in c12.items():
        c1[w1] = c1.get(w1, 0) + c
        n1[w1] = n1.get(w1, 0) + 1
        nc[w2] = nc.get(w2, 0) + 1
    for (w1, w2, w3), c in c123.items():
        c12dot[(w1, w2)] = c12dot.get((w1, w2), 0) + c
        n1_12[(w1, w2)] = n1_12.get((w1, w2), 0) + 1
    B = len(c12)

    def p2_pt(w2, w3):
        if w2 not in c1:
            return max(nc.get(w3, 0) * 10**12 // B, 1)
        num = max(4 * c12.get((w2, w3), 0) - 3, 0) * B
        num += 3 * n1[w2] * nc.get(w3, 0)
        return max(num * 10**12 // (4 * c1[w2] * B), 1)

    per_doc = {}
    for d, tk in toks.items():
        if d % 10 < 8 or len(tk) < 3:
            continue
        nll = 0
        for w1, w2, w3 in zip(tk, tk[1:], tk[2:]):
            p2 = p2_pt(w2, w3)
            if (w1, w2) not in c12dot:
                p_pt = p2
            else:
                num = max(4 * c123.get((w1, w2, w3), 0) - 3, 0) * 10**12
                num += 3 * n1_12[(w1, w2)] * p2
                p_pt = max(num // (4 * c12dot[(w1, w2)]), 1)
            assert 1 <= p_pt < 10**12
            nll += _LG1E12 - _lg2_octave_ppm(p_pt)
        per_doc[d] = (len(tk) - 2, nll)
    return per_doc


def test_kn_trigram_matches_python_reference(spark):
    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_tables(spark, SF_DIR, ("documents",))["documents"]
        .select("doc_id", "source", "text")
        .collect()
    ]
    per_doc = _kn3_reference(docs)
    src = {d: s for d, s, _ in docs}
    expect = {}
    for doc_id, (n_tg, nll) in per_doc.items():
        e = expect.setdefault(src[doc_id], [0, 0, 0])
        e[0] += 1
        e[1] += n_tg
        e[2] += nll
    got = {
        r["source"]: r
        for r in QUERIES["docs_kn_trigram_nll"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for s, (n_docs, n_tg, nll) in expect.items():
        assert got[s]["n_docs"] == n_docs, s
        assert got[s]["n_trigrams"] == n_tg, s
        assert got[s]["nll_ppm_bits"] == nll // n_tg, s


def test_mirror_detection_consistent(spark):
    from kafka_sink_spark.plans.analytics_weblm import _MIRROR_TOPK

    rows = QUERIES["docs_mirror_detection"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= _MIRROR_TOPK
    for r in rows:
        assert r["host_a"] < r["host_b"]
        assert r["shared_fp"] > 0
        assert 0 < r["overlap_ppm"] <= 1_000_000
    # ranked by shared_fp desc
    shared = [r["shared_fp"] for r in rows]
    assert shared == sorted(shared, reverse=True)


def test_hybrid_recall_bounds(spark):
    row = QUERIES["docs_hybrid_recall_vs_exact"](spark, SF_DIR).collect()[0]
    assert row["k"] == 10
    assert 0 <= row["n_common"] <= row["k"]
    assert row["recall_ppm"] == row["n_common"] * 1_000_000 // row["k"]


# --------------------------------------------------------------------------
# Round-11c: streaming URL-dedup twin, LM order gain
# --------------------------------------------------------------------------


def test_stream_url_twin_equals_batch_rollup(spark):
    """The streaming ledger's final state must equal the batch canonical
    rollup exactly (same canonicalizer expression, same grouping)."""
    rows = {
        (r["host"], r["curl"]): (r["n_urls"], r["survivor_doc_id"])
        for r in QUERIES["stream_url_dedup_twin"](spark, SF_DIR).collect()
    }
    from kafka_sink_spark.plans.analytics_weblm import _URL_SQL_SPARK
    from pyspark.sql import functions as F

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    batch = {
        (r["host"], r["curl"]): (r["n_urls"], r["survivor_doc_id"])
        for r in docs.select(
            "doc_id", F.expr(_URL_SQL_SPARK).alias("raw_url")
        )
        .select("doc_id", *canonicalize_url(F.col("raw_url")))
        .groupBy("host", "curl")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.min("doc_id").cast("long").alias("survivor_doc_id"),
        )
        .collect()
    }
    assert rows == batch


def test_kn_order_gain_consistent_with_nll_queries(spark):
    """gain = bigram_nll − trigram_nll, and both columns must equal the
    standalone certified queries' per-source values (every held-out doc
    here has ≥3 tokens, so the join drops nothing)."""
    gain = {
        r["source"]: r
        for r in QUERIES["docs_kn_order_gain"](spark, SF_DIR).collect()
    }
    bi = {
        r["source"]: r["nll_ppm_bits"]
        for r in QUERIES["docs_kn_bigram_nll"](spark, SF_DIR).collect()
    }
    tri = {
        r["source"]: r["nll_ppm_bits"]
        for r in QUERIES["docs_kn_trigram_nll"](spark, SF_DIR).collect()
    }
    assert set(gain) == set(bi) == set(tri)
    for s, r in gain.items():
        assert r["bigram_nll"] == bi[s], s
        assert r["trigram_nll"] == tri[s], s
        assert r["gain_ppm_bits"] == r["bigram_nll"] - r["trigram_nll"], s


def test_kn_unigram_matches_python_reference(spark):
    """The unigram KN is the continuation distribution: score every
    held-out token with nc(w)/B, clamped fixed-point."""
    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_tables(spark, SF_DIR, ("documents",))["documents"]
        .select("doc_id", "source", "text")
        .collect()
    ]
    c12, nc = {}, {}
    for d, _, t in docs:
        if d % 10 < 8:
            toks = [w for w in re.split(r"\s+", t) if w]
            for pair in zip(toks, toks[1:]):
                c12[pair] = c12.get(pair, 0) + 1
    for (_, w2), _c in c12.items():
        nc[w2] = nc.get(w2, 0) + 1
    B = len(c12)
    expect = {}
    for d, s, t in docs:
        if d % 10 < 8:
            continue
        toks = [w for w in re.split(r"\s+", t) if w]
        if not toks:
            continue
        nll = sum(
            _LG1E12
            - _lg2_octave_ppm(max(nc.get(w, 0) * 10**12 // B, 1))
            for w in toks
        )
        e = expect.setdefault(s, [0, 0, 0])
        e[0] += 1
        e[1] += len(toks)
        e[2] += nll
    got = {
        r["source"]: r
        for r in QUERIES["docs_kn_unigram_nll"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for s, (n_docs, n_tok, nll) in expect.items():
        assert got[s]["n_docs"] == n_docs, s
        assert got[s]["n_tokens"] == n_tok, s
        assert got[s]["nll_ppm_bits"] == nll // n_tok, s
