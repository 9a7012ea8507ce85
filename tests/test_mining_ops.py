"""Behavior + plan invariants for the round-6e mining wave
(plans/analytics_mining.py): exact heavy hitters, winnowing fingerprints,
overlap chunking, integer PageRank. Cross-engine value equality is covered
by test_entry_oracle / tools/driver_check."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_mining import (
    _CHUNK,
    _HH_K,
    _PR_BASE,
    _PR_ITERS,
    _PR_SCALE,
    _STRIDE,
    _WIN_N,
    _WIN_W,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# corpus_heavy_hitters
# --------------------------------------------------------------------------


def test_heavy_hitters_equal_exact_full_groupby(spark):
    """The MG-candidates + recount pipeline must return EXACTLY the set a
    full groupBy over all bigrams would — the summary's error must never
    surface. This is the guarantee the operator exists to provide."""
    from pyspark.sql import functions as F

    from kafka_sink_spark.extensions import text
    from kafka_sink_spark.session import load_tables

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    bigr = docs.select(text.tokens(F.col("text")).alias("_t")).select(
        F.explode(text.shingles_from_tokens(F.col("_t"), 2)).alias("gram")
    )
    n = bigr.count()
    exact = {
        (r.gram, r.cnt)
        for r in bigr.groupBy("gram").agg(F.count("*").alias("cnt")).collect()
        if r.cnt * _HH_K > n
    }
    got = {
        (r.gram, r.cnt)
        for r in QUERIES["corpus_heavy_hitters"](spark, SF_DIR).collect()
    }
    assert got == exact
    assert got  # non-degenerate at this SF


def test_heavy_hitters_ppm_above_threshold(spark):
    rows = QUERIES["corpus_heavy_hitters"](spark, SF_DIR).collect()
    for r in rows:
        # cnt*K > n  ⇒  freq_ppm = cnt*1e6 div n ≥ 1e6/K (up to truncation)
        assert r.freq_ppm >= 1_000_000 // _HH_K


def test_heavy_hitters_candidate_phase_has_no_shuffle_before_summary(spark):
    """Phase 1 (scan → explode → mapInPandas) must not shuffle: the MG
    summary is the thing that avoids shuffling the full frequency table."""
    from kafka_sink_spark.plans.analytics_mining import _mg_summaries  # noqa: F401

    plan = _plan(spark, "corpus_heavy_hitters")
    # the recount join must be broadcast, not a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------------------------------
# docs_winnowing
# --------------------------------------------------------------------------


def test_winnowing_density_bounds(spark):
    """Winnowing guarantees ≥1 fingerprint per window of w grams and never
    selects more than one per position: n_grams/w ≤ n_fp ≤ n_grams."""
    rows = QUERIES["docs_winnowing"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        n_windows = r.n_grams - (_WIN_W - 1)
        if n_windows <= 0:
            continue
        assert 1 <= r.n_fingerprints <= r.n_grams
        # coverage guarantee: one selection can cover at most w windows
        assert r.n_fingerprints * _WIN_W >= n_windows


def test_winnowing_matches_reference_python(spark):
    """Bit-exact check of one document against a direct Python
    implementation of robust winnowing (rightmost min per window)."""
    import hashlib
    import re

    from kafka_sink_spark.session import load_tables

    doc = (
        load_tables(spark, SF_DIR, ("documents",))["documents"]
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    toks = [t for t in re.split(r"\s+", doc.text) if t]
    grams = [
        " ".join(toks[i : i + _WIN_N]) for i in range(len(toks) - _WIN_N + 1)
    ]
    hx = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams
    ]
    fps = set()
    for end in range(_WIN_W - 1, len(hx)):
        window = list(range(end - _WIN_W + 1, end + 1))
        m = min(hx[p] for p in window)
        pos = max(p for p in window if hx[p] == m)  # rightmost min
        fps.add((pos, m))
    row = [
        r
        for r in QUERIES["docs_winnowing"](spark, SF_DIR).collect()
        if r.doc_id == doc.doc_id
    ][0]
    assert row.n_grams == len(grams)
    assert row.n_fingerprints == len(fps)
    assert row.fp_hash_sum == sum(h for _, h in fps)


def test_winnowing_single_exchange(spark):
    """The doc-keyed window shuffle must be the ONLY Exchange: both the
    selection-dedup agg and the per-doc rollup reuse its partitioning."""
    plan = _plan(spark, "docs_winnowing")
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan and "Join" not in plan


# --------------------------------------------------------------------------
# docs_chunk_overlap
# --------------------------------------------------------------------------


def test_chunk_overlap_covers_every_token_once_per_chunk(spark):
    """Chunks tile [0, n) with stride 48/size 64: starts are k*48, the last
    chunk reaches n, successive chunks overlap by exactly 16 (when full)."""
    from collections import defaultdict

    from kafka_sink_spark.session import load_tables

    docs = {
        r.doc_id: r.n
        for r in load_tables(spark, SF_DIR, ("documents",))["documents"]
        .selectExpr(
            "doc_id",
            "size(filter(split(text, '\\\\s+'), x -> x <> '')) AS n",
        )
        .collect()
    }
    by_doc = defaultdict(list)
    for r in QUERIES["docs_chunk_overlap"](spark, SF_DIR).collect():
        by_doc[r.doc_id].append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        n = docs[doc_id]
        for i, r in enumerate(rows):
            assert r.chunk_idx == i
            assert r.start_tok == i * _STRIDE
            assert r.n_chunk_tokens == min(_CHUNK, n - r.start_tok)
        last = rows[-1]
        assert last.start_tok + last.n_chunk_tokens == n
        # no chunk is redundant: each (but the first) must add new tokens
        for r in rows[1:]:
            assert r.start_tok + r.n_chunk_tokens > r.start_tok + (
                _CHUNK - _STRIDE
            )


def test_chunk_overlap_zero_shuffle(spark):
    plan = _plan(spark, "docs_chunk_overlap")
    assert "Exchange" not in plan  # pure scan-side projection chain


# --------------------------------------------------------------------------
# parts_copurchase_pagerank
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pagerank_rows(spark):
    return QUERIES["parts_copurchase_pagerank"](spark, SF_DIR).collect()


def test_pagerank_matches_reference_python(spark, pagerank_rows):
    """Bit-exact check against a direct Python implementation of the same
    integer recurrence over the collected edge list."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from kafka_sink_spark.session import load_tables

    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    pairs = (
        li.alias("a")
        .join(li.alias("b"), F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .collect()
    )
    out_edges = defaultdict(list)
    for r in pairs:
        out_edges[r.src].append(r.dst)
    rank = {v: _PR_SCALE for v in out_edges}
    for _ in range(_PR_ITERS):
        sums = defaultdict(int)
        for v, dsts in out_edges.items():
            unit = rank[v] // len(dsts)
            for d in dsts:
                sums[d] += unit
        rank = {v: _PR_BASE + 85 * sums[v] // 100 for v in out_edges}
    got = {r.part_key: r.rank_micro for r in pagerank_rows}
    assert got == rank


def test_pagerank_rank_bounds(pagerank_rows):
    """Every rank ≥ the damping base; the mean stays near SCALE (the
    un-normalized recurrence conserves mass up to truncation + damping)."""
    assert all(r.rank_micro >= _PR_BASE for r in pagerank_rows)
    mean = sum(r.rank_micro for r in pagerank_rows) / len(pagerank_rows)
    assert 0.5 * _PR_SCALE < mean < 1.5 * _PR_SCALE
