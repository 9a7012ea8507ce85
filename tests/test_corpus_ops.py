"""Behavior + plan invariants for the round-6c corpus wave
(plans/analytics_corpus.py): SemDeDup, DSIR weights, bigram-LM
predictability, int8 quantization, MinHash accuracy harness.

Cross-engine value equality is covered by test_entry_oracle; these pin the
operator SEMANTICS (survivor guarantees, code ranges, estimator identities)
and the scale-critical plan shapes."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def semantic(spark):
    return QUERIES["dedup_semantic"](spark, SF_DIR).collect()


def test_semantic_removed_subset_of_dup_holders(semantic):
    """A vector can only be removed because of a τ-similar neighbor."""
    for r in semantic:
        if r.is_removed:
            assert r.n_dup_neighbors >= 1, r


def test_semantic_every_neighborhood_keeps_a_survivor(semantic):
    """The keep-rank rule (farthest from centroid, ties to low id) is a
    total order within a cell, so the top-ranked member of any τ-similar
    neighborhood has no outranking neighbor and MUST survive: among vectors
    with dup neighbors, some are kept."""
    with_dups = [r for r in semantic if r.n_dup_neighbors > 0]
    if with_dups:  # sf-dependent; holds at both shipped SFs
        assert any(not r.is_removed for r in with_dups)


def test_semantic_covers_every_vector(semantic, spark):
    from kafka_sink_spark.session import load_tables

    n = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].count()
    assert len(semantic) == n
    assert len({r.vec_id for r in semantic}) == n


def test_quantize_codes_in_int8_range_and_errors_nonneg(spark):
    rows = QUERIES["embedding_quantize_int8"](spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r.min_code <= r.max_code <= 255, r
        assert r.err_fixed >= 0, r
        assert r.quant_mse >= 0.0, r


def test_minhash_accuracy_estimator_identities(spark):
    rows = QUERIES["dedup_minhash_accuracy"](spark, SF_DIR).collect()
    assert rows, "LSH candidates expected at this SF"
    for r in rows:
        assert 0 <= r.n_sig_match <= 16, r
        assert abs(r.est_jaccard - r.n_sig_match / 16.0) < 1e-9, r
        assert 0.0 <= r.jaccard <= 1.0, r
        assert abs(r.abs_err - abs(r.est_jaccard - r.jaccard)) < 2e-6, r


def test_lm_predictability_bounds(spark):
    rows = QUERIES["docs_lm_predictability"](spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 < r.predictability <= 1.0, r
        assert 0.0 <= r.min_bigram_prob <= r.predictability + 1e-9, r
        assert r.n_bigrams >= 1, r


def test_dsir_weights_positive_and_target_upweighted(spark):
    """Importance weights are strictly positive; the Gopher-passing target
    docs must average a HIGHER weight than the rejected docs (the DSIR
    contract: the sampler upweights target-like data)."""
    from pyspark.sql import functions as F

    from kafka_sink_spark.extensions import text
    from kafka_sink_spark.plans.analytics_quality import _GOPHER
    from kafka_sink_spark.session import load_tables

    w = QUERIES["docs_dsir_weights"](spark, SF_DIR)
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    flags = text.gopher_flags(docs, **_GOPHER).select("doc_id", "ok_all")
    j = w.join(flags, "doc_id").groupBy("ok_all").agg(
        F.avg("dsir_weight").alias("mean_w")
    )
    means = {r.ok_all: r.mean_w for r in j.collect()}
    assert all(r.dsir_weight > 0 for r in w.collect())
    if 0 in means and 1 in means:
        assert means[1] > means[0], means


def test_semantic_planted_identical_vectors_keep_one(spark, tmp_path):
    """Planted fixture: identical vectors MUST land in one cluster, pair
    above any τ, and keep exactly one survivor per identical group (the
    lowest id at equal centroid distance)."""
    import pyspark.sql.functions as F

    # one-hot base vectors: mutually orthogonal (cos = 0 < τ), so the ONLY
    # τ-similar pairs are the planted identical duplicates (cos = 1)
    base = [[1.0 if j == i else 0.0 for j in range(64)] for i in range(40)]
    rows = [(i, base[i], 0) for i in range(40)]
    # vectors 40..44 duplicate vector 0; 45..46 duplicate vector 1
    rows += [(40 + d, base[0], 0) for d in range(5)]
    rows += [(45 + d, base[1], 0) for d in range(2)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf = str(tmp_path / "sfsem")
    import os

    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    out = {r.vec_id: r for r in QUERIES["dedup_semantic"](spark, sf).collect()}
    grp0 = [0] + [40 + d for d in range(5)]
    grp1 = [1, 45, 46]
    for grp in (grp0, grp1):
        kept = [v for v in grp if not out[v].is_removed]
        # every member sees the rest of its identical group as neighbors
        for v in grp:
            assert out[v].n_dup_neighbors >= len(grp) - 1, (v, out[v])
        assert kept == [min(grp)], (grp, kept)


def test_bpe_merge_apply_overlapping_pair_fixture(spark, tmp_path):
    """Planted fixture: the corpus's top pair is 'aa'; 'aaaa' merges twice
    (leftmost non-overlapping), 'aaa' merges once — the exact replace()
    semantics both engines must share."""
    import os

    docs = spark.createDataFrame(
        [
            (0, "aaaa aaa xy", "en", "s", 11),
            (1, "aa aa zq", "en", "s", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sfbpe")
    os.makedirs(sf, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {r.doc_id: r for r in QUERIES["corpus_bpe_merge_apply"](spark, sf).collect()}
    # doc 0: 'aaaa'(2 merges) + 'aaa'(1) + 'xy'(0) = 3; doc 1: 'aa'+'aa' = 2
    assert out[0].n_merges == 3, out[0]
    assert out[1].n_merges == 2, out[1]
    assert out[0].symbols_after == out[0].symbols_before - 3
    assert out[1].symbols_after == out[1].symbols_before - 2


# ---------------------------------------------------------------------------
# plan invariants
# ---------------------------------------------------------------------------


def test_semantic_cluster_bucketed_no_cartesian(spark):
    """SemDeDup: pair generation is the cell-keyed self-join (equi, never
    cartesian/nested-loop over the corpus); Lloyd training joins broadcast
    centroids; the removal rule is one aggregation, no window."""
    plan = _plan(spark, "dedup_semantic")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Window" not in plan


def test_dsir_single_explode_broadcast_ratios(spark):
    """DSIR: the per-(doc,feat) table is built by ONE tokenize+explode
    (persisted - one Generate in the plan or an InMemoryRelation reuse);
    the ≤1024-row ratio table is broadcast back; no cartesian beyond the
    broadcast 1-row totals."""
    plan = _plan(spark, "docs_dsir_weights")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan  # the persisted per-doc feature table
    assert "partial_count" in plan or "partial_sum" in plan


def test_lm_predictability_pinned_shuffle_no_window(spark):
    """The bigram-marginal join is PINNED shuffle_hash since the r14 sweep
    (string-keyed, corpus-scaling build side — the AQE compressed-size
    trap class); the plan must carry no broadcast join at all."""
    plan = _plan(spark, "docs_lm_predictability")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert "Window" not in plan
    assert "InMemoryTableScan" in plan  # shared bigram substrate


def test_quantize_broadcast_stats_single_agg_chain(spark):
    """int8 quantization: per-dim stats partial-combine onto 64 rows,
    broadcast back; no window, no cartesian, no global sort."""
    plan = _plan(spark, "embedding_quantize_int8")
    assert "BroadcastHashJoin" in plan
    assert "partial_min" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_accuracy_equi_joins_only(spark):
    plan = _plan(spark, "dedup_minhash_accuracy")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan  # signature aggregation partial-combines
