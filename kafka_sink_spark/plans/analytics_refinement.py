"""Round-10g wave: residual quantization, retrieval MAP, and the
importance-sampling health diagnostic.

- ``embedding_residual_vq``  two-stage residual vector quantization
  (Juang & Gray 1982; the RVQ construction modern ANN systems layer
  under IVF): stage 1 is the catalog's Lloyd-trained coarse quantizer
  (K₁ = 8, 2 seeded rounds, exact fixed-point), stage 2 trains a second
  Lloyd codebook (K₂ = 16) on the RESIDUALS x − c₁ and re-encodes; the
  readout is per-cell quantization error after stage 1 vs after stage 2
  — the measured "how much distortion does the second stage buy back",
  which is the number that decides codebook depth for a 100 TB vector
  store.
- ``knn_map``  mean average precision @5 of label-relevance retrieval
  (the classic IR metric; Manning/Raghavan/Schütze's standard form) —
  completes the catalog's ranking-metric triad next to ``knn_label_ndcg``
  (graded rank quality) and ``knn_mrr`` (first-hit): AP averages
  precision at each relevant rank, normalized by min(k, R).
- ``docs_dsir_ess``  effective sample size of the DSIR importance
  weights (Kong 1992's ESS = (Σw)²/Σw², the standard IS health check):
  resampling with these weights behaves like ESS ≪ n independent
  draws — the go/no-go diagnostic before trusting ``docs_dsir_weights``
  for selection.

Determinism per the package convention: fixed-point micro-units and
integer Lloyd updates end-to-end (the extensions/similarity.py
machinery), ppm readouts via truncating division on non-negative
quantities, ties to low ids.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's ANN/evaluation/curation
families.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions import similarity
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_RVQ_DIM = 64
_RVQ_K1 = 8
_RVQ_K2 = 16
_RVQ_ITERS = 2

_MAP_K = 5
_MAP_QUERIES = 100


# --------------------------------------------------------------------------
# Two-stage residual vector quantization
# --------------------------------------------------------------------------


def _lloyd_chain(src: str, prefix: str, k: int, iterations: int) -> tuple[list[str], str]:
    """Emit the seeded-Lloyd CTE chain over fixed-point component rows in
    ``src`` (vid, m, comp, x) — the oracle-side mirror of
    extensions/similarity.py::lloyd_codebook.  Returns (ctes, final_name)."""
    ctes = [
        f"""{prefix}c0 AS (
      SELECT m, CAST(vid AS INTEGER) AS j, comp, x AS c
      FROM {src} WHERE vid < {k}
    )"""
    ]
    prev = f"{prefix}c0"
    for t in range(1, iterations + 1):
        ctes.append(
            f"""{prefix}d{t} AS (
      SELECT p.vid, p.m, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM {src} p JOIN {prev} c ON p.m = c.m AND p.comp = c.comp
      GROUP BY p.vid, p.m, c.j
    )"""
        )
        ctes.append(
            f"""{prefix}a{t} AS (
      SELECT vid, m, j FROM (
        SELECT vid, m, j,
               row_number() OVER (PARTITION BY vid, m ORDER BY d, j) AS rn
        FROM {prefix}d{t}) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""{prefix}c{t} AS (
      SELECT p.m, a.j, p.comp, CAST(SUM(p.x) // COUNT(*) AS BIGINT) AS c
      FROM {src} p JOIN {prefix}a{t} a ON p.vid = a.vid AND p.m = a.m
      GROUP BY p.m, a.j, p.comp
    )"""
        )
        prev = f"{prefix}c{t}"
    return ctes, prev


def _rvq_oracle() -> str:
    ctes = [
        f"""comp AS (
      SELECT vec_id AS vid, CAST(0 AS INTEGER) AS m,
             CAST(i AS INTEGER) AS comp,
             CAST(round(embedding[i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS x
      FROM embeddings, unnest(range({_RVQ_DIM})) AS u(i)
    )"""
    ]
    chain1, cb1 = _lloyd_chain("comp", "s1", _RVQ_K1, _RVQ_ITERS)
    ctes += chain1
    ctes.append(
        f"""fd1 AS (
      SELECT p.vid, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM comp p JOIN {cb1} c ON p.m = c.m AND p.comp = c.comp
      GROUP BY p.vid, c.j
    )"""
    )
    ctes.append(
        """fa1 AS (
      SELECT vid, j AS cell, d AS d1 FROM (
        SELECT vid, j, d,
               row_number() OVER (PARTITION BY vid ORDER BY d, j) AS rn
        FROM fd1) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""res AS (
      SELECT p.vid, p.m, p.comp, p.x - c.c AS x
      FROM comp p
      JOIN fa1 a ON a.vid = p.vid
      JOIN {cb1} c ON c.m = p.m AND c.comp = p.comp AND c.j = a.cell
    )"""
    )
    chain2, cb2 = _lloyd_chain("res", "s2", _RVQ_K2, _RVQ_ITERS)
    ctes += chain2
    ctes.append(
        f"""fd2 AS (
      SELECT p.vid, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM res p JOIN {cb2} c ON p.m = c.m AND p.comp = c.comp
      GROUP BY p.vid, c.j
    )"""
    )
    ctes.append(
        """fa2 AS (
      SELECT vid, d AS d2 FROM (
        SELECT vid, d,
               row_number() OVER (PARTITION BY vid ORDER BY d, j) AS rn
        FROM fd2) WHERE rn = 1
    )"""
    )
    ctes.append(
        """rows_ AS (
      SELECT a1.cell,
             CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST(SUM(a1.d1) AS BIGINT) AS d1_sum,
             CAST(SUM(a2.d2) AS BIGINT) AS d2_sum,
             CAST(SUM(a2.d2)::HUGEINT * 1000000 // SUM(a1.d1) AS BIGINT)
               AS d2_over_d1_ppm
      FROM fa1 a1 JOIN fa2 a2 ON a2.vid = a1.vid
      GROUP BY a1.cell
    )"""
    )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT CAST(cell AS BIGINT) AS cell, n_vectors, d1_sum, d2_sum,
           d2_over_d1_ppm
    FROM rows_
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(SUM(n_vectors) AS BIGINT),
           CAST(SUM(d1_sum) AS BIGINT), CAST(SUM(d2_sum) AS BIGINT),
           CAST(SUM(d2_sum)::HUGEINT * 1000000 // SUM(d1_sum) AS BIGINT)
    FROM rows_
    """
    )


@register("embedding_residual_vq", oracle=_rvq_oracle())
def embedding_residual_vq(spark, sf_dir):
    """Two-stage residual VQ (Juang & Gray 1982): the Lloyd-trained
    coarse quantizer (K₁ = {k1}, {it} seeded rounds, exact fixed-point —
    the same fit the trained-IVF family certifies) assigns every vector
    to a cell; a SECOND Lloyd codebook (K₂ = {k2}) trains on the
    residuals x − c₁ and re-encodes them.  Per cell (+ the pooled −1
    row): vector count, total squared error after stage 1 (d1_sum) and
    after stage 2 (d2_sum), and d2/d1 in ppm — the measured distortion
    buy-back of the second stage, the codebook-depth knob for a 100 TB
    vector store (RVQ stacks exactly like this, stage by stage).

    Scale shape: every stage is the canonical distributed k-means step —
    a broadcast join of the corpus against a tiny codebook plus two
    partial-combined aggregations; the residual table is one
    node-keyed join against the broadcast stage-1 codebook and is
    persisted once for the stage-2 fit + final encode.  Nothing
    collects; codebooks stay DataFrames.
    """
    from pyspark import StorageLevel

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    comp = similarity.component_rows(emb, m_subspaces=1, sub_len=_RVQ_DIM)
    cb1 = similarity.lloyd_codebook(
        comp, k_codewords=_RVQ_K1, iterations=_RVQ_ITERS
    )
    # Shared persisted corpus × K₁ distance table (same fit as the trained
    # IVF/IVF-PQ/SemDeDup consumers — lloyd_codebook memoizes it per session).
    fd1 = similarity.trained_distances(comp, _RVQ_K1, _RVQ_ITERS)
    fa1 = (
        fd1.select("vid", F.struct(F.col("d"), F.col("j")).alias("_c"))
        .groupBy("vid")
        .agg(F.min("_c").alias("_b"))
        .select(
            "vid",
            F.col("_b.j").alias("cell"),
            F.col("_b.d").alias("d1"),
        )
    )
    res = (
        comp.join(fa1.select("vid", "cell"), "vid")
        .join(
            F.broadcast(cb1.withColumnRenamed("j", "cell")),
            ["m", "comp", "cell"],
        )
        .select(
            "vid",
            "m",
            "comp",
            (F.col("x") - F.col("c")).alias("x"),
        )
        # feeds the stage-2 Lloyd fit (2 rounds x 2 consumers) + the
        # final encode — persist so the stage-1 lineage runs once
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cb2 = similarity.lloyd_codebook(
        res, k_codewords=_RVQ_K2, iterations=_RVQ_ITERS
    )
    fd2 = similarity._pq_distances(res, cb2)
    fa2 = (
        fd2.select("vid", F.struct(F.col("d"), F.col("j")).alias("_c"))
        .groupBy("vid")
        .agg(F.min("_c").alias("_b"))
        .select("vid", F.col("_b.d").alias("d2"))
    )
    rows = (
        fa1.join(fa2, "vid")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("d1").cast("long").alias("d1_sum"),
            F.sum("d2").cast("long").alias("d2_sum"),
        )
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_vectors",
            "d1_sum",
            "d2_sum",
            F.expr(
                "CAST(CAST(d2_sum AS DECIMAL(38,0)) * 1000000 div d1_sum"
                " AS BIGINT)"
            ).alias("d2_over_d1_ppm"),
        )
        # K₁-cell rows feed BOTH union branches (per-cell + pooled −1):
        # persist so the two-stage scoring pipeline executes once, not
        # once per branch (guide §7.2: duplicated subtrees; no exchange
        # reuse fires across the union's independently-compiled branches)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = rows.agg(
        F.lit(-1).cast("long").alias("cell"),
        F.sum("n_vectors").cast("long").alias("n_vectors"),
        F.sum("d1_sum").cast("long").alias("d1_sum"),
        F.sum("d2_sum").cast("long").alias("d2_sum"),
        F.expr(
            "CAST(CAST(SUM(d2_sum) AS DECIMAL(38,0)) * 1000000"
            " div SUM(d1_sum) AS BIGINT)"
        ).alias("d2_over_d1_ppm"),
    )
    return rows.unionByName(total)


embedding_residual_vq.__doc__ = embedding_residual_vq.__doc__.format(
    k1=_RVQ_K1, k2=_RVQ_K2, it=_RVQ_ITERS
)


# --------------------------------------------------------------------------
# Mean average precision @5 of label-relevance retrieval
# --------------------------------------------------------------------------


def _map_oracle(k: int = _MAP_K, nq: int = _MAP_QUERIES, dim: int = 64) -> str:
    from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql

    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS ql
      FROM embeddings WHERE vec_id < {nq}
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS ce, label AS cl
      FROM embeddings
    ), s AS (
      SELECT query_id, ql, neighbor_id, cl,
             round(({_dot_sql('qe', 'ce', dim)})
                   / ({_norm_sql('qe', dim)} * {_norm_sql('ce', dim)}), 6)
               AS cos_sim
      FROM q, c WHERE query_id <> neighbor_id
    ), r AS (
      SELECT query_id, ql, cl,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM s
    ), cum AS (
      SELECT query_id, ql, rk,
             CASE WHEN cl = ql THEN 1 ELSE 0 END AS rel,
             SUM(CASE WHEN cl = ql THEN 1 ELSE 0 END) OVER (
               PARTITION BY query_id ORDER BY rk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
      FROM r WHERE rk <= {k}
    ), apn AS (
      SELECT query_id, ql,
             CAST(SUM(CASE WHEN rel = 1 THEN h * 1000000 // rk
                           ELSE 0 END) AS BIGINT) AS ap_num
      FROM cum GROUP BY query_id, ql
    ), rel AS (
      SELECT q.query_id, COUNT(*) AS n_relevant
      FROM q JOIN c ON c.cl = q.ql AND c.neighbor_id <> q.query_id
      GROUP BY q.query_id
    ), rows_ AS (
      SELECT a.query_id, CAST(a.ql AS BIGINT) AS label,
             CAST(COALESCE(r2.n_relevant, 0) AS BIGINT) AS n_relevant,
             CAST(CASE WHEN COALESCE(r2.n_relevant, 0) = 0 THEN 0
                  ELSE a.ap_num // LEAST({k}, r2.n_relevant) END AS BIGINT)
               AS ap_ppm
      FROM apn a LEFT JOIN rel r2 ON r2.query_id = a.query_id
    )
    SELECT * FROM rows_
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(SUM(n_relevant) AS BIGINT),
           CAST(SUM(ap_ppm) // {nq} AS BIGINT)
    FROM rows_
    """


@register("knn_map", oracle=_map_oracle())
def knn_map(spark, sf_dir):
    """MAP@{k} of brute-force cosine retrieval with label relevance —
    the third leg of the ranking-metric triad (NDCG grades positions,
    MRR the first hit, MAP the precision at EVERY relevant rank):
    AP = Σ_(relevant i ≤ k) P@i / min(k, R) in ppm, pooled to the
    query_id = −1 MAP row.  Same {q}-query panel, same rounded-cosine
    tie-break convention as the NDCG/MRR harnesses, so the three
    metrics are directly comparable.

    Scale shape: the broadcast-query corpus scan and per-query
    WindowGroupLimit top-{k} of the knn family; the cumulative-hit
    window runs over ≤ {k} rows per query; relevant counts ride the
    label-keyed join; the pooled row aggregates {q} rows.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < _MAP_QUERIES)
    knn = similarity.knn_bruteforce(emb, queries, k=_MAP_K)
    labels = emb.select("vec_id", "label")
    ranked = (
        knn.join(
            labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
                "label", "ql"
            ),
            "query_id",
        )
        .join(
            labels.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
                "label", "cl"
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "ql",
            "rank",
            F.when(F.col("cl") == F.col("ql"), 1).otherwise(0).alias("rel"),
        )
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = ranked.select(
        "query_id", "ql", "rank", "rel", F.sum("rel").over(w).alias("h")
    )
    apn = cum.groupBy("query_id", "ql").agg(
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.expr("h * 1000000 div rank"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("ap_num")
    )
    rel = (
        F.broadcast(queries.select(F.col("vec_id").alias("query_id"), "label"))
        .join(
            labels.withColumnRenamed("label", "cl"),
            (F.col("cl") == F.col("label"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_relevant"))
    )
    rows = apn.join(rel, "query_id", "left").select(
        "query_id",
        F.col("ql").cast("long").alias("label"),
        F.coalesce(F.col("n_relevant"), F.lit(0))
        .cast("long")
        .alias("n_relevant"),
        F.expr(
            f"CAST(CASE WHEN COALESCE(n_relevant, 0) = 0 THEN 0"
            f" ELSE ap_num div LEAST({_MAP_K}, n_relevant) END AS BIGINT)"
        ).alias("ap_ppm"),
    )
    # per-query AP rows feed both union branches (rows + pooled MAP):
    # persist so the retrieval pipeline executes once (guide §7.2)
    from pyspark import StorageLevel

    rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
    total = rows.agg(
        F.lit(-1).cast("long").alias("query_id"),
        F.lit(-1).cast("long").alias("label"),
        F.sum("n_relevant").cast("long").alias("n_relevant"),
        F.expr(f"CAST(SUM(ap_ppm) div {_MAP_QUERIES} AS BIGINT)").alias(
            "ap_ppm"
        ),
    )
    return rows.unionByName(total)


knn_map.__doc__ = knn_map.__doc__.format(k=_MAP_K, q=_MAP_QUERIES)


# --------------------------------------------------------------------------
# Effective sample size of the DSIR importance weights
# --------------------------------------------------------------------------


def _ess_oracle() -> str:
    from kafka_sink_spark.plans.analytics_corpus import _dsir_oracle

    return f"""
    WITH dsir AS ({_dsir_oracle()}),
    w AS (
      SELECT doc_id, CAST(score_fixed // n_grams AS BIGINT) AS w_ppm
      FROM dsir
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w_ppm) AS BIGINT) AS sum_w_ppm,
           CAST(SUM(w_ppm::HUGEINT * w_ppm) AS BIGINT) AS sum_w2_ppm2,
           CAST((SUM(w_ppm)::HUGEINT * SUM(w_ppm))
                // SUM(w_ppm::HUGEINT * w_ppm) AS BIGINT) AS ess_docs,
           CAST(((SUM(w_ppm)::HUGEINT * SUM(w_ppm))
                 // SUM(w_ppm::HUGEINT * w_ppm)) * 1000000 // COUNT(*)
                AS BIGINT) AS ess_ratio_ppm
    FROM w
    """


@register("docs_dsir_ess", oracle=_ess_oracle())
def docs_dsir_ess(spark, sf_dir):
    """Effective sample size of the DSIR importance weights (Kong 1992:
    ESS = (Σw)² / Σw² — the standard importance-sampling health check):
    resampling the corpus with these weights behaves like drawing
    ESS ≪ n independent documents, so a collapsing ESS means the target
    distribution is concentrating the selection onto a few docs and the
    DSIR gate needs a broader target.  Reported: n, the weight moments
    (in the dsir pipeline's exact ppm fixed point, w = score div
    n_grams), ESS in documents and as a ratio of n in ppm.

    Scale shape: reuses the certified ``docs_dsir_weights`` pipeline
    (one persisted tokenize+explode pass, bounded feature table) and
    adds ONE partial-combined two-moment aggregate — sums and
    sum-of-squares merge associatively, so the diagnostic is free at
    any corpus size; the squared-sum products ride DECIMAL(38,0) ≙
    HUGEINT.
    """
    from kafka_sink_spark.plans.analytics_corpus import docs_dsir_weights

    w = docs_dsir_weights(spark, sf_dir).select(
        F.expr("CAST(score_fixed div n_grams AS BIGINT)").alias("w_ppm")
    )
    dec = "CAST(w_ppm AS DECIMAL(38,0))"
    return w.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w_ppm").cast("long").alias("sum_w_ppm"),
        F.sum(F.expr(f"{dec} * w_ppm")).cast("long").alias("sum_w2_ppm2"),
        F.expr(
            "CAST(CAST(SUM(w_ppm) AS DECIMAL(38,0)) * SUM(w_ppm)"
            " div SUM(CAST(w_ppm AS DECIMAL(38,0)) * w_ppm) AS BIGINT)"
        ).alias("ess_docs"),
        # staged: ESS first (bounded by n), THEN the ppm ratio — the
        # (Σw)²·1e6 product would outgrow DECIMAL(38,0) near 1e13 docs
        F.expr(
            "CAST(CAST(CAST(SUM(w_ppm) AS DECIMAL(38,0)) * SUM(w_ppm)"
            " div SUM(CAST(w_ppm AS DECIMAL(38,0)) * w_ppm)"
            " AS DECIMAL(38,0)) * 1000000 div COUNT(1) AS BIGINT)"
        ).alias("ess_ratio_ppm"),
    )
