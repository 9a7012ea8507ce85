"""Round-8d segmentation / evaluation wave.

- ``docs_langid_confusion``  confusion matrix of the marker-word
  language heuristic against the corpus ground-truth ``lang`` column:
  (true_lang, pred_lang, n_docs, share-of-true ppm) — the error
  breakdown that turns a language-ID accuracy number into a routing
  decision (which languages leak into which).
- ``embedding_threshold_sweep``  near-duplicate rate curve: one pass
  over the LSH-bucket candidate pairs, counted at five cosine
  thresholds — the "where do we set the dedup knife" sweep computed
  without re-scoring pairs per threshold.
- ``customer_rfm_segments``  RFM (recency / frequency / monetary)
  quintile segmentation: each dimension ranked with the two-phase
  bucket-prefix pattern (calendar / count / cents grids — no global
  sort anywhere), quintiles by exact integer division, one row per
  populated (r,f,m) cell with customer count and spend.

Determinism per the package convention: integers end-to-end,
rounded-6 cosines (the family's pinned float fence), truncating
division, ties broken on explicit keys.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's curation/evaluation families.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables, spread_small_scan

# --------------------------------------------------------------------------
# Language-ID confusion matrix
# --------------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from kafka_sink_spark.extensions.text import LANG_MARKERS

    def score(lang: str) -> str:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (
            "len(list_filter(list_filter(regexp_split_to_array(lower(text),"
            " '\\s+'), x -> x <> ''), t -> list_contains([" + markers + "], t)))"
        )

    return f"""
    WITH s AS (
      SELECT lang AS true_lang,
             {score('en')} AS s_en, {score('de')} AS s_de,
             {score('es')} AS s_es, {score('fr')} AS s_fr
      FROM documents
    ), p AS (
      SELECT true_lang,
             CASE
               WHEN s_fr > GREATEST(s_en, s_de, s_es) THEN 'fr'
               WHEN s_es > GREATEST(s_en, s_de) THEN 'es'
               WHEN s_de > s_en THEN 'de'
               WHEN s_en > 0 THEN 'en'
               ELSE 'und'
             END AS pred_lang
      FROM s
    ), m AS (
      SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM p GROUP BY true_lang, pred_lang
    ), tot AS (
      SELECT true_lang, SUM(n_docs) AS n_true FROM m GROUP BY true_lang
    )
    SELECT m.true_lang, m.pred_lang, m.n_docs,
           CAST(m.n_docs * 1000000 // tot.n_true AS BIGINT) AS share_ppm
    FROM m JOIN tot ON tot.true_lang = m.true_lang
    """


@register("docs_langid_confusion", oracle=_langid_confusion_oracle())
def docs_langid_confusion(spark, sf_dir):
    """Confusion matrix of the marker-word language heuristic
    (extensions/text.lang_id: argmax marker hits, strict-greater ties
    favoring en > de > es > fr, 'und' when nothing fires) against the
    ground-truth ``lang`` column: one row per (true, predicted) pair
    with the share of that true language in ppm — per-language recall
    is the diagonal share, and every off-diagonal cell names a routing
    leak.  The closed-form CASE in the oracle replays the heuristic's
    sequential strict-greater loop exactly.

    Scale shape: one scan, vectorized token/marker projections, one
    partial-combined rollup on the (|langs|×|langs|)-bounded matrix,
    and a broadcast of the per-true-language totals.  The marker
    projection rides spread_small_scan so the per-token CPU work feeds
    every core when the scan itself cannot (r14, guide §2.2; structural
    no-op at production scan widths).
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs = spread_small_scan(docs, spark)
    pred = docs.select(
        F.col("lang").alias("true_lang"),
        text_ops.lang_id(F.col("text")).alias("pred_lang"),
    )
    m = pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    tot = m.groupBy("true_lang").agg(F.sum("n_docs").alias("n_true"))
    return m.join(F.broadcast(tot), "true_lang").select(
        "true_lang",
        "pred_lang",
        "n_docs",
        F.expr("CAST(n_docs * 1000000 div n_true AS BIGINT)").alias(
            "share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Cosine threshold sweep over LSH candidates
# --------------------------------------------------------------------------

_SWEEP_TS = (0, 100_000, 200_000, 300_000, 400_000)  # thresholds in ppm


def _sweep_oracle(n_planes: int = 8, dim: int = 64) -> str:
    from kafka_sink_spark.extensions import similarity
    from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql

    planes = similarity.hyperplanes(dim, n_planes)

    def bucket_expr(col: str) -> str:
        terms = []
        for p_idx, plane in enumerate(planes):
            dot = " + ".join(
                f"{col}[{i+1}]::DOUBLE * ({plane[i]!r})" for i in range(dim)
            )
            terms.append(f"(CASE WHEN ({dot}) > 0 THEN {2**p_idx} ELSE 0 END)")
        return "\n           + ".join(terms)

    ts = ", ".join(f"({t})" for t in _SWEEP_TS)
    return f"""
    WITH b AS (
      SELECT vec_id, embedding,
             CAST({bucket_expr('embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             a.embedding AS va, b2.embedding AS vb
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    ), scored AS (
      SELECT CAST(FLOOR(round(({_dot_sql('va', 'vb', dim)})
                   / ({_norm_sql('va', dim)} * {_norm_sql('vb', dim)}), 6)
                  * 1000000) AS BIGINT) AS cos_ppm
      FROM pairs
    ), tot AS (SELECT COUNT(*) AS n_cand FROM scored)
    SELECT t.t AS threshold_ppm,
           CAST(tot.n_cand AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN scored.cos_ppm >= t.t THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN scored.cos_ppm >= t.t THEN 1 ELSE 0 END)
                * 1000000 // tot.n_cand AS BIGINT) AS candidate_share_ppm
    FROM (VALUES {ts}) AS t(t), scored, tot
    GROUP BY t.t, tot.n_cand
    """


@register("embedding_threshold_sweep", oracle=_sweep_oracle())
def embedding_threshold_sweep(spark, sf_dir):
    """Near-duplicate rate curve over the LSH candidate pairs: the
    same-bucket pairs are scored ONCE (rounded-6 cosine → ppm) and
    counted at five thresholds — the sweep that decides where the dedup
    knife falls without rescoring per threshold.  On the synthetic
    near-orthogonal embeddings the curve collapses between 0.3 and 0.4,
    which is exactly the signal (the corpus has candidates but few
    confident near-dups).

    Scale shape: candidates stay bucket-local (no all-pairs stage — the
    certified cosine_near_dup_pairs shape); the sweep is a 5-way
    conditional aggregate over one pass, with the candidate total
    broadcast.
    """
    from kafka_sink_spark.extensions import similarity

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    pairs = similarity.cosine_near_dup_pairs(emb, threshold=-1.0)
    scored = pairs.select(
        F.expr("CAST(FLOOR(cos_sim * 1000000) AS BIGINT)").alias("cos_ppm")
    )
    counts = scored.agg(
        F.count("*").cast("long").alias("n_candidates"),
        *[
            F.sum(F.when(F.col("cos_ppm") >= t, 1).otherwise(0))
            .cast("long")
            .alias(f"_n_{t}")
            for t in _SWEEP_TS
        ],
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("long").alias("threshold_ppm"),
                        F.col("n_candidates"),
                        F.col(f"_n_{t}").alias("n_pairs"),
                    )
                    for t in _SWEEP_TS
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "threshold_ppm",
        "n_candidates",
        "n_pairs",
        F.expr("CAST(n_pairs * 1000000 div n_candidates AS BIGINT)").alias(
            "candidate_share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# RFM quintile segmentation
# --------------------------------------------------------------------------

_RFM_ORACLE = """
    WITH cust AS (
      SELECT o_custkey AS ck,
             MAX(CAST(o_orderdate AS DATE)) AS last_d,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS spend
      FROM orders GROUP BY o_custkey
    ), ref AS (SELECT MAX(last_d) AS ref_d, CAST(COUNT(*) AS BIGINT) AS n
               FROM cust),
    dims AS (
      SELECT ck, freq, spend,
             datediff('day', last_d, ref.ref_d) AS rec_days, ref.n
      FROM cust, ref
    ), ranked AS (
      SELECT ck, n, freq, spend, rec_days,
             row_number() OVER (ORDER BY rec_days, ck) AS rk_r,
             row_number() OVER (ORDER BY freq DESC, ck) AS rk_f,
             row_number() OVER (ORDER BY spend DESC, ck) AS rk_m
      FROM dims
    ), seg AS (
      SELECT ((rk_r - 1) * 5) // n + 1 AS r_q,
             ((rk_f - 1) * 5) // n + 1 AS f_q,
             ((rk_m - 1) * 5) // n + 1 AS m_q,
             spend
      FROM ranked
    )
    SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(spend) AS BIGINT) AS spend_cents
    FROM seg GROUP BY r_q, f_q, m_q
    """


@register("customer_rfm_segments", oracle=_RFM_ORACLE)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation: every customer scored 1-5 on Recency (days
    since last order, 1 = most recent), Frequency (order count, 1 =
    most), and Monetary (spend cents, 1 = highest); one row per
    populated (r,f,m) cell with customer count and spend — the
    marketing segmentation every CRM rollup starts from, computed with
    EXACT global ranks.

    All three ranks use the two-phase bucket-prefix pattern
    (plans/prefix.py): recency on a week-bucket calendar grid,
    frequency on a count grid, monetary on a $10k cents grid — the only
    unpartitioned windows run over those bounded grids, never the
    customer table.  Quintiles are ((rank−1)·5) div n + 1, ties broken
    by customer key exactly as the oracle's row_number does.

    Scale shape: one orders-sized partial-combined rollup; three
    ladder + grid-prefix + bucket-local-window rank passes over the
    customer table; a 125-cell-bounded final rollup.
    """
    from kafka_sink_spark.plans.prefix import with_exclusive_prefix

    od = load_tables(spark, sf_dir, ("orders",))["orders"]
    # the per-customer rollup feeds ref + dims and, through dims, three
    # ladder passes and the three-window rank chain: persist so the
    # orders scan + rollup runs once, not once per consumer (guide §5)
    from pyspark import StorageLevel

    cust = od.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        F.count("*").cast("long").alias("freq"),
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).alias(
            "spend"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ref = cust.agg(
        F.max("last_d").alias("ref_d"), F.count("*").cast("long").alias("n")
    )
    dims = cust.crossJoin(F.broadcast(ref)).select(
        "ck",
        "freq",
        "spend",
        F.datediff(F.col("ref_d"), F.col("last_d")).cast("long").alias(
            "rec_days"
        ),
        "n",
    )

    def rank_by(df, col, *, descending, bucket_size, out):
        """Exact global row_number over (col asc/desc, ck) via the
        two-phase prefix: strictly-preceding count off the value grid +
        an in-value partitioned window.  The ladder counts come from
        ``dims`` (same rows as ``df`` — the chained rank windows only add
        columns), so a later rank's ladder does not re-execute the
        earlier ranks' window passes."""
        lad = dims.groupBy(col).agg(F.count("*").alias("t"))
        pre = with_exclusive_prefix(
            lad, col, {"prior": "t"}, bucket_size=bucket_size,
            descending=descending,
        )
        w = Window.partitionBy(col).orderBy("ck")
        return (
            df.join(F.broadcast(pre.select(col, "prior")), col)
            .withColumn(out, F.col("prior") + F.row_number().over(w))
            .drop("prior")
        )

    ranked = rank_by(
        dims, "rec_days", descending=False, bucket_size=7, out="rk_r"
    )
    ranked = rank_by(
        ranked, "freq", descending=True, bucket_size=5, out="rk_f"
    )
    ranked = rank_by(
        ranked, "spend", descending=True, bucket_size=1_000_000, out="rk_m"
    )
    seg = ranked.select(
        F.expr("((rk_r - 1) * 5) div n + 1").alias("r_q"),
        F.expr("((rk_f - 1) * 5) div n + 1").alias("f_q"),
        F.expr("((rk_m - 1) * 5) div n + 1").alias("m_q"),
        "spend",
    )
    return seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("spend").cast("long").alias("spend_cents"),
    )
