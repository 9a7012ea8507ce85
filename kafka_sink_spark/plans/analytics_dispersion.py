"""Round-8f dispersion / coverage / truncation wave.

- ``events_fano_factor``  per-type Fano factor of hourly event counts
  (variance-to-mean over the global hour span, zero buckets included):
  F ≈ 1e6 ppm is Poisson arrivals, higher is bursty, lower is
  regular — the count-dispersion companion to the per-user
  interarrival CV.
- ``docs_oov_rate``  out-of-vocabulary rate per source: tokens of the
  ODD (eval) document half whose type never appears in the EVEN
  (train) half's vocabulary — token and type OOV shares in ppm, the
  split-half generalization check for any frequency-derived vocab
  (the companion to corpus_kendall_tau's rank-stability view).
- ``embedding_prefix_dim_recall``  Matryoshka-style dimension
  truncation: top-5 cosine retrieval using only the FIRST 16 of 64
  dimensions, scored against the full-dimension top-5 — per-query
  overlap and recall ppm.  The "how much cheaper can the index be"
  number for prefix-truncatable embeddings.

Determinism per the package convention: integers end-to-end,
rounded-6 cosines with id tie-breaks, truncating division.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's probe/evaluation families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Fano factor of hourly counts
# --------------------------------------------------------------------------

_FANO_ORACLE = """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hr
    ), span AS (
      SELECT CAST(datediff('hour', MIN(date_trunc('hour', ts)),
                           MAX(date_trunc('hour', ts))) + 1 AS BIGINT) AS n
      FROM events
    ), agg AS (
      SELECT event_type, SUM(c) AS s, SUM(c * c) AS s2,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM h GROUP BY event_type
    )
    SELECT agg.event_type, span.n AS n_hours, agg.n_active,
           CAST(agg.s AS BIGINT) AS n_events,
           CAST((span.n * agg.s2 - agg.s * agg.s) * 1000000
                // (span.n * agg.s) AS BIGINT) AS fano_ppm
    FROM agg, span
    """


@register("events_fano_factor", oracle=_FANO_ORACLE)
def events_fano_factor(spark, sf_dir):
    """Fano factor (variance-to-mean ratio, Fano 1947) of hourly event
    counts per type, over the GLOBAL hour span with zero hours included:
    F = (n·Σc² − S²) div (n·S) in ppm — exactly 1e6 for Poisson
    arrivals, above for bursty clumping, below for pacing.  The
    count-dispersion twin of orders_interarrival_cv's gap view; the two
    disagree exactly when burstiness lives between the chosen bucket
    scales.

    Scale shape: one partial-combined (type, hour) rollup (bounded by
    |types|·span), a single-row span broadcast, and a |types|-row
    moment aggregate — cross-multiplied, no float mean.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    h = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").cast("long").alias("c"))
    span = events.agg(
        (
            (
                F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
            )
            / 3600
            + 1
        )
        .cast("long")
        .alias("n")
    )
    agg = h.groupBy("event_type").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.count("*").cast("long").alias("n_active"),
    )
    return agg.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.col("n").alias("n_hours"),
        "n_active",
        F.col("s").cast("long").alias("n_events"),
        F.expr(
            "CAST((n * s2 - s * s) * 1000000 div (n * s) AS BIGINT)"
        ).alias("fano_ppm"),
    )


# --------------------------------------------------------------------------
# Out-of-vocabulary rate per source
# --------------------------------------------------------------------------

_OOV_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    vocab AS (SELECT DISTINCT term FROM toks WHERE doc_id % 2 = 0),
    ev AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE doc_id % 2 = 1 GROUP BY source, term
    ), j AS (
      SELECT ev.source, ev.term, ev.c,
             CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM ev LEFT JOIN vocab ON vocab.term = ev.term
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(oov * c) AS BIGINT) AS n_oov_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(oov) AS BIGINT) AS n_oov_types,
           CAST(SUM(oov * c) * 1000000 // SUM(c) AS BIGINT)
             AS oov_token_ppm,
           CAST(SUM(oov) * 1000000 // COUNT(*) AS BIGINT) AS oov_type_ppm
    FROM j GROUP BY source
    """


@register("docs_oov_rate", oracle=_OOV_ORACLE)
def docs_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per source: the ODD document half is
    scored against the EVEN half's vocabulary — token-level and
    type-level OOV shares in ppm.  The split-half generalization test
    for any corpus-derived vocabulary: a source with high OOV under
    its own sibling half will be murder on a frozen tokenizer.

    Scale shape: one tokenize+count pass per half (partial-combined on
    (source, term)); the vocabulary membership check is a term-keyed
    left join (vocab types ≪ token instances); the rollup is
    |sources|-bounded.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(text_ops.tokens(F.col("text"))).alias("term"),
    )
    vocab = (
        toks.where(F.col("doc_id") % 2 == 0).select("term").distinct()
        .withColumn("_in_vocab", F.lit(1))
    )
    ev = (
        toks.where(F.col("doc_id") % 2 == 1)
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    j = ev.join(vocab.hint("shuffle_hash"), "term", "left").select(
        "source",
        "c",
        F.when(F.col("_in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    return j.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("oov") * F.col("c")).cast("long").alias("n_oov_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum("oov").cast("long").alias("n_oov_types"),
        F.expr("CAST(SUM(oov * c) * 1000000 div SUM(c) AS BIGINT)").alias(
            "oov_token_ppm"
        ),
        F.expr("CAST(SUM(oov) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "oov_type_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Matryoshka prefix-dimension recall
# --------------------------------------------------------------------------

_PD_K = 5
_PD_QUERIES = 100
_PD_PREFIX = 16


def _prefix_recall_oracle(
    k: int = _PD_K, nq: int = _PD_QUERIES, dim: int = 64, pdim: int = _PD_PREFIX
) -> str:
    from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql

    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {nq}
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings
    ), full_r AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               round(({_dot_sql('qe', 'ce', dim)})
                     / ({_norm_sql('qe', dim)} * {_norm_sql('ce', dim)}), 6)
               DESC, neighbor_id) AS rk
      FROM q, c WHERE query_id <> neighbor_id
    ), pref_r AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY
               round(({_dot_sql('qe', 'ce', pdim)})
                     / ({_norm_sql('qe', pdim)} * {_norm_sql('ce', pdim)}), 6)
               DESC, neighbor_id) AS rk
      FROM q, c WHERE query_id <> neighbor_id
    )
    SELECT f.query_id,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(p.neighbor_id) * 1000000 // {k} AS BIGINT)
             AS recall_ppm
    FROM full_r f LEFT JOIN pref_r p
      ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
         AND p.rk <= {k}
    WHERE f.rk <= {k}
    GROUP BY f.query_id
    """


@register("embedding_prefix_dim_recall", oracle=_prefix_recall_oracle())
def embedding_prefix_dim_recall(spark, sf_dir):
    """Matryoshka-style truncation test: top-{k} cosine retrieval using
    only the FIRST {p} of 64 dimensions, scored against the
    full-dimension top-{k} — per-query overlap count and recall in ppm.
    High prefix recall means the index can store {p}/64 of the bytes
    and rerank the shortlist at full precision; low recall means these
    embeddings do not truncate (train with a prefix objective or keep
    full width).

    Scale shape: two broadcast-panel scans (the certified
    knn_bruteforce shape — per-query WindowGroupLimit, no all-pairs
    stage), joined on the {q}×{k}-bounded result tables.
    """
    from kafka_sink_spark.extensions import similarity

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < _PD_QUERIES)
    full = similarity.knn_bruteforce(emb, queries, k=_PD_K)
    pemb = emb.select("vec_id", F.slice("embedding", 1, _PD_PREFIX).alias("pe"))
    pq = pemb.filter(F.col("vec_id") < _PD_QUERIES)
    pref = similarity.knn_bruteforce(pemb, pq, k=_PD_K, vec_col="pe")
    hit = pref.select(
        "query_id", F.col("neighbor_id").alias("p_neighbor"), F.lit(1).alias("_hit")
    )
    return (
        full.join(
            hit,
            (full.query_id == hit.query_id)
            & (full.neighbor_id == hit.p_neighbor),
            "left",
        )
        .drop(hit.query_id)
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_overlap"))
        .select(
            "query_id",
            "n_overlap",
            F.expr(f"CAST(n_overlap * 1000000 div {_PD_K} AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
    )


embedding_prefix_dim_recall.__doc__ = embedding_prefix_dim_recall.__doc__.format(
    k=_PD_K, p=_PD_PREFIX, q=_PD_QUERIES
)
