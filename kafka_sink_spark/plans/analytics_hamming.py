"""Round-10e binary-quantization ANN wave.

- ``knn_binary_hamming``  sign-binarized ANN (binary quantization, the
  1-bit limit of the scalar-quantization ladder that already includes
  ``embedding_quantize_int8`` and the PQ family): each 64-d embedding
  compresses to a 64-bit sign code — bit d set iff e[d] > 0 — stored as
  two packed 32-bit words, and the top-5 neighbors per query rank by
  Hamming distance (XOR + popcount) with id tie-break.  The code is
  produced by COMPARISONS only (no arithmetic on the floats at all), so
  it is bit-identical across engines by construction — the strongest
  determinism class in the catalog.
- ``knn_binary_recall``  recall@5 of the Hamming shortlist against the
  exact cosine top-5, per query plus a pooled total row — the number
  that decides whether the 32× compression is usable as a first-stage
  filter (rerank survivors with full-precision vectors) or as the
  index itself.

Scale shape: binarization is a zero-shuffle codegen projection (64
float compares per vector); the code table is 24 bytes/row — 32× less
scan and memory than the float vectors, which is the entire point at
100 TB: the Hamming scan streams the packed codes (XOR+popcount are
single instructions JVM-side) and only the ~k survivors ever touch the
full-precision vectors again.  The query side is a broadcast, the
per-query shortlist is a WindowGroupLimit top-k, and the recall join
probes a 50-row broadcast — no all-pairs anything.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's ANN/similarity family.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions import similarity
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_BQ_QUERIES = 10
_BQ_K = 5
_DIM = 64


def _code_spark(off: int) -> str:
    """Packed 32-bit sign word for dims [off, off+31] (1-based)."""
    return (
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT),"
        " (acc, d) -> acc + IF("
        f"element_at(embedding, CAST(d AS INT) + {off}) > 0,"
        " shiftleft(CAST(1 AS BIGINT), CAST(d AS INT)),"
        " CAST(0 AS BIGINT)))"
    )


def _code_duck(off: int) -> str:
    return (
        "CAST(list_sum(list_transform(range(0, 32),"
        f" d -> CASE WHEN embedding[d + {off}] > 0"
        " THEN (1::BIGINT << d) ELSE 0::BIGINT END)) AS BIGINT)"
    )


def _codes(emb):
    """(vec_id, lo, hi) packed sign-code table — 24 bytes/row."""
    return emb.select(
        "vec_id",
        F.expr(_code_spark(1)).alias("lo"),
        F.expr(_code_spark(33)).alias("hi"),
    )


_HAM_SPARK = "CAST(bit_count(qlo ^ lo) + bit_count(qhi ^ hi) AS BIGINT)"


def _hamming_topk(emb, k: int = _BQ_K, n_queries: int = _BQ_QUERIES):
    """Top-k Hamming neighbors for the first ``n_queries`` vec_ids."""
    # two consumers of the code table (query side + corpus side):
    # checkpoint 24 B/row so the float scan + binarization run once
    codes = _codes(emb).localCheckpoint(eager=True)
    q = codes.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    scored = (
        F.broadcast(q)
        .join(codes, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(_HAM_SPARK).alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "rank")
    )


def _hamming_cte() -> str:
    """Shared oracle CTEs: code table + ranked Hamming shortlist."""
    return f"""codes AS (
      SELECT vec_id, {_code_duck(1)} AS lo, {_code_duck(33)} AS hi
      FROM embeddings
    ), hs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi))
                  AS BIGINT) AS hamming
      FROM codes q, codes c
      WHERE q.vec_id < {_BQ_QUERIES} AND q.vec_id <> c.vec_id
    ), hr AS (
      SELECT query_id, neighbor_id, hamming,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY hamming ASC, neighbor_id ASC) AS INTEGER) AS rank
      FROM hs
    )"""


def _binary_hamming_oracle() -> str:
    return f"""
    WITH {_hamming_cte()}
    SELECT query_id, neighbor_id, hamming, rank
    FROM hr WHERE rank <= {_BQ_K}
    """


@register("knn_binary_hamming", oracle=_binary_hamming_oracle())
def knn_binary_hamming(spark, sf_dir):
    """Binary-quantized ANN: 64-bit sign codes (bit d = e[d] > 0, packed
    into two 32-bit words), top-5 per query by Hamming distance with id
    tie-break.  The sign code needs zero arithmetic — 64 comparisons —
    so unlike every dot-product ranking there is no float-summation
    convention to align: both engines binarize bit-identically.

    Scale shape: one zero-shuffle binarization projection (the code
    table is 24 bytes/row — a 32× smaller scan than the float vectors),
    a broadcast query probe over the packed codes (XOR+popcount are
    single-instruction JVM ops inside one codegen span), and a
    per-query WindowGroupLimit top-5.  At 100 TB the code table for
    1 B vectors is 24 GB — partition-scannable where the float table
    is 256 GB — and only shortlist survivors touch full vectors again.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return _hamming_topk(emb)


def _binary_recall_oracle() -> str:
    dot = " + ".join(
        f"qe[{i}]::DOUBLE * ce[{i}]::DOUBLE" for i in range(1, _DIM + 1)
    )
    nq = "sqrt(" + " + ".join(
        f"qe[{i}]::DOUBLE * qe[{i}]::DOUBLE" for i in range(1, _DIM + 1)
    ) + ")"
    nc = "sqrt(" + " + ".join(
        f"ce[{i}]::DOUBLE * ce[{i}]::DOUBLE" for i in range(1, _DIM + 1)
    ) + ")"
    return f"""
    WITH {_hamming_cte()}, ham AS (
      SELECT query_id, neighbor_id FROM hr WHERE rank <= {_BQ_K}
    ), exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(({dot}) / ({nq} * {nc}), 6) DESC,
                          c.vec_id ASC) AS rank
        FROM (SELECT vec_id, embedding AS qe FROM embeddings
              WHERE vec_id < {_BQ_QUERIES}) q(vec_id, qe),
             (SELECT vec_id, embedding AS ce FROM embeddings) c(vec_id, ce)
        WHERE q.vec_id <> c.vec_id
      ) WHERE rank <= {_BQ_K}
    ), per AS (
      SELECT e.query_id,
             CAST(SUM(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits
      FROM exact e LEFT JOIN ham h
        ON h.query_id = e.query_id AND h.neighbor_id = e.neighbor_id
      GROUP BY e.query_id
    ), rows_ AS (
      SELECT query_id, hits,
             CAST(hits * 1000000 // {_BQ_K} AS BIGINT) AS recall_ppm
      FROM per
    )
    SELECT * FROM rows_
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(SUM(hits) AS BIGINT),
           CAST(SUM(hits) * 1000000 // {_BQ_QUERIES * _BQ_K} AS BIGINT)
    FROM rows_
    """


@register("knn_binary_recall", oracle=_binary_recall_oracle())
def knn_binary_recall(spark, sf_dir):
    """Recall@5 of the binary-quantized Hamming shortlist against the
    exact cosine top-5, per query plus the pooled total (query_id −1) —
    the acceptance number for using 1-bit codes as the first-stage
    index: high recall means the 32× cheaper scan loses almost nothing
    before the full-precision rerank.

    Scale shape: the Hamming side is the ``knn_binary_hamming`` plan;
    the exact side is the sanctioned broadcast-query brute-force scan;
    the comparison joins two ≤ q·k-row shortlists (both broadcast) and
    aggregates on the q-row query grid.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.where(F.col("vec_id") < _BQ_QUERIES)
    exact = similarity.knn_bruteforce(emb, queries, k=_BQ_K).select(
        "query_id", "neighbor_id"
    )
    ham = _hamming_topk(emb).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    per = (
        exact.join(F.broadcast(ham), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("hits"))
    )
    rows = per.select(
        "query_id",
        "hits",
        F.expr(f"CAST(hits * 1000000 div {_BQ_K} AS BIGINT)").alias(
            "recall_ppm"
        ),
    )
    total = rows.agg(
        F.lit(-1).cast("long").alias("query_id"),
        F.sum("hits").cast("long").alias("hits"),
        F.expr(
            f"CAST(SUM(hits) * 1000000 div {_BQ_QUERIES * _BQ_K} AS BIGINT)"
        ).alias("recall_ppm"),
    )
    return rows.unionByName(total)
