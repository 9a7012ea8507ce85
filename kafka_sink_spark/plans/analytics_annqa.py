"""Round-9d ANN-QA wave — index-health readouts over the certified
similarity primitives.

- ``knn_distance_margin``  per-query nearest-neighbor confidence margin:
  d²₁/d²₅ over the EXACT fixed-point squared-L2 top-5 — margin → 0 means
  the nearest neighbor is unambiguous, margin → 1e6 means the whole
  shortlist is equidistant (retrieval by coin flip).  The per-query twin
  of the corpus-level relative-contrast number.
- ``embedding_ivf_balance``  IVF cell-occupancy audit over the certified
  coarse-quantizer assignment: per cell its population, corpus share,
  and load factor vs perfect balance — the index-health statistic that
  predicts probe-cost variance (one hot cell = one hot partition at
  serve time).
- ``knn_recall_vs_planes``  LSH tuning curve: recall of the bucketed
  top-5 against the exact cosine top-5 at 4 vs 8 hyperplanes — fewer
  planes → bigger buckets → higher recall at higher candidate cost, the
  knob every sign-random-projection deployment has to pick.

Determinism per the package convention: exact fixed-point micro
components for every distance (no float folds cross aggregation), 6 dp
rounded cosines before ranking, ties to the lower id, integer ppm
ratios.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's ANN/embedding-QA family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.extensions import similarity
from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_DIM = 64

# --------------------------------------------------------------------------
# Nearest-neighbor distance margin (exact fixed point)
# --------------------------------------------------------------------------

_MARGIN_QUERIES = 32
_MARGIN_K = 5


def _margin_oracle() -> str:
    return f"""
    WITH comp AS (
      SELECT vec_id AS vid, CAST(i AS INTEGER) AS comp,
             CAST(round(embedding[i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS x
      FROM embeddings, unnest(range({_DIM})) AS u(i)
    ), pd AS (
      SELECT q.vid AS query_id, v.vid AS neighbor_id,
             SUM((q.x - v.x) * (q.x - v.x)) AS dfix
      FROM comp q JOIN comp v ON v.comp = q.comp AND v.vid <> q.vid
      WHERE q.vid < {_MARGIN_QUERIES}
      GROUP BY 1, 2
    ), r AS (
      SELECT query_id, neighbor_id, dfix,
             row_number() OVER (
               PARTITION BY query_id ORDER BY dfix, neighbor_id) AS rank
      FROM pd
    )
    SELECT query_id,
           CAST(MAX(CASE WHEN rank = 1 THEN neighbor_id END) AS BIGINT) AS nn_id,
           CAST(MAX(CASE WHEN rank = 1 THEN dfix END) AS BIGINT) AS d1_fix,
           CAST(MAX(CASE WHEN rank = {_MARGIN_K} THEN dfix END) AS BIGINT)
             AS dk_fix,
           CAST(MAX(CASE WHEN rank = 1 THEN dfix END) * 1000000
                // GREATEST(MAX(CASE WHEN rank = {_MARGIN_K} THEN dfix END), 1)
             AS BIGINT) AS margin_ppm
    FROM r WHERE rank <= {_MARGIN_K}
    GROUP BY query_id
    """


@register("knn_distance_margin", oracle=_margin_oracle())
def knn_distance_margin(spark, sf_dir):
    """Retrieval-confidence margin per query: over the exact fixed-point
    squared-L2 top-{k} (a {q}-query panel), the ratio d²₁·1e6 div d²₅ —
    low means the winner is well separated from the shortlist tail, near
    1e6 means rank order is noise.  Exact integers end-to-end (micro
    components, integer distance sums), so the margin profile is
    bit-deterministic.

    Scale shape: the panel's component table ({q}×{d} rows) is broadcast
    against the corpus components — one linear scan, one partial-combined
    (query, neighbor) distance sum, a query-keyed WindowGroupLimit top-k,
    then a {q}-row conditional-aggregation readout.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    topk = similarity.knn_exact_fixed(
        emb, k=_MARGIN_K, n_queries=_MARGIN_QUERIES, dim=_DIM
    )
    return topk.groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("neighbor_id")))
        .cast("long")
        .alias("nn_id"),
        F.max(F.when(F.col("rank") == 1, F.col("dfix"))).cast("long").alias(
            "d1_fix"
        ),
        F.max(F.when(F.col("rank") == _MARGIN_K, F.col("dfix")))
        .cast("long")
        .alias("dk_fix"),
        F.expr(
            f"CAST(MAX(CASE WHEN rank = 1 THEN dfix END) * 1000000"
            f" div GREATEST(MAX(CASE WHEN rank = {_MARGIN_K} THEN dfix END),"
            f" 1) AS BIGINT)"
        ).alias("margin_ppm"),
    )


knn_distance_margin.__doc__ = knn_distance_margin.__doc__.format(
    k=_MARGIN_K, q=_MARGIN_QUERIES, d=_DIM
)

# --------------------------------------------------------------------------
# IVF cell balance
# --------------------------------------------------------------------------

_IVF_CELLS = 8


def _ivf_balance_oracle() -> str:
    dot = _dot_sql("v.embedding", "c.embedding", _DIM)
    nv = _norm_sql("v.embedding", _DIM)
    nc = _norm_sql("c.embedding", _DIM)
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {_IVF_CELLS}
    ), scored AS (
      SELECT v.vec_id AS vid, c.cid,
             round(({dot}) / ({nv} * {nc}), 6) AS cs
      FROM embeddings v, cent c
    ), assign AS (
      SELECT vid, cid FROM (
        SELECT vid, cid,
               row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid ASC)
                 AS rn
        FROM scored) WHERE rn = 1
    ), occ AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM assign GROUP BY cid
    ), tot AS (SELECT SUM(n_vecs) AS t FROM occ)
    SELECT CAST(cid AS BIGINT) AS cell,
           n_vecs,
           CAST(n_vecs * 1000000 // tot.t AS BIGINT) AS share_ppm,
           CAST(n_vecs * {_IVF_CELLS} * 1000000 // tot.t AS BIGINT)
             AS load_factor_ppm
    FROM occ, tot
    """


@register("embedding_ivf_balance", oracle=_ivf_balance_oracle())
def embedding_ivf_balance(spark, sf_dir):
    """IVF cell-occupancy audit over the certified coarse-quantizer
    assignment (rank-1 rounded-cosine centroid per vector): per cell its
    population, corpus share in ppm, and the load factor
    n·cells·1e6 div total (1e6 = perfectly balanced) — the skew number
    that predicts per-probe cost variance and flags a degenerate
    quantizer before the index ships.

    Scale shape: one corpus scan against the broadcast centroid set, a
    per-vector WindowGroupLimit argmax, then a |cells|-row rollup with a
    1-row broadcast total.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    assign = similarity.ivf_scored(emb, n_centroids=_IVF_CELLS).filter(
        F.col("crank") == 1
    )
    occ = assign.groupBy(F.col("cid").alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    tot = occ.agg(F.sum("n_vecs").alias("t"))
    return occ.crossJoin(F.broadcast(tot)).select(
        F.col("cell").cast("long").alias("cell"),
        "n_vecs",
        F.expr("CAST(n_vecs * 1000000 div t AS BIGINT)").alias("share_ppm"),
        F.expr(
            f"CAST(n_vecs * {_IVF_CELLS} * 1000000 div t AS BIGINT)"
        ).alias("load_factor_ppm"),
    )


# --------------------------------------------------------------------------
# LSH recall vs hyperplane count
# --------------------------------------------------------------------------

_RECALL_QUERIES = 10
_RECALL_K = 5
_RECALL_PLANES = (4, 8)


def _lsh_bucket_sql(col: str, n_planes: int) -> str:
    planes = similarity.hyperplanes(_DIM, n_planes)
    terms = []
    for p_idx, plane in enumerate(planes):
        dot = " + ".join(
            f"{col}[{i + 1}]::DOUBLE * ({plane[i]!r})" for i in range(_DIM)
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {2 ** p_idx} ELSE 0 END)")
    return " + ".join(terms)


def _recall_oracle() -> str:
    dot = _dot_sql("q.qe", "c.ce", _DIM)
    nq = _norm_sql("q.qe", _DIM)
    nc = _norm_sql("c.ce", _DIM)
    per_planes = []
    for np_ in _RECALL_PLANES:
        per_planes.append(
            f"""
    SELECT CAST({np_} AS BIGINT) AS n_planes,
           CAST({_RECALL_QUERIES} AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS hits,
           CAST(COUNT(*) * 1000000 // {_RECALL_QUERIES * _RECALL_K} AS BIGINT)
             AS recall_ppm
    FROM (
      SELECT l.query_id, l.neighbor_id FROM (
        SELECT query_id, neighbor_id FROM (
          SELECT b.query_id, b.neighbor_id,
                 row_number() OVER (
                   PARTITION BY b.query_id
                   ORDER BY b.cos_sim DESC, b.neighbor_id ASC) AS rank
          FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(({_dot_sql('q.embedding', 'c.embedding', _DIM)})
                         / ({_norm_sql('q.embedding', _DIM)}
                            * {_norm_sql('c.embedding', _DIM)}), 6) AS cos_sim
            FROM embeddings q JOIN embeddings c
              ON ({_lsh_bucket_sql('q.embedding', np_)})
                 = ({_lsh_bucket_sql('c.embedding', np_)})
                 AND q.vec_id <> c.vec_id
            WHERE q.vec_id < {_RECALL_QUERIES}
          ) b
        ) WHERE rank <= {_RECALL_K}
      ) l
      JOIN (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(({dot}) / ({nq} * {nc}), 6) DESC,
                            c.vec_id ASC) AS rank
          FROM (SELECT vec_id, embedding AS qe FROM embeddings
                WHERE vec_id < {_RECALL_QUERIES}) q(vec_id, qe),
               (SELECT vec_id, embedding AS ce FROM embeddings) c(vec_id, ce)
          WHERE q.vec_id <> c.vec_id
        ) WHERE rank <= {_RECALL_K}
      ) e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    )"""
        )
    return "\nUNION ALL\n".join(per_planes)


@register("knn_recall_vs_planes", oracle=_recall_oracle())
def knn_recall_vs_planes(spark, sf_dir):
    """LSH tuning curve: recall@5 of the sign-random-projection index
    against the exact cosine top-5 at 4 vs 8 hyperplanes — halving the
    planes quadruples expected bucket size (candidate cost) and buys
    recall; this two-point curve is the measured version of that
    trade-off, the number that picks the production plane count.

    Scale shape: per plane count one bucket-equi-join (candidates are
    bucket-local, never all pairs), per-query WindowGroupLimit top-5,
    and an equi-join against the exact shortlist (10×5 rows, broadcast);
    the output is the 2-row curve.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    exact = F.broadcast(
        similarity.knn_bruteforce(emb, queries, k=_RECALL_K).select(
            "query_id", "neighbor_id"
        )
    )
    curves = []
    for np_ in _RECALL_PLANES:
        lsh = similarity.knn_lsh(
            emb, queries, k=_RECALL_K, n_planes=np_, dim=_DIM
        ).select("query_id", "neighbor_id")
        hits = lsh.join(exact, ["query_id", "neighbor_id"])
        curves.append(
            hits.agg(
                F.lit(np_).cast("long").alias("n_planes"),
                F.lit(_RECALL_QUERIES).cast("long").alias("n_queries"),
                F.count(F.lit(1)).cast("long").alias("hits"),
                F.expr(
                    f"CAST(COUNT(1) * 1000000"
                    f" div {_RECALL_QUERIES * _RECALL_K} AS BIGINT)"
                ).alias("recall_ppm"),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out
