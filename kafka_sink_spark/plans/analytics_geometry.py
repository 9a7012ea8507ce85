"""Round-8k embedding-geometry wave.

- ``embedding_participation_ratio``  effective dimensionality of the
  embedding cloud per label and globally: the participation ratio
  PR = (Σ_d var_d)² / Σ_d var_d² over the 64 per-dimension variances
  (Gao et al. 2017's neural-dimensionality statistic) — PR≈D means
  isotropic use of the space, PR≪D means a few dominant axes (an
  anisotropy alarm for cosine retrieval quality).
- ``embedding_knn_hubness``  k-occurrence (in-degree) histogram of
  the LSH-bucketed kNN graph (Radovanović et al. 2010): how often
  each vector appears in other vectors' top-5 — a heavy hub tail
  degrades ANN retrieval diversity, orphans (in-degree 0) are
  unreachable from any neighbor list.
- ``embedding_relative_contrast``  distance-concentration audit
  (Beyer et al. 1999): per fixed query, mean over min squared L2
  distance to the corpus — RC → 1 means neighbors stop being
  meaningfully "nearer" than the bulk, the curse-of-dimensionality
  number behind every ANN recall target.

Determinism per the package convention: components milli-quantized
(FLOOR(x·1000), the power-iteration discipline), integer/decimal
arithmetic end-to-end, truncating division; the hubness graph rides
the certified sign-random-projection buckets and rounded-cosine
ranking of ``knn_lsh``.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's ANN/embedding-QA families.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions import similarity
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_DIM = 64

# --------------------------------------------------------------------------
# Participation ratio (effective dimensionality)
# --------------------------------------------------------------------------


def _milli_sql(i: int, one_based: bool) -> str:
    idx = i + 1 if one_based else i
    return f"CAST(FLOOR(CAST(embedding[{idx}] AS DOUBLE) * 1000) AS BIGINT)"


def _pr_oracle(dim: int = _DIM) -> str:
    sums = ",\n             ".join(
        f"SUM({_milli_sql(i, True)}) AS s{i},"
        f" SUM({_milli_sql(i, True)} * {_milli_sql(i, True)}) AS q{i}"
        for i in range(dim)
    )
    gsums = ", ".join(f"SUM(s{i}) AS s{i}, SUM(q{i}) AS q{i}" for i in range(dim))
    vlist = ", ".join(f"n * q{i} - s{i} * s{i}" for i in range(dim))
    return f"""
    WITH lab AS (
      SELECT CAST(label AS VARCHAR) AS label_key,
             CAST(COUNT(*) AS BIGINT) AS n,
             {sums}
      FROM embeddings GROUP BY label
    ), u AS (
      SELECT * FROM lab
      UNION ALL
      SELECT '*' AS label_key, CAST(SUM(n) AS BIGINT) AS n, {gsums} FROM lab
    ), ve AS (
      SELECT label_key, n, i.i AS dim, vs[i.i + 1] AS v
      FROM (SELECT label_key, n, [{vlist}] AS vs FROM u) vl,
           (SELECT unnest(range({dim})) AS i) i
    ), agg AS (
      SELECT label_key, CAST(MAX(n) AS BIGINT) AS n_vecs,
             CAST(SUM(v) AS BIGINT) AS total_var,
             SUM(CAST(v AS HUGEINT) * v) AS ssq,
             MAX(lpad(CAST(v AS VARCHAR), 19, '0')
                 || lpad(CAST(963 - dim AS VARCHAR), 3, '0')) AS mk
      FROM ve GROUP BY label_key
    )
    SELECT label_key, n_vecs, total_var,
           CAST(CASE WHEN ssq > 0
                     THEN (CAST(total_var AS HUGEINT) * total_var * 1000) // ssq
                     ELSE 0 END AS BIGINT) AS pr_milli,
           CAST(963 - CAST(substr(mk, 20, 3) AS BIGINT) AS BIGINT) AS top_dim,
           CAST(CASE WHEN total_var > 0
                     THEN (CAST(substr(mk, 1, 19) AS HUGEINT) * 1000000)
                          // total_var
                     ELSE 0 END AS BIGINT) AS top_share_ppm
    FROM agg
    """


@register("embedding_participation_ratio", oracle=_pr_oracle())
def embedding_participation_ratio(spark, sf_dir):
    """Participation ratio (effective dimensionality) of the embedding
    cloud, per label and for the whole corpus ('*'): with v_d the exact
    integer variance numerator n·Σx_d² − (Σx_d)² over milli-quantized
    components, PR·1000 = (Σ_d v_d)²·1000 div Σ_d v_d² — the n factors
    cancel, so the statistic is exact integers end-to-end (DECIMAL(38)
    for the squares).  Also reports the dominant dimension (argmax v_d,
    ties to the lowest dim via the sortable count||dim encoding) and
    its share of total variance in ppm.

    Scale shape: ONE scan into a per-label partial-combined rollup of
    129 sums (n, 64 Σx, 64 Σx²); the global row derives from the label
    rows (no second scan); everything after lives on the
    |labels|×64-bounded grid.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    aggs = [F.count("*").cast("long").alias("n")]
    for i in range(_DIM):
        m = _milli_sql(i, False)
        aggs.append(F.expr(f"SUM({m})").alias(f"s{i}"))
        aggs.append(F.expr(f"SUM({m} * {m})").alias(f"q{i}"))
    lab = emb.groupBy(
        F.col("label").cast("string").alias("label_key")
    ).agg(*aggs)
    gcols = [F.sum("n").alias("n")] + [
        F.sum(c).alias(c)
        for i in range(_DIM)
        for c in (f"s{i}", f"q{i}")
    ]
    glob = lab.agg(*gcols).select(F.lit("*").alias("label_key"), "*")
    u = lab.unionByName(glob.select(lab.columns))
    vl = u.select(
        "label_key",
        "n",
        F.array(
            *[F.expr(f"n * q{i} - s{i} * s{i}") for i in range(_DIM)]
        ).alias("vs"),
    )
    ve = vl.select("label_key", "n", F.posexplode("vs")).toDF(
        "label_key", "n", "dim", "v"
    )
    agg = ve.groupBy("label_key").agg(
        F.max("n").cast("long").alias("n_vecs"),
        F.sum("v").cast("long").alias("total_var"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("ssq"),
        F.max(
            F.concat(
                F.lpad(F.col("v").cast("string"), 19, "0"),
                F.lpad((F.lit(963) - F.col("dim")).cast("string"), 3, "0"),
            )
        ).alias("mk"),
    )
    return agg.select(
        "label_key",
        "n_vecs",
        "total_var",
        F.expr(
            "CAST(CASE WHEN ssq > 0 THEN"
            " (CAST(total_var AS DECIMAL(38,0)) * total_var * 1000) div ssq"
            " ELSE 0 END AS BIGINT)"
        ).alias("pr_milli"),
        F.expr("CAST(963 - CAST(substr(mk, 20, 3) AS BIGINT) AS BIGINT)").alias(
            "top_dim"
        ),
        F.expr(
            "CAST(CASE WHEN total_var > 0 THEN"
            " (CAST(substr(mk, 1, 19) AS DECIMAL(38,0)) * 1000000)"
            " div total_var ELSE 0 END AS BIGINT)"
        ).alias("top_share_ppm"),
    )


# --------------------------------------------------------------------------
# kNN hubness (k-occurrence histogram of the LSH graph)
# --------------------------------------------------------------------------

_HUB_K = 5
_HUB_PLANES = 8


def _hub_oracle(k: int = _HUB_K, n_planes: int = _HUB_PLANES, dim: int = _DIM) -> str:
    from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql

    planes = similarity.hyperplanes(dim, n_planes)

    def bucket_expr(col: str) -> str:
        terms = []
        for p_idx, plane in enumerate(planes):
            d = " + ".join(
                f"{col}[{i+1}]::DOUBLE * ({plane[i]!r})" for i in range(dim)
            )
            terms.append(f"(CASE WHEN ({d}) > 0 THEN {2**p_idx} ELSE 0 END)")
        return "\n           + ".join(terms)

    return f"""
    WITH b AS (
      SELECT vec_id, embedding, CAST({bucket_expr('embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ), s AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(({_dot_sql('q.embedding', 'c.embedding', dim)})
                   / ({_norm_sql('q.embedding', dim)}
                      * {_norm_sql('c.embedding', dim)}), 6) AS cos_sim
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ), r AS (
      SELECT neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM s
    ), ind AS (
      SELECT e.vec_id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS in_degree
      FROM embeddings e LEFT JOIN (
        SELECT neighbor_id, COUNT(*) AS deg FROM r WHERE rank <= {k}
        GROUP BY neighbor_id
      ) d ON d.neighbor_id = e.vec_id
    ), h AS (
      SELECT in_degree, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM ind GROUP BY in_degree
    ), t AS (SELECT SUM(n_vecs) AS tn FROM h)
    SELECT h.in_degree, h.n_vecs,
           CAST(h.n_vecs * 1000000 // t.tn AS BIGINT) AS share_ppm
    FROM h, t
    """


@register("embedding_knn_hubness", oracle=_hub_oracle())
def embedding_knn_hubness(spark, sf_dir):
    """k-occurrence (hubness) histogram of the production ANN graph:
    every vector queries its sign-random-projection bucket for its
    top-5 rounded-cosine neighbors (the certified ``knn_lsh``
    derivation, here with NO broadcast — the bucket is the shuffle
    key, so the full-corpus graph build is the scale path), then the
    in-degree of each vector in that graph is histogrammed.  A long
    hub tail (Radovanović et al. 2010) concentrates retrievals onto a
    few vectors; the in-degree-0 row counts orphans no neighbor list
    can reach.

    Scale shape: one scan into bucketed projections, an equi-join on
    the bucket key (candidates Σ|bucket|², never |corpus|²), a
    WindowGroupLimit top-k per query, then bounded in-degree rollups;
    the total for shares derives from the histogram itself.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    planes = similarity.hyperplanes(_DIM, _HUB_PLANES)
    base = emb.select(
        "vec_id", similarity.as_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", similarity.lsh_bucket(F.col("v"), planes))
    q = base.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("bucket").alias("cbucket"),
    )
    scored = q.join(
        c,
        (F.col("bucket") == F.col("cbucket"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(similarity.cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    graph = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HUB_K)
        .select("neighbor_id")
    )
    deg = graph.groupBy("neighbor_id").agg(F.count("*").alias("deg"))
    ind = (
        emb.select("vec_id")
        .join(deg, F.col("vec_id") == F.col("neighbor_id"), "left")
        .select(F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("in_degree"))
    )
    h = ind.groupBy("in_degree").agg(F.count("*").cast("long").alias("n_vecs"))
    t = h.agg(F.sum("n_vecs").alias("tn"))
    return h.crossJoin(F.broadcast(t)).select(
        "in_degree",
        "n_vecs",
        F.expr("CAST(n_vecs * 1000000 div tn AS BIGINT)").alias("share_ppm"),
    )


# --------------------------------------------------------------------------
# Relative contrast (distance concentration)
# --------------------------------------------------------------------------

_RC_QUERIES = 64  # fixed panel, SF-independent (like knn_bruteforce's 10)


def _rc_oracle(n_queries: int = _RC_QUERIES, dim: int = _DIM) -> str:
    def mq(i: int) -> str:
        return (
            f"CAST(FLOOR(CAST(q.embedding[{i+1}] AS DOUBLE) * 1000) AS BIGINT)"
        )

    def mc(i: int) -> str:
        return (
            f"CAST(FLOOR(CAST(c.embedding[{i+1}] AS DOUBLE) * 1000) AS BIGINT)"
        )

    d2 = "\n             + ".join(
        f"({mq(i)} - {mc(i)}) * ({mq(i)} - {mc(i)})" for i in range(dim)
    )
    return f"""
    WITH s AS (
      SELECT q.vec_id AS query_id, ({d2}) AS d2
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {n_queries}
    ), a AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_others,
             CAST(MIN(d2) AS BIGINT) AS min_d2,
             CAST(SUM(d2) // COUNT(*) AS BIGINT) AS mean_d2,
             CAST(CASE WHEN MIN(d2) > 0
                       THEN (CAST(SUM(d2) AS HUGEINT) * 1000000)
                            // (COUNT(*) * MIN(d2)) END AS BIGINT) AS rc_ppm
      FROM s GROUP BY query_id
    )
    SELECT a.query_id, CAST(e.label AS INTEGER) AS label,
           a.n_others, a.min_d2, a.mean_d2, a.rc_ppm
    FROM a JOIN embeddings e ON e.vec_id = a.query_id
    """


@register("embedding_relative_contrast", oracle=_rc_oracle())
def embedding_relative_contrast(spark, sf_dir):
    """Squared-L2 relative contrast (Beyer et al. 1999) for a fixed
    64-query panel: mean over min squared distance to the rest of the
    corpus, in ppm — exact integers on milli-quantized components, so
    the concentration number is bit-identical cross-engine.  RC near
    1e6 means the nearest neighbor is barely nearer than the average
    point (distance concentration — ANN recall targets become
    unstable); rc_ppm is NULL for a query with an exact milli-duplicate
    (min d² = 0).

    Scale shape: the bounded query panel broadcasts against one corpus
    scan (the same |q|×|corpus| discipline as ``knn_bruteforce``); the
    per-query rollup partial-combines map-side.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    milli = (
        "transform(embedding, x ->"
        " CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    q = emb.where(F.col("vec_id") < _RC_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").cast("int").alias("label"),
        F.expr(milli).alias("qm"),
    )
    c = emb.select(F.col("vec_id").alias("nid"), F.expr(milli).alias("cm"))
    s = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            "label",
            F.expr(
                "aggregate(zip_with(qm, cm, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("d2"),
        )
    )
    return s.groupBy("query_id", "label").agg(
        F.count("*").cast("long").alias("n_others"),
        F.min("d2").cast("long").alias("min_d2"),
        F.expr("CAST(SUM(d2) div COUNT(*) AS BIGINT)").alias("mean_d2"),
        F.expr(
            "CAST(CASE WHEN MIN(d2) > 0 THEN"
            " (CAST(SUM(d2) AS DECIMAL(38,0)) * 1000000)"
            " div (COUNT(*) * MIN(d2)) END AS BIGINT)"
        ).alias("rc_ppm"),
    ).select("query_id", "label", "n_others", "min_d2", "mean_d2", "rc_ppm")
