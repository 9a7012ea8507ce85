"""Round-6h wave: hybrid retrieval fusion, interval-stabbing backlog, and
seasonal anomaly baselines.

- ``knn_rank_fusion``  Reciprocal Rank Fusion (Cormack et al. 2009,
  public) of two retrieval rankings per query — exact cosine order and
  exact squared-L2 order (genuinely different on unnormalized vectors) —
  with the RRF score in exact integers: Σ 1e6 div (60 + rank).  This is
  the hybrid-search combiner every retrieval stack runs over its dense +
  sparse (or multi-metric) candidate lists.
- ``orders_open_backlog``  the open-orders-per-day curve via interval
  stabbing: each order contributes +1 at o_orderdate and −1 the day after
  its last l_shipdate; the running sum of day deltas is the backlog.
  The running sum is the same TWO-PHASE distributed prefix sum proven by
  corpus_vocab_growth — no global single-partition sort of the calendar.
- ``events_anomaly_seasonal``  3-sigma outliers against a SEASONAL
  baseline — the (event_type, hour-of-day) cell — using the all-integer
  z-score identity from events_value_outliers: (n·x − S)² > 9·(n·Q − S²).
  An event that is normal globally but anomalous at 3am is exactly what
  the global 3-sigma flag misses.

Determinism per the package convention: integers end-to-end; the only
floats are rounded 6-dp divisions of exact integers computed in identical
order in both engines.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions.similarity import as_double, cosine
from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Reciprocal Rank Fusion over cosine + squared-L2 rankings
# --------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant
_RRF_TOPK = 5
_RRF_QUERIES = 10
_RRF_DIM = 64


def _dist2_sql(a: str, b: str, dim: int) -> str:
    """Exact integer squared L2 distance between milli-quantized vectors."""
    terms = []
    for i in range(dim):
        qa = f"CAST(FLOOR(CAST({a}[{i + 1}] AS DOUBLE) * 1000.0) AS BIGINT)"
        qb = f"CAST(FLOOR(CAST({b}[{i + 1}] AS DOUBLE) * 1000.0) AS BIGINT)"
        terms.append(f"(({qa}) - ({qb})) * (({qa}) - ({qb}))")
    return " + ".join(terms)


_RRF_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {_RRF_QUERIES}
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings
    ), s AS (
      SELECT query_id, neighbor_id,
             round(({_dot_sql('qe', 'ce', _RRF_DIM)})
                   / ({_norm_sql('qe', _RRF_DIM)} * {_norm_sql('ce', _RRF_DIM)}),
                   6) AS cos_sim,
             CAST({_dist2_sql('qe', 'ce', _RRF_DIM)} AS BIGINT) AS dist2
      FROM q, c WHERE query_id <> neighbor_id
    ), r AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
             ) AS BIGINT) AS rank_cos,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY dist2 ASC, neighbor_id
             ) AS BIGINT) AS rank_l2
      FROM s
    ), f AS (
      SELECT query_id, neighbor_id, rank_cos, rank_l2,
             CAST(1000000 // ({_RRF_K} + rank_cos)
                  + 1000000 // ({_RRF_K} + rank_l2) AS BIGINT) AS fused_score
      FROM r
    )
    SELECT query_id, neighbor_id, fused_score, rank_cos, rank_l2,
           CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY fused_score DESC, neighbor_id
      ) AS rk FROM f
    ) WHERE rk <= {_RRF_TOPK}
    """


@register("knn_rank_fusion", oracle=_RRF_ORACLE)
def knn_rank_fusion(spark, sf_dir):
    """Reciprocal Rank Fusion of two exact rankings per query: cosine
    similarity (rounded 6 dp, the catalog's stable cross-engine order) and
    squared L2 distance computed in EXACT integers over milli-quantized
    vectors (no float sum order can flip an L2 rank).  RRF score is
    1e6 div (60+rank_cos) + 1e6 div (60+rank_l2) — exact integers, so the
    fused ranking is bit-deterministic.

    Scale shape: broadcast query block × one corpus scan computes both
    scores in a single projection; all three row_number windows share the
    query_id partitioning (one Exchange); in a production index the two
    input rankings would each come from their own ANN structure (IVF-PQ,
    inverted lists) and the fusion join would be rank-list-sized, never
    corpus-sized — here both lists are exact so the fusion itself is
    oracle-checkable end to end.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    milli = lambda col: F.transform(  # noqa: E731
        col, lambda x: F.floor(x.cast("double") * 1000.0).cast("long")
    )
    q = emb.where(F.col("vec_id") < _RRF_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
        milli(F.col("embedding")).alias("qm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("cv"),
        milli(F.col("embedding")).alias("cm"),
    )
    s = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
            F.aggregate(
                F.zip_with(F.col("qm"), F.col("cm"), lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist2"),
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    w_l2 = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id")
    )
    r = s.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w_cos).cast("long").alias("rank_cos"),
        F.row_number().over(w_l2).cast("long").alias("rank_l2"),
    ).withColumn(
        "fused_score",
        F.expr(
            f"1000000 div ({_RRF_K} + rank_cos) + 1000000 div ({_RRF_K} + rank_l2)"
        ),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("fused_score").desc(), F.col("neighbor_id")
    )
    return (
        r.withColumn("rank", F.row_number().over(w_f).cast("long"))
        .where(F.col("rank") <= _RRF_TOPK)
        .select(
            "query_id", "neighbor_id", "fused_score", "rank_cos", "rank_l2", "rank"
        )
    )


# --------------------------------------------------------------------------
# Open-order backlog via interval stabbing + two-phase prefix sum
# --------------------------------------------------------------------------

_BL_BUCKET = 64  # days per prefix-sum bucket


_BACKLOG_ORACLE = """
    WITH cl AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_d
      FROM lineitem GROUP BY l_orderkey
    ), o AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_d, cl.close_d
      FROM orders JOIN cl ON o_orderkey = cl.l_orderkey
    ), d AS (
      SELECT start_d AS day, 1 AS delta FROM o
      UNION ALL
      SELECT close_d + 1 AS day, -1 AS delta FROM o
    ), g AS (
      SELECT day,
             CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_opened,
             CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_closed,
             SUM(delta) AS net
      FROM d GROUP BY day
    )
    SELECT CAST(day AS VARCHAR) AS day, n_opened, n_closed,
           CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS open_orders
    FROM g
    """


@register("orders_open_backlog", oracle=_BACKLOG_ORACLE)
def orders_open_backlog(spark, sf_dir):
    """Concurrent open orders per day, by interval stabbing: every order is
    open from o_orderdate through its last line's l_shipdate, so it
    contributes +1 at the start day and −1 the day after close; the running
    sum of per-day deltas IS the backlog curve (sampled at every day the
    curve changes).  The classic sweep-line rewrite of "how many intervals
    cover each point" — linear, where the naive day×order theta-join is
    quadratic.

    Scale shape: an order-keyed max (partial-combined), a co-keyed
    orders⋈closes join, a 2× delta fan-out, a day-keyed partial-combined
    aggregate, then the running sum as the TWO-PHASE prefix sum (bucketed
    within-day-range cumulative + broadcast bucket prefixes) — the oracle's
    global ORDER BY window is the semantic spec; Spark never sorts the
    calendar in one partition.
    """
    li = load_tables(spark, sf_dir, ("lineitem", "orders"))
    cl = (
        li["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("close_d"))
    )
    o = li["orders"].select(
        "o_orderkey", F.to_date("o_orderdate").alias("start_d")
    ).join(cl, F.col("o_orderkey") == F.col("l_orderkey"))
    d = o.select(F.col("start_d").alias("day"), F.lit(1).alias("delta")).unionAll(
        o.select(F.date_add("close_d", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    g = d.groupBy("day").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_opened"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_closed"),
        F.sum("delta").alias("net"),
    ).withColumn("b", F.expr(f"datediff(day, DATE'1970-01-01') div {_BL_BUCKET}"))
    win_in = (
        Window.partitionBy("b")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = g.withColumn("cum_in_b", F.sum("net").over(win_in))
    btot = g.groupBy("b").agg(F.sum("net").alias("bt"))
    win_pre = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bpre = btot.select(
        "b", F.coalesce(F.sum("bt").over(win_pre), F.lit(0)).alias("prefix")
    )
    return within.join(F.broadcast(bpre), "b").select(
        F.col("day").cast("string").alias("day"),
        "n_opened",
        "n_closed",
        (F.col("prefix") + F.col("cum_in_b")).cast("long").alias("open_orders"),
    )


# --------------------------------------------------------------------------
# Seasonal (event_type × hour-of-day) 3-sigma anomaly flags
# --------------------------------------------------------------------------

_SEASONAL_ORACLE = """
    WITH b AS (
      SELECT event_id, event_type, hour(ts) AS hour_of_day,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS xm
      FROM events
    ), st AS (
      SELECT event_type, hour_of_day,
             COUNT(*) AS n, SUM(xm) AS s,
             SUM(CAST(xm AS HUGEINT) * CAST(xm AS HUGEINT)) AS q
      FROM b GROUP BY event_type, hour_of_day
    )
    SELECT b.event_id, b.event_type, b.hour_of_day,
           CAST(st.n AS BIGINT) AS n_cell,
           round(CAST(st.s AS DOUBLE) / st.n / 1e6, 6) AS cell_mean
    FROM b JOIN st USING (event_type, hour_of_day)
    WHERE (st.n * CAST(b.xm AS HUGEINT) - st.s)
          * (st.n * CAST(b.xm AS HUGEINT) - st.s)
          > 9 * (st.n * st.q - CAST(st.s AS HUGEINT) * CAST(st.s AS HUGEINT))
    """


@register("events_anomaly_seasonal", oracle=_SEASONAL_ORACLE)
def events_anomaly_seasonal(spark, sf_dir):
    """Events anomalous AGAINST THEIR SEASON: the 3-sigma test runs per
    (event_type, hour-of-day) cell, so a value that is unremarkable
    globally but extreme for its hour is flagged — and a globally-extreme
    value that is normal for its hour is not.  Same all-integer z-score
    identity as events_value_outliers ((n·x − S)² > 9·(n·Q − S²), wide
    products in decimal(38,0) ≙ HUGEINT), just a finer baseline keyspace
    (|event types| × 24 cells).

    Scale shape: one partial-combined aggregation onto the tiny cell
    keyspace, a broadcast stats join back, a pure-projection filter.  Only
    flagged events are emitted.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    b = events.select(
        "event_id",
        "event_type",
        F.hour("ts").alias("hour_of_day"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("xm"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = b.groupBy("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").alias("s"),
        F.sum(dec(F.col("xm")) * dec(F.col("xm"))).alias("q"),
    )
    j = b.join(F.broadcast(st), ["event_type", "hour_of_day"])
    dev = dec(F.col("n")) * dec(F.col("xm")) - dec(F.col("s"))
    var_num = dec(F.col("n")) * F.col("q") - dec(F.col("s")) * dec(F.col("s"))
    return j.where(dev * dev > F.lit(9) * var_num).select(
        "event_id",
        "event_type",
        F.col("hour_of_day").cast("long").alias("hour_of_day"),
        F.col("n").cast("long").alias("n_cell"),
        F.round(F.col("s").cast("double") / F.col("n") / 1e6, 6).alias("cell_mean"),
    )


# --------------------------------------------------------------------------
# Hybrid lexical+dense retrieval: BM25 x cosine, fused with RRF
# --------------------------------------------------------------------------

_HY_SIDE_TOPK = 20  # depth of each input rank list
_HY_K = 10  # fused results returned
_HY_QVEC = 0  # the dense query: embedding of vec_id 0 (doc_id-aligned)
_HY_RRF_C = 60


def _hybrid_oracle() -> str:
    from kafka_sink_spark.plans.analytics_retrieval import _bm25_sc_ctes

    dim = 64
    dot = _dot_sql("qe", "ce", dim)
    nq = _norm_sql("qe", dim)
    nc = _norm_sql("ce", dim)
    return f"""
    WITH {_bm25_sc_ctes()}, lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank_lex
      FROM (SELECT * FROM sc WHERE n_terms > 0
            ORDER BY score DESC, doc_id LIMIT {_HY_SIDE_TOPK})
    ), dense AS (
      SELECT doc_id, rank_dense FROM (
        SELECT c.vec_id AS doc_id,
               CAST(row_number() OVER (
                 ORDER BY round(({dot}) / ({nq} * {nc}), 6) DESC, c.vec_id
               ) AS BIGINT) AS rank_dense
        FROM (SELECT embedding AS qe FROM embeddings
              WHERE vec_id = {_HY_QVEC}) q,
             (SELECT vec_id, embedding AS ce FROM embeddings
              WHERE vec_id <> {_HY_QVEC}) c
      ) WHERE rank_dense <= {_HY_SIDE_TOPK}
    ), fused AS (
      SELECT COALESCE(l.doc_id, d2.doc_id) AS doc_id,
             CAST(COALESCE(l.rank_lex, 0) AS BIGINT) AS rank_lex,
             CAST(COALESCE(d2.rank_dense, 0) AS BIGINT) AS rank_dense,
             CAST(CASE WHEN l.doc_id IS NULL THEN 0
                       ELSE 1000000 // ({_HY_RRF_C} + l.rank_lex) END
                + CASE WHEN d2.doc_id IS NULL THEN 0
                       ELSE 1000000 // ({_HY_RRF_C} + d2.rank_dense) END
               AS BIGINT) AS rrf_ppm
      FROM lex l FULL OUTER JOIN dense d2 ON d2.doc_id = l.doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id) AS INTEGER)
             AS rank,
           doc_id, rank_lex, rank_dense, rrf_ppm
    FROM (SELECT * FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT {_HY_K})
    """


@register("docs_hybrid_rrf", oracle=_hybrid_oracle())
def docs_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval (the BM25 + dense-vector stack every modern RAG
    deployment runs): the certified BM25 scorer ranks the lexical side
    for the fixed 3-term query, the certified brute-force cosine ranks
    the dense side for the doc-0 query vector (vec_id ≙ doc_id in the
    corpus), each list truncates at {side}, and Reciprocal Rank Fusion
    (Cormack/Clarke/Büttcher 2009) merges them with the catalog's exact
    1e6 div ({c}+rank) convention — absent-side contributions are 0 and
    the report keeps both input ranks (0 = not on that list) so the
    fused top-{k} is auditable.

    Scale shape: each side is its own certified plan (zero-shuffle BM25
    projection + scalar broadcast; broadcast-query cosine scan) capped
    by TakeOrderedAndProject at {side} rows; the fusion is a full outer
    join of two ≤{side}-row lists — constant-size regardless of corpus —
    and the final rank window sits above a LIMIT.  At 100 TB each side
    would come from its own index (inverted lists / IVF-PQ, both in the
    catalog); the fusion stage is identical.
    """
    from kafka_sink_spark.extensions import similarity
    from kafka_sink_spark.plans.analytics_retrieval import _bm25_scored

    lex = (
        _bm25_scored(spark, sf_dir)
        .filter(F.col("n_terms") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(_HY_SIDE_TOPK)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
            .cast("long")
            .alias("rank_lex"),
        )
    )
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    dense = (
        similarity.knn_bruteforce(
            emb, emb.where(F.col("vec_id") == _HY_QVEC), k=_HY_SIDE_TOPK
        )
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").cast("long").alias("rank_dense"),
        )
    )
    fused = (
        lex.join(dense, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce(F.col("rank_lex"), F.lit(0))
            .cast("long")
            .alias("rank_lex"),
            F.coalesce(F.col("rank_dense"), F.lit(0))
            .cast("long")
            .alias("rank_dense"),
            F.expr(
                f"CAST(CASE WHEN rank_lex IS NULL THEN 0"
                f" ELSE 1000000 div ({_HY_RRF_C} + rank_lex) END"
                f" + CASE WHEN rank_dense IS NULL THEN 0"
                f" ELSE 1000000 div ({_HY_RRF_C} + rank_dense) END AS BIGINT)"
            ).alias("rrf_ppm"),
        )
    )
    top = fused.orderBy(F.col("rrf_ppm").desc(), F.col("doc_id")).limit(_HY_K)
    rw = Window.orderBy(F.col("rrf_ppm").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(rw).cast("int").alias("rank"),
        "doc_id",
        "rank_lex",
        "rank_dense",
        "rrf_ppm",
    )


docs_hybrid_rrf.__doc__ = docs_hybrid_rrf.__doc__.format(
    side=_HY_SIDE_TOPK, c=_HY_RRF_C, k=_HY_K
)


# --------------------------------------------------------------------------
# Hybrid RRF on the TRAINED index paths (r10 verdict ask #6): the same
# constant-size fusion stage, fed by the IVF-PQ index on the dense side and
# posting-list (inverted-index access pattern) BM25 on the lexical side —
# no full-corpus SCORING scan on either side.
# --------------------------------------------------------------------------


# The posting-scored table is read by the indexed hybrid and — through it —
# the hybrid-recall composition. Persist + memoize per (session, sf_dir):
# the rows that survive the posting explode (docs holding ≥1 query term)
# are the inverted index's serving payload; re-deriving them per consumer
# re-runs the corpus pass the index exists to amortize.
_BM25_POSTING_CACHE: dict = {}


def _bm25_posting_scored(spark, sf_dir):
    """BM25 scores via the inverted-list access pattern: only documents
    holding at least one query term ever enter the scoring join (the
    posting explode filters to the query's terms), unlike _bm25_scored
    which scores the whole corpus.  Global stats (T, n, df) are the
    1-row broadcast index metadata.  Values are identical to
    _bm25_scored rows with n_terms > 0 (same formula, same fixed-point
    ladder), which is what the shared ``sc`` oracle chain certifies.
    Persisted + memoized per (session, sf_dir) — see _BM25_POSTING_CACHE."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BM25_POSTING_CACHE.get(key)
    if cached is not None:
        return cached
    from kafka_sink_spark.extensions import text
    from kafka_sink_spark.plans.analytics_readability import _SPARK_LOG2
    from kafka_sink_spark.plans.analytics_retrieval import (
        _BM25_TERMS,
        _DEC,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    terms_sql = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    staged = docs.select(
        "doc_id",
        text.tokens(F.col("text")).alias("_t"),
    ).select(
        "doc_id",
        F.size("_t").cast("long").alias("dl"),
        F.expr(f"filter(_t, x -> x IN ({terms_sql}))").alias("_hits"),
    )
    # posting rows: one per (doc, matching term occurrence) — the shape an
    # inverted index serves for the query's terms only
    post = staged.select(
        "doc_id", "dl", F.explode("_hits").alias("tok")
    )
    d = post.groupBy("doc_id", "dl").agg(
        *[
            F.sum(F.when(F.col("tok") == term, 1).otherwise(0))
            .cast("long")
            .alias(f"tf{i}")
            for i, term in enumerate(_BM25_TERMS)
        ]
    )
    # index metadata: corpus totals from the doc-length projection, df from
    # the posting-derived tf table (documents absent from it have tf = 0)
    z = (
        staged.agg(
            F.sum("dl").cast("long").alias("T"),
            F.count("*").cast("long").alias("n"),
        )
        .crossJoin(
            F.broadcast(
                d.agg(
                    *[
                        F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
                        .cast("long")
                        .alias(f"df{i}")
                        for i in range(len(_BM25_TERMS))
                    ]
                )
            )
        )
    )
    idf = {
        i: f"({_SPARK_LOG2.format(x='(2 * n + 2)')}"
        f" - {_SPARK_LOG2.format(x=f'(2 * df{i} + 1)')})"
        for i in range(len(_BM25_TERMS))
    }
    tfc = {
        i: f"(CAST(44 AS DECIMAL(38,0)) * tf{i} * T * 1000000"
        f" div (CAST(20 AS DECIMAL(38,0)) * tf{i} * T"
        f" + CAST(6 AS DECIMAL(38,0)) * T"
        f" + CAST(18 AS DECIMAL(38,0)) * dl * n))"
        for i in range(len(_BM25_TERMS))
    }
    score = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN"
        f" CAST(({_DEC.format(idf[i])} * {tfc[i]}) div 1000000 AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for i in range(len(_BM25_TERMS))
    )
    out = (
        d.crossJoin(F.broadcast(z))
        .select("doc_id", F.expr(score).alias("score"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _BM25_POSTING_CACHE[key] = out
    return out


def _hybrid_indexed_oracle() -> str:
    from kafka_sink_spark.plans.analytics_retrieval import _bm25_sc_ctes
    from kafka_sink_spark.plans.analytics_training import _ivf_pq_ctes

    ivf = ",\n    ".join(_ivf_pq_ctes(n_queries=1))
    return f"""
    WITH {_bm25_sc_ctes()}, {ivf}, lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank_lex
      FROM (SELECT * FROM sc WHERE n_terms > 0
            ORDER BY score DESC, doc_id LIMIT {_HY_SIDE_TOPK})
    ), dense AS (
      SELECT doc_id, rank_dense FROM (
        SELECT neighbor_id AS doc_id,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY afix, neighbor_id
               ) AS BIGINT) AS rank_dense
        FROM ad
      ) WHERE rank_dense <= {_HY_SIDE_TOPK}
    ), fused AS (
      SELECT COALESCE(l.doc_id, d2.doc_id) AS doc_id,
             CAST(COALESCE(l.rank_lex, 0) AS BIGINT) AS rank_lex,
             CAST(COALESCE(d2.rank_dense, 0) AS BIGINT) AS rank_dense,
             CAST(CASE WHEN l.doc_id IS NULL THEN 0
                       ELSE 1000000 // ({_HY_RRF_C} + l.rank_lex) END
                + CASE WHEN d2.doc_id IS NULL THEN 0
                       ELSE 1000000 // ({_HY_RRF_C} + d2.rank_dense) END
               AS BIGINT) AS rrf_ppm
      FROM lex l FULL OUTER JOIN dense d2 ON d2.doc_id = l.doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id) AS INTEGER)
             AS rank,
           doc_id, rank_lex, rank_dense, rrf_ppm
    FROM (SELECT * FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT {_HY_K})
    """


@register("docs_hybrid_rrf_indexed", oracle=_hybrid_indexed_oracle())
def docs_hybrid_rrf_indexed(spark, sf_dir):
    """Hybrid RRF fed by the TRAINED INDEX PATHS end-to-end — the shape a
    production RAG stack actually deploys at 100 TB, proving the
    constant-size fusion claim of docs_hybrid_rrf on indexed inputs:

    - dense side: the certified IVF-PQ index (Lloyd-trained coarse
      quantizer + product-quantized residuals, Jégou et al. 2011) —
      candidates are CELL-BUCKETED (nprobe/C of the corpus), scored by
      asymmetric distance, never a full-corpus similarity scan;
    - lexical side: BM25 through the inverted-list access pattern — the
      posting explode keeps only documents containing a query term, so
      the scoring join touches the postings of the 3 query terms plus a
      1-row broadcast of index metadata (T, n, df), never a full-corpus
      scoring pass (the corpus pass that builds postings/doc-lengths is
      the index build, amortized across every query against it);
    - fusion: the identical RRF stage — a full-outer join of two ≤{side}
      row lists, constant-size regardless of corpus.

    Values are pinned to the same certified scorers: the lexical scores
    equal _bm25_scored on n_terms>0 rows (shared ``sc`` oracle chain);
    the dense ranking equals knn_ivf_pq's ADC order (shared CTE chain,
    n_queries = 1)."""
    from kafka_sink_spark.extensions import similarity
    from kafka_sink_spark.plans.analytics_training import (
        _IVFPQ_COARSE_ITERS,
        _IVFPQ_PQ_ITERS,
        _IVFT_C,
        _IVFT_NPROBE,
        _PQT_DIM,
        _PQT_K,
        _PQT_M,
    )

    lex = (
        _bm25_posting_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(_HY_SIDE_TOPK)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
            .cast("long")
            .alias("rank_lex"),
        )
    )
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    dense = similarity.knn_ivf_pq(
        emb,
        k=_HY_SIDE_TOPK,
        n_queries=1,
        n_centroids=_IVFT_C,
        nprobe=_IVFT_NPROBE,
        m_subspaces=_PQT_M,
        k_codewords=_PQT_K,
        dim=_PQT_DIM,
        coarse_iterations=_IVFPQ_COARSE_ITERS,
        pq_iterations=_IVFPQ_PQ_ITERS,
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("rank_dense"),
    )
    fused = (
        lex.join(dense, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce(F.col("rank_lex"), F.lit(0))
            .cast("long")
            .alias("rank_lex"),
            F.coalesce(F.col("rank_dense"), F.lit(0))
            .cast("long")
            .alias("rank_dense"),
            F.expr(
                f"CAST(CASE WHEN rank_lex IS NULL THEN 0"
                f" ELSE 1000000 div ({_HY_RRF_C} + rank_lex) END"
                f" + CASE WHEN rank_dense IS NULL THEN 0"
                f" ELSE 1000000 div ({_HY_RRF_C} + rank_dense) END AS BIGINT)"
            ).alias("rrf_ppm"),
        )
    )
    top = fused.orderBy(F.col("rrf_ppm").desc(), F.col("doc_id")).limit(_HY_K)
    rw = Window.orderBy(F.col("rrf_ppm").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(rw).cast("int").alias("rank"),
        "doc_id",
        "rank_lex",
        "rank_dense",
        "rrf_ppm",
    )


docs_hybrid_rrf_indexed.__doc__ = docs_hybrid_rrf_indexed.__doc__.format(
    side=_HY_SIDE_TOPK
)


# --------------------------------------------------------------------------
# Round-11b: recall of the indexed hybrid vs the exact hybrid
# --------------------------------------------------------------------------


def _hybrid_recall_oracle() -> str:
    from kafka_sink_spark.plans.analytics_retrieval import _bm25_sc_ctes
    from kafka_sink_spark.plans.analytics_training import _ivf_pq_ctes

    dim = 64
    dot = _dot_sql("qe", "ce", dim)
    nq = _norm_sql("qe", dim)
    nc = _norm_sql("ce", dim)
    ivf = ",\n    ".join(_ivf_pq_ctes(n_queries=1))
    rrf = (
        f"CAST(CASE WHEN l.doc_id IS NULL THEN 0"
        f" ELSE 1000000 // ({_HY_RRF_C} + l.rank_lex) END"
        f" + CASE WHEN d2.doc_id IS NULL THEN 0"
        f" ELSE 1000000 // ({_HY_RRF_C} + d2.rank_dense) END AS BIGINT)"
    )
    return f"""
    WITH {_bm25_sc_ctes()}, {ivf}, lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank_lex
      FROM (SELECT * FROM sc WHERE n_terms > 0
            ORDER BY score DESC, doc_id LIMIT {_HY_SIDE_TOPK})
    ), dense_x AS (
      SELECT doc_id, rank_dense FROM (
        SELECT c.vec_id AS doc_id,
               CAST(row_number() OVER (
                 ORDER BY round(({dot}) / ({nq} * {nc}), 6) DESC, c.vec_id
               ) AS BIGINT) AS rank_dense
        FROM (SELECT embedding AS qe FROM embeddings
              WHERE vec_id = {_HY_QVEC}) q,
             (SELECT vec_id, embedding AS ce FROM embeddings
              WHERE vec_id <> {_HY_QVEC}) c
      ) WHERE rank_dense <= {_HY_SIDE_TOPK}
    ), dense_i AS (
      SELECT doc_id, rank_dense FROM (
        SELECT neighbor_id AS doc_id,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY afix, neighbor_id
               ) AS BIGINT) AS rank_dense
        FROM ad
      ) WHERE rank_dense <= {_HY_SIDE_TOPK}
    ), top_x AS (
      SELECT doc_id FROM (
        SELECT COALESCE(l.doc_id, d2.doc_id) AS doc_id, {rrf} AS rrf_ppm
        FROM lex l FULL OUTER JOIN dense_x d2 ON d2.doc_id = l.doc_id
      ) ORDER BY rrf_ppm DESC, doc_id LIMIT {_HY_K}
    ), top_i AS (
      SELECT doc_id FROM (
        SELECT COALESCE(l.doc_id, d2.doc_id) AS doc_id, {rrf} AS rrf_ppm
        FROM lex l FULL OUTER JOIN dense_i d2 ON d2.doc_id = l.doc_id
      ) ORDER BY rrf_ppm DESC, doc_id LIMIT {_HY_K}
    )
    SELECT CAST({_HY_K} AS INTEGER) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(COUNT(*) * 1000000 // {_HY_K} AS BIGINT) AS recall_ppm
    FROM top_x JOIN top_i USING (doc_id)
    """


@register("docs_hybrid_recall_vs_exact", oracle=_hybrid_recall_oracle())
def docs_hybrid_recall_vs_exact(spark, sf_dir):
    """Recall@{k} of the INDEXED hybrid (IVF-PQ dense + posting-list BM25,
    docs_hybrid_rrf_indexed) against the EXACT hybrid (full cosine scan +
    full BM25, docs_hybrid_rrf) — the acceptance number that decides
    whether the index path can replace the exact path in production: how
    much of the exact fused top-{k} the approximate fused top-{k}
    retains.

    Scale shape: both sides are the already-certified constant-size
    fusion outputs (≤{k} rows each); the overlap is a join of two
    {k}-row lists — the whole query's corpus-sized work is the two
    certified retrieval stacks it composes."""
    a = docs_hybrid_rrf(spark, sf_dir).select("doc_id")
    b = docs_hybrid_rrf_indexed(spark, sf_dir).select("doc_id")
    return a.join(b, "doc_id").agg(
        F.lit(_HY_K).cast("int").alias("k"),
        F.count("*").cast("long").alias("n_common"),
        F.expr(f"CAST(COUNT(*) * 1000000 div {_HY_K} AS BIGINT)").alias(
            "recall_ppm"
        ),
    )


docs_hybrid_recall_vs_exact.__doc__ = docs_hybrid_recall_vs_exact.__doc__.format(
    k=_HY_K
)
