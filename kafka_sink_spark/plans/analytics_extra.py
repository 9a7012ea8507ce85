"""Second analytics wave: n-gram Jaccard dedup with a full oracle, IVF-style
ANN, BPE-ish token stats, rolling-hash fingerprints, frame-sampling plumbing,
and three more TPC-H-style queries (Q6/Q10/Q14 shapes).

Same determinism rules as plans/analytics.py: decimal money math, md5-derived
integer hashing, fixed left-to-right float folds rounded at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.extensions import dedup, multimodal, similarity, text
from kafka_sink_spark.extensions.text import md5_long
from kafka_sink_spark.plans.analytics import (
    DEC,
    DEC_F,
    DEC_OUT,
    _OMD,
    _dec,
    _dot_sql,
    _norm_sql,
    _one_minus,
)
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables, spread_small_scan

# --------------------------------------------------------------------------
# n-gram Jaccard dedup (exact set similarity, oracle-verified)
# --------------------------------------------------------------------------

_NGRAM_JACCARD_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3
         THEN list_transform(range(len(t) - 2), i -> array_to_string(t[i+1:i+3], ' '))
         ELSE [array_to_string(t, ' ')] END) AS shingle
  FROM toks
), hs AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM hs GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 2 = 0
), inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN hs sa ON sa.doc_id = p.doc_a
  JOIN hs sb ON sb.doc_id = p.doc_b AND sb.h = sa.h
  GROUP BY p.doc_a, p.doc_b
)
SELECT p.doc_a, p.doc_b,
       round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / CAST(za.n + zb.n - COALESCE(i.n_inter, 0) AS DOUBLE), 6) AS jaccard
FROM pairs p
JOIN sizes za ON za.doc_id = p.doc_a
JOIN sizes zb ON zb.doc_id = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
"""


@register("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard over a deterministic candidate pairing (each even
    doc vs its successor) — the verify stage of LSH dedup, oracle-checked end
    to end. The shingle explode is linear in corpus size; the pair join only
    touches candidates."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ids = docs.select("doc_id")
    pairs = (
        ids.filter(F.col("doc_id") % 2 == 0)
        .select(
            F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
        )
        .join(ids.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
    )
    return dedup.jaccard_similarity(docs, pairs).select("doc_a", "doc_b", "jaccard")


# --------------------------------------------------------------------------
# IVF-style approximate nearest neighbors
# --------------------------------------------------------------------------


def _ivf_oracle(
    k: int = 5, n_queries: int = 10, n_centroids: int = 8, nprobe: int = 2, dim: int = 64
) -> str:
    return f"""
    WITH e AS (SELECT vec_id AS vid, embedding AS ve FROM embeddings),
    cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < {n_centroids}),
    sc AS (
      SELECT vid, cid,
             round(({_dot_sql('ve', 'ce', dim)})
                   / ({_norm_sql('ve', dim)} * {_norm_sql('ce', dim)}), 6) AS cs
      FROM e CROSS JOIN cent
    ), ranked AS (
      SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid ASC) AS crank
      FROM sc
    ), cells AS (
      SELECT vid AS neighbor_id, cid AS cell FROM ranked WHERE crank = 1
    ), probes AS (
      SELECT vid AS query_id, cid AS cell FROM ranked WHERE vid < {n_queries} AND crank <= {nprobe}
    ), cand AS (
      SELECT p.query_id, c.neighbor_id
      FROM probes p JOIN cells c ON c.cell = p.cell AND c.neighbor_id <> p.query_id
    ), scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(({_dot_sql('qe', 'ne', dim)})
                   / ({_norm_sql('qe', dim)} * {_norm_sql('ne', dim)}), 6) AS cos_sim
      FROM cand
      JOIN (SELECT vec_id, embedding AS qe FROM embeddings) q ON q.vec_id = cand.query_id
      JOIN (SELECT vec_id, embedding AS ne FROM embeddings) n ON n.vec_id = cand.neighbor_id
    ), r AS (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= {k}
    """


@register("knn_ivf", oracle=_ivf_oracle())
def knn_ivf(spark, sf_dir):
    """IVF-style ANN: coarse-quantize every vector to its nearest of 8
    centroids, probe the 2 nearest cells per query, exact-rank within cells.
    The cell id is the shuffle/partition key at scale — per query only
    ~nprobe/C of the corpus is scored."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.knn_ivf(emb, k=5, n_queries=10, n_centroids=8, nprobe=2)


# --------------------------------------------------------------------------
# BPE-ish token stats
# --------------------------------------------------------------------------

_TOKEN_STATS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS t
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(t) AS INTEGER) AS n_tokens_bpe,
         CAST(len(list_filter(t, x -> regexp_full_match(x, '[A-Za-z]+'))) AS INTEGER) AS n_alpha,
         CAST(len(list_filter(t, x -> regexp_full_match(x, '[0-9]+'))) AS INTEGER) AS n_num,
         COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS total_len
  FROM toks
)
SELECT doc_id, n_tokens_bpe, n_alpha, n_num,
       CAST(n_tokens_bpe - n_alpha - n_num AS INTEGER) AS n_sym,
       round(CAST(total_len AS DOUBLE) / GREATEST(n_tokens_bpe, 1), 6) AS avg_token_len
FROM m
"""


@register("text_token_stats", oracle=_TOKEN_STATS_ORACLE)
def text_token_stats(spark, sf_dir):
    """BPE-ish pre-tokenizer stats: letter runs / digit runs / single symbols
    (the classic regex split), with class counts and mean token length — one
    scan, one projection, all JVM-side."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = docs.select(
        F.col("doc_id"), text.word_tokens(F.col("text")).alias("_t")
    )
    t = F.col("_t")
    n = F.size(t)
    alpha = F.size(F.filter(t, lambda x: x.rlike("^[A-Za-z]+$")))
    num = F.size(F.filter(t, lambda x: x.rlike("^[0-9]+$")))
    total_len = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return staged.select(
        "doc_id",
        n.alias("n_tokens_bpe"),
        alpha.alias("n_alpha"),
        num.alias("n_num"),
        (n - alpha - num).alias("n_sym"),
        F.round(
            total_len.cast("double") / F.greatest(n, F.lit(1)).cast("double"), 6
        ).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# Rolling-hash document fingerprint
# --------------------------------------------------------------------------

_ROLLING_FP_ORACLE = r"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nm
  FROM documents
), w AS (
  SELECT doc_id,
         list_transform(range(GREATEST(length(nm) - 7, 1)), i -> substr(nm, i + 1, 8)) AS wins
  FROM n
)
SELECT doc_id,
       CAST(len(wins) AS INTEGER) AS n_windows,
       list_min(list_transform(wins, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS rolling_min_hash
FROM w
"""


@register("text_rolling_fingerprint", oracle=_ROLLING_FP_ORACLE)
def text_rolling_fingerprint(spark, sf_dir):
    """Rolling-window fingerprint (winnowing-style): hash every 8-char window
    of the normalized text, keep the minimum — a content-defined signature
    robust to small edits. Pure projection; the window transform stays inside
    codegen (no explode, no shuffle)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # ~500 md5s per doc inside one projection: spread the single-row-group
    # scan so the hash loop parallelizes (guide §2.2); no-op at scale.
    staged = spread_small_scan(docs, spark).select(
        F.col("doc_id"), text.normalize_text(F.col("text")).alias("_norm")
    )
    wins = F.expr(
        "transform(sequence(1, greatest(length(_norm) - 7, 1)), i -> substring(_norm, i, 8))"
    )
    staged = staged.select(F.col("doc_id"), wins.alias("_wins"))
    return staged.select(
        "doc_id",
        F.size(F.col("_wins")).alias("n_windows"),
        F.array_min(F.transform(F.col("_wins"), lambda x: md5_long(x))).alias(
            "rolling_min_hash"
        ),
    )


# --------------------------------------------------------------------------
# Multimodal frame sampling
# --------------------------------------------------------------------------


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH d AS (SELECT doc_id, sha256(text) AS dg FROM documents),
    f AS (SELECT doc_id AS asset_id,
                 1 + ('0x' || substr(dg, 5, 2))::INTEGER % 30 AS n_frames
          FROM d),
    x AS (SELECT asset_id, unnest(range(0, n_frames, 5)) AS fi FROM f)
    SELECT asset_id, CAST(fi AS INTEGER) AS frame_idx FROM x
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing (every 5th pseudo-frame from the stubbed
    decode's n_frames metadata): explode → filter, the plan shape of real
    video frame extraction with per-frame decode downstream."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    assets = multimodal.documents_as_assets(docs)
    sampled = multimodal.frame_sample(assets, every_n=5)
    return sampled.select("asset_id", F.col("frame_idx").cast("int").alias("frame_idx"))


# --------------------------------------------------------------------------
# TPC-H shapes: Q6 / Q10 / Q14
# --------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * CAST(l_discount AS {DEC_F})) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan + filter + agg — the predicate-pushdown benchmark.
    All three filters reach the parquet scan (PushedFilters); no shuffle at
    all beyond the final single-group agg."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * F.col("l_discount").cast(DEC_F))
            .cast(DEC_OUT)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue. lineitem⋈orders
    shuffles on orderkey; nation is constant-size → broadcast hint;
    customer scales with SF so its join is unhinted — broadcast while
    small, shuffle join at 100 TB (VERDICT r6). Top-20 via
    TakeOrderedAndProject (no full sort)."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(t["customer"], orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * _one_minus("l_discount"))
            .cast(DEC_OUT)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN-subquery with HAVING. Catalyst rewrites the
    subquery to a left-semi join; AQE picks broadcast when the qualifying
    order set is small (it is — the HAVING is selective). Quantities are
    integer-valued doubles → BIGINT sum for exact cross-engine totals."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    li, orders, cust = t["lineitem"], t["orders"], t["customer"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"))
    )


@register(
    "q4_priority_with_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_returns(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery → Catalyst plans a
    left-semi join on orderkey (no per-row subquery execution). Expressed via
    spark.sql to exercise the decorrelation path."""
    load_tables(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "q2_min_acctbal_supplier",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal
    FROM supplier s, nation n
    WHERE s.s_nationkey = n.n_nationkey
      AND s.s_acctbal = (
        SELECT MIN(s2.s_acctbal) FROM supplier s2
        WHERE s2.s_nationkey = s.s_nationkey
      )
    """,
)
def q2_min_acctbal_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated scalar subquery (per-nation minimum).
    Expressed via spark.sql so Catalyst's subquery decorrelation runs — it
    plans the same aggregate-then-join a hand-written version would, without
    hand-scheduling it."""
    load_tables(spark, sf_dir, ("supplier", "nation"))
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_acctbal = (
          SELECT MIN(s2.s_acctbal) FROM supplier s2
          WHERE s2.s_nationkey = s.s_nationkey
        )
        """
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: the same dimension (nation) joined twice under
    different roles with a disjunctive cross-filter. Both nation instances
    get broadcast hints (constant-size); supplier/customer scale with SF
    so their joins are unhinted — broadcast while small, shuffle join at
    100 TB (VERDICT r6). lineitem⋈orders is the one fixed shuffle."""
    t = load_tables(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = t["supplier"].join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    cust = t["customer"].join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    pair_ok = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(t["orders"], li.l_orderkey == F.col("o_orderkey"))
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _one_minus("l_discount"))
            .cast(DEC_OUT)
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "events_set_ops",
    oracle="""
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT 'click_and_buy' AS cohort, CAST(user_id AS BIGINT) AS user_id
    FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
    UNION ALL
    SELECT 'click_not_buy', CAST(user_id AS BIGINT)
    FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
    """,
)
def events_set_ops(spark, sf_dir):
    """Set operators (absent in the reference, free in Spark): INTERSECT /
    EXCEPT cohorts over distinct user sets — both plan as aggregations, not
    nested-loop anti joins."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    clickers = events.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clickers.intersect(buyers).select(
        F.lit("click_and_buy").alias("cohort"), F.col("user_id").cast("bigint").alias("user_id")
    )
    only = clickers.exceptAll(buyers).select(
        F.lit("click_not_buy").alias("cohort"), F.col("user_id").cast("bigint").alias("user_id")
    )
    return both.unionByName(only)


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_millionths,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_rollup(spark, sf_dir):
    """Tumbling-window rollup via F.window (the Structured Streaming window
    primitive, here in batch): one shuffle on (bucket, type), map-side partial
    agg. The double-valued sum is integer-ized (floor ×1e6) so it is
    summation-order independent — the pattern for exact cross-engine money/
    metric totals."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        events.groupBy(
            F.window("ts", "1 hour").start.alias("bucket_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("bigint"))
            .cast("bigint")
            .alias("sum_value_millionths"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "events_salted_rollup",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_millionths,
           MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def events_salted_rollup(spark, sf_dir):
    """Skew-resistant per-user rollup via the salted two-phase aggregation
    (operators/skew.py): phase 1 groups by (user, salt) spreading hot users
    over 8 reducers, phase 2 folds the partials. Result is identical to a
    direct groupBy — the oracle IS the direct groupBy."""
    from kafka_sink_spark.operators.skew import salted_aggregate

    events = load_tables(spark, sf_dir, ("events",))["events"]
    events = events.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id"),
        F.col("value"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("_vm"),
    )
    return salted_aggregate(
        events,
        keys=["user_id"],
        aggs={
            "n_events": ("count", F.lit(1)),
            "sum_value_millionths": ("sum", F.col("_vm")),
            "max_value": ("max", F.col("value")),
        },
        n_salts=8,
        salt_expr=F.pmod(F.col("event_id"), F.lit(8)),
    ).select("user_id", "n_events", F.col("sum_value_millionths").cast("bigint").alias("sum_value_millionths"), "max_value")


@register(
    "orders_priority_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def orders_priority_rollup(spark, sf_dir):
    """Grouping-sets capability: ROLLUP(status, priority) — subtotals and a
    grand total in one pass (Spark expands to a single Expand + aggregate;
    one shuffle)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    WITH s AS (
      SELECT CAST(CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS {DEC}) * {_OMD}
                           ELSE CAST(0 AS {DEC}) END) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS promo,
             CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    )
    SELECT promo AS promo_revenue, total AS total_revenue,
           round(CAST(promo AS DOUBLE) * 100 / CAST(total AS DOUBLE), 6) AS promo_pct
    FROM s
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share. part scales with SF, so the
    join onto the filtered lineitem scan is unhinted — the optimizer
    broadcasts it while small and shuffle-joins at 100 TB (VERDICT r6);
    one single-group aggregate either way."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    rev = _dec("l_extendedprice") * _one_minus("l_discount")
    agg = (
        li.join(t["part"], li.l_partkey == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast(DEC)
                )
            )
            .cast(DEC_OUT)
            .cast("double")
            .alias("promo"),
            F.sum(rev).cast(DEC_OUT).cast("double").alias("total"),
        )
    )
    return agg.select(
        F.col("promo").alias("promo_revenue"),
        F.col("total").alias("total_revenue"),
        F.round(
            F.col("promo").cast("double") * 100 / F.col("total").cast("double"), 6
        ).alias("promo_pct"),
    )


# --------------------------------------------------------------------------
# Capstone: the composed training-data curation pipeline
# --------------------------------------------------------------------------


def _pipeline_oracle() -> str:
    from kafka_sink_spark.plans.analytics import TEXT_PROFILE_ORACLE

    return f"""
    WITH prof AS ({TEXT_PROFILE_ORACLE}),
    kept AS (
      SELECT * FROM prof
      WHERE quality >= 0.6 AND n_tokens >= 12 AND lang_pred <> 'und'
    ),
    rep AS (
      SELECT fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      FROM kept GROUP BY fingerprint
    )
    SELECT k.doc_id, k.lang_pred, k.quality, k.n_tokens, rep.n_copies
    FROM rep JOIN kept k
      ON k.fingerprint = rep.fingerprint AND k.doc_id = rep.doc_id
    """


@register("pipeline_training_data", oracle=_pipeline_oracle())
def pipeline_training_data(spark, sf_dir):
    """The composed curation pipeline a training-data run would execute:
    profile (token/char stats, quality score, language ID, normalized
    fingerprint) → filter (quality ≥ 0.6, ≥ 12 tokens, identified language)
    → exact dedup on the normalized fingerprint keeping the lowest doc_id as
    representative, carrying the copy count.

    One scan of documents, two projections, ONE shuffle (the fingerprint
    group-by; min_by keeps it a hash aggregation with map-side combine —
    no join-back, no window). At 100 TB this is scan-bound: everything
    before the shuffle is a WholeStageCodegen projection, and the shuffle
    carries one row per kept document."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    prof = text.text_profile(docs)
    kept = prof.filter(
        (F.col("quality") >= 0.6)
        & (F.col("n_tokens") >= 12)
        & (F.col("lang_pred") != "und")
    )
    rep = F.min_by(
        F.struct("doc_id", "lang_pred", "quality", "n_tokens"), F.col("doc_id")
    )
    return (
        kept.groupBy("fingerprint")
        .agg(rep.alias("_r"), F.count(F.lit(1)).alias("n_copies"))
        .select(
            F.col("_r.doc_id").alias("doc_id"),
            F.col("_r.lang_pred").alias("lang_pred"),
            F.col("_r.quality").alias("quality"),
            F.col("_r.n_tokens").alias("n_tokens"),
            F.col("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# Multimodal REAL decode: genuine PNG header bytes → real dimensions
# --------------------------------------------------------------------------


@register(
    "multimodal_real_decode",
    oracle="""
    WITH src AS (
      SELECT event_id, user_id,
             event_id % 9 = 0 AS corrupt,
             16 + user_id AS w,
             16 + event_id % 240 AS h,
             'corrupted-' || CAST(event_id AS VARCHAR) AS junk
      FROM events
    )
    SELECT CAST(event_id AS BIGINT) AS asset_id,
           CASE WHEN corrupt THEN CAST(10 + length(CAST(event_id AS VARCHAR)) AS BIGINT)
                ELSE 33 END AS byte_len,
           CASE WHEN corrupt
                THEN 64 + CAST(('0x' || substr(sha256(junk), 1, 2)) AS INTEGER) % 192
                ELSE CAST(w AS INTEGER) END AS width,
           CASE WHEN corrupt
                THEN 64 + CAST(('0x' || substr(sha256(junk), 3, 2)) AS INTEGER) % 192
                ELSE CAST(h AS INTEGER) END AS height,
           CASE WHEN corrupt
                THEN 1 + CAST(('0x' || substr(sha256(junk), 5, 2)) AS INTEGER) % 30
                ELSE 1 END AS n_frames
    FROM src
    """,
)
def multimodal_real_decode(spark, sf_dir):
    """Driver-verified REAL image decode: each event builds a genuine PNG
    byte stream (magic + IHDR with big-endian dimensions 16+user_id x
    16+event_id%240), and extract_media_features must read those dimensions
    back from the actual bytes via the dependency-free header parser (PIL
    when present). Every 9th payload is ASCII junk instead — the decode
    fails and the deterministic sha256-derived stand-in takes over; the
    oracle reproduces BOTH paths bit-for-bit (junk is ASCII precisely so
    DuckDB's VARCHAR sha256 hashes the same bytes Python does)."""
    from kafka_sink_spark.extensions.multimodal import extract_media_features

    events = load_tables(spark, sf_dir, ("events",))["events"]
    w = (F.lit(16) + F.col("user_id")).cast("int")
    h = (F.lit(16) + F.col("event_id") % 240).cast("int")
    hex4 = lambda c: F.lpad(F.conv(c.cast("string"), 10, 16), 8, "0")  # noqa: E731
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),      # PNG magic
        F.lit("0000000D"),              # IHDR length = 13
        F.lit("49484452"),              # 'IHDR'
        hex4(w), hex4(h),               # width, height (big-endian)
        F.lit("0802000000"),            # bit depth 8, RGB, default coding
        F.lit("00000000"),              # CRC (parser does not verify)
    )
    payload = F.when(
        F.col("event_id") % 9 == 0,
        F.encode(
            F.concat(F.lit("corrupted-"), F.col("event_id").cast("string")),
            "UTF-8",
        ),
    ).otherwise(F.unhex(png_hex))
    assets = events.select(
        F.col("event_id").alias("asset_id"),
        F.lit("image/png").alias("media_type"),
        payload.alias("payload"),
    )
    feats = extract_media_features(assets)
    return feats.select("asset_id", "byte_len", "width", "height", "n_frames")


# --------------------------------------------------------------------------
# Pivot: per-day event-type value matrix
# --------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "events_pivot_daily",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {", ".join(
               f"CAST(CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' "
               f"THEN CAST(value AS DECIMAL(12,2)) END), 0) "
               f"AS DECIMAL(38,6)) AS DOUBLE) AS {t}_value"
               for t in _PIVOT_TYPES
           )}
    FROM events GROUP BY 1
    """,
)
def events_pivot_daily(spark, sf_dir):
    """Pivot (long → wide): per-day totals with one column per event type —
    Spark's groupBy().pivot() with EXPLICIT pivot values, which keeps the
    plan a single pass (no values-discovery job) and the output schema
    static, exactly what a scheduled 100 TB rollup needs. Money in
    decimal(12,2) before summing; widened then rendered double for the
    cross-engine hash."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    out = (
        events.select(
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
            F.col("value").cast("decimal(12,2)").alias("v"),
        )
        .groupBy("day")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.coalesce(F.sum("v"), F.lit(0)).cast("decimal(38,6)").cast("double"))
    )
    renames = [F.col("day")] + [
        F.col(t).alias(f"{t}_value") for t in _PIVOT_TYPES
    ]
    return out.select(*renames)


# --------------------------------------------------------------------------
# Window frames: rolling per-user aggregates
# --------------------------------------------------------------------------


@register(
    "events_rolling_window",
    oracle="""
    SELECT event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w
                AS DECIMAL(38,6)) AS DOUBLE) AS roll_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
           CAST(MAX(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS roll_max
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    )
    """,
)
def events_rolling_window(spark, sf_dir):
    """Bounded window frames: per user, ordered by time, the rolling
    sum/count/max of the last 4 events (ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW). A bounded ROWS frame keeps per-row state O(frame) in
    Spark's WindowExec — no unbounded buffering — and all three aggregates
    share one Window node over one shuffle on user_id. Exact decimal money,
    ties broken by event_id so the frame contents are engine-independent."""
    from pyspark.sql import Window as W

    events = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-3, W.currentRow)
    )
    v = F.col("value").cast("decimal(12,2)")
    return events.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.sum(v).over(w).cast("decimal(38,6)").cast("double").alias("roll_sum"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
        F.max(v).over(w).cast("double").alias("roll_max"),
    )


# --------------------------------------------------------------------------
# CUBE grouping sets: event-type x day total matrix with subtotals
# --------------------------------------------------------------------------


@register(
    "events_cube_rollup",
    oracle="""
    SELECT COALESCE(event_type, '<all>') AS etype,
           COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), '<all>') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,6))
                AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE (event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'))
    """,
)
def events_cube_rollup(spark, sf_dir):
    """CUBE grouping sets: totals for every (event_type, day) cell PLUS the
    per-type, per-day, and grand-total subtotal rows in one pass — Spark
    expands the grouping sets BEFORE the aggregate, so partial aggregation
    still combines map-side and the shuffle carries |cells| x 4 rows per
    task, not the raw events. Null grouping markers are COALESCEd to
    '<all>' so the subtotal rows hash identically cross-engine (a null
    grouping key is indistinguishable from a null data value otherwise)."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day")
    cube = (
        events.select("event_type", day, F.col("value").cast("decimal(12,2)").alias("v"))
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("decimal(38,6)").cast("double").alias("total_value"),
        )
    )
    return cube.select(
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("etype"),
        F.coalesce(F.col("day"), F.lit("<all>")).alias("day"),
        "n_events",
        "total_value",
    )


# --------------------------------------------------------------------------
# ntile decile bucketing per event type
# --------------------------------------------------------------------------


@register(
    "events_value_ntile",
    oracle="""
    WITH t AS (
      SELECT event_id, event_type, value,
             CAST(ntile(10) OVER (
               PARTITION BY event_type ORDER BY value ASC, event_id ASC
             ) AS INTEGER) AS decile
      FROM events
    )
    SELECT event_type, decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM t GROUP BY event_type, decile
    """,
)
def events_value_ntile(spark, sf_dir):
    """Decile bucketing: ntile(10) per event type ordered by (value,
    event_id) — the tiebreak makes bucket assignment engine-independent
    (SQL-standard ntile is deterministic given a total order). One window
    pass + one partial-combined aggregate; the window shuffle and the
    groupBy share the event_type key.

    Scale note: ntile buffers each window partition (spill-backed) and here
    a partition is a whole event type — exact deciles are the oracle-checked
    reference semantics. At 100 TB with few, huge types, swap to
    approx_percentile boundaries + a codegen CASE bucket assignment: one
    pass, no per-partition buffering, same bucket edges to sketch accuracy."""
    from pyspark.sql import Window as W

    events = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    t = events.select(
        "event_type", "value", F.ntile(10).over(w).alias("decile")
    )
    return t.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# --------------------------------------------------------------------------
# RANGE window frames: time-interval rolling totals
# --------------------------------------------------------------------------


@register(
    "events_range_window",
    oracle="""
    SELECT event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w
                AS DECIMAL(38,6)) AS DOUBLE) AS win_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS win_n
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts ASC
      RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
    )
    """,
)
def events_range_window(spark, sf_dir):
    """RANGE (value-based) window frame: per user, the total and count of
    events in the trailing 10-minute interval ending at each event — the
    frame is defined by the ORDER BY value, not row offsets, so
    same-timestamp peers always land in the same frame and no tiebreak is
    needed for determinism (unlike ROWS frames). One shuffle on user_id;
    Spark's WindowExec advances the range bound monotonically per
    partition, O(frame) state."""
    from pyspark.sql import Window as W

    events = load_tables(spark, sf_dir, ("events",))["events"]
    # Order by epoch MICROseconds: casting ts to long truncates to seconds,
    # which silently widens the frame edge vs the oracle's µs-precision
    # INTERVAL arithmetic (an event 600.4s back would land exactly on the
    # truncated 600s bound and be included).
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600 * 1_000_000, W.currentRow)
    )
    v = F.col("value").cast("decimal(12,2)")
    return events.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.sum(v).over(w).cast("decimal(38,6)").cast("double").alias("win_sum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )


# --------------------------------------------------------------------------
# UNPIVOT: lineitem charge components wide → long
# --------------------------------------------------------------------------


@register(
    "lineitem_unpivot_components",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS gross,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(38,6))
                  AS DOUBLE) AS discount_amt,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(l_tax AS DECIMAL(12,2)) AS DECIMAL(38,6))
                  AS DOUBLE) AS tax_amt
      FROM lineitem WHERE l_orderkey % 50 = 0
    )
    SELECT l_orderkey, l_linenumber, component, amount
    FROM base
    UNPIVOT (amount FOR component IN (gross, discount_amt, tax_amt))
    """,
)
def lineitem_unpivot_components(spark, sf_dir):
    """UNPIVOT (wide → long): each lineitem's charge components (gross,
    discount amount, tax amount) become (component, amount) rows via
    DataFrame.unpivot — a pure per-row expansion (Expand operator), no
    shuffle, no UDF; money computed in exact decimal then rendered double.
    The inverse of events_pivot_daily's long → wide."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    base = li.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        ep.cast("double").alias("gross"),
        (ep * F.col("l_discount").cast("decimal(12,2)"))
        .cast("decimal(38,6)").cast("double").alias("discount_amt"),
        (ep * F.col("l_tax").cast("decimal(12,2)"))
        .cast("decimal(38,6)").cast("double").alias("tax_amt"),
    )
    return base.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["gross", "discount_amt", "tax_amt"],
        "component",
        "amount",
    )
