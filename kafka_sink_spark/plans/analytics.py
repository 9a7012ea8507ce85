"""Analytics + training-data-extension queries (registered into the same
QUERIES/ORACLES catalog as the parity set).

Float determinism strategy (cross-engine exactness for the driver's value
hash):
- Money aggregates run in DECIMAL: inputs cast to decimal(12,2) BEFORE any
  arithmetic, so sums are exact and engine-order-independent; output casts
  only ever WIDEN the scale (DuckDB truncates on scale-down, Spark rounds).
- Ratio/cosine outputs: both engines execute the SAME operation sequence on
  the same float64 inputs (left-to-right folds), then round(…, 6).
- Hash-derived operators (minhash/simhash/LSH) are pure int64 arithmetic on
  md5 digests — bit-identical by construction; the oracle SQL is GENERATED
  from the same constants the Spark code uses.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions import dedup, multimodal, similarity, text
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# Precision discipline: price fits decimal(12,2); the (1±x) factors fit
# decimal(4,2). Products then stay ≤ decimal(22,6) — exact in BOTH engines
# (beyond 38 digits Spark silently rescales and DuckDB degrades to DOUBLE,
# which is how cross-engine last-digit drift sneaks in).
DEC = "decimal(12,2)"
DEC_F = "decimal(4,2)"
DEC_OUT = "decimal(38,6)"  # scale-WIDENING only: DuckDB truncates on scale-down, Spark rounds

# Final-output rendering: the driver compares query/oracle results through
# pandas, where Spark decimals arrive as Decimal objects but DuckDB DECIMALs
# arrive as float64 — same values, different hash. So every decimal-valued
# OUTPUT column takes one last exact-decimal -> double cast on BOTH sides.
# r10 correction (sf10 ladder): DuckDB's DIRECT decimal->double cast is NOT
# correctly rounded once values pass ~1e12 (415549704160.900000 came out
# 415549704160.89996 while Spark's BigDecimal.doubleValue gives the nearest
# double ...9), so every oracle-side cast routes through VARCHAR —
# CAST(CAST(x AS STRING) AS DOUBLE) — exact digits then a correctly-rounded
# parse, bit-identical to Spark at every magnitude.  The Spark-side SQL
# strings got the same (numerically no-op) wrap for symmetry.
# The internal arithmetic stays decimal; only the rendering changes.


def _dec(c):
    return F.col(c).cast(DEC)


def _one_minus(c):
    return (F.lit(1) - F.col(c).cast(DEC_F)).cast(DEC_F)


def _one_plus(c):
    return (F.lit(1) + F.col(c).cast(DEC_F)).cast(DEC_F)


# --------------------------------------------------------------------------
# TPC-H-style analytics (Spark-native capability showcase + bench headliners)
# --------------------------------------------------------------------------


_OMD = f"CAST(1 - CAST(l_discount AS {DEC_F}) AS {DEC_F})"
_OPT = f"CAST(1 + CAST(l_tax AS {DEC_F}) AS {DEC_F})"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS sum_qty,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS sum_base_price,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD} * {_OPT}) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS sum_charge,
           round(CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS STRING) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           round(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS STRING) AS DOUBLE) / COUNT(*), 4) AS avg_price,
           round(CAST(CAST(SUM(CAST(l_discount AS {DEC})) AS STRING) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1: scan-heavy aggregation. Plan: one parquet scan (pruned to 7
    columns, shipdate filter pushed), partial agg map-side, 6-group shuffle."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    omd = _one_minus("l_discount")
    opt = _one_plus("l_tax")
    price = _dec("l_extendedprice")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast(DEC_OUT).cast("double").alias("sum_qty"),
            F.sum(price).cast(DEC_OUT).cast("double").alias("sum_base_price"),
            F.sum(price * omd).cast(DEC_OUT).cast("double").alias("sum_disc_price"),
            F.sum(price * omd * opt)
            .cast(DEC_OUT)
            .cast("double")
            .alias("sum_charge"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_price"
            ),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3: selective join chain. customer scales with SF, so no
    forced broadcast hint — autoBroadcastJoinThreshold/AQE pick broadcast
    while the filtered segment is actually small and degrade to a shuffle
    join at 100 TB instead of OOMing the executors (VERDICT r6). The
    orders⋈lineitem join shuffles on orderkey (the natural key at 100 TB;
    bucketing both tables on orderkey removes even that)."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * _one_minus("l_discount"))
            .cast(DEC_OUT)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: star join. region/nation are constant-size → forced
    broadcast; supplier/customer scale with SF, so their joins carry no
    hint — the optimizer broadcasts them while small and falls back to
    shuffle joins at 100 TB (VERDICT r6). Only orders⋈lineitem always
    shuffles, co-partitioned on orderkey."""
    t = load_tables(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = t["supplier"].join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = t["lineitem"]
    cust = t["customer"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == F.col("s_suppkey"))
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * _one_minus("l_discount"))
            .cast(DEC_OUT)
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "events_topk_per_user",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id,
           value, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
      FROM events
    ) WHERE rnk <= 3
    """,
)
def events_topk_per_user(spark, sf_dir):
    """Top-k per key via window. Spark pushes a WindowGroupLimit below the
    shuffle (map-side top-k) — verified in .explain; at scale each partition
    ships only k rows per key."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("event_id").cast("bigint").alias("event_id"),
            "value",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register(
    "events_sessionize",
    oracle="""
    WITH o AS (SELECT user_id, epoch_us(ts) AS t FROM events),
    l AS (SELECT user_id, t,
                 lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt
          FROM o),
    s AS (SELECT user_id,
                 CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1 ELSE 0 END AS new_s
          FROM l)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(SUM(new_s) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag + conditional sum.
    One shuffle on user_id; Structured Streaming twin uses
    session_window(ts, '30 minutes') — see streaming module."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    t = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(t)
    gap_us = 30 * 60 * 1_000_000
    with_flag = events.select(
        F.col("user_id"),
        F.when(
            F.lag(t).over(w).isNull() | ((t - F.lag(t).over(w)) > gap_us), F.lit(1)
        ).otherwise(F.lit(0)).alias("new_s"),
    )
    return with_flag.groupBy(F.col("user_id").cast("bigint").alias("user_id")).agg(
        F.sum("new_s").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

_SW_LIST = "['" + "','".join(text.STOPWORDS) + "']"


def _lang_oracle_cases() -> str:
    score_cols = {
        lang: f"len(list_filter(ltoks, t -> list_contains(['"
        + "','".join(markers)
        + "'], t)))"
        for lang, markers in text.LANG_MARKERS.items()
    }
    s = {lang: f"s_{lang}" for lang in score_cols}
    selects = ",\n      ".join(f"{expr} AS {s[lang]}" for lang, expr in score_cols.items())
    case = f"""CASE WHEN {s['en']} > 0 AND {s['en']} >= {s['de']} AND {s['en']} >= {s['es']} AND {s['en']} >= {s['fr']} THEN 'en'
           WHEN {s['de']} > 0 AND {s['de']} >= {s['es']} AND {s['de']} >= {s['fr']} THEN 'de'
           WHEN {s['es']} > 0 AND {s['es']} >= {s['fr']} THEN 'es'
           WHEN {s['fr']} > 0 THEN 'fr'
           ELSE 'und' END"""
    return selects, case


_LANG_SELECTS, _LANG_CASE = _lang_oracle_cases()

TEXT_PROFILE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ltoks
  FROM documents
), m AS (
  SELECT doc_id,
      CAST(len(toks) AS INTEGER) AS n_tokens,
      CAST(length(text) AS INTEGER) AS n_chars_computed,
      CAST(len(list_filter(ltoks, t -> list_contains({_SW_LIST}, t))) AS DOUBLE)
        / GREATEST(len(ltoks), 1) AS sw,
      CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
        / GREATEST(length(text), 1) AS pr,
      LEAST(CAST(length(text) AS DOUBLE) / 200.0, 1.0) AS lok,
      {_LANG_SELECTS},
      md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM base
)
SELECT doc_id, n_tokens, n_chars_computed,
       round(sw, 6) AS stopword_ratio,
       round(pr, 6) AS punct_ratio,
       round(0.5 * lok + 0.25 * (1.0 - pr) + 0.25 * LEAST(sw * 5.0, 1.0), 6) AS quality,
       {_LANG_CASE} AS lang_pred,
       fingerprint
FROM m
"""


@register("text_profile", oracle=TEXT_PROFILE_ORACLE)
def text_profile(spark, sf_dir):
    """Document profiling: token/char counts, stopword & punctuation ratios,
    quality score, language ID, fingerprint — one scan, one projection."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.text_profile(docs)


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via content hash (SURVEY north-star): groupBy(md5)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.exact_duplicates(docs)


def _minhash_oracle(k: int = 16) -> str:
    p = dedup.MINHASH_PRIME
    mins = ",\n       ".join(
        f"MIN((hm * {a} + {b}) % {p}) AS m{i}"
        for i, (a, b) in enumerate(dedup.minhash_params(k))
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(len(t) - 2), i -> array_to_string(t[i+1:i+3], ' '))
             ELSE [array_to_string(t, ' ')] END) AS shingle
      FROM toks
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {p} AS hm FROM sh
    )
    SELECT doc_id, {mins}
    FROM h GROUP BY doc_id
    """


@register("dedup_minhash_signatures", oracle=_minhash_oracle(16))
def dedup_minhash_signatures(spark, sf_dir):
    """MinHash signatures (k=16) over 3-word shingles: explode → hash →
    16 min-aggregates. Partial aggregation keeps the shuffle at 16 longs/doc."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.minhash_signatures(docs, k=16)


def _minhash_pairs_oracle(
    threshold: float = 0.2, k: int = 16, bands: int = 4, n: int = 3
) -> str:
    """Full LSH pipeline twin: signatures → band buckets → candidate join →
    exact Jaccard → threshold. Generated from the same constants the Spark
    code uses."""
    rows = k // bands
    p = dedup.MINHASH_PRIME
    mins = ",\n         ".join(
        f"MIN((hm * {a} + {b}) % {p}) AS m{i}"
        for i, (a, b) in enumerate(dedup.minhash_params(k))
    )
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band_id, md5("
        + " || ',' || ".join(
            f"CAST(m{i} AS VARCHAR)" for i in range(b * rows, (b + 1) * rows)
        )
        + ") AS band_hash FROM sigs"
        for b in range(bands)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) >= {n}
             THEN list_transform(range(len(t) - {n - 1}), i -> array_to_string(t[i+1:i+{n}], ' '))
             ELSE [array_to_string(t, ' ')] END) AS shingle
      FROM toks
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hraw FROM sh
    ), hm AS (
      SELECT doc_id, hraw % {p} AS hm FROM h
    ), sigs AS (
      SELECT doc_id, {mins} FROM hm GROUP BY doc_id
    ), banded AS (
      {band_selects}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ), hs AS (
      SELECT DISTINCT doc_id, hraw AS hx FROM h
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS nsz FROM hs GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
      FROM cand c
      JOIN hs sa ON sa.doc_id = c.doc_a
      JOIN hs sb ON sb.doc_id = c.doc_b AND sb.hx = sa.hx
      GROUP BY c.doc_a, c.doc_b
    ), scored AS (
      SELECT c.doc_a, c.doc_b,
             round(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                   / CAST(za.nsz + zb.nsz - COALESCE(i.n_inter, 0) AS DOUBLE), 6) AS jaccard
      FROM cand c
      JOIN sizes za ON za.doc_id = c.doc_a
      JOIN sizes zb ON zb.doc_id = c.doc_b
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= {threshold}
    """


@register("dedup_minhash_pairs", oracle=_minhash_pairs_oracle())
def dedup_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup pairs with exact-Jaccard verification.
    Band-bucket join — the O(n²) cross product never materializes. The whole
    pipeline is md5-derived integer arithmetic, so the oracle replays it
    bit-for-bit (signatures → band buckets → candidates → Jaccard)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.minhash_dedup_pairs(docs, threshold=0.2)


def _simhash_oracle(bits: int = 16) -> str:
    terms = "\n         + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, v -> 2 * ((v >> {i}) & 1) - 1)) > 0 THEN {2**i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), h AS (
      SELECT doc_id, list_transform(t, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
      FROM toks
    ), sig AS (
      SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM h
    )
    SELECT simhash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
    FROM sig GROUP BY simhash
    """


@register("dedup_simhash", oracle=_simhash_oracle(16))
def dedup_simhash(spark, sf_dir):
    """SimHash (16-bit) dedup groups: per-token hash bit-majority — a pure
    projection per doc, then groupBy(signature)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.simhash_duplicates(docs, bits=16)


def _clusters_oracle(threshold: float = 0.2, k: int = 16, bands: int = 4, n: int = 3) -> str:
    pairs_sql = _minhash_pairs_oracle(threshold, k, bands, n)
    return f"""
    WITH RECURSIVE pairsq AS ({pairs_sql}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairsq
      UNION ALL
      SELECT doc_b, doc_a FROM pairsq
    ), verts AS (
      SELECT DISTINCT src AS doc_id FROM edges
    ), reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM verts
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst
    )
    SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
    """


@register("dedup_clusters", oracle=_clusters_oracle())
def dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: MinHash-LSH pairs → connected components via
    iterative min-label propagation (HashMin). Each round is one distributed
    join+agg; the DuckDB twin computes the same components with a recursive
    CTE — an iterative Spark algorithm that is still oracle-checkable."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.2)
    return dedup.connected_components(pairs)


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------


def _dot_sql(a: str, b: str, dim: int) -> str:
    return " + ".join(f"{a}[{i}]::DOUBLE * {b}[{i}]::DOUBLE" for i in range(1, dim + 1))


def _norm_sql(a: str, dim: int) -> str:
    return "sqrt(" + " + ".join(f"{a}[{i}]::DOUBLE * {a}[{i}]::DOUBLE" for i in range(1, dim + 1)) + ")"


def _knn_oracle(k: int = 5, n_queries: int = 10, dim: int = 64) -> str:
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {n_queries}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
    s AS (
      SELECT query_id, neighbor_id,
             round(({_dot_sql('qe', 'ce', dim)})
                   / ({_norm_sql('qe', dim)} * {_norm_sql('ce', dim)}), 6) AS cos_sim
      FROM q, c WHERE query_id <> neighbor_id
    ), r AS (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= {k}
    """


@register("knn_bruteforce", oracle=_knn_oracle(5, 10, 64))
def knn_bruteforce(spark, sf_dir):
    """Exact top-5 cosine neighbors for 10 query vectors: broadcast queries ×
    corpus scan, JVM-side dot products, per-query window top-k."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_bruteforce(emb, queries, k=5)


def _buckets_oracle(n_planes: int = 8, dim: int = 64) -> str:
    planes = similarity.hyperplanes(dim, n_planes)
    terms = []
    for p_idx, plane in enumerate(planes):
        dot = " + ".join(
            f"embedding[{i+1}]::DOUBLE * ({plane[i]!r})" for i in range(dim)
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {2**p_idx} ELSE 0 END)")
    expr = "\n         + ".join(terms)
    return f"""
    SELECT vec_id, CAST({expr} AS BIGINT) AS bucket FROM embeddings
    """


@register("embedding_lsh_buckets", oracle=_buckets_oracle(8, 64))
def embedding_lsh_buckets(spark, sf_dir):
    """Sign-random-projection LSH buckets (8 deterministic hyperplanes) —
    the shuffle key for ANN / embedding near-dup at scale."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.embedding_buckets(emb, n_planes=8, dim=64)


def _knn_lsh_oracle(
    k: int = 5, n_queries: int = 10, n_planes: int = 8, dim: int = 64
) -> str:
    planes = similarity.hyperplanes(dim, n_planes)

    def bucket_expr(col: str) -> str:
        terms = []
        for p_idx, plane in enumerate(planes):
            d = " + ".join(f"{col}[{i+1}]::DOUBLE * ({plane[i]!r})" for i in range(dim))
            terms.append(f"(CASE WHEN ({d}) > 0 THEN {2**p_idx} ELSE 0 END)")
        return "\n           + ".join(terms)

    return f"""
    WITH b AS (
      SELECT vec_id, embedding, CAST({bucket_expr('embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ), cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.embedding AS qe, c.embedding AS ce
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {n_queries}
    ), s AS (
      SELECT query_id, neighbor_id,
             round(({_dot_sql('qe', 'ce', dim)})
                   / ({_norm_sql('qe', dim)} * {_norm_sql('ce', dim)}), 6) AS cos_sim
      FROM cand
    ), r AS (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= {k}
    """


@register("knn_lsh", oracle=_knn_lsh_oracle(5, 10, 8, 64))
def knn_lsh(spark, sf_dir):
    """LSH-bucketed ANN: candidates share the query's sign-random-projection
    bucket (8 deterministic hyperplanes), exact cosine rank within the
    bucket. The scale path between brute force (exact, |q|×|corpus|) and IVF:
    per query only its bucket's slice of the corpus is scored, and the bucket
    id is the shuffle key."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_lsh(emb, queries, k=5, n_planes=8, dim=64)


def _cosine_neardup_oracle(
    threshold: float = 0.3, n_planes: int = 8, dim: int = 64
) -> str:
    planes = similarity.hyperplanes(dim, n_planes)
    def bucket_expr(col: str) -> str:
        terms = []
        for p_idx, plane in enumerate(planes):
            dot = " + ".join(f"{col}[{i+1}]::DOUBLE * ({plane[i]!r})" for i in range(dim))
            terms.append(f"(CASE WHEN ({dot}) > 0 THEN {2**p_idx} ELSE 0 END)")
        return "\n           + ".join(terms)

    return f"""
    WITH b AS (
      SELECT vec_id, embedding, CAST({bucket_expr('embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.embedding AS va, b2.embedding AS vb
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    ), scored AS (
      SELECT id_a, id_b,
             round(({_dot_sql('va', 'vb', dim)})
                   / ({_norm_sql('va', dim)} * {_norm_sql('vb', dim)}), 6) AS cos_sim
      FROM pairs
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {threshold}
    """


@register("embedding_cosine_neardup", oracle=_cosine_neardup_oracle())
def embedding_cosine_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs within LSH buckets (threshold 0.3 —
    the synthetic embeddings are near-orthogonal, max in-bucket cosine ≈0.44,
    so 0.3 keeps the check non-vacuous while staying selective).
    Deterministic hyperplanes + fixed-order float folds → the bucket join and
    cosine threshold replay exactly in the oracle."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.cosine_near_dup_pairs(emb, threshold=0.3, n_planes=8, dim=64)


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------


@register(
    "multimodal_features",
    oracle="""
    WITH d AS (SELECT doc_id, sha256(text) AS dg, octet_length(encode(text)) AS blen
               FROM documents)
    SELECT doc_id AS asset_id,
           'text/plain' AS media_type,
           CAST(blen AS BIGINT) AS byte_len,
           dg AS sha256,
           CAST(64 + ('0x' || substr(dg, 1, 2))::INTEGER % 192 AS INTEGER) AS width,
           CAST(64 + ('0x' || substr(dg, 3, 2))::INTEGER % 192 AS INTEGER) AS height,
           CAST(1 + ('0x' || substr(dg, 5, 2))::INTEGER % 30 AS INTEGER) AS n_frames
    FROM d
    """,
)
def multimodal_features(spark, sf_dir):
    """Binary-column plumbing: text bytes as opaque payloads → mapInPandas
    feature extraction (sha256 + deterministic pseudo-decode). The decode is
    stubbed (no codecs in container); the Arrow batch path is real."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    assets = multimodal.documents_as_assets(docs)
    return multimodal.extract_media_features(assets)
