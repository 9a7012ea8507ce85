"""Round-6n wave: distributed exact quantiles without a global sort, the
histogram-digest estimate they calibrate, and one-pass weighted sampling
with an unbiased total estimator — the quantile and sampling entries in
the catalog's estimate-vs-ground-truth harness family (KMV distinct-count,
MinHash Jaccard, Count-Min frequency, Misra-Gries heavy hitters, Bloom
membership, histogram quantiles, priority sampling).

``lineitem_histogram_quantiles``: p50/p90/p99 of the extended price in
exact integer cents, computed the scalable way — bucket counts + a bounded
prefix sum locate the target bucket, then rank selection happens INSIDE
that one bucket (a tiny fraction of the data), never a global sort of the
fact table.  Next to each exact value, the fixed-width histogram's
mid-bucket estimate and its signed error in ppm — the
estimate-vs-ground-truth readout a query optimizer's histogram statistics
or an approx_percentile user would want certified.

``orders_priority_sample``: priority sampling (Duffield et al. 2007) of
32 orders weighted by value, in exact fixed point, with the
Horvitz-Thompson total estimate emitted next to the exact total and its
signed error in ppm.

Determinism per the package convention: fixed-point cents, truncating
integer division, lower quantiles selected by rank (never interpolated
floats).

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_HQ_BUCKETS = 1024
_HQ_QS = (50, 90, 99)


_HQ_ORACLE = f"""
    WITH v AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
    ), stats AS (
      SELECT MIN(c) AS lo, MAX(c) AS hi, CAST(COUNT(*) AS BIGINT) AS n,
             ((MAX(c) - MIN(c)) // {_HQ_BUCKETS}) + 1 AS width
      FROM v
    ), hist AS (
      SELECT (v.c - stats.lo) // stats.width AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v, stats GROUP BY 1
    ), cum AS (
      SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket) AS cum,
             SUM(cnt) OVER (ORDER BY bucket) - cnt AS cum_before
      FROM hist
    ), targets AS (
      SELECT q, ((q * (stats.n - 1)) // 100) + 1 AS r, stats.n, stats.lo,
             stats.width
      FROM stats, unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS u(q)
    ), located AS (
      SELECT t.q, t.r, t.n, t.lo, t.width, c.bucket, c.cum_before
      FROM targets t JOIN cum c ON c.cum_before < t.r AND t.r <= c.cum
    ), exact AS (
      SELECT l.q, l.r, l.n, l.lo, l.width, l.bucket, l.cum_before,
             MAX(CASE WHEN rk = l.r - l.cum_before THEN bc END) AS exact_cents
      FROM located l JOIN (
        SELECT (v.c - stats.lo) // stats.width AS bucket, v.c AS bc,
               ROW_NUMBER() OVER (
                 PARTITION BY (v.c - stats.lo) // stats.width ORDER BY v.c
               ) AS rk
        FROM v, stats
      ) b ON b.bucket = l.bucket
      GROUP BY 1, 2, 3, 4, 5, 6, 7
    )
    SELECT CAST(q AS BIGINT) AS q, n, exact_cents,
           lo + bucket * width + width // 2 AS est_cents,
           -- symmetric truncation: abs-error division on non-negative
           -- operands only (DuckDB // floors negatives, Spark div
           -- truncates — splitting on sign keeps the engines identical)
           CASE WHEN lo + bucket * width + width // 2 >= exact_cents
                THEN (lo + bucket * width + width // 2 - exact_cents)
                     * 1000000 // exact_cents
                ELSE -((exact_cents - lo - bucket * width - width // 2)
                       * 1000000 // exact_cents)
           END AS err_ppm
    FROM exact
    """


@register("lineitem_histogram_quantiles", oracle=_HQ_ORACLE)
def lineitem_histogram_quantiles(spark, sf_dir):
    """Exact p50/p90/p99 of the lineitem extended price (integer cents)
    WITHOUT a global sort, plus the {b}-bucket fixed-width histogram's
    mid-bucket estimate and its signed error in ppm.

    The exact path is the scalable two-phase rank selection: (1) one
    partial-combined bucket-count aggregate + a bounded prefix sum over
    ≤{b} rows locates the bucket holding rank r = ⌊q·(n−1)/100⌋ + 1;
    (2) rank selection runs INSIDE that single bucket only (≈n/{b} of the
    data), where a per-bucket window picks the (r − cum_before)-th value.
    A global ORDER BY of the fact table — what a naive exact quantile
    plans — never happens; the only single-partition work is the ≤{b}-row
    cumulative histogram, the same bounded shape as the catalog's
    two-phase prefix sums.  The histogram estimate next to it is what a
    cost optimizer's statistics (or an approx-percentile sketch with
    {b} centroids) would answer; the harness certifies its error against
    ground truth instead of assuming it.

    Scale shape: two scans of the value column (hist build; selected-
    bucket rank), one broadcast of the 3-row target table, windows only
    over single buckets.  At any n the per-bucket rank window touches
    ~n/{b} rows per selected bucket.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    v = li.select(
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias("c")
    )
    stats = v.agg(
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
        F.count("*").cast("long").alias("n"),
    ).select(
        "lo",
        "hi",
        "n",
        F.expr(f"((hi - lo) div {_HQ_BUCKETS}) + 1").alias("width"),
    )
    vb = v.crossJoin(F.broadcast(stats)).select(
        "c", "lo", "n", "width", F.expr("(c - lo) div width").alias("bucket")
    )
    hist = vb.groupBy("bucket").agg(F.count("*").cast("long").alias("cnt"))
    cum_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(cum_w).alias("cum"),
        (F.sum("cnt").over(cum_w) - F.col("cnt")).alias("cum_before"),
    )
    targets = (
        stats.select(
            "lo",
            "n",
            "width",
            F.explode(F.array(*[F.lit(q) for q in _HQ_QS])).alias("q"),
        )
        .select(
            "lo",
            "n",
            "width",
            "q",
            F.expr("((q * (n - 1)) div 100) + 1").alias("r"),
        )
    )
    located = targets.join(
        F.broadcast(cum),
        (F.col("cum_before") < F.col("r")) & (F.col("r") <= F.col("cum")),
    )
    ranked = vb.select(
        "bucket",
        F.col("c").alias("bc"),
        F.row_number()
        .over(Window.partitionBy("bucket").orderBy("c"))
        .alias("rk"),
    ).join(
        F.broadcast(located.select("bucket").distinct()), "bucket", "left_semi"
    )
    exact = (
        located.join(ranked, "bucket")
        .where(F.col("rk") == F.col("r") - F.col("cum_before"))
        .select(
            F.col("q").cast("long").alias("q"),
            "n",
            F.col("bc").alias("exact_cents"),
            F.expr("lo + bucket * width + width div 2").alias("est_cents"),
        )
    )
    return exact.select(
        "q",
        "n",
        "exact_cents",
        "est_cents",
        # Symmetric truncation: divide absolute error (non-negative), then
        # apply the sign — Spark `div` truncates while DuckDB `//` floors,
        # so a signed numerator would diverge between the engines.
        F.when(
            F.col("est_cents") >= F.col("exact_cents"),
            F.expr("((est_cents - exact_cents) * 1000000) div exact_cents"),
        )
        .otherwise(
            -F.expr("((exact_cents - est_cents) * 1000000) div exact_cents")
        )
        .alias("err_ppm"),
    )


lineitem_histogram_quantiles.__doc__ = lineitem_histogram_quantiles.__doc__.format(
    b=_HQ_BUCKETS
)


# --------------------------------------------------------------------------
# Priority sampling + Horvitz-Thompson total estimation
# --------------------------------------------------------------------------

_PS_K = 32
_POW30 = 1 << 30  # 2^30: the fixed-point denominator of the uniform draw


_PS_ORACLE = f"""
    WITH w AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS w_cents,
             (('0x' || substr(md5('ps:' || CAST(o_orderkey AS VARCHAR)), 1, 15))
                ::BIGINT // {_POW30}) + 1 AS u30
      FROM orders
    ), p AS (
      SELECT o_orderkey, w_cents,
             (w_cents * {_POW30}) // u30 AS priority,
             ROW_NUMBER() OVER (
               ORDER BY (w_cents * {_POW30}) // u30 DESC, o_orderkey) AS rk
      FROM w
    ), tau AS (
      SELECT priority // {_POW30} AS tau_cents FROM p WHERE rk = {_PS_K} + 1
    ), tot AS (
      SELECT CAST(SUM(w_cents) AS BIGINT) AS exact_total,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM w
    ), s AS (
      SELECT p.rk, p.o_orderkey, p.w_cents,
             GREATEST(p.w_cents, tau.tau_cents) AS ht_cents
      FROM p, tau WHERE p.rk <= {_PS_K}
    ), est AS (
      SELECT CAST(SUM(ht_cents) AS BIGINT) AS est_total FROM s
    )
    SELECT CAST(s.rk AS BIGINT) AS rk, s.o_orderkey, s.w_cents, s.ht_cents,
           tot.n, tot.exact_total, est.est_total,
           CASE WHEN est.est_total >= tot.exact_total
                THEN (est.est_total - tot.exact_total) * 1000000
                     // tot.exact_total
                ELSE -((tot.exact_total - est.est_total) * 1000000
                       // tot.exact_total)
           END AS err_ppm
    FROM s, tot, est
    """


@register("orders_priority_sample", oracle=_PS_ORACLE)
def orders_priority_sample(spark, sf_dir):
    """Priority sampling (Duffield, Lund & Thorup 2007) of {k} orders
    weighted by order value, with the Horvitz-Thompson total estimate it
    supports: each order draws a deterministic fixed-point uniform
    ``u = (md5_60 div 2^30 + 1) / 2^30``, gets priority ``w div u``
    (computed as ``w·2^30 div u30`` — exact bigint, no floats), the top-k
    priorities form the sample, the (k+1)-th priority sets the threshold
    τ, and each sampled order's estimator is ``max(w, τ)`` — the weighted
    sample whose totals are provably unbiased, here CERTIFIED by emitting
    the estimate next to the exact total with signed error in ppm (same
    sign-split truncation as the quantile harness).

    Scale shape: one scan computes weights+priorities; top-(k+1) is a
    TakeOrderedAndProject (per-partition top-k + k-row merge — never a
    global sort); the threshold and totals are single-row broadcasts.
    Weighted sampling this way needs no second pass and no global
    shuffle — the canonical one-pass weighted-sample-without-replacement
    at any scale.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = orders.select(
        "o_orderkey",
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias("w_cents"),
        F.expr(
            f"(CAST(conv(substr(md5(concat('ps:', CAST(o_orderkey AS STRING))),"
            f" 1, 15), 16, 10) AS BIGINT) div {_POW30}) + 1"
        )
        .cast("long")
        .alias("u30"),
    ).select(
        "o_orderkey",
        "w_cents",
        F.expr(f"(w_cents * {_POW30}) div u30").alias("priority"),
    )
    topk1 = (
        w.orderBy(F.col("priority").desc(), F.col("o_orderkey"))
        .limit(_PS_K + 1)
        .select(
            "*",
            F.row_number()
            .over(Window.orderBy(F.col("priority").desc(), F.col("o_orderkey")))
            .alias("rk"),
        )
    )
    tau = topk1.where(F.col("rk") == _PS_K + 1).select(
        F.expr(f"priority div {_POW30}").alias("tau_cents")
    )
    tot = w.agg(
        F.sum("w_cents").cast("long").alias("exact_total"),
        F.count("*").cast("long").alias("n"),
    )
    s = (
        topk1.where(F.col("rk") <= _PS_K)
        .crossJoin(F.broadcast(tau))
        .select(
            F.col("rk").cast("long").alias("rk"),
            "o_orderkey",
            "w_cents",
            F.greatest("w_cents", "tau_cents").alias("ht_cents"),
        )
    )
    est = s.agg(F.sum("ht_cents").cast("long").alias("est_total"))
    return (
        s.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(est))
        .select(
            "rk",
            "o_orderkey",
            "w_cents",
            "ht_cents",
            "n",
            "exact_total",
            "est_total",
            F.when(
                F.col("est_total") >= F.col("exact_total"),
                F.expr(
                    "((est_total - exact_total) * 1000000) div exact_total"
                ),
            )
            .otherwise(
                -F.expr(
                    "((exact_total - est_total) * 1000000) div exact_total"
                )
            )
            .alias("err_ppm"),
        )
    )


orders_priority_sample.__doc__ = orders_priority_sample.__doc__.format(k=_PS_K)


# --------------------------------------------------------------------------
# Exact Gini coefficient without a global sort
# --------------------------------------------------------------------------

_GINI_BUCKETS = 1024


_GINI_ORACLE = f"""
    WITH v AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c,
             l_orderkey, l_linenumber
      FROM lineitem
    ), stats AS (
      SELECT MIN(c) AS lo, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT)) AS w,
             ((MAX(c) - MIN(c)) // {_GINI_BUCKETS}) + 1 AS width
      FROM v
    ), vb AS (
      SELECT v.c, v.l_orderkey, v.l_linenumber,
             (v.c - stats.lo) // stats.width AS b
      FROM v, stats
    ), hist AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM vb GROUP BY b
    ), cum AS (
      SELECT b, SUM(cnt) OVER (ORDER BY b) - cnt AS cb FROM hist
    ), local_ AS (
      SELECT b, c, ROW_NUMBER() OVER (
               PARTITION BY b ORDER BY c, l_orderkey, l_linenumber) AS r
      FROM vb
    ), t AS (
      SELECT SUM((CAST(cum.cb AS HUGEINT) + local_.r) * local_.c) AS t
      FROM local_ JOIN cum ON cum.b = local_.b
    )
    SELECT stats.n, CAST(stats.w AS BIGINT) AS total_cents,
           CAST((2 * t.t * 1000000) // (stats.n * stats.w)
                - ((stats.n + 1) * 1000000) // stats.n AS BIGINT) AS gini_ppm
    FROM stats, t
    """


@register("lineitem_price_gini", oracle=_GINI_ORACLE)
def lineitem_price_gini(spark, sf_dir):
    """EXACT Gini coefficient of the extended-price distribution —
    G = 2·Σᵢ i·w₍ᵢ₎/(n·W) − (n+1)/n over the ascending-sorted weights —
    WITHOUT ever globally sorting the fact table.  The rank-weighted sum
    Σ i·w₍ᵢ₎ decomposes by value bucket: global rank = (rows in lower
    buckets) + (rank within my bucket), so one bucket histogram + a
    bounded ≤{b}-row prefix sum supplies the offsets and a
    bucket-partitioned window supplies the local ranks — the same
    two-phase discipline as lineitem_histogram_quantiles, here powering
    an inequality/concentration measure (the per-item Lorenz companion
    to supplier_revenue_hhi's share-based concentration).  All arithmetic
    is decimal(38,0) ≙ HUGEINT; the output applies the two truncating
    divisions in the same order in both engines.

    Equal values may permute ranks within a tie group, but Σ i·w over a
    tie group is invariant (same w, consecutive i), so the statistic is
    well-defined; ties still break deterministically on (orderkey,
    linenumber).

    Scale shape: one scan builds buckets + histogram (partial-combined);
    the only single-partition work is the ≤{b}-row cumulative histogram;
    local ranks are bucket-partitioned windows (~n/{b} rows each); the
    offset join is a broadcast of ≤{b} rows; the final reduction is one
    map-side-combined sum.  A global ORDER BY never appears.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    v = li.select(
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias("c"),
        "l_orderkey",
        "l_linenumber",
    )
    stats = v.agg(
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0))")).alias("w"),
    ).select(
        "lo",
        "n",
        "w",
        F.expr(f"((hi - lo) div {_GINI_BUCKETS}) + 1").alias("width"),
    )
    vb = v.crossJoin(F.broadcast(stats)).select(
        "c",
        "l_orderkey",
        "l_linenumber",
        F.expr("(c - lo) div width").alias("b"),
    )
    hist = vb.groupBy("b").agg(F.count("*").cast("long").alias("cnt"))
    cum_w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "b", (F.sum("cnt").over(cum_w) - F.col("cnt")).alias("cb")
    )
    local = vb.select(
        "b",
        "c",
        F.row_number()
        .over(
            Window.partitionBy("b").orderBy("c", "l_orderkey", "l_linenumber")
        )
        .alias("r"),
    )
    t = (
        local.join(F.broadcast(cum), "b")
        .agg(
            F.sum(
                F.expr("(CAST(cb AS DECIMAL(38,0)) + r) * c")
            ).alias("t")
        )
    )
    return stats.crossJoin(t).select(
        "n",
        F.col("w").cast("long").alias("total_cents"),
        F.expr(
            "CAST((2 * t * 1000000) div (CAST(n AS DECIMAL(38,0)) * w)"
            " - ((n + 1) * 1000000) div n AS BIGINT)"
        ).alias("gini_ppm"),
    )
