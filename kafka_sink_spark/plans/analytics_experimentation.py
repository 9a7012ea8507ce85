"""Round-7m wave: experimentation and operations control — variance
reduction, transport-distance drift, statistical process control,
extreme-value diagnostics, and recommender diversity — five more
published techniques in the catalog's exact-integer, oracle-twinned
style.

- ``events_cuped_variance_reduction``  CUPED (Deng et al. 2013), the
  standard experimentation variance-reduction trick: with each user's
  first-half value sum as pre-period covariate X and second-half as
  metric Y, θ = cov(X,Y)/var(X) and the adjusted metric Y − θX shrinks
  variance by exactly the squared correlation.  θ in signed ppm and
  the realized variance reduction in ppm, all from ÷10000-reduced
  integer sums in decimal(38).
- ``events_wasserstein_drift``  1-D earth-mover (Wasserstein-1) drift
  between the half-month value distributions over the same fixed
  16-bucket grid as the TVD probe: W₁ = Σ_b |cumP − cumQ| · width —
  unlike TVD it charges for HOW FAR mass moved, the transport-aware
  drift number, exact in value-micros.
- ``lineitem_xbar_control``  the Shewhart X̄/R control chart (the SPC
  classic): fixed 5-item subgroups per ship day, grand mean ± A₂·R̄
  limits with A₂(5) = 0.577 PINNED in ppm (no table lookups at run
  time), out-of-control day census by exact cross-multiplied compare.
- ``events_mean_excess``  the mean-excess function at the exact p90
  threshold — the extreme-value-theory diagnostic (linear-in-u mean
  excess ⇔ generalized-Pareto tail) that decides whether a metric has
  a heavy tail worth modeling; threshold off the value ladder,
  conditional mean in truncated micros.
- ``knn_aggregate_diversity``  aggregate diversity / catalog coverage
  of a recommender (Adomavicius & Kwon 2012): how many DISTINCT items
  the top-k lists over a query panel actually reach, the coverage
  share in ppm, and the most-recommended item's frequency — the
  popularity-bias check beside NDCG's accuracy.

Determinism per the package convention: integer arithmetic end-to-end,
sign-split truncating division, pinned ppm constant tables, documented
milli-reductions where decimal(38) headroom demands them.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_DEC = "CAST({} AS DECIMAL(38,0))"

# --------------------------------------------------------------------------
# CUPED variance reduction
# --------------------------------------------------------------------------

_CUPED_ORACLE = """
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN date_part('day', ts) <= 15
                 THEN CAST(FLOOR(value * 1000000) AS BIGINT) ELSE 0 END)
               // 10000 AS x,
             SUM(CASE WHEN date_part('day', ts) > 15
                 THEN CAST(FLOOR(value * 1000000) AS BIGINT) ELSE 0 END)
               // 10000 AS y
      FROM events GROUP BY user_id
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x::HUGEINT * x) AS qx,
             SUM(x::HUGEINT * y) AS sxy
      FROM per_user
    ), theta AS (
      SELECT n, sx, sy,
             CASE WHEN n * sxy - sx::HUGEINT * sy >= 0
                  THEN ((n * sxy - sx::HUGEINT * sy) * 1000000)
                       // (n * qx - sx::HUGEINT * sx)
                  ELSE -(((sx::HUGEINT * sy - n * sxy) * 1000000)
                         // (n * qx - sx::HUGEINT * sx))
             END AS th
      FROM s
    ), adj AS (
      SELECT t.n, t.th,
             SUM(1000000 * p.y - t.th * p.x) AS sa,
             SUM((1000000 * p.y - t.th * p.x)::HUGEINT
                 * (1000000 * p.y - t.th * p.x)) AS qa,
             SUM((1000000 * p.y)::HUGEINT * (1000000 * p.y)) AS qy,
             SUM(1000000 * p.y) AS sy6
      FROM per_user p, theta t
      GROUP BY t.n, t.th
    )
    SELECT n AS n_users, CAST(th AS BIGINT) AS theta_ppm,
           CAST(GREATEST(1000000
                - ((n * qa - sa::HUGEINT * sa) * 1000000)
                  // (n * qy - sy6::HUGEINT * sy6), 0) AS BIGINT)
             AS var_reduction_ppm
    FROM adj
    """


@register("events_cuped_variance_reduction", oracle=_CUPED_ORACLE)
def events_cuped_variance_reduction(spark, sf_dir):
    """CUPED variance reduction (Deng et al. 2013) — the standard trick
    that makes A/B tests converge faster: per user, the first-half
    value sum is the pre-period covariate X and the second-half the
    metric Y; θ = cov(X,Y)/var(X) (signed ppm, cross-multiplied) and
    the adjusted metric A = 1e6·Y − θ·X realizes a variance reduction
    of exactly the squared X-Y correlation.  The emitted
    var_reduction_ppm = 1 − var(A)/var(1e6·Y) is that realized
    shrinkage — how much experiment sensitivity the covariate buys.
    Inputs are reduced ÷10000 (identically in both engines) so
    every product in the two variance cross-multiplications stays
    inside decimal(38) ≙ HUGEINT.

    Scale shape: ONE partial-combined per-user aggregate over events
    (the only fact-sized shuffle); the θ sums and the adjusted-variance
    sums are user-keyed aggregates with a single-row θ broadcast —
    two passes over the user grid, zero over raw events after the
    first.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "SUM(CASE WHEN dayofmonth(ts) <= 15"
            " THEN CAST(FLOOR(value * 1000000) AS BIGINT) ELSE 0 END)"
            " div 10000"
        ).alias("x"),
        F.expr(
            "SUM(CASE WHEN dayofmonth(ts) > 15"
            " THEN CAST(FLOOR(value * 1000000) AS BIGINT) ELSE 0 END)"
            " div 10000"
        ).alias("y"),
    )
    dec = _DEC
    s = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr(dec.format("x") + " * x")).alias("qx"),
        F.sum(F.expr(dec.format("x") + " * y")).alias("sxy"),
    )
    num = f"({dec.format('n')} * sxy - {dec.format('sx')} * sy)"
    den = f"({dec.format('n')} * qx - {dec.format('sx')} * sx)"
    theta = s.select(
        "n",
        F.expr(
            f"CAST(CASE WHEN {num} >= 0 THEN ({num} * 1000000) div {den}"
            f" ELSE -((-({num}) * 1000000) div {den}) END AS BIGINT)"
        ).alias("th"),
    )
    adj = (
        per_user.crossJoin(F.broadcast(theta))
        .select(
            "n",
            "th",
            F.expr("1000000 * y - th * x").alias("a"),
            F.expr("1000000 * y").alias("y6"),
        )
        .groupBy("n", "th")
        .agg(
            F.sum("a").cast("long").alias("sa"),
            F.sum(F.expr(dec.format("a") + " * a")).alias("qa"),
            F.sum("y6").cast("long").alias("sy6"),
            F.sum(F.expr(dec.format("y6") + " * y6")).alias("qy"),
        )
    )
    var_a = f"({dec.format('n')} * qa - {dec.format('sa')} * sa)"
    var_y = f"({dec.format('n')} * qy - {dec.format('sy6')} * sy6)"
    return adj.select(
        F.col("n").alias("n_users"),
        F.col("th").cast("long").alias("theta_ppm"),
        F.expr(
            f"CAST(GREATEST(1000000 - ({var_a} * 1000000) div {var_y},"
            " CAST(0 AS BIGINT)) AS BIGINT)"
        ).alias("var_reduction_ppm"),
    )


# --------------------------------------------------------------------------
# Wasserstein-1 drift over the fixed bucket grid
# --------------------------------------------------------------------------

_W1_BUCKETS = 16

_W1_ORACLE = f"""
    WITH v AS (
      SELECT CAST(FLOOR(value * 1000000) AS BIGINT) AS c,
             CASE WHEN date_part('day', ts) <= 15 THEN 1 ELSE 2 END AS half
      FROM events
    ), stats AS (
      SELECT MIN(c) AS lo, ((MAX(c) - MIN(c)) // {_W1_BUCKETS}) + 1 AS width
      FROM v
    ), b AS (
      SELECT (v.c - stats.lo) // stats.width AS bucket, v.half,
             COUNT(*) AS cnt
      FROM v, stats GROUP BY 1, 2
    ), n AS (
      SELECT SUM(CASE WHEN half = 1 THEN cnt ELSE 0 END) AS n1,
             SUM(CASE WHEN half = 2 THEN cnt ELSE 0 END) AS n2
      FROM b
    ), grid AS (
      SELECT g.bucket,
             COALESCE(SUM(CASE WHEN b.half = 1 THEN b.cnt END), 0) AS c1,
             COALESCE(SUM(CASE WHEN b.half = 2 THEN b.cnt END), 0) AS c2
      FROM (SELECT unnest(range({_W1_BUCKETS})) AS bucket) g
      LEFT JOIN b ON b.bucket = g.bucket
      GROUP BY g.bucket
    ), cum AS (
      SELECT bucket,
             SUM(c1) OVER (ORDER BY bucket) * 1000000 // n.n1 AS fp,
             SUM(c2) OVER (ORDER BY bucket) * 1000000 // n.n2 AS fq
      FROM grid, n
    ), w AS (
      SELECT SUM(ABS(fp - fq)) AS cumdiff FROM cum
    )
    SELECT CAST(n.n1 AS BIGINT) AS n_first, CAST(n.n2 AS BIGINT) AS n_second,
           CAST(stats.width AS BIGINT) AS bucket_width_us,
           CAST(w.cumdiff AS BIGINT) AS cumdiff_ppm,
           CAST(w.cumdiff * stats.width // 1000000 AS BIGINT) AS w1_us
    FROM w, n, stats
    """


@register("events_wasserstein_drift", oracle=_W1_ORACLE)
def events_wasserstein_drift(spark, sf_dir):
    """Wasserstein-1 (earth-mover) drift between the first- and
    second-half-of-month value distributions on the SAME fixed
    {b}-bucket grid as the TVD probe: W₁ = Σ_b |F_P(b) − F_Q(b)|·width
    — the transport-aware drift number that charges for HOW FAR the
    mass moved, where TVD only counts how much.  CDFs are truncated
    ppm over the CONSTANT bucket grid (cumulated in bucket order, so
    the sum is deterministic), and W₁ is emitted both as the raw
    cumulative-ppm sum and in value-micros.

    Scale shape: identical to the TVD probe — one partial-combined
    (bucket, half) histogram is the only pass over events; the dense
    {b}-row grid, CDFs, and the W₁ sum are constant-size arithmetic.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    v = ev.select(
        F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("c"),
        F.expr("CASE WHEN dayofmonth(ts) <= 15 THEN 1 ELSE 2 END").alias(
            "half"
        ),
    )
    stats = v.agg(
        F.min("c").alias("lo"),
        F.expr(f"((MAX(c) - MIN(c)) div {_W1_BUCKETS}) + 1").alias("width"),
    ).localCheckpoint(eager=True)
    b = (
        v.crossJoin(F.broadcast(stats))
        .select(F.expr("(c - lo) div width").alias("bucket"), "half")
        .groupBy("bucket", "half")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    n = b.agg(
        F.sum(F.when(F.col("half") == 1, F.col("cnt")).otherwise(0)).alias(
            "n1"
        ),
        F.sum(F.when(F.col("half") == 2, F.col("cnt")).otherwise(0)).alias(
            "n2"
        ),
    )
    grid = spark.createDataFrame(
        [(i,) for i in range(_W1_BUCKETS)], "bucket bigint"
    )
    dense = (
        grid.join(
            b.groupBy("bucket").agg(
                F.sum(
                    F.when(F.col("half") == 1, F.col("cnt")).otherwise(0)
                ).alias("c1"),
                F.sum(
                    F.when(F.col("half") == 2, F.col("cnt")).otherwise(0)
                ).alias("c2"),
            ),
            "bucket",
            "left",
        )
        .select(
            "bucket",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    cum_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = dense.crossJoin(F.broadcast(n)).select(
        "n1",
        "n2",
        F.sum("c1").over(cum_w).alias("cp"),
        F.sum("c2").over(cum_w).alias("cq"),
    )
    w = cum.select(
        "n1",
        "n2",
        F.abs(
            F.expr("cp * 1000000 div n1") - F.expr("cq * 1000000 div n2")
        ).alias("d"),
    ).agg(
        F.max("n1").cast("long").alias("n_first"),
        F.max("n2").cast("long").alias("n_second"),
        F.sum("d").cast("long").alias("cumdiff"),
    )
    return w.crossJoin(F.broadcast(stats)).select(
        "n_first",
        "n_second",
        F.col("width").cast("long").alias("bucket_width_us"),
        F.col("cumdiff").alias("cumdiff_ppm"),
        F.expr("CAST(cumdiff * width div 1000000 AS BIGINT)").alias("w1_us"),
    )


events_wasserstein_drift.__doc__ = events_wasserstein_drift.__doc__.format(
    b=_W1_BUCKETS
)


# --------------------------------------------------------------------------
# Shewhart X-bar / R control chart
# --------------------------------------------------------------------------

_SPC_N = 5
_A2_PPM = 577_000  # A2 for subgroup size 5, pinned (0.577)

_SPC_ORACLE = f"""
    WITH ranked AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c,
             row_number() OVER (PARTITION BY CAST(l_shipdate AS DATE)
                                ORDER BY l_orderkey, l_linenumber) AS rk
      FROM lineitem
    ), sub AS (
      SELECT d, SUM(c) AS sum5, MAX(c) - MIN(c) AS r
      FROM ranked WHERE rk <= {_SPC_N}
      GROUP BY d HAVING COUNT(*) = {_SPC_N}
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd, SUM(sum5) AS ssum,
             SUM(r) AS sr
      FROM sub
    ), ooc AS (
      SELECT COUNT(*) AS n_out
      FROM sub, g
      WHERE ABS(sub.sum5::HUGEINT * g.nd - g.ssum) * 1000000
            > {_A2_PPM}::HUGEINT * g.sr * {_SPC_N}
    )
    SELECT g.nd AS n_days, CAST({_SPC_N} AS BIGINT) AS subgroup_n,
           CAST(g.ssum // ({_SPC_N} * g.nd) AS BIGINT) AS center_cents,
           CAST(g.sr // g.nd AS BIGINT) AS rbar_cents,
           CAST(({_A2_PPM} * (g.sr // g.nd)) // 1000000 AS BIGINT)
             AS limit_halfwidth_cents,
           CAST(ooc.n_out AS BIGINT) AS n_out_of_control
    FROM g, ooc
    """


@register("lineitem_xbar_control", oracle=_SPC_ORACLE)
def lineitem_xbar_control(spark, sf_dir):
    """Shewhart X̄/R control chart (the SPC classic): per ship day, the
    subgroup is the first {n} line items (by order/line number — fixed
    subgroup size, as the chart requires); a day is OUT OF CONTROL when
    |X̄_d − X̄̄| > A₂·R̄ with A₂({n}) = 0.577 PINNED in ppm.  The
    compare is cleared of every division:
    |sum5_d·N − Σsum5|·1e6 > A₂ppm·ΣR·{n}, so both engines flag the
    same days bit-for-bit.  Reports the center line, average range,
    the control half-width, and the out-of-control census — the ops
    answer to "is this metric stable or trending out of spec".

    Scale shape: the per-day subgroup pick is a day-partitioned rank
    filter (WindowGroupLimit — per-task O({n}) heads per day); subgroup
    stats partial-combine on the CALENDAR-BOUNDED day grid; the chart
    constants are one single-row broadcast.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    ranked = li.select(
        F.col("l_shipdate").cast("date").alias("d"),
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias("c"),
        F.row_number()
        .over(
            Window.partitionBy(F.col("l_shipdate").cast("date")).orderBy(
                "l_orderkey", "l_linenumber"
            )
        )
        .alias("rk"),
    )
    sub = (
        ranked.filter(F.col("rk") <= _SPC_N)
        .groupBy("d")
        .agg(
            F.count("*").alias("m"),
            F.sum("c").alias("sum5"),
            (F.max("c") - F.min("c")).alias("r"),
        )
        .filter(F.col("m") == _SPC_N)
    )
    g = sub.agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("sum5").cast("long").alias("ssum"),
        F.sum("r").cast("long").alias("sr"),
    )
    dec = _DEC
    ooc = (
        sub.crossJoin(F.broadcast(g))
        .filter(
            F.expr(
                f"ABS({dec.format('sum5')} * nd - ssum) * 1000000"
                f" > CAST({_A2_PPM} AS DECIMAL(38,0)) * sr * {_SPC_N}"
            )
        )
        .agg(F.count("*").cast("long").alias("n_out"))
    )
    return g.crossJoin(F.broadcast(ooc)).select(
        F.col("nd").alias("n_days"),
        F.lit(_SPC_N).cast("long").alias("subgroup_n"),
        F.expr(f"CAST(ssum div ({_SPC_N} * nd) AS BIGINT)").alias(
            "center_cents"
        ),
        F.expr("CAST(sr div nd AS BIGINT)").alias("rbar_cents"),
        F.expr(
            f"CAST(({_A2_PPM} * (sr div nd)) div 1000000 AS BIGINT)"
        ).alias("limit_halfwidth_cents"),
        F.col("n_out").alias("n_out_of_control"),
    )


lineitem_xbar_control.__doc__ = lineitem_xbar_control.__doc__.format(n=_SPC_N)


# --------------------------------------------------------------------------
# Mean excess over the exact p90 threshold
# --------------------------------------------------------------------------

_ME_ORACLE = """
    WITH v AS (
      SELECT CAST(FLOOR(value * 1000000) AS BIGINT) AS c FROM events
    ), ladder AS (
      SELECT c, COUNT(*) AS t,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM v GROUP BY c
    ), n AS (SELECT SUM(t) AS n FROM ladder),
    u AS (
      SELECT l.c AS u
      FROM ladder l, n
      WHERE l.below < ((90 * (n.n - 1)) // 100) + 1
        AND ((90 * (n.n - 1)) // 100) + 1 <= l.below + l.t
    ), exc AS (
      SELECT COUNT(*) AS n_exceed, SUM(v.c - u.u) AS excess
      FROM v, u WHERE v.c > u.u
    )
    SELECT CAST(n.n AS BIGINT) AS n, CAST(u.u AS BIGINT) AS u_us,
           CAST(exc.n_exceed AS BIGINT) AS n_exceed,
           CAST(exc.n_exceed * 1000000 // n.n AS BIGINT) AS exceed_ppm,
           CAST(CASE WHEN exc.n_exceed = 0 THEN 0
                ELSE exc.excess // exc.n_exceed END AS BIGINT)
             AS mean_excess_us
    FROM n, u, exc
    """


@register("events_mean_excess", oracle=_ME_ORACLE)
def events_mean_excess(spark, sf_dir):
    """Mean-excess function at the exact nearest-rank p90 — the
    extreme-value-theory diagnostic: E[X − u | X > u] linear in u is
    the generalized-Pareto signature, and its level at p90 is the
    first number a tail-risk model fits.  The threshold comes off the
    value ladder (never interpolated), the exceedance census and the
    conditional mean are exact truncated micros, and the exceedance
    rate in ppm certifies the threshold really cut ≈10% of mass
    (nearest-rank ties can shift it — measured, not assumed).

    Scale shape: the ladder is a partial-combined distinct-value count;
    its below-count comes from the two-phase bucket prefix
    (plans/prefix.py) so the only unpartitioned window runs over the
    bounded unit-bucket value grid — the micros ladder itself grows with
    data; the threshold pick is a ladder join; the excess pass is one
    scan with a single-value broadcast.
    """
    from kafka_sink_spark.plans.prefix import ladder_with_below

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    v = ev.select(F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("c"))
    # Two-phase bucket prefix (1-unit buckets over the micros ladder): the
    # only global window runs over the bounded value-domain grid — the
    # micros ladder itself grows with data until the domain saturates.
    ladder = ladder_with_below(v, "c", bucket_size=1_000_000)
    n = ladder.agg(F.sum("t").cast("long").alias("n"))
    u = (
        ladder.crossJoin(F.broadcast(n))
        .filter(
            (F.col("below") < F.expr("((90 * (n - 1)) div 100) + 1"))
            & (
                F.expr("((90 * (n - 1)) div 100) + 1")
                <= F.col("below") + F.col("t")
            )
        )
        .select(F.col("c").alias("u"))
    )
    exc = v.crossJoin(F.broadcast(u)).filter(F.col("c") > F.col("u")).agg(
        F.count("*").cast("long").alias("n_exceed"),
        F.sum(F.col("c") - F.col("u")).cast("long").alias("excess"),
    )
    return (
        n.crossJoin(F.broadcast(u))
        .crossJoin(F.broadcast(exc))
        .select(
            "n",
            F.col("u").alias("u_us"),
            "n_exceed",
            F.expr("CAST(n_exceed * 1000000 div n AS BIGINT)").alias(
                "exceed_ppm"
            ),
            F.expr(
                "CAST(CASE WHEN n_exceed = 0 THEN 0"
                " ELSE excess div n_exceed END AS BIGINT)"
            ).alias("mean_excess_us"),
        )
    )


# --------------------------------------------------------------------------
# Recommender aggregate diversity / catalog coverage
# --------------------------------------------------------------------------

_DIV_QUERIES = 100
_DIV_K = 5


def _div_oracle(nq: int = _DIV_QUERIES, k: int = _DIV_K, dim: int = 64) -> str:
    from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql

    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {nq}
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings
    ), s AS (
      SELECT query_id, neighbor_id,
             round(({_dot_sql('qe', 'ce', dim)})
                   / ({_norm_sql('qe', dim)} * {_norm_sql('ce', dim)}), 6)
               AS cos_sim
      FROM q, c WHERE query_id <> neighbor_id
    ), knn AS (
      SELECT neighbor_id FROM (
        SELECT neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM s
      ) WHERE rk <= {k}
    ), freq AS (
      SELECT neighbor_id, COUNT(*) AS f FROM knn GROUP BY neighbor_id
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM c)
    SELECT tot.n_corpus,
           CAST({nq} * {k} AS BIGINT) AS n_recommendations,
           CAST((SELECT COUNT(*) FROM freq) AS BIGINT) AS n_distinct_items,
           CAST((SELECT COUNT(*) FROM freq) * 1000000 // tot.n_corpus
             AS BIGINT) AS coverage_ppm,
           CAST((SELECT MAX(f) FROM freq) AS BIGINT) AS max_item_freq
    FROM tot
    """


@register("knn_aggregate_diversity", oracle=_div_oracle())
def knn_aggregate_diversity(spark, sf_dir):
    """Aggregate diversity / catalog coverage of the top-{k} cosine
    recommender over a {q}-query panel (Adomavicius & Kwon 2012): how
    many DISTINCT catalog items the recommendation lists actually
    reach (coverage in ppm of the corpus) and how concentrated they
    are (the most-recommended item's frequency).  Accuracy metrics
    (knn_label_ndcg) reward popular-item bias; this is the
    counterweight a recommender pipeline monitors beside them.

    Scale shape: the panel is broadcast against one corpus scan (the
    knn-family shape); per-query top-{k} is a WindowGroupLimit; the
    frequency profile partial-combines on the item key and the
    readout is single-row.
    """
    from kafka_sink_spark.extensions import similarity

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < _DIV_QUERIES)
    knn = similarity.knn_bruteforce(emb, queries, k=_DIV_K)
    freq = knn.groupBy("neighbor_id").agg(F.count("*").alias("f"))
    prof = freq.agg(
        F.count("*").cast("long").alias("n_distinct_items"),
        F.max("f").cast("long").alias("max_item_freq"),
    )
    tot = emb.agg(F.count("*").cast("long").alias("n_corpus"))
    return tot.crossJoin(F.broadcast(prof)).select(
        "n_corpus",
        F.lit(_DIV_QUERIES * _DIV_K).cast("long").alias("n_recommendations"),
        "n_distinct_items",
        F.expr("CAST(n_distinct_items * 1000000 div n_corpus AS BIGINT)").alias(
            "coverage_ppm"
        ),
        "max_item_freq",
    )


knn_aggregate_diversity.__doc__ = knn_aggregate_diversity.__doc__.format(
    q=_DIV_QUERIES, k=_DIV_K
)
