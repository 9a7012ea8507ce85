"""Round-7k wave: data governance and robust preprocessing — privacy
diversity, fairness screening, targeting lift, seasonal strength, and
outlier-immune estimation — five more published techniques in the
catalog's exact-integer, oracle-twinned style.

- ``events_l_diversity``  l-diversity audit (Machanavajjhala et al.
  2007): k-anonymity's companion — per quasi-identifier equivalence
  class (user bucket × hour, the events_k_anonymity QI minus the
  sensitive column), the number of DISTINCT sensitive values
  (event_type); classes with l = 1 leak the sensitive attribute even
  when k is large.  Banded census in exact ppm.
- ``orders_disparate_impact``  the EEOC 80%-rule screen: per customer
  market segment, the urgent-order selection rate and its ratio to the
  best segment's rate — a ratio below 800 000 ppm flags adverse
  impact.  The standard fairness smoke test, exact.
- ``customer_decile_lift``  decile lift / gains analysis: customers
  ranked into spend deciles by the catalog's two-phase bucket-prefix
  rank (never a global sort), response = placed ≥1 urgent order;
  lift_d = rate_d / overall rate in ppm — the classical targeting
  chart certified against SQL.
- ``orders_seasonal_strength``  STL-style strength-of-seasonality and
  strength-of-trend (Hyndman & Athanasopoulos): F = max(0,
  1 − Var(R)/Var(component+R)) with every series kept in integral
  7×-cents (the weekday-profile decomposition) so the variance ratio
  is one decimal(38) cross-multiplication — the numbers that tell a
  forecaster whether the weekly cycle is real.
- ``supplier_winsorized_balance``  winsorized mean (the robust
  location estimator): account balances clamped to the exact
  nearest-rank [p5, p95] before averaging, beside the raw mean —
  the preprocessing step that tames heavy tails without dropping
  rows; balances are signed, so every division is sign-split.

Determinism per the package convention: integer arithmetic end-to-end,
sign-split truncating division, nearest-rank quantiles off value
ladders, variance ratios by cross-multiplication in decimal(38).

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
# l-diversity audit
# --------------------------------------------------------------------------

_LDIV_ORACLE = """
    WITH qi AS (
      SELECT user_id // 10 AS user_bucket,
             CAST(hour(ts) AS BIGINT) AS hod,
             event_type
      FROM events
    ), classes AS (
      SELECT user_bucket, hod,
             COUNT(*) AS sz,
             COUNT(DISTINCT event_type) AS l
      FROM qi GROUP BY user_bucket, hod
    ), banded AS (
      SELECT CASE WHEN l = 1 THEN '1'
                  WHEN l = 2 THEN '2'
                  WHEN l BETWEEN 3 AND 4 THEN '3-4'
                  ELSE '5+' END AS l_band,
             sz
      FROM classes
    ), tot AS (SELECT SUM(sz) AS n_rows FROM banded)
    SELECT l_band,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(SUM(sz) * 1000000 // tot.n_rows AS BIGINT) AS rows_ppm
    FROM banded, tot
    GROUP BY l_band, tot.n_rows
    """


@register("events_l_diversity", oracle=_LDIV_ORACLE)
def events_l_diversity(spark, sf_dir):
    """l-diversity audit (Machanavajjhala et al. 2007) — the privacy
    check k-anonymity misses: over the (user-bucket, hour) equivalence
    classes (events_k_anonymity's quasi-identifier minus the sensitive
    column), l = the number of DISTINCT sensitive values (event_type)
    per class.  A class can hold 100 rows (k-anonymous) and still leak
    everything if all 100 share one event type (l = 1); the banded
    census (1 / 2 / 3-4 / 5+) reports how much of the table sits at
    each diversity level, in exact ppm of rows.

    Scale shape: one partial-combined (class, sensitive) pass feeds a
    distinct-count per class (two stage-local aggregations on the same
    class key — a single exchange); the band census is a grid-sized
    rollup with a single-row total broadcast.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    classes = (
        ev.select(
            F.expr("user_id div 10").alias("user_bucket"),
            F.hour("ts").cast("long").alias("hod"),
            "event_type",
        )
        .groupBy("user_bucket", "hod")
        .agg(
            F.count("*").alias("sz"),
            F.countDistinct("event_type").alias("l"),
        )
    )
    banded = classes.select(
        F.when(F.col("l") == 1, "1")
        .when(F.col("l") == 2, "2")
        .when(F.col("l") <= 4, "3-4")
        .otherwise("5+")
        .alias("l_band"),
        "sz",
    )
    tot = banded.agg(F.sum("sz").alias("n_rows_t"))
    return (
        banded.groupBy("l_band")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum("sz").cast("long").alias("n_rows"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "l_band",
            "n_classes",
            "n_rows",
            F.expr("CAST(n_rows * 1000000 div n_rows_t AS BIGINT)").alias(
                "rows_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# Disparate impact (80% rule) across market segments
# --------------------------------------------------------------------------

_DI_ORACLE = """
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), g AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(pos) AS BIGINT) AS n_urgent,
             SUM(pos) * 1000000 // COUNT(*) AS rate_ppm
      FROM j GROUP BY segment
    ), best AS (SELECT MAX(rate_ppm) AS best_rate FROM g)
    SELECT segment, n_orders, n_urgent,
           CAST(rate_ppm AS BIGINT) AS rate_ppm,
           CAST(rate_ppm * 1000000 // best.best_rate AS BIGINT)
             AS di_vs_best_ppm
    FROM g, best
    """


@register("orders_disparate_impact", oracle=_DI_ORACLE)
def orders_disparate_impact(spark, sf_dir):
    """The four-fifths (80%) rule — the standard disparate-impact
    screen: per customer market segment, the urgent-order selection
    rate in exact ppm and its ratio to the BEST segment's rate; any
    segment whose di_vs_best_ppm falls below 800 000 would flag adverse
    impact under the EEOC guideline.  On this synthetic fleet the rates
    should be statistically flat — certified, not assumed, and the
    harness any (group, outcome) pair drops into.

    Scale shape: one fact-dimension equi-join on the customer key
    (unhinted — AQE broadcasts the dimension while it is small, shuffle
    at 100 TB), one partial-combined (segment) aggregate over the
    5-segment grid, and a single-row best-rate broadcast.
    """
    od = load_tables(spark, sf_dir, ("orders", "customer"))
    j = od["orders"].join(
        od["customer"],
        od["orders"].o_custkey == od["customer"].c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"
        ).alias("pos"),
    )
    g = j.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("pos").cast("long").alias("n_urgent"),
        F.expr("SUM(pos) * 1000000 div COUNT(*)").alias("rate_ppm"),
    )
    best = g.agg(F.max("rate_ppm").alias("best_rate"))
    return g.crossJoin(F.broadcast(best)).select(
        "segment",
        "n_orders",
        "n_urgent",
        F.col("rate_ppm").cast("long").alias("rate_ppm"),
        F.expr("CAST(rate_ppm * 1000000 div best_rate AS BIGINT)").alias(
            "di_vs_best_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Decile lift / gains analysis
# --------------------------------------------------------------------------

_LIFT_BUCKET = 1_000_000  # cents per spend bucket ($10k)


_LIFT_ORACLE = f"""
    WITH spend AS (
      SELECT o_custkey AS ck,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS sp,
             MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS resp
      FROM orders GROUP BY o_custkey
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM spend),
    ranked AS (
      SELECT ck, sp, resp,
             row_number() OVER (ORDER BY sp DESC, ck) AS rk
      FROM spend
    ), deciled AS (
      SELECT resp, ((rk - 1) * 10) // n.n AS decile FROM ranked, n
    ), overall AS (
      SELECT SUM(resp) * 1000000 // COUNT(*) AS rate FROM deciled
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(resp) AS BIGINT) AS responders,
           CAST(SUM(resp) * 1000000 // COUNT(*) AS BIGINT) AS rate_ppm,
           CAST((SUM(resp) * 1000000 // COUNT(*)) * 1000000
                // overall.rate AS BIGINT) AS lift_ppm
    FROM deciled, overall
    GROUP BY decile, overall.rate
    """


@register("customer_decile_lift", oracle=_LIFT_ORACLE)
def customer_decile_lift(spark, sf_dir):
    """Decile lift (gains) analysis: customers ranked by total spend
    into deciles, response = placed at least one urgent order;
    lift_d = rate_d / overall-rate in ppm — the classical targeting
    chart (decile 0 ≫ 1e6 ppm means spend predicts urgency).  The
    exact spend rank uses the catalog's TWO-PHASE bucket-prefix
    pattern — a bounded $10k-bucket histogram + bounded prefix gives
    each bucket its rank offset, a bucket-local window finishes — so
    the oracle's global row_number is reproduced without any
    rangepartitioned sort of customers.

    Scale shape: per-customer spend partial-combines on the customer
    key (the one fact-sized shuffle); ranks come from bucket-local
    windows over the bounded spend grid; the decile rollup is 10 rows
    with a single-row overall-rate broadcast.
    """
    od = load_tables(spark, sf_dir, ("orders",))["orders"]
    spend = od.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).alias("sp"),
        F.max(
            F.expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END")
        ).alias("resp"),
    )
    n = spend.agg(F.count("*").cast("long").alias("n"))
    b = spend.select(
        "ck", "sp", "resp", F.expr(f"sp div {_LIFT_BUCKET}").alias("bk")
    )
    bstats = b.groupBy("bk").agg(F.count("*").alias("bcnt"))
    above_w = Window.orderBy(F.col("bk").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bpre = bstats.select(
        "bk", F.coalesce(F.sum("bcnt").over(above_w), F.lit(0)).alias("above")
    )
    in_bucket_w = Window.partitionBy("bk").orderBy(
        F.col("sp").desc(), F.col("ck")
    )
    ranked = b.join(F.broadcast(bpre), "bk").select(
        "resp",
        (F.col("above") + F.row_number().over(in_bucket_w)).alias("rk"),
    )
    deciled = ranked.crossJoin(F.broadcast(n)).select(
        "resp", F.expr("((rk - 1) * 10) div n").alias("decile")
    )
    overall = deciled.agg(
        F.expr("SUM(resp) * 1000000 div COUNT(*)").alias("rate")
    )
    return (
        deciled.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("resp").cast("long").alias("responders"),
            F.expr("SUM(resp) * 1000000 div COUNT(*)").alias("rate_raw"),
        )
        .crossJoin(F.broadcast(overall))
        .select(
            "decile",
            "n_customers",
            "responders",
            F.col("rate_raw").cast("long").alias("rate_ppm"),
            F.expr("CAST(rate_raw * 1000000 div rate AS BIGINT)").alias(
                "lift_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# STL-style seasonal / trend strength
# --------------------------------------------------------------------------

_STRENGTH_ORACLE = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ), ma AS (
      SELECT d, y, SUM(y) OVER w AS s7, COUNT(*) OVER w AS c7
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), detr AS (
      SELECT d, isodow(d) AS dow, 7 * y AS y7, s7, 7 * y - s7 AS x7
      FROM ma WHERE c7 = 7
    ), seas AS (
      SELECT dow,
             CASE WHEN SUM(x7) >= 0 THEN SUM(x7) // COUNT(*)
                  ELSE -((-SUM(x7)) // COUNT(*)) END AS s7dow
      FROM detr GROUP BY dow
    ), comp AS (
      SELECT detr.x7 - seas.s7dow AS r7,
             detr.x7 AS d7,
             detr.y7 - seas.s7dow AS t7
      FROM detr JOIN seas ON seas.dow = detr.dow
    ), v AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(r7::HUGEINT * r7) AS qr, SUM(r7) AS sr,
             SUM(d7::HUGEINT * d7) AS qd, SUM(d7) AS sd,
             SUM(t7::HUGEINT * t7) AS qt, SUM(t7) AS st
      FROM comp
    )
    SELECT n AS n_days,
           CAST(GREATEST(1000000
                - ((n * qr - sr::HUGEINT * sr) * 1000000)
                  // (n * qd - sd::HUGEINT * sd), 0) AS BIGINT)
             AS f_seasonal_ppm,
           CAST(GREATEST(1000000
                - ((n * qr - sr::HUGEINT * sr) * 1000000)
                  // (n * qt - st::HUGEINT * st), 0) AS BIGINT)
             AS f_trend_ppm
    FROM v
    """


@register("orders_seasonal_strength", oracle=_STRENGTH_ORACLE)
def orders_seasonal_strength(spark, sf_dir):
    """STL-style strength of seasonality and trend (Hyndman &
    Athanasopoulos): with the weekday-profile decomposition kept in
    integral 7×-cents (trend 7T = Σ₇, detrended X = 7y − 7T, weekday
    seasonal s = mean X per ISO weekday, remainder R = X − s),
    F_seasonal = max(0, 1 − Var(R)/Var(S+R)) and F_trend = max(0,
    1 − Var(R)/Var(T+R)) — each variance ratio ONE decimal(38) ≙
    HUGEINT cross-multiplication ((nΣr²−(Σr)²)/(nΣd²−(Σd)²); the n²
    denominators cancel because every component runs over the SAME
    day rows).  Strengths near 1e6 certify a real weekly cycle /
    trend; near 0, noise.  The go/no-go in front of any seasonal
    forecasting.

    Scale shape: daily totals partial-combine onto the
    CALENDAR-BOUNDED day grid; the 7-row window, the 7-row weekday
    means, and the variance sums all run on that bounded series —
    nothing after the first aggregate touches raw orders.
    """
    od = load_tables(spark, sf_dir, ("orders",))["orders"]
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).alias("y")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "y",
        F.sum("y").over(w).alias("s7"),
        F.count("*").over(w).alias("c7"),
    )
    detr = ma.filter(F.col("c7") == 7).select(
        F.expr("weekday(d) + 1").alias("dow"),
        (7 * F.col("y")).alias("y7"),
        (7 * F.col("y") - F.col("s7")).alias("x7"),
    )
    seas = detr.groupBy("dow").agg(
        F.expr(
            "CASE WHEN SUM(x7) >= 0 THEN SUM(x7) div COUNT(*)"
            " ELSE -((-SUM(x7)) div COUNT(*)) END"
        ).alias("s7dow")
    )
    comp = detr.join(F.broadcast(seas), "dow").select(
        (F.col("x7") - F.col("s7dow")).alias("r7"),
        F.col("x7").alias("d7"),
        (F.col("y7") - F.col("s7dow")).alias("t7"),
    )
    dec = _DEC
    v = comp.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr(dec.format("r7") + " * r7")).alias("qr"),
        F.sum("r7").cast("long").alias("sr"),
        F.sum(F.expr(dec.format("d7") + " * d7")).alias("qd"),
        F.sum("d7").cast("long").alias("sd"),
        F.sum(F.expr(dec.format("t7") + " * t7")).alias("qt"),
        F.sum("t7").cast("long").alias("st"),
    )
    var = "({n} * {q} - {ds} * {s})".format
    vr = var(n=dec.format("n"), q="qr", ds=dec.format("sr"), s="sr")
    vd = var(n=dec.format("n"), q="qd", ds=dec.format("sd"), s="sd")
    vt = var(n=dec.format("n"), q="qt", ds=dec.format("st"), s="st")
    return v.select(
        F.col("n").alias("n_days"),
        F.expr(
            f"CAST(GREATEST(1000000 - ({vr} * 1000000) div {vd},"
            " CAST(0 AS BIGINT)) AS BIGINT)"
        ).alias("f_seasonal_ppm"),
        F.expr(
            f"CAST(GREATEST(1000000 - ({vr} * 1000000) div {vt},"
            " CAST(0 AS BIGINT)) AS BIGINT)"
        ).alias("f_trend_ppm"),
    )


# --------------------------------------------------------------------------
# Winsorized mean of supplier balances
# --------------------------------------------------------------------------

_WINS_LO = 5
_WINS_HI = 95


_WINS_ORACLE = f"""
    WITH v AS (
      SELECT CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS c FROM supplier
    ), ladder AS (
      SELECT c, COUNT(*) AS t,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM v GROUP BY c
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS s FROM v),
    targets AS (
      SELECT u.q, ((u.q * (n.n - 1)) // 100) + 1 AS r, n.n
      FROM n, unnest([{_WINS_LO}, {_WINS_HI}]) AS u(q)
    ), picked AS (
      SELECT t.q, l.c
      FROM targets t JOIN ladder l
        ON l.below < t.r AND t.r <= l.below + l.t
    ), qs AS (
      SELECT MAX(CASE WHEN q = {_WINS_LO} THEN c END) AS q_lo,
             MAX(CASE WHEN q = {_WINS_HI} THEN c END) AS q_hi
      FROM picked
    ), wins AS (
      SELECT SUM(CASE WHEN v.c < qs.q_lo THEN qs.q_lo
                      WHEN v.c > qs.q_hi THEN qs.q_hi
                      ELSE v.c END) AS ws
      FROM v, qs
    )
    SELECT n.n, qs.q_lo AS q5_cents, qs.q_hi AS q95_cents,
           CAST(CASE WHEN n.s >= 0 THEN n.s // n.n
                ELSE -((-n.s) // n.n) END AS BIGINT) AS raw_mean_cents,
           CAST(CASE WHEN wins.ws >= 0 THEN wins.ws // n.n
                ELSE -((-wins.ws) // n.n) END AS BIGINT)
             AS winsorized_mean_cents
    FROM n, qs, wins
    """


@register("supplier_winsorized_balance", oracle=_WINS_ORACLE)
def supplier_winsorized_balance(spark, sf_dir):
    """Winsorized mean of supplier account balances — the robust
    location estimator that CLAMPS to the exact nearest-rank
    [p{lo}, p{hi}] instead of dropping rows (trimming loses mass;
    winsorizing keeps n): quantiles off the signed-cents value ladder,
    clamp in one projection, and both means in sign-split cents (floor
    on negative balances is toward −∞ in BOTH engines, so everything
    stays bit-identical).  The raw-vs-winsorized gap measures how much
    the tails move the books — the preprocessing certificate any
    heavy-tailed monetary column needs.

    Scale shape: the ladder is a partial-combined distinct-value count;
    its below-count comes from the two-phase bucket prefix
    (plans/prefix.py) so the only unpartitioned window runs over the
    bounded $100-bucket balance grid, never the supplier ladder; the
    two-rank pick is a ladder join; the clamp pass is one scan with a
    2-value broadcast.
    """
    from kafka_sink_spark.plans.prefix import ladder_with_below

    sup = load_tables(spark, sf_dir, ("supplier",))["supplier"]
    v = sup.select(F.expr("CAST(FLOOR(s_acctbal * 100) AS BIGINT)").alias("c"))
    # Two-phase bucket prefix ($100 buckets): the only global window runs
    # over the bounded balance-domain grid, never the supplier ladder.
    ladder = ladder_with_below(v, "c", bucket_size=10_000)
    # totals derive from the ladder (n = Σt, s = Σc·t) — no second scan
    n = ladder.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("t")).cast("long").alias("s"),
    )
    targets = n.select(
        "n",
        F.explode(F.array(F.lit(_WINS_LO), F.lit(_WINS_HI))).alias("q"),
    ).select("n", "q", F.expr("((q * (n - 1)) div 100) + 1").alias("r"))
    picked = targets.join(
        F.broadcast(ladder),
        (F.col("below") < F.col("r"))
        & (F.col("r") <= F.col("below") + F.col("t")),
    ).select("q", "c")
    qs = picked.agg(
        F.max(F.when(F.col("q") == _WINS_LO, F.col("c"))).alias("q_lo"),
        F.max(F.when(F.col("q") == _WINS_HI, F.col("c"))).alias("q_hi"),
    )
    wins = v.crossJoin(F.broadcast(qs)).agg(
        F.sum(
            F.expr(
                "CASE WHEN c < q_lo THEN q_lo WHEN c > q_hi THEN q_hi"
                " ELSE c END"
            )
        )
        .cast("long")
        .alias("ws")
    )
    return (
        n.crossJoin(F.broadcast(qs.select("q_lo", "q_hi")))
        .crossJoin(F.broadcast(wins))
        .select(
            "n",
            F.col("q_lo").alias("q5_cents"),
            F.col("q_hi").alias("q95_cents"),
            F.expr(
                "CAST(CASE WHEN s >= 0 THEN s div n ELSE -((-s) div n) END"
                " AS BIGINT)"
            ).alias("raw_mean_cents"),
            F.expr(
                "CAST(CASE WHEN ws >= 0 THEN ws div n ELSE -((-ws) div n) END"
                " AS BIGINT)"
            ).alias("winsorized_mean_cents"),
        )
    )


supplier_winsorized_balance.__doc__ = supplier_winsorized_balance.__doc__.format(
    lo=_WINS_LO, hi=_WINS_HI
)
