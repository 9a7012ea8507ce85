"""Round-7g wave: robust / classical inference over the event and order
streams — five published tests in the catalog's exact-integer,
oracle-twinned style.

- ``events_pettitt_changepoint``  Pettitt's rank-based change-point test
  (Pettitt 1979): U_t = Σ_{i≤t} (2·midrank_i − (n+1)) over the daily
  value series per event type; the day maximizing |U_t| is the candidate
  break.  Doubled midranks keep U_t integral under ties (the same ladder
  as docs_spearman_rho); the significance screen 6K²/(n³+n²) is emitted
  in exact ppm (> 3_688_879 ppm ⇔ p < 0.05 under Pettitt's approximation).
- ``lineitem_welch_ttest``  Welch's unequal-variance t² between the
  returned ('R') and acknowledged ('A') lineitem price populations, with
  the Welch–Satterthwaite degrees of freedom — the workhorse two-sample
  location test.  Sums/sum-of-squares stay exact in decimal(38); the
  only truncations are the catalog's documented ppm divisions.
- ``orders_anova_f``  one-way ANOVA F across the five order priorities:
  SSB/SSW from exact per-group sums (never float expected values),
  F in ppm.
- ``events_theil_sen_trend``  Theil–Sen median slope + the Mann–Kendall
  S statistic over the daily value totals: every pairwise slope is an
  exact truncated micro-units-per-day integer, the median is a
  nearest-rank pick, and S = Σ sgn(y_j − y_i) is exact — the standard
  robust trend pair (Sen 1968; Mann 1945).
- ``events_bowley_skewness``  Bowley's quartile skewness per event type,
  (Q3 + Q1 − 2·Q2)/(Q3 − Q1) in signed ppm over exact nearest-rank
  quartiles picked off the value-domain ladder — the outlier-immune
  skewness measure.

Determinism per the package convention: integer/decimal(38) arithmetic
end-to-end, sign-split truncating division (Spark ``div`` truncates,
DuckDB ``//`` floors — operands are kept non-negative), doubled midranks
for ties, nearest-rank (never interpolated) quantiles.

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
# Pettitt rank change-point per event type
# --------------------------------------------------------------------------

_PETTITT_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS x
      FROM events GROUP BY 1, 2
    ), ladder AS (
      SELECT event_type, x, COUNT(*) AS t,
             COALESCE(SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM daily GROUP BY event_type, x
    ), sized AS (
      SELECT d.event_type, d.d,
             2 * l.below + l.t + 1 AS r2,
             COUNT(*) OVER (PARTITION BY d.event_type) AS n
      FROM daily d JOIN ladder l
        ON l.event_type = d.event_type AND l.x = d.x
    ), cum AS (
      SELECT event_type, d, n,
             ROW_NUMBER() OVER w AS ti,
             SUM(r2 - (n + 1)) OVER w AS u
      FROM sized
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), best AS (
      SELECT event_type, d, n, ABS(u) AS k,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ABS(u) DESC, d) AS rk
      FROM cum WHERE ti < n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(d AS VARCHAR) AS change_day,
           CAST(k AS BIGINT) AS k_stat,
           CAST((6 * k::HUGEINT * k * 1000000)
                // (n::HUGEINT * n * n + n::HUGEINT * n) AS BIGINT)
             AS stat_ppm
    FROM best WHERE rk = 1
    """


@register("events_pettitt_changepoint", oracle=_PETTITT_ORACLE)
def events_pettitt_changepoint(spark, sf_dir):
    """Pettitt's nonparametric change-point test (Pettitt 1979) on each
    event type's daily value series: with doubled midranks r2 off the
    distinct-value ladder, U_t = Σ_{i≤t} (r2_i − (n+1)) is EXACTLY the
    Pettitt statistic (integral even under ties), and the reported day is
    the earliest t < n maximizing |U_t|.  The screen statistic
    6K²/(n³+n²) is exact ppm; Pettitt's approximation p ≈ 2·exp(−stat)
    puts the 5% line at stat > ln(40)·1e6 ≈ 3_688_879 ppm.  The same
    rank discipline as docs_spearman_rho — no floats anywhere.

    Scale shape: daily totals partial-combine on (type, day); the rank
    ladder and cumulative U_t run over the CALENDAR-BOUNDED day domain
    per type (a per-type window over ≤ days rows, never over raw
    events); the argmax is a per-type rank-1 filter (WindowGroupLimit).
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)")).alias("x")
    )
    below_w = Window.partitionBy("event_type").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ladder = (
        daily.groupBy("event_type", "x")
        .agg(F.count("*").alias("t"))
        .select(
            "event_type",
            "x",
            (
                2 * F.coalesce(F.sum("t").over(below_w), F.lit(0))
                + F.col("t")
                + 1
            ).alias("r2"),
        )
    )
    sized = daily.join(ladder, ["event_type", "x"]).select(
        "event_type",
        "d",
        "r2",
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    cum_w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sized.select(
        "event_type",
        "d",
        "n",
        F.row_number().over(Window.partitionBy("event_type").orderBy("d")).alias("ti"),
        F.sum(F.col("r2") - (F.col("n") + 1)).over(cum_w).alias("u"),
    )
    best = (
        cum.filter(F.col("ti") < F.col("n"))
        .select(
            "event_type",
            "d",
            "n",
            F.abs(F.col("u")).alias("k"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("k").desc(), F.col("d")
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return best.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("d").cast("string").alias("change_day"),
        F.col("k").cast("long").alias("k_stat"),
        F.expr(
            "CAST((6 * CAST(k AS DECIMAL(38,0)) * k * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * n * n + CAST(n AS DECIMAL(38,0)) * n)"
            " AS BIGINT)"
        ).alias("stat_ppm"),
    )


# --------------------------------------------------------------------------
# Welch's t² between returned and acknowledged lineitem prices
# --------------------------------------------------------------------------

_WELCH_ORACLE = """
    WITH g AS (
      SELECT
        CAST(COUNT(*) FILTER (l_returnflag = 'R') AS BIGINT) AS n_r,
        CAST(COUNT(*) FILTER (l_returnflag = 'A') AS BIGINT) AS n_a,
        SUM(CAST(FLOOR(l_extendedprice) AS BIGINT))
          FILTER (l_returnflag = 'R') AS s_r,
        SUM(CAST(FLOOR(l_extendedprice) AS BIGINT))
          FILTER (l_returnflag = 'A') AS s_a,
        SUM(CAST(FLOOR(l_extendedprice) AS HUGEINT)
            * CAST(FLOOR(l_extendedprice) AS BIGINT))
          FILTER (l_returnflag = 'R') AS q_r,
        SUM(CAST(FLOOR(l_extendedprice) AS HUGEINT)
            * CAST(FLOOR(l_extendedprice) AS BIGINT))
          FILTER (l_returnflag = 'A') AS q_a
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ), w AS (
      SELECT
        n_r, n_a,
        s_r * 1000000 // n_r AS mean_r_ppm,
        s_a * 1000000 // n_a AS mean_a_ppm,
        ((n_r * q_r - s_r::HUGEINT * s_r) * 1000000)
          // (n_r::HUGEINT * n_r * (n_r - 1)) AS ar,
        ((n_a * q_a - s_a::HUGEINT * s_a) * 1000000)
          // (n_a::HUGEINT * n_a * (n_a - 1)) AS aa,
        ((s_r::HUGEINT * n_a - s_a::HUGEINT * n_r)
         * (s_r::HUGEINT * n_a - s_a::HUGEINT * n_r) * 1000000)
          // (n_r::HUGEINT * n_r * n_a * n_a) AS num6
      FROM g
    )
    SELECT n_r, n_a,
           CAST(mean_r_ppm AS BIGINT) AS mean_r_ppm,
           CAST(mean_a_ppm AS BIGINT) AS mean_a_ppm,
           CAST((num6 * 1000000) // (ar + aa) AS BIGINT) AS t2_ppm,
           CAST(((ar // 1000 + aa // 1000) * (ar // 1000 + aa // 1000)
                 * (n_r - 1) * (n_a - 1) * 1000000)
                // ((ar // 1000) * (ar // 1000) * (n_a - 1)
                    + (aa // 1000) * (aa // 1000) * (n_r - 1))
             AS BIGINT) AS df_ppm
    FROM w
    """


@register("lineitem_welch_ttest", oracle=_WELCH_ORACLE)
def lineitem_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance two-sample test between the returned
    ('R') and acknowledged ('A') lineitem extended prices, in the
    catalog's sqrt-free squared form: t² = (m_R − m_A)² / (v_R/n_R +
    v_A/n_A) in ppm, plus the Welch–Satterthwaite degrees of freedom
    df = (A_R + A_A)² / (A_R²/(n_R−1) + A_A²/(n_A−1)) in ppm, where
    A_g = v_g/n_g.  Group sums and sums of squares are EXACT integer
    dollars in decimal(38) ≙ HUGEINT; the mean difference is cleared by
    cross-multiplication ((S_R·n_A − S_A·n_R)²/(n_R²n_A²)) so the only
    truncation anywhere is the final documented ppm division of each
    term — both engines truncate identically on the non-negative
    operands.  Dollars (not cents) keep the squared cross-products
    inside decimal(38) headroom at bench scale; for df the ppm-scaled
    A_g terms are milli-reduced (÷1000, identically in both engines)
    before squaring so the common-denominator form
    (A_R+A_A)²(n_R−1)(n_A−1) / (A_R²(n_A−1)+A_A²(n_R−1)) also stays
    inside decimal(38).

    Scale shape: ONE partial-combined aggregate over the two price
    populations (count/sum/sum-of-squares per flag) is the only pass
    over raw rows; everything after is single-row arithmetic on a
    broadcast-sized relation.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    dol = "CAST(FLOOR(l_extendedprice) AS BIGINT)"
    dol2 = f"CAST(FLOOR(l_extendedprice) AS DECIMAL(38,0)) * {dol}"
    g = li.filter(F.col("l_returnflag").isin("R", "A")).agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("long").alias("n_r"),
        F.count(F.when(F.col("l_returnflag") == "A", 1)).cast("long").alias("n_a"),
        F.sum(F.expr(f"CASE WHEN l_returnflag = 'R' THEN {dol} END"))
        .cast("long")
        .alias("s_r"),
        F.sum(F.expr(f"CASE WHEN l_returnflag = 'A' THEN {dol} END"))
        .cast("long")
        .alias("s_a"),
        F.sum(F.expr(f"CASE WHEN l_returnflag = 'R' THEN {dol2} END")).alias(
            "q_r"
        ),
        F.sum(F.expr(f"CASE WHEN l_returnflag = 'A' THEN {dol2} END")).alias(
            "q_a"
        ),
    )
    dec = _DEC
    w = g.select(
        "n_r",
        "n_a",
        F.expr(f"{dec.format('s_r')} * 1000000 div n_r").alias("mean_r_ppm"),
        F.expr(f"{dec.format('s_a')} * 1000000 div n_a").alias("mean_a_ppm"),
        F.expr(
            f"((n_r * q_r - {dec.format('s_r')} * s_r) * 1000000)"
            f" div ({dec.format('n_r')} * n_r * (n_r - 1))"
        ).alias("ar"),
        F.expr(
            f"((n_a * q_a - {dec.format('s_a')} * s_a) * 1000000)"
            f" div ({dec.format('n_a')} * n_a * (n_a - 1))"
        ).alias("aa"),
        F.expr(
            f"(({dec.format('s_r')} * n_a - {dec.format('s_a')} * n_r)"
            f" * ({dec.format('s_r')} * n_a - {dec.format('s_a')} * n_r)"
            " * 1000000)"
            f" div ({dec.format('n_r')} * n_r * n_a * n_a)"
        ).alias("num6"),
    )
    return w.select(
        "n_r",
        "n_a",
        F.expr("CAST(mean_r_ppm AS BIGINT)").alias("mean_r_ppm"),
        F.expr("CAST(mean_a_ppm AS BIGINT)").alias("mean_a_ppm"),
        F.expr(
            f"CAST(({dec.format('num6')} * 1000000) div (ar + aa) AS BIGINT)"
        ).alias("t2_ppm"),
        F.expr(
            "CAST(((CAST(ar div 1000 AS DECIMAL(38,0)) + aa div 1000)"
            " * (CAST(ar div 1000 AS DECIMAL(38,0)) + aa div 1000)"
            " * (n_r - 1) * (n_a - 1) * 1000000)"
            " div (CAST(ar div 1000 AS DECIMAL(38,0)) * (ar div 1000)"
            " * (n_a - 1)"
            " + CAST(aa div 1000 AS DECIMAL(38,0)) * (aa div 1000)"
            " * (n_r - 1)) AS BIGINT)"
        ).alias("df_ppm"),
    )


# --------------------------------------------------------------------------
# One-way ANOVA F across order priorities
# --------------------------------------------------------------------------

_ANOVA_ORACLE = """
    WITH g AS (
      SELECT o_orderpriority AS pr,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS s,
             SUM(CAST(FLOOR(o_totalprice) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice) AS BIGINT)) AS q
      FROM orders GROUP BY 1
    ), parts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(n) AS n, SUM(s) AS s, SUM(q) AS q,
             SUM((s::HUGEINT * s) // n) AS sb
      FROM g
    ), ss AS (
      SELECT k, n,
             GREATEST(sb - (s::HUGEINT * s) // n, 0) AS ssb,
             GREATEST(q::HUGEINT - sb, 0) AS ssw
      FROM parts
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n,
           CAST(ssb AS BIGINT) AS ssb_dollars2,
           CAST(ssw AS BIGINT) AS ssw_dollars2,
           CAST((ssb::HUGEINT * (n - k) * 1000000) // (ssw::HUGEINT * (k - 1))
             AS BIGINT) AS f_ppm
    FROM ss
    """


@register("orders_anova_f", oracle=_ANOVA_ORACLE)
def orders_anova_f(spark, sf_dir):
    """One-way ANOVA F statistic for order total price across the five
    order priorities: F = (SSB/(k−1)) / (SSW/(N−k)) with the sums of
    squares computed from EXACT integer-dollar group sums via
    SSB = Σ S_g²/n_g − S²/N and SSW = Q − Σ S_g²/n_g (never float group
    means), every product in decimal(38) ≙ HUGEINT and each S²/n term
    truncated to whole dollars² (a ≤1-dollar² grain per group, clamped
    at zero so both engines agree bit-for-bit even when the true SSB is
    smaller than the rounding residue).  F ≈ 1e6 ppm says priority
    explains nothing beyond noise — the expected verdict on this
    synthetic fleet, certified rather than assumed.

    Scale shape: ONE partial-combined aggregate (count/sum/sum-of-
    squares per priority — a 5-row grid) is the only pass over orders;
    the F arithmetic is single-row decimal math.
    """
    od = load_tables(spark, sf_dir, ("orders",))["orders"]
    dec = _DEC
    g = od.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)"))
        .cast("long")
        .alias("s"),
        F.sum(
            F.expr(
                "CAST(FLOOR(o_totalprice) AS DECIMAL(38,0))"
                " * CAST(FLOOR(o_totalprice) AS BIGINT)"
            )
        ).alias("q"),
    )
    parts = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("n"),
        F.sum("s").cast("long").alias("s"),
        F.sum("q").alias("q"),
        F.sum(F.expr(f"({dec.format('s')} * s) div n")).cast("long").alias("sb"),
    )
    ss = parts.select(
        "k",
        "n",
        F.expr(
            f"GREATEST(sb - ({dec.format('s')} * s) div n, CAST(0 AS BIGINT))"
        ).alias("ssb"),
        F.expr("GREATEST(CAST(q AS BIGINT) - sb, CAST(0 AS BIGINT))").alias(
            "ssw"
        ),
    )
    return ss.select(
        F.col("k").alias("k_groups"),
        "n",
        F.col("ssb").alias("ssb_dollars2"),
        F.col("ssw").alias("ssw_dollars2"),
        F.expr(
            f"CAST(({dec.format('ssb')} * (n - k) * 1000000)"
            f" div ({dec.format('ssw')} * (k - 1)) AS BIGINT)"
        ).alias("f_ppm"),
    )


# --------------------------------------------------------------------------
# Theil–Sen median slope + Mann–Kendall S over the daily value series
# --------------------------------------------------------------------------

_THEILSEN_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS y
      FROM events GROUP BY 1
    ), pairs AS (
      SELECT a.d AS da, b.d AS db,
             b.y - a.y AS dy,
             date_diff('day', a.d, b.d) AS dt
      FROM daily a JOIN daily b ON a.d < b.d
    ), slopes AS (
      SELECT da, db,
             CASE WHEN dy >= 0 THEN dy // dt ELSE -((-dy) // dt) END AS sl,
             CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1 ELSE 0 END AS sg
      FROM pairs
    ), ranked AS (
      SELECT sl, SUM(sg) OVER () AS mk_s, COUNT(*) OVER () AS m,
             ROW_NUMBER() OVER (ORDER BY sl, da, db) AS rk
      FROM slopes
    ), days AS (SELECT COUNT(*) AS n_days FROM daily)
    SELECT CAST(days.n_days AS BIGINT) AS n_days,
           CAST(ranked.m AS BIGINT) AS n_pairs,
           CAST(ranked.mk_s AS BIGINT) AS mk_s,
           CAST(ranked.sl AS BIGINT) AS sen_slope_us_per_day
    FROM ranked, days WHERE ranked.rk = (ranked.m + 1) // 2
    """


@register("events_theil_sen_trend", oracle=_THEILSEN_ORACLE)
def events_theil_sen_trend(spark, sf_dir):
    """Theil–Sen robust trend (Sen 1968) with the Mann–Kendall S
    statistic (Mann 1945) over the daily event-value totals: every
    pairwise slope (y_j − y_i)/(d_j − d_i) is an exact sign-split
    truncated integer in value-micros per day, the Sen slope is the
    lower-median NEAREST-RANK pick (rank ⌊(m+1)/2⌋ under the
    deterministic (slope, day-pair) order), and S = Σ sgn(y_j − y_i) is
    an exact integer whose sign is the trend verdict.  Median-of-slopes
    shrugs off the outlier days that wreck the OLS slope
    (events_trend_slope) — the standard robust companion.

    Scale shape: daily totals partial-combine on the CALENDAR-BOUNDED
    day domain; the pair join and the median rank run over days², a
    constant-bounded relation (time is finite) that never grows with row
    count — the same boundedness argument as the catalog's prefix-sum
    passes.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)")).alias("y")
    )
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        "da",
        "db",
        (F.col("yb") - F.col("ya")).alias("dy"),
        F.datediff("db", "da").alias("dt"),
    )
    slopes = pairs.select(
        "da",
        "db",
        F.expr(
            "CASE WHEN dy >= 0 THEN dy div dt ELSE -((-dy) div dt) END"
        ).alias("sl"),
        F.expr("CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1 ELSE 0 END").alias(
            "sg"
        ),
    )
    every = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = slopes.select(
        "sl",
        F.sum("sg").over(every).alias("mk_s"),
        F.count("*").over(every).alias("m"),
        F.row_number().over(Window.orderBy("sl", "da", "db")).alias("rk"),
    )
    days = daily.agg(F.count("*").cast("long").alias("n_days"))
    return (
        ranked.filter(F.expr("rk = (m + 1) div 2"))
        .crossJoin(F.broadcast(days))
        .select(
            "n_days",
            F.col("m").cast("long").alias("n_pairs"),
            F.col("mk_s").cast("long").alias("mk_s"),
            F.col("sl").cast("long").alias("sen_slope_us_per_day"),
        )
    )


# --------------------------------------------------------------------------
# Bowley quartile skewness per event type
# --------------------------------------------------------------------------

_BOWLEY_QS = (25, 50, 75)

_BOWLEY_ORACLE = f"""
    WITH v AS (
      SELECT event_type, CAST(FLOOR(value * 1000000) AS BIGINT) AS c
      FROM events
    ), ladder AS (
      SELECT event_type, c, COUNT(*) AS t,
             COALESCE(SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM v GROUP BY event_type, c
    ), n AS (
      SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1
    ), targets AS (
      SELECT n.event_type, n.n, u.q,
             ((u.q * (n.n - 1)) // 100) + 1 AS r
      FROM n, unnest([{", ".join(str(q) for q in _BOWLEY_QS)}]) AS u(q)
    ), picked AS (
      SELECT t.event_type, t.n, t.q, l.c
      FROM targets t JOIN ladder l
        ON l.event_type = t.event_type
       AND l.below < t.r AND t.r <= l.below + l.t
    ), wide AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN q = 25 THEN c END) AS q1_us,
             MAX(CASE WHEN q = 50 THEN c END) AS q2_us,
             MAX(CASE WHEN q = 75 THEN c END) AS q3_us
      FROM picked GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, q1_us, q2_us, q3_us,
           CAST(CASE WHEN q3_us = q1_us THEN 0
                WHEN q3_us + q1_us - 2 * q2_us >= 0
                THEN ((q3_us + q1_us - 2 * q2_us) * 1000000)
                     // (q3_us - q1_us)
                ELSE -(((2 * q2_us - q3_us - q1_us) * 1000000)
                       // (q3_us - q1_us))
           END AS BIGINT) AS bowley_ppm
    FROM wide
    """


@register("events_bowley_skewness", oracle=_BOWLEY_ORACLE)
def events_bowley_skewness(spark, sf_dir):
    """Bowley's quartile coefficient of skewness per event type:
    (Q3 + Q1 − 2·Q2)/(Q3 − Q1) in signed ppm, over exact NEAREST-RANK
    quartiles (rank ⌊q·(n−1)/100⌋ + 1, never interpolated) picked off
    the per-type distinct-value ladder in integer value-micros.
    Quartile skewness is immune to the tail outliers that dominate the
    moment-based skew — the robust shape companion to
    events_value_outliers.  Division is sign-split so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree.

    Scale shape: the ladder is a partial-combined (type, value) count
    with a cumulative over the VALUE-DOMAIN-BOUNDED distinct grid per
    type (two-decimal readings → a fixed grid, never a sort of raw
    events); quartile extraction is a 3-rank ladder join; the skewness
    arithmetic is a 5-row grid.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    v = ev.select(
        "event_type",
        F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("c"),
    )
    below_w = Window.partitionBy("event_type").orderBy("c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ladder = (
        v.groupBy("event_type", "c")
        .agg(F.count("*").alias("t"))
        .select(
            "event_type",
            "c",
            "t",
            F.coalesce(F.sum("t").over(below_w), F.lit(0)).alias("below"),
        )
    )
    # per-type totals derive from the ladder (n = Σt) — no second scan
    n = ladder.groupBy("event_type").agg(F.sum("t").alias("n"))
    targets = n.select(
        "event_type",
        "n",
        F.explode(F.array(*[F.lit(q) for q in _BOWLEY_QS])).alias("q"),
    ).select(
        "event_type",
        "n",
        "q",
        F.expr("((q * (n - 1)) div 100) + 1").alias("r"),
    )
    lad = ladder.withColumnRenamed("event_type", "l_type")
    picked = targets.join(
        lad,
        (F.col("event_type") == F.col("l_type"))
        & (F.col("below") < F.col("r"))
        & (F.col("r") <= F.col("below") + F.col("t")),
    ).select("event_type", "n", "q", "c")
    wide = picked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("q") == 25, F.col("c"))).alias("q1_us"),
        F.max(F.when(F.col("q") == 50, F.col("c"))).alias("q2_us"),
        F.max(F.when(F.col("q") == 75, F.col("c"))).alias("q3_us"),
    )
    return wide.select(
        "event_type",
        "n",
        "q1_us",
        "q2_us",
        "q3_us",
        F.expr(
            "CAST(CASE WHEN q3_us = q1_us THEN 0"
            " WHEN q3_us + q1_us - 2 * q2_us >= 0"
            " THEN ((q3_us + q1_us - 2 * q2_us) * 1000000) div (q3_us - q1_us)"
            " ELSE -(((2 * q2_us - q3_us - q1_us) * 1000000)"
            " div (q3_us - q1_us)) END AS BIGINT)"
        ).alias("bowley_ppm"),
    )
