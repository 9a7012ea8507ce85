"""Round-7d wave: rank correlation, graph mixing structure, categorical
effect size, and arrival burstiness — four more published measures in the
catalog's exact-integer, oracle-twinned style.

- ``docs_spearman_rho``  Spearman rank correlation (with midrank tie
  handling = Pearson on ranks) between document length in characters and
  in tokens.  Midranks are halves, so DOUBLED ranks R2 = 2·C(<v) + t + 1
  stay integral; the correlation is emitted as the SIGNED SQUARE in ppm
  (sign(ρ)·ρ², the sqrt-free form this catalog uses for every
  correlation-like statistic), with ranks derived from bounded
  distinct-value ladders — never a global row sort.
- ``parts_assortativity``  degree assortativity (Newman 2002) of the
  co-purchase graph: the Pearson correlation of endpoint degrees across
  edges, exact via r = (4M·Σjk − S²)/(2M·Q − S²) with S = Σ(j+k),
  Q = Σ(j²+k²) over undirected edges — assortative (hub-hub) vs
  disassortative (hub-leaf) mixing, the standard macro-structure probe.
- ``lineitem_cramers_v``  Cramér's V effect size for the returnflag ×
  linestatus contingency: per-cell χ² mass from the exact identity
  (o−e)²/e = (n·o − r·c)²/(n·r·c), normalized by n·min(r−1, c−1) — the
  strength companion to the independence TEST in
  events_chisq_contingency.
- ``orders_interarrival_cv``  per-customer squared coefficient of
  variation of order interarrival gaps: CV² = (n·Σg² − S²)/S² exactly —
  the burstiness index (CV² ≈ 1e6 ppm for Poisson arrivals, above it for
  bursty customers), the arrival-process twin of docs_term_dispersion's
  content burstiness.

Determinism per the package convention: integer arithmetic end-to-end,
sign-split truncating division for signed ppm, bounded-ladder ranks.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Spearman rank correlation between doc length in chars and in tokens
# --------------------------------------------------------------------------

_SPEARMAN_ORACLE = r"""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  t -> t <> '')) AS BIGINT) AS y
      FROM documents
    ), lx AS (
      SELECT x, COUNT(*) AS t,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM d GROUP BY x
    ), ly AS (
      SELECT y, COUNT(*) AS t,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM d GROUP BY y
    ), ranked AS (
      SELECT d.doc_id,
             2 * lx.below + lx.t + 1 AS rx2,
             2 * ly.below + ly.t + 1 AS ry2
      FROM d JOIN lx ON lx.x = d.x JOIN ly ON ly.y = d.y
    ), agg AS (
      SELECT COUNT(*) AS n, SUM(rx2) AS sx, SUM(ry2) AS sy,
             SUM(rx2::HUGEINT * rx2) AS qx, SUM(ry2::HUGEINT * ry2) AS qy,
             SUM(rx2::HUGEINT * ry2) AS sxy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN (n * sxy - sx::HUGEINT * sy) >= 0
                THEN ((n * sxy - sx::HUGEINT * sy)
                      * (n * sxy - sx::HUGEINT * sy) * 1000000)
                     // ((n * qx - sx::HUGEINT * sx)
                         * (n * qy - sy::HUGEINT * sy))
                ELSE -(((sx::HUGEINT * sy - n * sxy)
                        * (sx::HUGEINT * sy - n * sxy) * 1000000)
                       // ((n * qx - sx::HUGEINT * sx)
                           * (n * qy - sy::HUGEINT * sy)))
           END AS BIGINT) AS rho2_signed_ppm
    FROM agg
    """


@register("docs_spearman_rho", oracle=_SPEARMAN_ORACLE)
def docs_spearman_rho(spark, sf_dir):
    """Spearman rank correlation between document length in characters and
    in tokens, with proper midrank tie handling (= Pearson computed on
    ranks).  Midranks are half-integers, so ranks are DOUBLED —
    R2(v) = 2·C(<v) + t_v + 1 off the distinct-value ladder — and the
    statistic is the signed square sign(ρ)·ρ² in ppm (the catalog's
    sqrt-free correlation form, cf. events_trend_slope):
    ρ² = (nΣrxry − ΣrxΣry)² / ((nΣrx²−(Σrx)²)(nΣry²−(Σry)²)), every
    product in decimal(38) ≙ HUGEINT.  Here it certifies the (obviously
    strong) monotone association between the two length measures — the
    harness any pair of quality-signal columns can be dropped into.

    Scale shape: rank ladders are per-distinct-value partial-combined
    counts with a cumulative over the BOUNDED value domain (never a
    global row_number over documents); the rank join is two equi-joins on
    the value; the final correlation is one six-sum aggregate.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x"),
        F.size(text_ops.tokens(F.col("text"))).cast("long").alias("y"),
    )

    def ladder(col):
        below_w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            d.groupBy(col)
            .agg(F.count("*").alias("t"))
            .select(
                col,
                "t",
                F.coalesce(F.sum("t").over(below_w), F.lit(0)).alias("below"),
            )
        )

    lx = ladder("x").select("x", (2 * F.col("below") + F.col("t") + 1).alias("rx2"))
    ly = ladder("y").select("y", (2 * F.col("below") + F.col("t") + 1).alias("ry2"))
    ranked = d.join(lx, "x").join(ly, "y")
    dec = "CAST({} AS DECIMAL(38,0))"
    agg = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(F.expr(dec.format("rx2") + " * rx2")).alias("qx"),
        F.sum(F.expr(dec.format("ry2") + " * ry2")).alias("qy"),
        F.sum(F.expr(dec.format("rx2") + " * ry2")).alias("sxy"),
    )
    num = "(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
    den = (
        "((CAST(n AS DECIMAL(38,0)) * qx - CAST(sx AS DECIMAL(38,0)) * sx)"
        " * (CAST(n AS DECIMAL(38,0)) * qy - CAST(sy AS DECIMAL(38,0)) * sy))"
    )
    return agg.select(
        "n",
        F.expr(
            f"CAST(CASE WHEN {num} >= 0"
            f" THEN ({num} * {num} * 1000000) div {den}"
            f" ELSE -((({num}) * ({num}) * 1000000) div {den})"
            " END AS BIGINT)"
        ).alias("rho2_signed_ppm"),
    )


# --------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# --------------------------------------------------------------------------

_ASSORT_ORACLE = """
    WITH li AS (
      SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), e2 AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM e2 GROUP BY src
    ), und AS (
      SELECT src, dst FROM e2 WHERE src < dst
    ), agg AS (
      SELECT COUNT(*) AS m,
             SUM(da.d::HUGEINT * db.d) AS sjk,
             SUM(da.d + db.d) AS s2,
             SUM(da.d::HUGEINT * da.d + db.d::HUGEINT * db.d) AS q2
      FROM und JOIN deg da ON da.node = und.src
      JOIN deg db ON db.node = und.dst
    ), nodes AS (SELECT COUNT(*) AS n_nodes FROM deg)
    SELECT CAST(nodes.n_nodes AS BIGINT) AS n_nodes,
           CAST(agg.m AS BIGINT) AS n_edges,
           CAST(CASE WHEN (4 * agg.m * agg.sjk - agg.s2::HUGEINT * agg.s2) >= 0
                THEN ((4 * agg.m * agg.sjk - agg.s2::HUGEINT * agg.s2) * 1000000)
                     // (2 * agg.m * agg.q2 - agg.s2::HUGEINT * agg.s2)
                ELSE -(((agg.s2::HUGEINT * agg.s2 - 4 * agg.m * agg.sjk) * 1000000)
                       // (2 * agg.m * agg.q2 - agg.s2::HUGEINT * agg.s2))
           END AS BIGINT) AS r_ppm
    FROM agg, nodes
    """


@register("parts_assortativity", oracle=_ASSORT_ORACLE)
def parts_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the part co-purchase graph:
    the Pearson correlation of endpoint degrees over undirected edges,
    computed exactly as r = (4M·Σjk − S²)/(2M·Q − S²) with S = Σ(j+k) and
    Q = Σ(j²+k²) — the halves in Newman's formula clear under
    cross-multiplication, so the whole statistic is one signed ppm
    division of decimal(38) products.  r < 0 (disassortative) is the
    typical co-occurrence-graph signature: high-degree hub parts attach
    to low-degree specialist parts.

    Scale shape: reuses the PERSISTED src-partitioned co-purchase edge
    table (the pagerank/triangles substrate — built once per session);
    degrees are one partial-combined count; the degree join hits the
    src-partitioning, and the final correlation is a four-sum aggregate.
    """
    from kafka_sink_spark.plans.analytics_mining import _copurchase_edges

    e2 = _copurchase_edges(spark, sf_dir)
    deg = e2.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    und = e2.filter(F.col("src") < F.col("dst"))
    dec = "CAST({} AS DECIMAL(38,0))"
    agg = (
        und.join(deg.select(F.col("node").alias("src"), F.col("d").alias("da")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("db")), "dst")
        .agg(
            F.count("*").cast("long").alias("m"),
            F.sum(F.expr(dec.format("da") + " * db")).alias("sjk"),
            F.sum(F.col("da") + F.col("db")).cast("long").alias("s2"),
            F.sum(
                F.expr(dec.format("da") + " * da + " + dec.format("db") + " * db")
            ).alias("q2"),
        )
    )
    nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    num = "(4 * m * sjk - CAST(s2 AS DECIMAL(38,0)) * s2)"
    den = "(2 * m * q2 - CAST(s2 AS DECIMAL(38,0)) * s2)"
    return agg.crossJoin(F.broadcast(nodes)).select(
        "n_nodes",
        F.col("m").alias("n_edges"),
        F.expr(
            f"CAST(CASE WHEN {num} >= 0 THEN ({num} * 1000000) div {den}"
            f" ELSE -((-({num}) * 1000000) div {den}) END AS BIGINT)"
        ).alias("r_ppm"),
    )


# --------------------------------------------------------------------------
# Cramér's V for the returnflag × linestatus contingency
# --------------------------------------------------------------------------

_CRAMER_ORACLE = """
    WITH o AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS obs
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ), rs AS (SELECT rf, SUM(obs) AS r FROM o GROUP BY rf),
    cs AS (SELECT ls, SUM(obs) AS c FROM o GROUP BY ls),
    tot AS (
      SELECT SUM(obs) AS n,
             (SELECT COUNT(*) FROM rs) AS n_r,
             (SELECT COUNT(*) FROM cs) AS n_c
      FROM o
    ), cells AS (
      SELECT SUM(((tot.n * o.obs - rs.r * cs.c)::HUGEINT
                  * (tot.n * o.obs - rs.r * cs.c)) * 1000000
                 // (tot.n::HUGEINT * rs.r * cs.c)) AS chisq_ppm
      FROM o JOIN rs ON rs.rf = o.rf JOIN cs ON cs.ls = o.ls, tot
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST(tot.n_r AS BIGINT) AS n_rows_cat,
           CAST(tot.n_c AS BIGINT) AS n_cols_cat,
           CAST(cells.chisq_ppm AS BIGINT) AS chisq_ppm,
           CAST(cells.chisq_ppm * 1000
                // (tot.n * LEAST(tot.n_r - 1, tot.n_c - 1)) AS BIGINT)
             AS v2_ppb
    FROM cells, tot
    """


@register("lineitem_cramers_v", oracle=_CRAMER_ORACLE)
def lineitem_cramers_v(spark, sf_dir):
    """Cramér's V effect size for the returnflag × linestatus contingency
    table: per-cell χ² mass via the exact identity (o−e)²/e =
    (n·o − r·c)²/(n·r·c) — no float expected counts — summed in ppm, then
    V² = χ²/(n·min(r−1, c−1)) emitted in ppb (V itself needs a sqrt; the
    squared form is the catalog's standard).  Where
    events_chisq_contingency answers "are they independent?", this
    answers "how strongly associated?" — the effect size that stays
    comparable across sample sizes.

    Scale shape: one partial-combined count over the tiny category grid
    is the only pass over raw rows; margins and the total are grid-sized
    aggregates; the arithmetic is a handful of rows.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    o = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count("*").alias("obs"))
    rs = o.groupBy("rf").agg(F.sum("obs").alias("r"))
    cs = o.groupBy("ls").agg(F.sum("obs").alias("c"))
    tot = o.agg(
        F.sum("obs").cast("long").alias("n"),
        F.count_distinct("rf").cast("long").alias("n_r"),
        F.count_distinct("ls").cast("long").alias("n_c"),
    )
    cells = (
        o.join(F.broadcast(rs), "rf")
        .join(F.broadcast(cs), "ls")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "(CAST(n * obs - r * c AS DECIMAL(38,0))"
                    " * (n * obs - r * c)) * 1000000"
                    " div (CAST(n AS DECIMAL(38,0)) * r * c)"
                )
            ).alias("chisq_ppm")
        )
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "n",
        F.col("n_r").alias("n_rows_cat"),
        F.col("n_c").alias("n_cols_cat"),
        F.col("chisq_ppm").cast("long").alias("chisq_ppm"),
        F.expr(
            "CAST(chisq_ppm * 1000 div (n * LEAST(n_r - 1, n_c - 1)) AS BIGINT)"
        ).alias("v2_ppb"),
    )


# --------------------------------------------------------------------------
# Per-customer interarrival burstiness (squared coefficient of variation)
# --------------------------------------------------------------------------

_IAT_ORACLE = """
    WITH o AS (
      SELECT o_custkey, epoch_us(o_orderdate) AS t_us
      FROM orders
    ), g AS (
      SELECT o_custkey,
             (t_us - lag(t_us) OVER (PARTITION BY o_custkey ORDER BY t_us))
               // 86400000000 AS gap_days
      FROM o
    ), agg AS (
      SELECT o_custkey, COUNT(*) AS n_gaps, SUM(gap_days) AS s,
             SUM(gap_days::HUGEINT * gap_days) AS q
      FROM g WHERE gap_days IS NOT NULL
      GROUP BY o_custkey
      HAVING COUNT(*) >= 2 AND SUM(gap_days) > 0
    )
    SELECT o_custkey, CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(s AS BIGINT) AS total_gap_days,
           CAST((n_gaps * q - s::HUGEINT * s) * 1000000
                // (s::HUGEINT * s) AS BIGINT) AS cv2_ppm
    FROM agg
    """


@register("orders_interarrival_cv", oracle=_IAT_ORACLE)
def orders_interarrival_cv(spark, sf_dir):
    """Per-customer burstiness of order arrivals: the squared coefficient
    of variation of interarrival gaps, CV² = Var/mean² =
    (n·Σg² − S²)/S² in exact integers (gaps in whole days from exact
    epoch-microsecond differences).  CV² ≈ 1e6 ppm marks Poisson-like
    ordering; far above it, bursty customers; near 0, metronomic
    schedules — the arrival-process counterpart to docs_term_dispersion's
    content burstiness, and the customer-level feature feeding churn/LTV
    models.  Customers need ≥ 2 gaps and a positive gap sum (same-day-only
    histories carry no dispersion signal).

    Scale shape: ONE customer-keyed lag window (the exchange any
    per-customer sequence feature pays) + a partial-combined per-customer
    rollup; output is one row per qualifying customer.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    o = orders.select(
        "o_custkey", F.unix_micros(F.col("o_orderdate")).alias("t_us")
    )
    w = Window.partitionBy("o_custkey").orderBy("t_us")
    g = o.select(
        "o_custkey",
        "t_us",
        F.lag("t_us").over(w).alias("prev_us"),
    ).select(
        "o_custkey",
        F.expr("(t_us - prev_us) div 86400000000").alias("gap_days"),
    )
    agg = (
        g.filter(F.col("gap_days").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("gap_days").cast("long").alias("s"),
            F.sum(F.expr("CAST(gap_days AS DECIMAL(38,0)) * gap_days")).alias("q"),
        )
        .filter((F.col("n_gaps") >= 2) & (F.col("s") > 0))
    )
    return agg.select(
        "o_custkey",
        "n_gaps",
        F.col("s").alias("total_gap_days"),
        F.expr(
            "CAST((n_gaps * q - CAST(s AS DECIMAL(38,0)) * s) * 1000000"
            " div (CAST(s AS DECIMAL(38,0)) * s) AS BIGINT)"
        ).alias("cv2_ppm"),
    )
