"""Second wave of TPC-H-shape analytics queries — the join/subquery shapes
missing from the first set (q8 market share, q9 profit rollup, q11 HAVING
scalar subquery, q12 conditional counts, q13 outer-join distribution, q15
CTE + scalar max, q16 distinct-count with anti-join, q17 correlated-avg
decorrelated as a pre-aggregate join, q19 disjunctive pushdown, q21
EXISTS+NOT EXISTS double correlation, q22 anti-join + global scalar).

These are Spark-native capability (the reference has no joins/aggregations at
all — SURVEY §2.7); they are registered in the same QUERIES/ORACLES catalog
and hash-verified against DuckDB. The testdata is TPC-H-ish but lacks
partsupp / l_shipmode / l_commitdate / c_phone, so q11/q12/q16/q21/q22 keep
the SHAPE (the plan-relevant structure) with available columns.

Scale notes (100 TB): only constant-size inputs (nation/region, single-row
or top-k aggregates) carry explicit broadcast hints; SF-scaling tables
(supplier/part/customer) join unhinted so the optimizer broadcasts them
while small and degrades to shuffle joins at scale (VERDICT r6); fact⋈fact
joins (lineitem⋈orders, customer⋈orders) shuffle on their keys and survive
skew via AQE. All money math is exact
decimal (see analytics.py header) so the DuckDB hash-compare is robust to
partition-order differences.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.analytics import (
    DEC,
    DEC_F,
    DEC_OUT,
    _OMD,
    _dec,
    _one_minus,
)
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_sales AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS {DEC}) * {_OMD} AS volume,
             n2.n_name AS nation
      FROM part, lineitem, orders, customer, nation n1, region, supplier, nation n2
      WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
        AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round(CAST(COALESCE(SUM(CASE WHEN nation = 'NATION_5' THEN volume END),
                               0) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 8-way join (two roles of nation) + conditional share.
    nation⋈region is constant-size → broadcast hint; the part and
    supplier⋈nation sides scale with SF so their joins are unhinted
    (optimizer broadcasts while small, shuffles at 100 TB — VERDICT r6);
    lineitem⋈orders and orders⋈customer are the fixed shuffles. The share
    divides two EXACT decimal sums as the last (double) step."""
    t = load_tables(
        spark, sf_dir,
        ("part", "lineitem", "orders", "customer", "nation", "region", "supplier"),
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    eur = F.broadcast(
        n1.join(t["region"], F.col("n1_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("n1_key")
    )
    promo = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = t["supplier"].join(n2, F.col("s_nationkey") == F.col("n2_key")).select(
        "s_suppkey", "nation"
    )
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    volume = (_dec("l_extendedprice") * _one_minus("l_discount")).alias("volume")
    sales = (
        t["lineitem"]
        .join(promo, F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(eur, F.col("c_nationkey") == F.col("n1_key"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume,
            F.col("nation"),
        )
    )
    zero = F.lit(0).cast(DEC)
    return sales.groupBy("o_year").agg(
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume"))), zero
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}
                    - CAST(l_quantity AS {DEC}) * CAST(p_retailprice AS {DEC})
                      * CAST(0.01 AS DECIMAL(3,2))) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%widget%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit rollup by supplier nation and year with a LIKE
    filter on the part dimension (no partsupp table here — the per-unit cost
    is derived from p_retailprice). part/supplier scale with SF → no
    broadcast hints (optimizer's call per VERDICT r6); nation folds into
    the supplier side pre-join."""
    t = load_tables(spark, sf_dir, ("part", "supplier", "lineitem", "orders", "nation"))
    widget = t["part"].filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = t["supplier"].join(
        t["nation"], F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    cost = _dec("l_quantity") * _dec("p_retailprice") * F.lit(0.01).cast("decimal(3,2)")
    profit = (_dec("l_extendedprice") * _one_minus("l_discount") - cost).alias("amount")
    return (
        t["lineitem"]
        .join(widget, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            profit,
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast(DEC_OUT).cast("double").alias("sum_profit"))
    )


@register(
    "q11_part_value",
    oracle=f"""
    SELECT l_partkey AS ps_partkey,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_1'
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS {DEC})) > (
      SELECT SUM(CAST(l_extendedprice AS {DEC})) * CAST(0.002 AS DECIMAL(4,3))
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_1'
    )
    """,
)
def q11_part_value(spark, sf_dir):
    """TPC-H Q11 shape: per-group aggregate filtered by a scalar subquery
    over the SAME aggregation (HAVING sum > fraction-of-total). Expressed via
    spark.sql so Catalyst plans the scalar subquery as a separate
    broadcast-able stage rather than a rescan per group."""
    load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(
        f"""
        SELECT l_partkey AS ps_partkey,
               CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS part_value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
        GROUP BY l_partkey
        HAVING SUM(CAST(l_extendedprice AS {DEC})) > (
          SELECT SUM(CAST(l_extendedprice AS {DEC})) * CAST(0.002 AS DECIMAL(4,3))
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_1'
        )
        """
    )


@register(
    "q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_class(spark, sf_dir):
    """TPC-H Q12 shape: fact⋈fact join + conditional counts (CASE inside
    SUM). No l_shipmode in this testdata — l_linestatus is the grouping.
    The date filter pushes to the lineitem scan; one shuffle (the join)."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer join preserving customers with zero orders +
    two-level aggregation (count per customer, then histogram of counts).
    COUNT(col) ignoring the null-extended rows is the load-bearing
    semantics."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    ords = t["orders"].filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        t["customer"]
        .join(ords, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}) AS {DEC_OUT})
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(CAST(total_revenue AS STRING) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: CTE reused twice (once for rows, once for its MAX in
    a scalar subquery). Exact-decimal revenue makes the cross-engine equality
    safe. spark.sql so the CTE + scalar subquery path is exercised."""
    load_tables(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql(
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(SUM(CAST(l_extendedprice AS {DEC})
                          * CAST(1 - CAST(l_discount AS {DEC_F}) AS {DEC_F}))
                      AS {DEC_OUT}) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(CAST(total_revenue AS STRING) AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct part-supplier pairs (standing in for
    partsupp) + NOT IN exclusion subquery + COUNT(DISTINCT) per group. The
    part subset and exclusion list both scale with SF → no broadcast
    hints (optimizer broadcasts while small — VERDICT r6); the
    distinct-pairs dedup is the one big shuffle."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_size")
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 100).select("s_suppkey")
    return (
        pairs.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH agg AS (
      SELECT l_partkey AS pk, SUM(CAST(l_quantity AS {DEC})) AS sq,
             COUNT(*) AS cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
      GROUP BY l_partkey
    )
    SELECT round(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS STRING) AS DOUBLE) / 7.0, 4)
             AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN agg ON pk = l_partkey
    WHERE p_brand = 'Brand#1'
      AND CAST(l_quantity AS {DEC}) * 5 * cnt < sq
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: the correlated per-part average decorrelated as a
    pre-aggregate joined back to the fact (the plan Catalyst produces for the
    subquery form). The avg comparison is the exact-integer rewrite
    qty < 0.2·avg ⇔ 5·qty·cnt < sum — no float division on the compare
    path, so both engines agree bit-for-bit.  The brand key set and the
    per-part aggregate both scale with |part|, so neither join carries a
    broadcast hint — the optimizer broadcasts them while small and
    degrades to shuffle joins at 100 TB (VERDICT r6)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    brand = t["part"].filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = t["lineitem"].join(brand, F.col("l_partkey") == F.col("p_partkey"))
    agg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count("*").alias("cnt")
    )
    return (
        li.join(agg, F.col("l_partkey") == F.col("pk"))
        .filter(_dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 4
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * {_OMD}) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs mixing columns from both join sides.
    Catalyst extracts the common single-side conjuncts (l_quantity ranges,
    p_size/p_brand) below the join — CNF predicate pushdown — then applies
    the residual disjunction after. part scales with SF → no broadcast
    hint (optimizer's call per VERDICT r6); zero extra shuffles."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    q = F.col("l_quantity")
    case = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (q >= qlo)
        & (q <= qhi)
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            case("Brand#12", 5, 1, 11)
            | case("Brand#23", 10, 10, 20)
            | case("Brand#34", 15, 20, 30)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _one_minus("l_discount"))
            .cast(DEC_OUT)
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: EXISTS + NOT EXISTS both correlated on the same key
    with an inequality on a second column — Catalyst decorrelates to a
    left-semi and a left-anti join on l_orderkey. spark.sql to exercise that
    rewrite (no l_commitdate here; l_returnflag='R' plays 'late')."""
    load_tables(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    return spark.sql(
        """
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
          AND n_name = 'NATION_3'
        GROUP BY s_name
        """
    )


@register(
    "q22_global_sales",
    oracle=f"""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS {DEC})) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(CAST(SUM(CAST(c_acctbal AS {DEC})) AS {DEC_OUT}) AS STRING) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS {DEC}) * n > s
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_global_sales(spark, sf_dir):
    """TPC-H Q22 shape: customers above the global positive-balance average
    with no RECENT orders (this testdata gives every customer at least one
    order overall, so 'dormant since 1998' keeps the anti-join non-vacuous) —
    global scalar aggregate (broadcast single row) + anti join + rollup. The
    average compare is the exact rewrite bal > sum/n ⇔ bal·n > sum
    (decimal · bigint, no division)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    pos = F.broadcast(
        t["customer"].filter(F.col("c_acctbal") > 0)
        .agg(F.sum(_dec("c_acctbal")).alias("s"), F.count("*").alias("n"))
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return (
        t["customer"]
        .crossJoin(pos)
        .filter(_dec("c_acctbal") * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntrycode"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast(DEC_OUT).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q20_part_suppliers",
    oracle=f"""
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      )
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS {DEC})) > CAST(50 AS {DEC})
    )
    AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
    """,
)
def q20_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested IN subqueries — the inner one filters the part
    dimension (LIKE), the outer one aggregates lineitem per (supplier, part)
    with a HAVING threshold (standing in for the partsupp availqty
    comparison). Catalyst plans both INs as left-semi joins; the HAVING
    aggregate happens once, pre-join. spark.sql to exercise nested-subquery
    planning."""
    load_tables(spark, sf_dir, ("supplier", "nation", "lineitem", "part"))
    return spark.sql(
        f"""
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS {DEC})) > CAST(50 AS {DEC})
        )
        AND n_name = 'NATION_2'
        """
    )
