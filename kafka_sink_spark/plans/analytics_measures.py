"""Round-6k wave: diversity, independence, and service-level measures —
three classic statistics rendered in the catalog's exact-integer style.

- ``docs_simpson_diversity``  per-document lexical diversity via the
  Gini-Simpson index 1 − Σp² — the transcendental-free diversity measure
  (Shannon entropy needs logs; Simpson is exact in ppm integers) — plus
  the type-token ratio, the two standard "is this document repetitive
  slop?" signals a curation stack scores.
- ``events_chisq_contingency``  the χ² independence statistic between
  event type and a fixed value band, cell by cell: each cell's
  contribution (O·N − R·C)²/(N·R·C) is emitted as an exact scaled
  integer, so the association report is bit-deterministic (no float E
  tables).
- ``orders_shipping_sla``  per-month SLA attainment: orders fully shipped
  within 7/30 days as exact ppm rates — the conditional-rate rollup shape
  every ops dashboard runs.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.extensions import text
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Gini-Simpson lexical diversity per document
# --------------------------------------------------------------------------

_SIMPSON_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), tf AS (
      SELECT doc_id, w AS term, COUNT(*) AS c
      FROM toks, unnest(t) AS u(w)
      GROUP BY doc_id, w
    ), d AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             SUM(CAST(c AS HUGEINT) * c) AS sum_c2
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           CAST(1000000 - (sum_c2 * 1000000) // (CAST(n_tokens AS HUGEINT) * n_tokens)
                AS BIGINT) AS simpson_ppm,
           CAST((n_types * 1000000) // n_tokens AS BIGINT) AS ttr_ppm
    FROM d
    """


@register("docs_simpson_diversity", oracle=_SIMPSON_ORACLE)
def docs_simpson_diversity(spark, sf_dir):
    """Per-document lexical diversity: the Gini-Simpson index
    1 − Σ(c_w/n)² in exact ppm (1e6·(1 − Σc²/n²), one truncating division)
    and the type-token ratio — the transcendental-free versions of the
    entropy-style repetitiveness signals (Simpson needs no log, so it is
    bit-identical cross-engine where Shannon entropy could drift in the
    last ulp).  Low simpson_ppm ⇒ a few tokens dominate ⇒ boilerplate.

    Scale shape: one tokenize+explode, one (doc,term) partial-combined
    count, one doc-keyed rollup — linear, two shuffles, no window.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tf = (
        docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    d = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(dec(F.col("c")) * dec(F.col("c"))).alias("sum_c2"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.expr(
            "CAST(1000000 - (sum_c2 * 1000000)"
            " div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)"
        ).alias("simpson_ppm"),
        F.expr("CAST((n_types * 1000000) div n_tokens AS BIGINT)").alias("ttr_ppm"),
    )


# --------------------------------------------------------------------------
# χ² contingency between event type and value band
# --------------------------------------------------------------------------

_BAND_WIDTH = 250  # value ∈ [0, 1000) → 4 bands


_CHISQ_ORACLE = f"""
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR(value) AS BIGINT) // {_BAND_WIDTH} AS band
      FROM events
    ), o AS (
      SELECT event_type, band, CAST(COUNT(*) AS BIGINT) AS obs
      FROM b GROUP BY event_type, band
    ), rt AS (
      SELECT event_type, SUM(obs) AS r FROM o GROUP BY event_type
    ), ct AS (
      SELECT band, SUM(obs) AS c FROM o GROUP BY band
    ), nn AS (
      SELECT SUM(obs) AS n FROM o
    )
    SELECT o.event_type, o.band, o.obs,
           CAST((o.obs * nn.n - rt.r * ct.c)
                * (o.obs * nn.n - rt.r * ct.c) * 1000000
                // (nn.n * rt.r * ct.c) AS BIGINT) AS chisq_n_ppm
    FROM o, nn, rt, ct
    WHERE rt.event_type = o.event_type AND ct.band = o.band
    """


@register("events_chisq_contingency", oracle=_CHISQ_ORACLE)
def events_chisq_contingency(spark, sf_dir):
    """χ² independence cells between event type and value band: each
    observed cell reports (O·N − R·C)²·1e6 div (N·R·C) — this is the
    cell's χ² contribution scaled by N (multiply the classic
    (O−E)²/E = (O·N − R·C)²/(N²·R·C/N)... identity through by N), kept
    as one exact integer expression so the association scan never builds
    a float expected-count table.  Σ cells / (N·1e6) recovers the
    textbook χ² statistic.

    Scale shape: one scan, one partial-combined cell count (|types|×4
    cells), two marginal rollups of that tiny table, broadcast joins back.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    b = events.select(
        "event_type",
        F.expr(f"CAST(FLOOR(value) AS BIGINT) div {_BAND_WIDTH}").alias("band"),
    )
    o = b.groupBy("event_type", "band").agg(F.count("*").cast("long").alias("obs"))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("band").agg(F.sum("obs").alias("c"))
    nn = o.agg(F.sum("obs").alias("n"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "band")
        .crossJoin(F.broadcast(nn))
    )
    diff = dec(F.col("obs")) * dec(F.col("n")) - dec(F.col("r")) * dec(F.col("c"))
    return j.select(
        "event_type",
        "band",
        "obs",
        (
            (diff * diff * F.lit(1_000_000).cast("decimal(38,0)"))
        ).alias("_num")
        .cast("decimal(38,0)"),
        (dec(F.col("n")) * dec(F.col("r")) * dec(F.col("c"))).alias("_den"),
    ).select(
        "event_type",
        "band",
        "obs",
        F.expr("CAST(_num div _den AS BIGINT)").alias("chisq_n_ppm"),
    )


# --------------------------------------------------------------------------
# Monthly shipping SLA attainment
# --------------------------------------------------------------------------

_SLA_ORACLE = """
    WITH cl AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
      FROM lineitem GROUP BY l_orderkey
    ), o AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
             CAST(cl.last_ship - CAST(o_orderdate AS DATE) AS BIGINT) AS days
      FROM orders JOIN cl ON o_orderkey = cl.l_orderkey
    )
    SELECT order_month, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN days <= 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_7d,
           CAST(SUM(CASE WHEN days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_30d,
           CAST((SUM(CASE WHEN days <= 7 THEN 1 ELSE 0 END) * 1000000)
                // COUNT(*) AS BIGINT) AS sla7_ppm,
           CAST((SUM(CASE WHEN days <= 30 THEN 1 ELSE 0 END) * 1000000)
                // COUNT(*) AS BIGINT) AS sla30_ppm
    FROM o GROUP BY order_month
    """


@register("orders_shipping_sla", oracle=_SLA_ORACLE)
def orders_shipping_sla(spark, sf_dir):
    """Monthly shipping SLA attainment: fraction of orders whose LAST line
    shipped within 7 and 30 days of the order date, as exact ppm rates —
    the conditional-rate rollup every operations dashboard runs, kept
    integer-exact end to end.

    Scale shape: order-keyed partial-combined max over lineitem (the one
    big shuffle), a co-keyed join to orders, then a ~84-group month
    rollup of pure conditional counts.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    cl = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("last_ship"))
    )
    o = (
        t["orders"]
        .select("o_orderkey", "o_orderdate")
        .join(cl, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.datediff(F.col("last_ship"), F.to_date("o_orderdate"))
            .cast("long")
            .alias("days"),
        )
    )
    in7 = F.sum(F.when(F.col("days") <= 7, 1).otherwise(0)).cast("long")
    in30 = F.sum(F.when(F.col("days") <= 30, 1).otherwise(0)).cast("long")
    return o.groupBy("order_month").agg(
        F.count("*").cast("long").alias("n_orders"),
        in7.alias("n_within_7d"),
        in30.alias("n_within_30d"),
        F.expr(
            "CAST(sum(CASE WHEN days <= 7 THEN 1 ELSE 0 END) * 1000000"
            " div count(*) AS BIGINT)"
        ).alias("sla7_ppm"),
        F.expr(
            "CAST(sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END) * 1000000"
            " div count(*) AS BIGINT)"
        ).alias("sla30_ppm"),
    )
