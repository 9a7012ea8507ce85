"""Round-8g bias / elasticity / divergence wave.

- ``dedup_survivor_quality``  curation-bias audit of the dedup stage:
  the certified MinHash-LSH → connected-components pipeline splits the
  corpus into survivors (cluster minimum), removed duplicates, and
  singletons; each cohort's size, mean word count (ppm) and Gopher
  pass rate (ppm) answer "does dedup systematically delete the good
  documents" — the check every removal pipeline owes its corpus.
- ``lineitem_discount_elasticity``  the demand curve by discount band:
  per exact discount percentage, item count, mean quantity (ppm),
  mean gross price (cents ppm), and the band's share of all items —
  rising mean quantity with discount is the elasticity signal, flat
  means discounts are being spent for nothing.
- ``orders_priority_kl_by_nation``  per-nation KL divergence (in
  octave-log2 ppm-bits) between the nation's order-priority mix and
  the global mix — the segment-drift detector for categorical mixes,
  exact: each term is c·(log2(c·T) − log2(t·g)) div t, truncated
  before the order-independent sum.

Determinism per the package convention: integers end-to-end,
octave-log2 ppm-bits, sign-split truncating division.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's curation/insight families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Dedup survivor-quality audit
# --------------------------------------------------------------------------


def _survivor_oracle() -> str:
    from kafka_sink_spark.plans.analytics import _clusters_oracle
    from kafka_sink_spark.plans.analytics_quality import _GOPHER_ORACLE

    return f"""
    WITH assign AS ({_clusters_oracle()}),
    flags AS ({_GOPHER_ORACLE}),
    cohorts AS (
      SELECT f.doc_id, f.n_words, f.ok_all,
             CASE WHEN a.doc_id IS NULL THEN 'singleton'
                  WHEN f.doc_id = a.cluster_id THEN 'survivor'
                  ELSE 'removed' END AS cohort
      FROM flags f LEFT JOIN assign a ON a.doc_id = f.doc_id
    )
    SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_words) * 1000000 // COUNT(*) AS BIGINT)
             AS mean_words_ppm,
           CAST(SUM(ok_all) * 1000000 // COUNT(*) AS BIGINT)
             AS gopher_pass_ppm
    FROM cohorts GROUP BY cohort
    """


@register("dedup_survivor_quality", oracle=_survivor_oracle())
def dedup_survivor_quality(spark, sf_dir):
    """Curation-bias audit: does near-dup removal delete the good
    documents?  The certified MinHash-LSH → connected-components
    assignment splits the corpus into survivors (cluster minimum),
    removed duplicates, and singletons (never clustered); per cohort
    this reports size, mean word count (ppm) and the Gopher all-gates
    pass rate (ppm).  A removed cohort that out-scores the survivors
    means the min-id survivor rule is throwing away the better copy —
    switch to a quality-ranked survivor pick before shipping.

    Scale shape: inherits the certified pair-generation + HashMin
    shapes and the zero-shuffle gopher projection; the cohort rollup is
    a 3-row aggregate off one doc-keyed left join.
    """
    from kafka_sink_spark.extensions import dedup, text
    from kafka_sink_spark.plans.analytics_quality import _GOPHER

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.2)
    assign = dedup.connected_components(pairs).select(
        F.col("doc_id").alias("a_doc"), "cluster_id"
    )
    flags = text.gopher_flags(docs, **_GOPHER).select(
        "doc_id", "n_words", "ok_all"
    )
    cohorts = flags.join(
        assign, flags.doc_id == assign.a_doc, "left"
    ).select(
        F.when(F.col("a_doc").isNull(), F.lit("singleton"))
        .when(F.col("doc_id") == F.col("cluster_id"), F.lit("survivor"))
        .otherwise(F.lit("removed"))
        .alias("cohort"),
        "n_words",
        "ok_all",
    )
    return cohorts.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.expr("CAST(SUM(n_words) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "mean_words_ppm"
        ),
        F.expr("CAST(SUM(ok_all) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "gopher_pass_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Discount elasticity curve
# --------------------------------------------------------------------------

_ELASTICITY_ORACLE = """
    WITH b AS (
      SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS discount_pct,
             CAST(FLOOR(l_quantity) AS BIGINT) AS q,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_cents
      FROM lineitem
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
    SELECT b.discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(b.q) * 1000000 // COUNT(*) AS BIGINT) AS mean_qty_ppm,
           CAST(SUM(b.price_cents) // COUNT(*) AS BIGINT)
             AS mean_price_cents,
           CAST(COUNT(*) * 1000000 // tot.n AS BIGINT) AS item_share_ppm
    FROM b, tot GROUP BY b.discount_pct, tot.n
    """


@register("lineitem_discount_elasticity", oracle=_ELASTICITY_ORACLE)
def lineitem_discount_elasticity(spark, sf_dir):
    """Demand curve by discount band: per exact discount percentage,
    the item count, mean quantity in ppm, mean gross line price in
    cents, and the band's share of all line items.  Mean quantity
    rising with the discount is the elasticity signal any promo model
    starts from; a flat curve says the discounts are being granted for
    nothing.  (q6_forecast_revenue asks what removing a band is worth;
    this asks whether the band changes behavior at all.)

    Scale shape: one scan, one partial-combined rollup on the ≤11-value
    discount grid, a single-row total broadcast.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    b = li.select(
        F.expr("CAST(round(l_discount * 100, 0) AS BIGINT)").alias(
            "discount_pct"
        ),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("q"),
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
    )
    tot = b.agg(F.count("*").cast("long").alias("n"))
    return (
        b.groupBy("discount_pct")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.expr("CAST(SUM(q) * 1000000 div COUNT(*) AS BIGINT)").alias(
                "mean_qty_ppm"
            ),
            F.expr("CAST(SUM(price_cents) div COUNT(*) AS BIGINT)").alias(
                "mean_price_cents"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "discount_pct",
            "n_items",
            "mean_qty_ppm",
            "mean_price_cents",
            F.expr("CAST(n_items * 1000000 div n AS BIGINT)").alias(
                "item_share_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# Per-nation priority-mix KL divergence
# --------------------------------------------------------------------------


def _kl_oracle() -> str:
    from kafka_sink_spark.plans.analytics_readability import _DUCK_LOG2

    # Bounded probability-ratio form (r10, analytics_readability.py
    # note): the KL log ratio c·T/(t·g) is P(pri|nation)/P(pri) — both
    # probabilities in 1e12 fixed point, bracket = lg(p_pt) − lg(q_pt):
    # arguments bounded by 1e12 (no count-product int64 cliff) and the
    # octave biases cancel for a nation matching the global mix.
    from kafka_sink_spark.plans.analytics_readability import duck_ratio_pt

    p_pt = duck_ratio_pt("j.c", "j.tn")
    q_pt = duck_ratio_pt("j.gc", "g.tg")
    num = _DUCK_LOG2.format(x=p_pt)
    den = _DUCK_LOG2.format(x=q_pt)
    return f"""
    WITH o AS (
      SELECT c.c_nationkey AS nation, o.o_orderpriority AS pri
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), nc AS (
      SELECT nation, pri, CAST(COUNT(*) AS BIGINT) AS c FROM o
      GROUP BY nation, pri
    ), nt AS (
      SELECT nation, SUM(c) AS tn FROM nc GROUP BY nation
    ), gc AS (
      SELECT pri, SUM(c) AS gc FROM nc GROUP BY pri
    ), g AS (SELECT SUM(c) AS tg FROM nc),
    j AS (
      SELECT nc.nation, nc.pri, nc.c, nt.tn, gcc.gc
      FROM nc JOIN nt ON nt.nation = nc.nation
             JOIN gc gcc ON gcc.pri = nc.pri
    ), terms AS (
      SELECT j.nation, j.tn,
             CASE WHEN (j.c::HUGEINT * ({num} - {den})) >= 0
                  THEN (j.c::HUGEINT * ({num} - {den})) // j.tn
                  ELSE -((-(j.c::HUGEINT * ({num} - {den}))) // j.tn)
             END AS t_ppm_bits
      FROM j, g
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(MAX(tn) AS BIGINT) AS n_orders,
           CAST(SUM(t_ppm_bits) AS BIGINT) AS kl_ppm_bits
    FROM terms GROUP BY nation
    """


@register("orders_priority_kl_by_nation", oracle=_kl_oracle())
def orders_priority_kl_by_nation(spark, sf_dir):
    """KL divergence of each nation's order-priority mix from the
    global mix, in octave-log2 ppm-bits: each term is
    c·(log2(c·T) − log2(t·g)) div t, computed via the bounded
    probability-ratio convention (r10, analytics_readability.py) —
    lg(P(pri|nation)·1e12) − lg(P(pri)·1e12), arguments bounded by
    1e12 at any SF, octave biases cancelling for a nation that
    matches the global mix; the outer c·bracket multiply rides
    DECIMAL(38,0)/HUGEINT — exact integers throughout;
    per-term truncation before
    the order-independent sum; the octave bias is shared by both
    engines (and can leave a near-uniform nation a few ppm-bits
    negative — the sign is reported, not clamped).  The categorical
    segment-drift detector: a nation with high KL routes to its own
    forecast model.

    Scale shape: one orders-sized equi-join to the customer dimension
    (unhinted — the dimension scales with SF), a partial-combined
    (nation, priority) rollup, then everything lives on the
    |nations|×|priorities|-bounded grid.
    """
    from kafka_sink_spark.plans.analytics_readability import _SPARK_LOG2

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o = t["orders"].select("o_custkey", "o_orderpriority").join(
        t["customer"].select("c_custkey", "c_nationkey"),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    nc = o.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count("*").cast("long").alias("c"))
    nt = nc.groupBy("nation").agg(F.sum("c").alias("tn"))
    gc = nc.groupBy("pri").agg(F.sum("c").alias("gc"))
    g = nc.agg(F.sum("c").alias("tg"))
    j = (
        nc.join(F.broadcast(nt), "nation")
        .join(F.broadcast(gc), "pri")
        .crossJoin(F.broadcast(g))
    )
    # Bounded probability-ratio form (r10) — see the oracle note.
    # Outer c·bracket multiply rides DECIMAL(38,0).
    from kafka_sink_spark.plans.analytics_readability import spark_ratio_pt

    # Stage probabilities, then the signed product, each once per row —
    # the lg template reads its argument 4× and the sign-split CASE the
    # product 3×; inlined, the DECIMAL division would run up to 24×.
    staged = j.select(
        "nation",
        "tn",
        "c",
        F.expr(spark_ratio_pt("c", "tn")).alias("p_pt"),
        F.expr(spark_ratio_pt("gc", "tg")).alias("q_pt"),
    ).select(
        "nation",
        "tn",
        F.expr(
            "CAST(c AS DECIMAL(38,0))"
            f" * (({_SPARK_LOG2.format(x='p_pt')})"
            f" - ({_SPARK_LOG2.format(x='q_pt')}))"
        ).alias("prod"),
    )
    terms = staged.select(
        "nation",
        "tn",
        F.expr(
            "CASE WHEN prod >= 0 THEN prod div tn"
            " ELSE -((-prod) div tn) END"
        ).alias("t_ppm_bits"),
    )
    return terms.groupBy("nation").agg(
        F.max("tn").cast("long").alias("n_orders"),
        F.sum("t_ppm_bits").cast("long").alias("kl_ppm_bits"),
    ).select(
        F.col("nation").cast("long").alias("nation"),
        "n_orders",
        "kl_ppm_bits",
    )
