"""Round-8i affinity / drift / shape wave.

- ``events_type_affinity``  event-type co-occurrence over per-user
  activity sets: for each type pair, the user overlap, Jaccard in ppm,
  and lift in ppm (observed co-users vs independence) — the "users who
  do X also do Y" matrix, the SET-side complement to the SEQUENCE-side
  Markov transition matrix.
- ``orders_mktsegment_drift``  temporal categorical drift: each order
  month's market-segment mix against the GLOBAL mix as an exact
  octave-log2 KL (ppm-bits) plus the month's top segment — the
  month-over-month mix-shift monitor for any categorical dimension.
- ``docs_length_octave_profile``  document-length shape: share of
  documents per power-of-two length octave plus each octave's mean
  length — the log-histogram that length cutoffs and packing budgets
  are read from (heavy tails show up as mass in the top octaves).

Determinism per the package convention: integers end-to-end,
octave-log2 ppm-bits via bit length, truncating division.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's insight/profile families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Event-type affinity (co-occurrence over user sets)
# --------------------------------------------------------------------------

_AFFINITY_ORACLE = """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), tc AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu FROM ut
      GROUP BY event_type
    ), n AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM ut
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS both_users
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.both_users,
           ta.nu AS users_a, tb.nu AS users_b,
           CAST(p.both_users * 1000000
                // (ta.nu + tb.nu - p.both_users) AS BIGINT) AS jaccard_ppm,
           CAST(p.both_users * n.nu * 1000000
                // (ta.nu * tb.nu) AS BIGINT) AS lift_ppm
    FROM pairs p
    JOIN tc ta ON ta.event_type = p.type_a
    JOIN tc tb ON tb.event_type = p.type_b, n
    """


@register("events_type_affinity", oracle=_AFFINITY_ORACLE)
def events_type_affinity(spark, sf_dir):
    """Event-type affinity over per-user activity sets: for each type
    pair (a < b), the number of users doing both, Jaccard in ppm, and
    the independence lift |both|·N div (|a|·|b|) in ppm — 1e6 means
    the types co-occur exactly as independence predicts, above means a
    shared audience.  The SET-side complement to
    events_markov_transitions' sequence view: transitions say what
    follows what, affinity says who shares whom.

    Scale shape: one distinct (user, type) projection (partial-combined
    on a key bounded by users×|types|), a user-keyed self-join whose
    fan-out is bounded by |types|² per user, and |types|²-bounded
    rollups with broadcast marginals.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    ut = events.select("user_id", "event_type").distinct()
    tc = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("nu"))
    n = ut.agg(F.countDistinct("user_id").cast("long").alias("total_users"))
    pairs = (
        ut.alias("a")
        .join(
            ut.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("both_users"))
    )
    return (
        pairs.join(
            F.broadcast(
                tc.select(
                    F.col("event_type").alias("type_a"),
                    F.col("nu").alias("users_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                tc.select(
                    F.col("event_type").alias("type_b"),
                    F.col("nu").alias("users_b"),
                )
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "both_users",
            "users_a",
            "users_b",
            F.expr(
                "CAST(both_users * 1000000"
                " div (users_a + users_b - both_users) AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST(both_users * total_users * 1000000"
                " div (users_a * users_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Market-segment mix drift by month
# --------------------------------------------------------------------------


def _drift_oracle() -> str:
    from kafka_sink_spark.plans.analytics_readability import _DUCK_LOG2

    # Bounded probability-ratio form (r10, analytics_readability.py
    # note): the KL log ratio c·T/(t·g) is P(seg|month)/P(seg) — both
    # probabilities in 1e12 fixed point, bracket = lg(p_pt) − lg(q_pt):
    # arguments bounded by 1e12 (no count-product int64 cliff) and the
    # octave biases cancel for a month matching the global mix.
    from kafka_sink_spark.plans.analytics_readability import duck_ratio_pt

    p_pt = duck_ratio_pt("j.c", "j.tm")
    q_pt = duck_ratio_pt("j.gc", "g.tg")
    num = _DUCK_LOG2.format(x=p_pt)
    den = _DUCK_LOG2.format(x=q_pt)
    return f"""
    WITH o AS (
      SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS month,
             c.c_mktsegment AS seg
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), mc AS (
      SELECT month, seg, CAST(COUNT(*) AS BIGINT) AS c FROM o
      GROUP BY month, seg
    ), mt AS (SELECT month, SUM(c) AS tm FROM mc GROUP BY month),
    gc AS (SELECT seg, SUM(c) AS gc FROM mc GROUP BY seg),
    g AS (SELECT SUM(c) AS tg FROM mc),
    j AS (
      SELECT mc.month, mc.seg, mc.c, mt.tm, gcc.gc
      FROM mc JOIN mt ON mt.month = mc.month
             JOIN gc gcc ON gcc.seg = mc.seg
    ), terms AS (
      SELECT j.month, j.tm, j.seg, j.c,
             CASE WHEN (j.c::HUGEINT * ({num} - {den})) >= 0
                  THEN (j.c::HUGEINT * ({num} - {den})) // j.tm
                  ELSE -((-(j.c::HUGEINT * ({num} - {den}))) // j.tm)
             END AS t_ppm_bits
      FROM j, g
    )
    SELECT month, CAST(MAX(tm) AS BIGINT) AS n_orders,
           CAST(SUM(t_ppm_bits) AS BIGINT) AS kl_ppm_bits,
           -- deterministic (count, name) argmax via a sortable encoding
           substr(MAX(lpad(CAST(c AS VARCHAR), 19, '0') || '|' || seg), 21)
             AS top_segment
    FROM terms GROUP BY month
    """


@register("orders_mktsegment_drift", oracle=_drift_oracle())
def orders_mktsegment_drift(spark, sf_dir):
    """Monthly market-segment mix drift: each order month's segment mix
    against the global mix as an exact octave-log2 KL in ppm-bits
    (the bounded probability-ratio convention, r10,
    analytics_readability.py: lg(P(seg|month)·1e12) − lg(P(seg)·1e12),
    arguments bounded by 1e12 at any SF, octave biases cancelling for
    a month that matches the global mix, outer multiply in
    DECIMAL(38,0)/HUGEINT; per-term truncation, signed — truncation
    can leave a near-global month a few ppm-bits negative)
    plus the month's dominant segment (count-then-name max for a
    deterministic tie-break).  The month a campaign shifts the audience
    shows up as a KL spike before any revenue number moves.

    Scale shape: one orders-sized equi-join to the customer dimension
    (unhinted), a partial-combined (month, segment) rollup, then
    everything lives on the calendar×|segments|-bounded grid.
    """
    from kafka_sink_spark.plans.analytics_readability import _SPARK_LOG2

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o = t["orders"].select("o_custkey", "o_orderdate").join(
        t["customer"].select("c_custkey", "c_mktsegment"),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    mc = o.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias(
            "month"
        ),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count("*").cast("long").alias("c"))
    mt = mc.groupBy("month").agg(F.sum("c").alias("tm"))
    gc = mc.groupBy("seg").agg(F.sum("c").alias("gc"))
    g = mc.agg(F.sum("c").alias("tg"))
    j = (
        mc.join(F.broadcast(mt), "month")
        .join(F.broadcast(gc), "seg")
        .crossJoin(F.broadcast(g))
    )
    # Bounded probability-ratio form (r10) — see the oracle note.
    # Outer c·bracket multiply rides DECIMAL(38,0).
    from kafka_sink_spark.plans.analytics_readability import spark_ratio_pt

    # Stage probabilities, then the signed product, each once per row —
    # the lg template reads its argument 4× and the sign-split CASE the
    # product 3×; inlined, the DECIMAL division would run up to 24×.
    staged = j.select(
        "month",
        "tm",
        "seg",
        "c",
        F.expr(spark_ratio_pt("c", "tm")).alias("p_pt"),
        F.expr(spark_ratio_pt("gc", "tg")).alias("q_pt"),
    ).select(
        "month",
        "tm",
        "seg",
        "c",
        F.expr(
            "CAST(c AS DECIMAL(38,0))"
            f" * (({_SPARK_LOG2.format(x='p_pt')})"
            f" - ({_SPARK_LOG2.format(x='q_pt')}))"
        ).alias("prod"),
    )
    terms = staged.select(
        "month",
        "tm",
        "seg",
        "c",
        F.expr(
            "CASE WHEN prod >= 0 THEN prod div tm"
            " ELSE -((-prod) div tm) END"
        ).alias("t_ppm_bits"),
    )
    return terms.groupBy("month").agg(
        F.max("tm").cast("long").alias("n_orders"),
        F.sum("t_ppm_bits").cast("long").alias("kl_ppm_bits"),
        F.substring(
            F.max(
                F.concat(
                    F.lpad(F.col("c").cast("string"), 19, "0"),
                    F.lit("|"),
                    F.col("seg"),
                )
            ),
            21,
            1_000,
        ).alias("top_segment"),
    )


# --------------------------------------------------------------------------
# Document-length octave profile
# --------------------------------------------------------------------------

_OCTAVE_ORACLE = """
    WITH d AS (
      SELECT n_chars, length(bin(n_chars)) - 1 AS octave FROM documents
      WHERE n_chars > 0
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
    SELECT CAST(d.octave AS BIGINT) AS octave,
           CAST(1 << d.octave AS BIGINT) AS octave_floor_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * 1000000 // tot.n AS BIGINT) AS share_ppm,
           CAST(SUM(d.n_chars) // COUNT(*) AS BIGINT) AS mean_chars
    FROM d, tot GROUP BY d.octave, tot.n
    """


@register("docs_length_octave_profile", oracle=_OCTAVE_ORACLE)
def docs_length_octave_profile(spark, sf_dir):
    """Document-length shape on the log scale: documents bucketed by
    power-of-two length octave (floor(log2(n_chars)) via bit length),
    with each octave's share in ppm and mean length — the histogram
    that packing budgets, truncation cutoffs, and heavy-tail alarms
    are read from (mass piling into the top octaves is the long-doc
    tail a fixed-length pipeline must handle).

    Scale shape: one scan, a bit-length projection, one
    partial-combined rollup onto the ≤63-octave grid, a single-row
    total broadcast.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = docs.where(F.col("n_chars") > 0).select(
        "n_chars",
        (F.length(F.expr("bin(n_chars)")) - 1).cast("long").alias("octave"),
    )
    tot = d.agg(F.count("*").cast("long").alias("n"))
    return (
        d.groupBy("octave")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("CAST(SUM(n_chars) div COUNT(*) AS BIGINT)").alias(
                "mean_chars"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "octave",
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(octave AS INT))"
                   " AS BIGINT)").alias("octave_floor_chars"),
            "n_docs",
            F.expr("CAST(n_docs * 1000000 div n AS BIGINT)").alias(
                "share_ppm"
            ),
            "mean_chars",
        )
    )
