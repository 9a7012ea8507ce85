"""Round-8e survival / sequence-information / gate-overlap wave.

- ``lineitem_shipping_hazard``  discrete-time hazard table of the
  order→ship delay: per whole-day delay, the at-risk count (delay ≥
  d, from the DESCENDING two-phase bucket prefix — never a global
  sort), event count (delay = d), hazard in ppm, and the surviving
  share — the life-table form of the Kaplan–Meier estimator with no
  product chain (so it stays exact integer arithmetic).
- ``events_markov_entropy_rate``  entropy rate of the first-order
  event-type Markov chain: per-state conditional entropy via the
  octave-interpolated log2 (per-term ppm truncation before the
  order-independent sum), weighted by the state's empirical frequency
  — the sequence-predictability number (low rate = rigid funnels,
  high = exploratory behavior) on top of the certified transition
  matrix.
- ``docs_quality_gate_venn``  overlap census of three Gopher quality
  gates (word count / symbol ratio / stopword floor): all 8 pass/fail
  cells with document share in ppm — the Venn readout that shows
  whether gates are redundant or complementary BEFORE anyone tunes
  thresholds.

Determinism per the package convention: integers end-to-end,
octave-log2 ppm-bits, truncating division, bounded grids via
plans/prefix.py.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's quality/insight families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Discrete shipping hazard (life table)
# --------------------------------------------------------------------------

_HAZARD_ORACLE = """
    WITH d AS (
      SELECT datediff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS delay
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), lad AS (
      SELECT delay, CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY delay
    ), cum AS (
      SELECT delay, t,
             COALESCE(SUM(t) OVER (ORDER BY delay DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
      FROM lad
    ), tot AS (SELECT SUM(t) AS n FROM lad)
    SELECT CAST(cum.delay AS BIGINT) AS delay_days,
           CAST(cum.above + cum.t AS BIGINT) AS n_at_risk,
           cum.t AS n_events,
           CAST(cum.t * 1000000 // (cum.above + cum.t) AS BIGINT)
             AS hazard_ppm,
           CAST(cum.above * 1000000 // tot.n AS BIGINT) AS surviving_ppm
    FROM cum, tot
    """


@register("lineitem_shipping_hazard", oracle=_HAZARD_ORACLE)
def lineitem_shipping_hazard(spark, sf_dir):
    """Discrete-time hazard (life table) of the order→ship delay: for
    each whole-day delay d, the at-risk population (line items not yet
    shipped at day d, i.e. delay ≥ d), the deliveries that day, the
    hazard d(t)/n(t) in ppm, and the share still surviving past d — the
    Kaplan–Meier life table without the product chain, so every cell is
    exact integer arithmetic.  Rising hazard with delay means shipments bunch at the
    deadline; flat hazard means memoryless fulfilment.

    Scale shape: one fact-sized equi-join (orders key) + partial-combined
    delay rollup; the
    at-risk (reverse-cumulative) counts come from the DESCENDING
    two-phase bucket prefix (plans/prefix.py, week buckets over the
    calendar-bounded delay domain); the readout is a grid-sized
    projection with a single-row total broadcast.
    """
    from kafka_sink_spark.plans.prefix import with_exclusive_prefix

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    d = (
        t["lineitem"]
        .select("l_orderkey", "l_shipdate")
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            .cast("long")
            .alias("delay")
        )
    )
    lad = d.groupBy("delay").agg(F.count("*").cast("long").alias("t"))
    cum = with_exclusive_prefix(
        lad, "delay", {"above": "t"}, bucket_size=7, descending=True
    )
    tot = lad.agg(F.sum("t").cast("long").alias("n"))
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("delay").alias("delay_days"),
        (F.col("above") + F.col("t")).cast("long").alias("n_at_risk"),
        F.col("t").alias("n_events"),
        F.expr("CAST(t * 1000000 div (above + t) AS BIGINT)").alias(
            "hazard_ppm"
        ),
        F.expr("CAST(above * 1000000 div n AS BIGINT)").alias("surviving_ppm"),
    )


# --------------------------------------------------------------------------
# Markov chain entropy rate
# --------------------------------------------------------------------------


def _entropy_rate_oracle() -> str:
    from kafka_sink_spark.plans.analytics_readability import _DUCK_LOG2

    li = _DUCK_LOG2.format(x="t.n_from")
    lij = _DUCK_LOG2.format(x="t.n")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) AS next_type
      FROM events
    ), tc AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ), t AS (
      SELECT from_type, to_type, n,
             SUM(n) OVER (PARTITION BY from_type) AS n_from
      FROM tc
    ), rows_ AS (
      SELECT from_type, MAX(n_from) AS n_from,
             CAST(SUM(n * ({li} - {lij}) // n_from) AS BIGINT) AS h_ppm_bits
      FROM t GROUP BY from_type
    ), tot AS (SELECT SUM(n_from) AS n FROM rows_)
    SELECT rows_.from_type, CAST(rows_.n_from AS BIGINT) AS n_from,
           rows_.h_ppm_bits,
           CAST(rows_.n_from * 1000000 // tot.n AS BIGINT) AS weight_ppm,
           CAST(rows_.n_from * rows_.h_ppm_bits // tot.n AS BIGINT)
             AS contrib_ppm_bits
    FROM rows_, tot
    """


@register("events_markov_entropy_rate", oracle=_entropy_rate_oracle())
def events_markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the first-order event-type Markov chain: per
    state, the conditional next-step entropy H(next|state) in
    octave-log2 ppm-bits (each −p·log2 p term is
    n_ij·(log2(n_i)−log2(n_ij)) div n_i, truncated BEFORE the
    order-independent sum — the docs_source_entropy discipline), plus
    the state's empirical weight and its contribution to the chain's
    entropy rate Σ w_i·H_i.  Low rate = rigid funnels (the next event
    is predictable), high rate = exploratory behavior — the
    sequence-predictability number for any behavioral-model bake-off.

    Scale shape: one user-keyed window shuffle builds the successor
    pairs (the certified events_markov_transitions shape); everything
    after lives on the |types|²-bounded transition table.
    """
    from pyspark.sql import Window

    from kafka_sink_spark.plans.analytics_readability import _SPARK_LOG2

    events = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    tc = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").cast("long").alias("n"))
    row_w = Window.partitionBy("from_type")
    t = tc.select("*", F.sum("n").over(row_w).alias("n_from"))
    li = _SPARK_LOG2.format(x="n_from")
    lij = _SPARK_LOG2.format(x="n")
    rows = t.groupBy("from_type").agg(
        F.max("n_from").cast("long").alias("n_from"),
        F.sum(F.expr(f"n * ({li} - {lij}) div n_from"))
        .cast("long")
        .alias("h_ppm_bits"),
    )
    tot = rows.agg(F.sum("n_from").cast("long").alias("n"))
    return rows.crossJoin(F.broadcast(tot)).select(
        "from_type",
        "n_from",
        "h_ppm_bits",
        F.expr("CAST(n_from * 1000000 div n AS BIGINT)").alias("weight_ppm"),
        F.expr("CAST(n_from * h_ppm_bits div n AS BIGINT)").alias(
            "contrib_ppm_bits"
        ),
    )


# --------------------------------------------------------------------------
# Quality-gate Venn census
# --------------------------------------------------------------------------


def _venn_oracle() -> str:
    from kafka_sink_spark.plans.analytics_quality import _GOPHER_ORACLE

    return f"""
    WITH flags AS ({_GOPHER_ORACLE}),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM flags)
    SELECT CAST(ok_words AS BIGINT) AS ok_words,
           CAST(ok_symbols AS BIGINT) AS ok_symbols,
           CAST(ok_stopwords AS BIGINT) AS ok_stopwords,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * 1000000 // tot.n AS BIGINT) AS share_ppm
    FROM flags, tot
    GROUP BY ok_words, ok_symbols, ok_stopwords, tot.n
    """


@register("docs_quality_gate_venn", oracle=_venn_oracle())
def docs_quality_gate_venn(spark, sf_dir):
    """Overlap census of three Gopher quality gates (word-count bounds,
    symbol ratio, stopword floor): every pass/fail combination with its
    document share in ppm.  Cells that never light up mean a gate is
    redundant (dominated by another); a heavy fail∩fail cell means the
    gates reject the same documents and a third signal is needed —
    the diagnosis to run BEFORE tuning thresholds.

    Scale shape: the certified gopher_flags staged projection (zero
    shuffles) followed by one partial-combined rollup onto the 8-cell
    grid and a single-row total broadcast.
    """
    from kafka_sink_spark.extensions import text
    from kafka_sink_spark.plans.analytics_quality import _GOPHER

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    flags = text.gopher_flags(docs, **_GOPHER)
    cells = flags.groupBy("ok_words", "ok_symbols", "ok_stopwords").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    tot = cells.agg(F.sum("n_docs").cast("long").alias("n"))
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("ok_words").cast("long").alias("ok_words"),
        F.col("ok_symbols").cast("long").alias("ok_symbols"),
        F.col("ok_stopwords").cast("long").alias("ok_stopwords"),
        "n_docs",
        F.expr("CAST(n_docs * 1000000 div n AS BIGINT)").alias("share_ppm"),
    )
