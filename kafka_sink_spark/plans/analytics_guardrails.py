"""Round-10e pipeline-guardrail wave: screens and alarms a production
data pipeline runs continuously over its feeds.

- ``docs_blocklist_rate``  C4-style blocklist screen (Raffel et al.
  2020 filtered C4 on a public "bad words" list): per source, how many
  documents trip the blocklist and how dense the hits are — the
  go/no-go number for a source before it enters the training mix.
- ``events_page_hinkley``  Page–Hinkley drift alarm (Page 1954;
  Hinkley 1971 — the sequential mean-shift detector MOA/river ship for
  streams): per event type, the PH statistic over the time-ordered
  value series and the first alarm crossing, i.e. "did this feed's
  level drift, and when".
- ``orders_cmh_test``  Cochran–Mantel–Haenszel stratified 2×2 test
  (Mantel & Haenszel 1959): association between order priority and
  high order value CONTROLLING for customer nation — the confounder
  check behind any per-segment rollout readout.

Determinism per the package convention: exact integer micro-units
throughout; the PH running mean uses truncating division on
non-negative prefix sums (identical in both engines — negative values
never reach a division); CMH expectation/variance use the staged
truncating-division convention (each factor ratio is reduced before
the next multiply, so no count-product has to fit int64 — the r9→r10
log-family lesson applied to hypergeometric moments).

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's quality/streaming-drift/
experimentation families.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# C4-style blocklist screen per source
# --------------------------------------------------------------------------

_BLOCKLIST = ("slow", "dup", "big")
_TOKEN_RE = "[a-z]+"
_BL_IN = ", ".join(f"'{w}'" for w in _BLOCKLIST)


def _blocklist_oracle() -> str:
    return f"""
    WITH t AS (
      SELECT source,
             len(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS n_tok,
             len(list_filter(regexp_extract_all(lower(text), '{_TOKEN_RE}'),
                 w -> w IN ({_BL_IN}))) AS n_hit
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS flagged_ppm,
           CAST(SUM(n_hit) AS BIGINT) AS n_hits,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_hit)::HUGEINT * 1000000 // SUM(n_tok) AS BIGINT)
             AS hits_per_mtoken
    FROM t GROUP BY source ORDER BY source
    """


@register("docs_blocklist_rate", oracle=_blocklist_oracle())
def docs_blocklist_rate(spark, sf_dir):
    """Blocklist screen per source (the C4 construction: a document is
    dropped if it contains any listed word; here the screen REPORTS
    rather than drops, per source): flagged-document rate and hit
    density per million tokens.  Token-exact matching — the text
    tokenizes with the catalog's [a-z]+ convention and whole tokens
    compare against the list, so substrings of longer words never
    false-positive (a regex-boundary screen would).

    Scale shape: one zero-shuffle projection (tokenize + filter are
    codegen'd higher-order functions; no explode — the per-doc counts
    reduce inside the lambda), then one partial-combined rollup onto
    the |sources| keyspace.  The same plan at any corpus size.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = docs.select(
        "source",
        F.expr(
            f"size(regexp_extract_all(lower(text), '{_TOKEN_RE}', 0))"
        ).alias("n_tok"),
        F.expr(
            f"size(filter(regexp_extract_all(lower(text), '{_TOKEN_RE}', 0),"
            f" w -> w IN ({_BL_IN})))"
        ).alias("n_hit"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_hit") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum("n_hit").cast("long").alias("n_hits"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            F.expr("CAST(n_flagged * 1000000 div n_docs AS BIGINT)").alias(
                "flagged_ppm"
            ),
            "n_hits",
            "n_tokens",
            F.expr(
                "CAST(CAST(n_hits AS DECIMAL(38,0)) * 1000000 div n_tokens"
                " AS BIGINT)"
            ).alias("hits_per_mtoken"),
        )
        .select(
            "source", "n_docs", "n_flagged", "flagged_ppm",
            "n_hits", "n_tokens", "hits_per_mtoken",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Page–Hinkley drift alarm per event type
# --------------------------------------------------------------------------

_PH_LAMBDA_US = 2_000_000_000  # alarm threshold: 2000 value-units in µ-units


_PH_ORACLE = f"""
    WITH v AS (
      SELECT event_type, event_id, ts,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ), c AS (
      SELECT event_type, event_id,
             ROW_NUMBER() OVER w AS t,
             v_us,
             SUM(CAST(v_us AS HUGEINT)) OVER w AS s
      FROM v
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), term AS (
      SELECT event_type, event_id, t, v_us - (s // t) AS term
      FROM c
    ), m AS (
      SELECT event_type, event_id, t,
             SUM(CAST(term AS HUGEINT)) OVER w2 AS m
      FROM term
      WINDOW w2 AS (PARTITION BY event_type ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), ph AS (
      SELECT event_type, event_id, t,
             m - MIN(m) OVER w3 AS ph
      FROM m
      WINDOW w3 AS (PARTITION BY event_type ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), peak AS (
      SELECT event_type, t AS t_at_max, CAST(ph AS BIGINT) AS max_ph_us
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY event_type ORDER BY ph DESC, t ASC) AS rk
            FROM ph)
      WHERE rk = 1
    ), alarm AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(MIN(CASE WHEN ph > {_PH_LAMBDA_US} THEN t END), 0)
                  AS BIGINT) AS alarm_t
      FROM ph GROUP BY event_type
    )
    SELECT a.event_type, a.n, p.max_ph_us,
           CAST(p.t_at_max AS BIGINT) AS t_at_max, a.alarm_t,
           CAST(CASE WHEN a.alarm_t > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS alarmed
    FROM alarm a JOIN peak p ON p.event_type = a.event_type
    ORDER BY a.event_type
    """


@register("events_page_hinkley", oracle=_PH_ORACLE)
def events_page_hinkley(spark, sf_dir):
    """Page–Hinkley mean-shift alarm per event type (Page 1954, Hinkley
    1971; the sequential drift detector stream libraries ship): over
    the time-ordered value series, m_t = Σ_{{i≤t}} (x_i − x̄_i) with the
    RUNNING mean x̄_i, and PH_t = m_t − min_{{i≤t}} m_i; the type alarms
    at the first t with PH_t > λ (λ = 2000 value-units).  Reported per
    type: series length, the peak PH statistic and where it peaked,
    and the alarm time (0 = never crossed).  Integer convention: the
    running mean is S_i div i on non-negative micro-unit prefix sums —
    truncating division agrees cross-engine because the dividend is
    never negative; everything after is add/subtract only.

    Scale shape: three stacked cumulative windows (running sum, running
    m, running min) share ONE type-keyed sort — Spark plans a single
    Window operator chain on one exchange; the peak is a per-type
    WindowGroupLimit rank-1 and the alarm a partial-combined
    conditional min.  The partition key is the series key, so the
    inherently-sequential scan parallelizes across types/series exactly
    as a per-key stateful streaming operator would.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    v = events.select(
        "event_type",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("v_us"),
    )
    w_ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    c = v.select(
        "event_type",
        "event_id",
        "ts",
        F.row_number().over(w_ord).alias("t"),
        "v_us",
        F.sum(F.expr("CAST(v_us AS DECIMAL(38,0))")).over(w_cum).alias("s"),
    )
    # every cumulative pass orders by the SAME (ts, event_id) keys so the
    # planner reuses one per-type sort instead of re-sorting on t
    term = c.select(
        "event_type",
        "event_id",
        "ts",
        "t",
        F.expr("v_us - (s div t)").alias("term"),
    )
    m = term.select(
        "event_type",
        "event_id",
        "ts",
        "t",
        F.sum(F.expr("CAST(term AS DECIMAL(38,0))")).over(w_cum).alias("m"),
    )
    ph = m.select(
        "event_type",
        "event_id",
        "t",
        (F.col("m") - F.min("m").over(w_cum)).alias("ph"),
    )
    peak = (
        ph.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("ph").desc(), F.col("t").asc()
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("t").cast("long").alias("t_at_max"),
            F.col("ph").cast("long").alias("max_ph_us"),
        )
    )
    alarm = ph.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(
            F.min(F.when(F.col("ph") > _PH_LAMBDA_US, F.col("t"))),
            F.lit(0),
        )
        .cast("long")
        .alias("alarm_t"),
    )
    return (
        alarm.join(F.broadcast(peak), "event_type")
        .select(
            "event_type",
            "n",
            "max_ph_us",
            "t_at_max",
            "alarm_t",
            F.expr(
                "CAST(CASE WHEN alarm_t > 0 THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("alarmed"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Cochran–Mantel–Haenszel stratified 2×2 association test
# --------------------------------------------------------------------------

_CMH_EXPOSED_PRIORITIES = ("1-URGENT", "2-HIGH")
_CMH_OUTCOME_THRESHOLD = 150000  # "high-value order": o_totalprice > $150k
_CMH_EXPOSED = (
    "o_orderpriority IN ("
    + ", ".join(f"'{p}'" for p in _CMH_EXPOSED_PRIORITIES)
    + ")"
)
_CMH_OUTCOME = f"o_totalprice > {_CMH_OUTCOME_THRESHOLD}"


_CMH_ORACLE = f"""
    WITH j AS (
      SELECT n.n_name AS nation,
             CASE WHEN {_CMH_EXPOSED} THEN 1 ELSE 0 END AS e,
             CASE WHEN {_CMH_OUTCOME} THEN 1 ELSE 0 END AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), s AS (
      SELECT nation,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(e * y) AS BIGINT) AS a,
             CAST(SUM(e) AS BIGINT) AS r1,
             CAST(SUM(y) AS BIGINT) AS c1
      FROM j GROUP BY nation
    ), rows_ AS (
      SELECT nation, n, a, r1, c1,
             CAST(r1::HUGEINT * c1 * 1000000 // n AS BIGINT) AS e_ppm,
             CAST(((r1::HUGEINT * (n - r1) // n)
                   * (c1::HUGEINT * (n - c1) // (n - 1))
                   * 1000000000::HUGEINT) // n AS BIGINT) AS v_ppb,
             CAST(a::HUGEINT * 1000000 - r1::HUGEINT * c1 * 1000000 // n
                  AS BIGINT) AS dev_ppm,
             CAST(0 AS BIGINT) AS cmh_ppm
      FROM s
    )
    SELECT * FROM rows_
    UNION ALL
    SELECT '*' AS nation,
           CAST(SUM(n) AS BIGINT), CAST(SUM(a) AS BIGINT),
           CAST(SUM(r1) AS BIGINT), CAST(SUM(c1) AS BIGINT),
           CAST(SUM(e_ppm) AS BIGINT), CAST(SUM(v_ppb) AS BIGINT),
           CAST(SUM(dev_ppm) AS BIGINT),
           CAST((SUM(dev_ppm)::HUGEINT * SUM(dev_ppm))
                // (SUM(v_ppb)::HUGEINT * 1000) AS BIGINT)
    FROM rows_
    """


@register("orders_cmh_test", oracle=_CMH_ORACLE)
def orders_cmh_test(spark, sf_dir):
    """Cochran–Mantel–Haenszel stratified 2×2 association (Mantel &
    Haenszel 1959): does high order priority associate with high order
    value (> $150k) AFTER controlling for customer nation?  Per
    stratum: the 2×2 margins, the hypergeometric expectation E(a) and
    variance V(a) in fixed point, and the deviation a − E(a); the '*'
    row pools them into the CMH statistic (Σdev)²/ΣV (no continuity
    correction) in ppm of a χ²₁ unit.  Integer convention: E and V use
    staged truncating division — each non-negative factor ratio
    (r1·r2/n, c1·c2/(n−1)) reduces before the next multiply, so the
    moments are exact to the convention and NO four-way count product
    ever has to fit int64 (the log-family rebase lesson applied to
    hypergeometric moments; bounded through ~10¹² orders/stratum).

    Scale shape: one orders↔customer equi-join (both SF-scaling — a
    plain shuffle join on the key, never broadcast), a 25-row broadcast
    nation join, then ONE partial-combined rollup onto the nation
    keyspace; the pooled row aggregates 25 rows.  The sufficient
    statistics (n, a, r1, c1) merge associatively, so this is the
    map-side-combine plan at any scale.
    """
    tables = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    o = tables["orders"]
    c = tables["customer"]
    n = tables["nation"]
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(n), c.c_nationkey == n.n_nationkey
        )
        .select(
            F.col("n_name").alias("nation"),
            F.expr(f"CASE WHEN {_CMH_EXPOSED} THEN 1 ELSE 0 END").alias("e"),
            F.expr(f"CASE WHEN {_CMH_OUTCOME} THEN 1 ELSE 0 END").alias("y"),
        )
    )
    s = j.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("e") * F.col("y")).cast("long").alias("a"),
        F.sum("e").cast("long").alias("r1"),
        F.sum("y").cast("long").alias("c1"),
    )
    rows = s.select(
        "nation",
        "n",
        "a",
        "r1",
        "c1",
        F.expr(
            "CAST(CAST(r1 AS DECIMAL(38,0)) * c1 * 1000000 div n AS BIGINT)"
        ).alias("e_ppm"),
        # `div` renders each staged quotient as BIGINT — recast to
        # DECIMAL(38,0) BEFORE the next multiply or the ×1e9 runs in long
        # arithmetic and overflows (caught by the sf10 ladder; DuckDB's
        # HUGEINT pipeline never narrows, so the recast also keeps the
        # two engines on the same arithmetic)
        F.expr(
            "CAST((CAST(CAST(r1 AS DECIMAL(38,0)) * (n - r1) div n"
            "       AS DECIMAL(38,0))"
            " * CAST(CAST(c1 AS DECIMAL(38,0)) * (n - c1) div (n - 1)"
            "       AS DECIMAL(38,0))"
            " * 1000000000) div n AS BIGINT)"
        ).alias("v_ppb"),
        F.expr(
            "CAST(CAST(a AS DECIMAL(38,0)) * 1000000"
            " - CAST(r1 AS DECIMAL(38,0)) * c1 * 1000000"
            " div n AS BIGINT)"
        ).alias("dev_ppm"),
        F.lit(0).cast("long").alias("cmh_ppm"),
    )
    total = rows.agg(
        F.lit("*").alias("nation"),
        F.sum("n").cast("long").alias("n"),
        F.sum("a").cast("long").alias("a"),
        F.sum("r1").cast("long").alias("r1"),
        F.sum("c1").cast("long").alias("c1"),
        F.sum("e_ppm").cast("long").alias("e_ppm"),
        F.sum("v_ppb").cast("long").alias("v_ppb"),
        F.sum("dev_ppm").cast("long").alias("dev_ppm"),
        F.expr(
            "CAST((CAST(SUM(dev_ppm) AS DECIMAL(38,0)) * SUM(dev_ppm))"
            " div (CAST(SUM(v_ppb) AS DECIMAL(38,0)) * 1000) AS BIGINT)"
        ).alias("cmh_ppm"),
    )
    return rows.unionByName(total)


# --------------------------------------------------------------------------
# Wald SPRT sequential A/B decision per event type
# --------------------------------------------------------------------------

# H0: P(value > 30) = 0.5  vs  H1: P = 0.6, alpha = beta = 0.05.
# Per-observation LLR increments and the Wald boundaries are CONSTANTS of
# the design, embedded as exact ppm-bit literals (lg2(0.6/0.5), lg2(0.4/0.5),
# lg2(0.95/0.05)) identical in both engines — the data only ever counts.
_SPRT_THRESHOLD = 30
_SPRT_A_PPM = 263_034  # lg2(p1/p0) per success
_SPRT_B_PPM = -321_928  # lg2((1-p1)/(1-p0)) per failure
_SPRT_BOUND_PPM = 4_247_928  # lg2((1-beta)/alpha); lower bound is its negation


_SPRT_ORACLE = f"""
    WITH v AS (
      SELECT event_type, event_id, ts,
             CASE WHEN value > {_SPRT_THRESHOLD} THEN 1 ELSE 0 END AS succ
      FROM events
    ), c AS (
      SELECT event_type,
             ROW_NUMBER() OVER w AS t,
             SUM(succ) OVER w AS k
      FROM v
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), l AS (
      SELECT event_type, t, k,
             k * {_SPRT_A_PPM} + (t - k) * ({_SPRT_B_PPM}) AS llr
      FROM c
    ), agg AS (
      SELECT event_type,
             CAST(MAX(t) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN t = n2.nmax THEN k END) AS BIGINT) AS k,
             CAST(MAX(CASE WHEN t = n2.nmax THEN llr END) AS BIGINT)
               AS llr_final_ppm,
             CAST(COALESCE(MIN(CASE WHEN llr >= {_SPRT_BOUND_PPM}
                                    THEN t END), 0) AS BIGINT) AS t_accept,
             CAST(COALESCE(MIN(CASE WHEN llr <= -{_SPRT_BOUND_PPM}
                                    THEN t END), 0) AS BIGINT) AS t_reject
      FROM l, (SELECT event_type AS et, MAX(t) AS nmax FROM l GROUP BY 1) n2
      WHERE l.event_type = n2.et
      GROUP BY event_type
    )
    SELECT event_type, n, k, llr_final_ppm,
           CAST(CASE
             WHEN t_accept > 0 AND (t_reject = 0 OR t_accept <= t_reject)
               THEN t_accept
             WHEN t_reject > 0 THEN t_reject
             ELSE 0 END AS BIGINT) AS decision_t,
           CAST(CASE
             WHEN t_accept > 0 AND (t_reject = 0 OR t_accept <= t_reject)
               THEN 1
             WHEN t_reject > 0 THEN -1
             ELSE 0 END AS BIGINT) AS decision
    FROM agg ORDER BY event_type
    """


@register("events_sprt", oracle=_SPRT_ORACLE)
def events_sprt(spark, sf_dir):
    """Wald sequential probability ratio test per event type (Wald
    1945): H0 P(value > 30) = 0.5 vs H1 P = 0.6 at alpha = beta = 0.05.
    Because the Bernoulli LLR has CONSTANT per-observation increments,
    LLR_t = k_t·lg2(p1/p0) + (t−k_t)·lg2(q1/q0) is pure integer
    arithmetic on the cumulative success count — the sequential test
    that stops an experiment the moment the evidence clears the Wald
    boundary ±lg2(19), instead of waiting for a fixed horizon.
    Reported per type: n, successes, the final LLR, the first boundary
    crossing (0 = never decided) and the decision (+1 accept H1,
    −1 accept H0, 0 still running).

    Scale shape: one type-keyed cumulative window (the same single sort
    the Page–Hinkley alarm uses), then a partial-combined conditional
    aggregate; the per-type series is the partition, so the inherently
    sequential statistic parallelizes across types exactly like a
    per-key stateful streaming operator.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    v = events.select(
        "event_type",
        "event_id",
        "ts",
        F.expr(
            f"CASE WHEN value > {_SPRT_THRESHOLD} THEN 1 ELSE 0 END"
        ).alias("succ"),
    )
    w_ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    l = v.select(
        "event_type",
        F.row_number().over(w_ord).alias("t"),
        F.sum("succ").over(w_cum).alias("k"),
    ).select(
        "event_type",
        "t",
        "k",
        F.expr(
            f"k * {_SPRT_A_PPM} + (t - k) * ({_SPRT_B_PPM})"
        ).alias("llr"),
    )
    agg = l.groupBy("event_type").agg(
        F.max("t").cast("long").alias("n"),
        F.max_by("k", "t").cast("long").alias("k"),
        F.max_by("llr", "t").cast("long").alias("llr_final_ppm"),
        F.coalesce(
            F.min(F.when(F.col("llr") >= _SPRT_BOUND_PPM, F.col("t"))),
            F.lit(0),
        )
        .cast("long")
        .alias("t_accept"),
        F.coalesce(
            F.min(F.when(F.col("llr") <= -_SPRT_BOUND_PPM, F.col("t"))),
            F.lit(0),
        )
        .cast("long")
        .alias("t_reject"),
    )
    return agg.select(
        "event_type",
        "n",
        "k",
        "llr_final_ppm",
        F.expr(
            "CAST(CASE"
            " WHEN t_accept > 0 AND (t_reject = 0 OR t_accept <= t_reject)"
            "   THEN t_accept"
            " WHEN t_reject > 0 THEN t_reject"
            " ELSE 0 END AS BIGINT)"
        ).alias("decision_t"),
        F.expr(
            "CAST(CASE"
            " WHEN t_accept > 0 AND (t_reject = 0 OR t_accept <= t_reject)"
            "   THEN 1"
            " WHEN t_reject > 0 THEN -1"
            " ELSE 0 END AS BIGINT)"
        ).alias("decision"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Streaming SPRT twin — the real stateful operator, driver-certified
# --------------------------------------------------------------------------

_STREAM_SPRT_RUNS = __import__("itertools").count()


@register("stream_sprt_twin", oracle=_SPRT_ORACLE)
def stream_sprt_twin(spark, sf_dir):
    """The CUSTOM STATEFUL streaming SPRT (streaming/analytics.py
    running_sprt: applyInPandasWithState, per-type state = FOUR integers
    (t, k, first-crossing, decision)), certified by EXECUTING the real
    streaming query: the events table replays through a file source with
    trigger(availableNow=True), and the per-type final emission must
    hash-equal the batch ``events_sprt`` oracle, because both sides fold
    the identical constant-increment integer LLR in (ts, event_id)
    order.  This is what the sequential test is FOR on a stream — the
    experiment stops itself at the boundary crossing instead of waiting
    for a batch horizon; the twin proves the stream and batch forms are
    the same decision function.

    Scale shape: state is four integers per key (bounded by the type/arm
    cardinality, never the stream length — even tighter than the EWMA
    twin's value window); Arrow batches keep the Python hop vectorized;
    the only shuffle is the event_type exchange.
    """
    import tempfile

    from kafka_sink_spark.plans.stream_twin import finish_stream_twin
    from kafka_sink_spark.streaming.analytics import running_sprt

    events = load_tables(spark, sf_dir, ("events",))["events"]
    sel = events.select("event_id", "ts", "event_type", "value")
    src = tempfile.mkdtemp(prefix="stream_sprt_src_")
    sel.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    name = f"stream_sprt_twin_{next(_STREAM_SPRT_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_sprt_ck_")
    q = (
        running_sprt(
            stream,
            threshold=_SPRT_THRESHOLD,
            a_ppm=_SPRT_A_PPM,
            b_ppm=_SPRT_B_PPM,
            bound_ppm=_SPRT_BOUND_PPM,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    # update-mode memory sink keeps one row per emission; the final state
    # per type is the emission with the largest n (monotone)
    result = (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max_by("k", "n").alias("k"),
            F.max_by("llr_final_ppm", "n").alias("llr_final_ppm"),
            F.max_by("decision_t", "n").alias("decision_t"),
            F.max_by("decision", "n").alias("decision"),
        )
        .orderBy("event_type")
    )
    return finish_stream_twin(spark, q, name, result, (src, ck))
