"""Round-6o wave: corpus novelty scoring, change-point detection, and
digit-law conformance — a curation-ordering signal, the classic
sequential-drift detector, and the classic fraud screen, all in the
catalog's exact-integer, oracle-twinned style.

- ``docs_ngram_novelty``  per-document novelty: the fraction of a
  document's distinct 3-gram shingles whose FIRST corpus occurrence (by
  doc_id order) is this document — the "how much new text does this doc
  contribute" signal dataset-curation orderings rank by (the streaming
  complement of dedup: a doc full of already-seen shingles is redundant
  even if no single pair crosses a near-dup threshold).
- ``events_cusum_changepoint``  CUSUM change-point location (Page 1954)
  per event type: the time index maximizing |Σ_{i≤t}(v_i − mean)|, with
  the mean cross-multiplied away (D_t = n·S_t − t·total) so the entire
  statistic is exact wide-integer arithmetic — no float mean crosses a
  partition or engine boundary.
- ``orders_benford_digits``  Benford first-digit conformance with the
  expectation entering as nine fixed ppm literals (summing to exactly
  1e6) and exact integer chi-square cells — no logarithm is ever
  evaluated.

Determinism per the package convention: decimal(38,0) ≙ HUGEINT for the
wide products, truncating division on non-negative operands (sign split
where a difference can be negative), ties broken on time order.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.analytics_assoc import _distinct_shingles
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Per-document n-gram novelty
# --------------------------------------------------------------------------

_NOVELTY_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, unnest(
          CASE WHEN len(t) >= 3
               THEN list_transform(range(len(t) - 2),
                      i -> array_to_string(t[i+1:i+3], ' '))
               ELSE [array_to_string(t, ' ')] END) AS s
        FROM toks)
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh
    ), firsts AS (
      SELECT h, MIN(doc_id) AS first_doc FROM h GROUP BY h
    )
    SELECT h.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = h.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = h.doc_id THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM h JOIN firsts f ON f.h = h.h
    GROUP BY h.doc_id
    """


@register("docs_ngram_novelty", oracle=_NOVELTY_ORACLE)
def docs_ngram_novelty(spark, sf_dir):
    """Per-document shingle novelty: of a document's distinct 3-gram
    shingles, how many appear in NO earlier document (first corpus
    occurrence by doc_id order), as a count and a ppm rate.  This is the
    ordering-aware redundancy signal curation pipelines rank by — a
    document can evade every pairwise near-dup threshold and still be 0%
    novel because its content is scattered across many predecessors;
    conversely high-novelty docs are the ones worth keeping first.

    Scale shape: reuses the persisted distinct (doc, shingle) postings
    (shared with dedup_ppjoin_pairs); one partial-combined min-aggregate
    assigns each shingle its first document, one hash-join back to the
    postings, one per-doc count rollup — linear, three shuffles on the
    same 60-bit hash key.  The "earlier" order is doc_id (ingestion
    order); any total order column slots in unchanged.
    """
    sh = _distinct_shingles(spark, sf_dir)
    firsts = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("(n_novel * 1000000) div n_shingles").alias("novelty_ppm"),
        )
    )


# --------------------------------------------------------------------------
# CUSUM change-point location per event type
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
    WITH v AS (
      SELECT event_type, event_id, ts,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ), c AS (
      SELECT event_type, event_id, ts,
             ROW_NUMBER() OVER w AS t,
             SUM(CAST(v_us AS HUGEINT)) OVER w AS s,
             SUM(CAST(v_us AS HUGEINT)) OVER (PARTITION BY event_type) AS total,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), d AS (
      SELECT event_type, event_id, ts, t, n,
             ABS(n * s - t * total) AS abs_d
      FROM c
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY abs_d DESC, t) AS rk
      FROM d
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS t_at_max,
           event_id AS changepoint_event_id, ts AS changepoint_ts,
           CAST(abs_d // n AS BIGINT) AS max_cusum_dev_us
    FROM r WHERE rk = 1
    """


@register("events_cusum_changepoint", oracle=_CUSUM_ORACLE)
def events_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point location per event type (Page 1954 / the
    binary-segmentation pivot): the time index t maximizing
    |Σ_{i≤t}(v_i − v̄)| over the type's time-ordered values.  The mean is
    cross-multiplied away — D_t = n·S_t − t·total — so the statistic is
    exact decimal(38,0)/HUGEINT arithmetic end-to-end; the reported
    magnitude divides back by n into micro-value units (non-negative, so
    truncation agrees cross-engine).  Ties break on earliest t.

    Scale shape: one type-keyed window pass produces the running sum,
    rank, and per-type totals over a single hash partitioning; the argmax
    is a per-type WindowGroupLimit rank (top-1), never a global sort.
    Each series' cumsum is inherently sequential — at production scale
    the partition key IS the series key, exactly as here.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    v = events.select(
        "event_type",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("v_us"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tw = Window.partitionBy("event_type")
    dec = "CAST(v_us AS DECIMAL(38,0))"
    c = v.select(
        "event_type",
        "event_id",
        "ts",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("t"),
        F.sum(F.expr(dec)).over(w).alias("s"),
        F.sum(F.expr(dec)).over(tw).alias("total"),
        F.count("*").over(tw).alias("n"),
    )
    d = c.select(
        "event_type",
        "event_id",
        "ts",
        "t",
        "n",
        F.abs(F.col("n") * F.col("s") - F.col("t") * F.col("total")).alias(
            "abs_d"
        ),
    )
    r = d.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.col("abs_d").desc(), F.col("t")
            )
        )
        .alias("rk"),
    )
    return r.where(F.col("rk") == 1).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("t").cast("long").alias("t_at_max"),
        F.col("event_id").alias("changepoint_event_id"),
        F.col("ts").alias("changepoint_ts"),
        F.expr("CAST(abs_d div n AS BIGINT)").alias("max_cusum_dev_us"),
    )


# --------------------------------------------------------------------------
# Benford first-digit conformance
# --------------------------------------------------------------------------

# log10(1 + 1/d) in ppm; the published Benford probabilities. The rounded
# constants sum to exactly 1_000_000, so the expected distribution is an
# exact integer measure.
_BENFORD_PPM = {
    1: 301030,
    2: 176091,
    3: 124939,
    4: 96910,
    5: 79181,
    6: 66947,
    7: 57992,
    8: 51153,
    9: 45757,
}
assert sum(_BENFORD_PPM.values()) == 1_000_000

_BENFORD_CASE = (
    "CASE "
    + " ".join(f"WHEN digit = {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


_BENFORD_ORACLE = f"""
    WITH w AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
    ), o AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs FROM w GROUP BY digit
    ), t AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o
    ), x AS (
      SELECT o.digit, o.obs, t.n, {_BENFORD_CASE} AS exp_ppm
      FROM o, t
    )
    SELECT digit, obs, n,
           obs * 1000000 // n AS obs_ppm,
           exp_ppm,
           CAST((CAST(obs AS HUGEINT) * 1000000 - CAST(n AS HUGEINT) * exp_ppm)
                * (CAST(obs AS HUGEINT) * 1000000 - CAST(n AS HUGEINT) * exp_ppm)
                // (CAST(n AS HUGEINT) * exp_ppm) AS BIGINT) AS chisq_cell_ppm
    FROM x
    """


@register("orders_benford_digits", oracle=_BENFORD_ORACLE)
def orders_benford_digits(spark, sf_dir):
    """Benford's-law first-digit conformance of order totals: observed
    first-significant-digit counts against the published Benford
    probabilities log10(1+1/d) — the classic fraud/data-quality screen —
    with each digit's chi-square contribution in exact integer ppm.  The
    Benford expectation enters as NINE FIXED PPM LITERALS that sum to
    exactly 1e6 (no logs evaluated anywhere), and the chi-square cell
    ((obs·1e6 − n·exp)² div (n·exp), decimal38 ≙ HUGEINT for the square)
    follows the same cross-multiplied integer identity as
    ``events_chisq_contingency`` — bit-identical cross-engine.

    Scale shape: one projection (first digit of the fixed-point cents
    string), one 9-key partial-combined count, a single-row total
    broadcast.  Linear at any scale; the digit keyspace is constant.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = orders.select(
        F.expr(
            "CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)"
            " AS STRING), 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    o = w.groupBy("digit").agg(F.count("*").cast("long").alias("obs"))
    t = o.agg(F.sum("obs").cast("long").alias("n"))
    dec = "CAST(obs AS DECIMAL(38,0)) * 1000000 - CAST(n AS DECIMAL(38,0)) * exp_ppm"
    return (
        o.crossJoin(F.broadcast(t))
        .select("digit", "obs", "n", F.expr(_BENFORD_CASE).alias("exp_ppm"))
        .select(
            "digit",
            "obs",
            "n",
            F.expr("obs * 1000000 div n").alias("obs_ppm"),
            "exp_ppm",
            F.expr(
                f"CAST(({dec}) * ({dec})"
                " div (CAST(n AS DECIMAL(38,0)) * exp_ppm) AS BIGINT)"
            ).alias("chisq_cell_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test per event type
# --------------------------------------------------------------------------

_RUNS_ORACLE = """
    WITH v AS (
      SELECT event_type, event_id, ts,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ), r1 AS (
      SELECT event_type, event_id, ts, v_us,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY v_us, event_id) AS vrk,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM v
    ), med AS (
      SELECT event_type,
             MAX(CASE WHEN vrk = (cnt + 1) // 2 THEN v_us END) AS median_us
      FROM r1 GROUP BY event_type
    ), s AS (
      SELECT v.event_type, v.event_id, v.ts,
             CASE WHEN v.v_us > med.median_us THEN 1 ELSE 0 END AS sgn
      FROM v JOIN med ON med.event_type = v.event_type
    ), chg AS (
      SELECT event_type, sgn,
             CASE WHEN lag(sgn) OVER w IS DISTINCT FROM sgn
                  THEN 1 ELSE 0 END AS is_new_run
      FROM s WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(sgn) AS BIGINT) AS n_above,
             CAST(COUNT(*) - SUM(sgn) AS BIGINT) AS n_below,
             CAST(SUM(is_new_run) AS BIGINT) AS runs
      FROM chg GROUP BY event_type
    )
    SELECT event_type, n, n_above, n_below, runs,
           CAST(1000000 + (2 * n_above * n_below * 1000000) // n AS BIGINT)
             AS expected_runs_ppm,
           CAST((CAST(runs * n - (n + 2 * n_above * n_below) AS HUGEINT)
                 * (runs * n - (n + 2 * n_above * n_below)) * (n - 1)) * 1000000
                // (CAST(2 * n_above * n_below AS HUGEINT)
                    * (2 * n_above * n_below - n)) AS BIGINT)
             AS z2_ppm
    FROM agg
    """


@register("events_runs_test", oracle=_RUNS_ORACLE)
def events_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test per event type: split the time-ordered
    series at its exact lower median (above / not-above), count maximal
    same-sign runs R, and emit the squared z statistic against the
    under-randomness expectation E[R] = 1 + 2·n₁·n₂/n — entirely in
    cross-multiplied exact integers: D = R·n − (n + 2n₁n₂) = n·(R − E[R])
    is exact, and with Var(R) = 2n₁n₂·(2n₁n₂−n)/(n²·(n−1)) the n²
    cancels, giving z² = D²·(n−1) / (2n₁n₂·(2n₁n₂−n)) emitted in ppm with
    decimal(38,0) ≙ HUGEINT wide products, no float mean/variance
    anywhere (the same discipline as events_ab_test's z² and the χ²
    cells).  z² > 4e6 ppm ⇒ the sequence is non-random at ~5% —
    clustering (too few runs) or oscillation (too many) both trip it;
    the randomness screen that complements the CUSUM location test.

    Scale shape: one type-keyed rank window for the exact median, one
    broadcast of the per-type medians, one type-keyed lag window sharing
    the same hash partitioning, and a partial-combined per-type rollup —
    linear, two window passes, no joins beyond the broadcast.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    v = events.select(
        "event_type",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("v_us"),
    )
    r1 = v.select(
        "*",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("v_us", "event_id"))
        .alias("vrk"),
        F.count("*").over(Window.partitionBy("event_type")).alias("cnt"),
    )
    med = r1.groupBy("event_type").agg(
        F.max(
            F.when(F.col("vrk") == F.expr("(cnt + 1) div 2"), F.col("v_us"))
        ).alias("median_us")
    )
    s = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "ts",
        F.when(F.col("v_us") > F.col("median_us"), 1).otherwise(0).alias("sgn"),
    )
    lag_w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    chg = s.select(
        "event_type",
        "sgn",
        F.when(
            ~F.lag("sgn").over(lag_w).eqNullSafe(F.col("sgn")), 1
        )
        .otherwise(0)
        .alias("is_new_run"),
    )
    agg = chg.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("sgn").cast("long").alias("n_above"),
        (F.count("*") - F.sum("sgn")).cast("long").alias("n_below"),
        F.sum("is_new_run").cast("long").alias("runs"),
    )
    dbig = "CAST(runs * n - (n + 2 * n_above * n_below) AS DECIMAL(38,0))"
    return agg.select(
        "event_type",
        "n",
        "n_above",
        "n_below",
        "runs",
        F.expr(
            "CAST(1000000 + (2 * n_above * n_below * 1000000) div n AS BIGINT)"
        ).alias("expected_runs_ppm"),
        F.expr(
            f"CAST(({dbig} * (runs * n - (n + 2 * n_above * n_below))"
            " * (n - 1)) * 1000000"
            " div (CAST(2 * n_above * n_below AS DECIMAL(38,0))"
            " * (2 * n_above * n_below - n)) AS BIGINT)"
        ).alias("z2_ppm"),
    )
