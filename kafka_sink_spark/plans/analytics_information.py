"""Round-9b information/streaming wave.

- ``stream_topk_twin``  exact streaming heavy hitters: per-user event
  counts maintained by a real Structured Streaming availableNow replay
  (update-mode aggregation — counts are monotone, so the per-key MAX of
  the emitted updates is the final count), read out as the global
  top-10.  The exact-top-k twin the sketch twins (count-min / HLL)
  bracket from the approximate side.
- ``events_info_gain_by_hour``  mutual information I(type; hour-of-day)
  in octave-ppm-bits — the feature-usefulness probe of the canonical
  "does the hour predict the event type" question, reported per type
  (each type's additive MI contribution) plus the '*' total row.
- ``docs_sentence_dispersion``  per-source sentence-length profile:
  sentence count, token mass, mean length and the variance/mean
  dispersion index (the burstiness signal behind "template text has
  metronome sentences, prose doesn't"), exact via cross-multiplication.

Determinism per the package convention: counts-only log arguments
(octave-log2 ppm-bits, the KL/entropy discipline), per-term truncating
division with sign-splits, cross-multiplied moments (no sqrt), ties on
ids; the streaming twin's top-10 rank rides an ``orderBy().limit()``
spine.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's streaming/quality families.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.analytics_readability import (
    _DUCK_LOG2,
    _SPARK_LOG2,
    duck_ratio_pt,
    spark_ratio_pt,
)
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.plans.stream_twin import finish_stream_twin
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Streaming exact top-k (heavy hitters twin)
# --------------------------------------------------------------------------

_TOPK = 10
_STREAM_TOPK_RUNS = iter(range(1_000_000))

_STREAM_TOPK_ORACLE = f"""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ), r AS (
      SELECT user_id, n_events,
             CAST(row_number() OVER (
               ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rank
      FROM c
    )
    SELECT user_id, n_events, rank FROM r WHERE rank <= {_TOPK}
    """


@register("stream_topk_twin", oracle=_STREAM_TOPK_ORACLE)
def stream_topk_twin(spark, sf_dir):
    """Exact streaming heavy hitters, certified by executing the real
    streaming query: the events table replays through a file stream with
    ``trigger(availableNow=True)``, an update-mode per-user COUNT(*)
    emits monotone counts per micro-batch, and the final per-user MAX of
    the emissions must reproduce the batch counts exactly — read out as
    the global top-10 (ties to the lower user id).

    Scale shape: streaming state is one row per distinct user (the
    canonical keyed-aggregation state bound); the top-10 readout is a
    TakeOrderedAndProject over the memory-sink table plus a sanctioned
    10-row limit-spine rank — never a global sort.
    """
    import tempfile

    events = load_tables(spark, sf_dir, ("events",))["events"]
    src = tempfile.mkdtemp(prefix="stream_topk_src_")
    events.select("user_id").write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id long").parquet(src)
    name = f"stream_topk_twin_{next(_STREAM_TOPK_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_topk_ck_")
    q = (
        stream.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").cast("long").alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(_TOPK)
    )
    rk = Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    result = final.select(
        "user_id", "n_events", F.row_number().over(rk).cast("long").alias("rank")
    )
    return finish_stream_twin(spark, q, name, result, (src, ck))


# --------------------------------------------------------------------------
# Mutual information of event type and hour-of-day
# --------------------------------------------------------------------------


def _mi_oracle() -> str:
    # Bounded probability-ratio form (r10, analytics_readability.py
    # note): the MI log ratio c·N/(ct·ch) is P(hour|type)/P(hour) —
    # both probabilities render in 1e12 fixed point and the bracket is
    # lg(p_pt) − lg(q_pt): arguments bounded by 1e12 (no count-product
    # int64 cliff at any corpus size) and the octave biases CANCEL when
    # the hour is independent of the type, keeping near-null terms ~0.
    # The outer c·bracket multiply rides HUGEINT/DECIMAL.
    p_pt = duck_ratio_pt("j.c", "j.ct")
    q_pt = duck_ratio_pt("j.ch", "j.nn")
    num = _DUCK_LOG2.format(x=p_pt)
    den = _DUCK_LOG2.format(x=q_pt)
    return f"""
    WITH th AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hour(ts)
    ), tt AS (SELECT event_type, SUM(c) AS ct FROM th GROUP BY event_type),
    ht AS (SELECT hod, SUM(c) AS ch FROM th GROUP BY hod),
    nt AS (SELECT SUM(c) AS nn FROM th),
    j AS (
      SELECT th.event_type, th.c, tt.ct, ht.ch, nt.nn
      FROM th JOIN tt ON tt.event_type = th.event_type
              JOIN ht ON ht.hod = th.hod, nt
    ), terms AS (
      SELECT event_type, ct,
             CASE WHEN (c::HUGEINT * ({num} - {den})) >= 0
                  THEN (c::HUGEINT * ({num} - {den})) // nn
                  ELSE -((-(c::HUGEINT * ({num} - {den}))) // nn)
             END AS t_ppm_bits
      FROM j
    ), per AS (
      SELECT event_type, CAST(MAX(ct) AS BIGINT) AS n_events,
             CAST(SUM(t_ppm_bits) AS BIGINT) AS mi_ppm_bits
      FROM terms GROUP BY event_type
    )
    SELECT event_type, n_events, mi_ppm_bits FROM per
    UNION ALL
    SELECT '*' AS event_type, CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(mi_ppm_bits) AS BIGINT) AS mi_ppm_bits
    FROM per
    """


@register("events_info_gain_by_hour", oracle=_mi_oracle())
def events_info_gain_by_hour(spark, sf_dir):
    """Mutual information between event type and hour-of-day in
    octave-ppm-bits: I = Σ (c/N)·log2(c·N / (c_type·c_hour)), reported
    as each type's additive contribution plus the '*' total — the
    feature-usefulness number behind "should the router condition on the
    clock".  Counts only inside every log, per-term sign-split
    truncation before the order-independent sum (a near-independent
    type can land a few ppm-bits negative; the sign is reported, not
    clamped — the KL-family convention).  The log ratio rides the
    bounded probability-ratio convention (r10,
    analytics_readability.py): lg(P(hour|type)·1e12) − lg(P(hour)·1e12)
    — arguments bounded by 1e12 at any corpus size (the r9
    count-product form capped N at ~4.6e18/c) and the octave biases
    cancel under independence; the outer c·bracket multiply rides
    DECIMAL(38,0)/HUGEINT.

    Scale shape: one partial-combined (type, hour) rollup over events,
    then everything lives on the |types|×24 bounded grid (grid-sized
    broadcasts are the only join inputs).
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    th = events.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hod")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tt = th.groupBy("event_type").agg(F.sum("c").alias("ct"))
    ht = th.groupBy("hod").agg(F.sum("c").alias("ch"))
    nt = th.agg(F.sum("c").alias("nn"))
    # lg(q) depends only on the hour — evaluate it ONCE per hod on the
    # 24-row broadcast grid instead of per (type, hod) row; this also
    # halves the lg expression tree the optimizer has to plan.
    htq = ht.crossJoin(F.broadcast(nt)).select(
        "hod",
        F.expr(spark_ratio_pt("ch", "nn")).alias("q_pt"),
    ).select("hod", F.expr(_SPARK_LOG2.format(x="q_pt")).alias("lgq"))
    j = (
        th.join(F.broadcast(tt), "event_type")
        .join(F.broadcast(htq), "hod")
        .crossJoin(F.broadcast(nt))
    )
    # Bounded probability-ratio form (r10) — see the oracle note: the
    # bracket is lg(P(hour|type)·1e12) − lg(P(hour)·1e12), arguments
    # bounded, biases cancelling under independence; outer multiply in
    # DECIMAL(38,0) so c·bracket never crosses int64 at any corpus size.
    # Stage the fixed-point probabilities, then the bracket, then the
    # signed product — each exactly once per row: the lg template reads
    # its argument 4× and the sign-split CASE reads the product 3×, so
    # inlining would re-evaluate the DECIMAL division up to 24× per term
    # (measured 1.9× on the whole query at sf0.1).
    staged = j.select(
        "event_type",
        "ct",
        "c",
        "nn",
        "lgq",
        F.expr(spark_ratio_pt("c", "ct")).alias("p_pt"),
    ).select(
        "event_type",
        "ct",
        "nn",
        F.expr(
            "CAST(c AS DECIMAL(38,0))"
            f" * (({_SPARK_LOG2.format(x='p_pt')}) - lgq)"
        ).alias("prod"),
    )
    terms = staged.select(
        "event_type",
        "ct",
        F.expr(
            "CASE WHEN prod >= 0 THEN prod div nn"
            " ELSE -((-prod) div nn) END"
        ).alias("t_ppm_bits"),
    )
    per = terms.groupBy("event_type").agg(
        F.max("ct").cast("long").alias("n_events"),
        F.sum("t_ppm_bits").cast("long").alias("mi_ppm_bits"),
    )
    total = per.agg(
        F.lit("*").alias("event_type"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("mi_ppm_bits").cast("long").alias("mi_ppm_bits"),
    )
    return per.unionByName(total)


# --------------------------------------------------------------------------
# Sentence-length dispersion per source
# --------------------------------------------------------------------------

_SENT_ORACLE = r"""
    WITH s AS (
      SELECT source,
             len(list_filter(regexp_split_to_array(sent, '\s+'), x -> x <> ''))
               AS slen
      FROM (
        SELECT source, unnest(regexp_split_to_array(text, '[.!?]+')) AS sent
        FROM documents
      )
      WHERE len(list_filter(regexp_split_to_array(sent, '\s+'), x -> x <> '')) > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(SUM(slen) AS BIGINT) AS n_tokens,
           CAST(SUM(slen) * 1000000 // COUNT(*) AS BIGINT) AS mean_len_ppm,
           CAST((COUNT(*) * SUM(slen * slen) - SUM(slen) * SUM(slen))
                * 1000000 // (COUNT(*) * SUM(slen)) AS BIGINT)
             AS dispersion_ppm
    FROM s GROUP BY source
    """


@register("docs_sentence_dispersion", oracle=_SENT_ORACLE)
def docs_sentence_dispersion(spark, sf_dir):
    """Per-source sentence-length profile: sentences split on [.!?]+ runs,
    lengths in whitespace tokens (empty fragments dropped), with the
    variance-to-mean dispersion index D = Var(len)/Mean(len) in ppm —
    D ≪ mean flags metronome template text, D ≈ mean Poisson-like prose.
    Exact integers via cross-multiplication: D_ppm =
    (n·Σx² − (Σx)²)·1e6 div (n·Σx) — no sqrt, no floats.

    Scale shape: a per-document projection (split + explode, zero
    shuffle), then ONE partial-combined per-source moment rollup; the
    output is |sources| rows.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    s = docs.select(
        "source",
        F.explode(F.split(F.col("text"), r"[.!?]+")).alias("sent"),
    ).select(
        "source",
        F.size(
            F.filter(F.split(F.col("sent"), r"\s+"), lambda x: x != "")
        ).cast("long").alias("slen"),
    ).where(F.col("slen") > 0)
    return s.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.sum("slen").cast("long").alias("n_tokens"),
        F.expr("CAST(SUM(slen) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "mean_len_ppm"
        ),
        F.expr(
            "CAST((COUNT(*) * SUM(slen * slen) - SUM(slen) * SUM(slen))"
            " * 1000000 div (COUNT(*) * SUM(slen)) AS BIGINT)"
        ).alias("dispersion_ppm"),
    )
