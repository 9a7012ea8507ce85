"""Streaming analytics operators: event-time windows, watermarks,
sessionization, and a custom stateful operator.

The reference has NO event-time processing (SURVEY §2.8 — its record timestamp
is only a writetime), so this module is north-star surface: the streaming
twins of the batch catalog queries, built on the Structured Streaming
primitives a 100 TB pipeline uses:

- tumbling windows + watermark  → ``F.window`` with ``withWatermark`` (late
  data beyond the watermark is dropped; state is bounded).
- session windows               → ``F.session_window`` (gap-based, merging);
  the batch twin is ``events_sessionize`` (lag + conditional sum) and the two
  agree on complete data.
- custom stateful operators     → ``applyInPandasWithState`` with per-key
  state and processing-time timeouts (the pattern for dedup-within-horizon,
  running profiles, CDC-style accumulators).

Every operator takes/returns DataFrames and works identically on a streaming
or batch input where Spark allows it, so tests can replay file streams with
``trigger(availableNow=True)`` and diff final state against the batch
catalog oracles.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour rollup with a watermark bounding state.

    Streaming twin of the batch ``events_hourly_rollup`` catalog query: same
    grouping, same integer-ized sum, so the availableNow final output equals
    the batch/oracle result on complete data.
    """
    return (
        events.withWatermark("ts", watermark)
        # Group by the window STRUCT (not window().start) — the struct keeps
        # the event-time column attached so the watermark can close windows
        # and append mode is valid.
        .groupBy(F.window("ts", "1 hour").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("bigint"))
            .cast("bigint")
            .alias("sum_value_millionths"),
        )
        .select(
            F.col("bucket.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value_millionths",
        )
    )


def sliding_rollup_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """SLIDING-window rollup (1-hour window every 15 minutes): each event
    contributes to window/slide = 4 overlapping buckets — the dashboard
    smoothing shape tumbling windows can't express. Same watermark-bounded
    state and integer-ized sum as hourly_rollup_stream; streaming state
    holds ~(watermark + window)/slide open windows per key, so it stays
    bounded regardless of stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("bigint"))
            .cast("bigint")
            .alias("sum_value_millionths"),
        )
        .select(
            F.col("bucket.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value_millionths",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessionization via ``session_window`` — Spark merges
    overlapping gap windows per key, which on complete data yields exactly
    the batch lag-based session count (``events_sessionize``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("session"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            F.col("n_events"),
        )
    )


# --- custom stateful operator: per-user running profile --------------------

RUNNING_PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("last_event_id", LongType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, last_id BIGINT"


def _profile_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user event count + latest event id, surviving across
    micro-batches in the state store. The shape of any custom accumulator
    (rate limiter, dedup-within-horizon, running quality profile)."""
    (user_id,) = key
    n, last_id = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_id = max(last_id, int(pdf["event_id"].max()))
    state.update((n, last_id))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events_total": [n], "last_event_id": [last_id]}
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: emits the
    per-user running totals each micro-batch. State is one tuple per user —
    bounded by key cardinality; Arrow batches keep the Python hop vectorized.
    """
    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _profile_fn,
            outputStructType=RUNNING_PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- stateful bounded-horizon EWMA -----------------------------------------

_EWMA_H = 16  # current event + up to 15 predecessors; weight of lag j: 2^(15-j)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("n_window", IntegerType()),
        StructField("ewma", DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [StructField("vals", ArrayType(LongType()))]
)


def _ewma_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user bounded-horizon dyadic EWMA: state is the last ≤15
    fixed-point values (most recent last), so state is FIXED-WIDTH per key
    regardless of stream length, and the arithmetic is exact Python ints —
    emissions reproduce the batch ``events_ewma`` rows bit-for-bit (Python
    ``//`` ≡ Spark ``div`` for the non-negative numerator)."""
    import math

    (user_id,) = key
    prev = list(state.get[0]) if state.exists else []
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        if prev:
            state.update((prev,))
        return
    pdf = pd.concat(frames, ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    out = {"event_id": [], "user_id": [], "value": [], "n_window": [], "ewma": []}
    h = _EWMA_H
    for r in pdf.itertuples(index=False):
        vm = math.floor(float(r.value) * 1_000_000.0)
        num = vm * (1 << (h - 1))
        den = 1 << (h - 1)
        nwin = 1
        for j, pv in enumerate(reversed(prev), start=1):  # j=1: most recent
            w = 1 << (h - 1 - j)
            num += int(pv) * w
            den += w
            nwin += 1
        out["event_id"].append(int(r.event_id))
        out["user_id"].append(int(user_id))
        out["value"].append(float(r.value))
        out["n_window"].append(nwin)
        out["ewma"].append((num // den) / 1e6)
        prev.append(vm)
        if len(prev) > h - 1:
            prev.pop(0)
    state.update((prev,))
    yield pd.DataFrame(out)


def running_ewma(events: DataFrame) -> DataFrame:
    """The STREAMING form of the batch ``events_ewma`` catalog query: a
    custom stateful operator (``applyInPandasWithState``) holding each
    user's last ≤15 fixed-point values. Emissions are one row per event and
    — because the arithmetic is the same exact-integer formula — equal the
    batch query's rows exactly on time-ordered input (replay batches must
    not interleave out of time order across micro-batch boundaries; within
    a batch the function sorts). State: one ≤15-long array per user."""
    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_fn,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- stream-stream interval join -------------------------------------------


def interval_join_stream(
    anchors: DataFrame,
    probes: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: every anchor row pairs with
    the probe rows of the same user in ``[anchor.ts - lookback, anchor.ts]``.

    Both sides carry watermarks and the join predicate bounds event time on
    BOTH sides, so Spark can evict buffered state once the watermark passes
    the interval — state is O(rows inside the lookback horizon), not O(stream).
    On complete data the result equals the identical batch join (the test
    diffs them). At 100 TB the equi-key (user_id) drives the shuffle; the
    time bound only prunes state, exactly like the batch range predicate.
    """
    a = anchors.withWatermark("ts", watermark).select(
        F.col("user_id").alias("a_user_id"),
        F.col("event_id").alias("anchor_id"),
        F.col("ts").alias("a_ts"),
    )
    p = probes.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("probe_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = a.join(
        p,
        F.expr(
            f"a_user_id = p_user_id AND "
            f"p_ts BETWEEN a_ts - INTERVAL {lookback} AND a_ts"
        ),
        "inner",
    )
    return joined.select(
        F.col("a_user_id").alias("user_id"),
        "anchor_id",
        "probe_id",
        (F.unix_micros(F.col("a_ts")) - F.unix_micros(F.col("p_ts"))).alias("gap_us"),
    )


# --- streaming exact dedup --------------------------------------------------


def dedup_stream(records: DataFrame, keys: list, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication on ``keys`` with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's fingerprint only until
    the watermark passes it — duplicates inside the horizon are dropped, and
    state does not grow with the stream (the at-least-once sink's replayed
    records are exactly such within-horizon duplicates).
    """
    return records.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_rollup_stream(
    events: DataFrame, customers: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """STREAM-STATIC enrichment join + segment rollup: each micro-batch of
    events joins the static customer dimension on user_id = c_custkey,
    then rolls up per (market segment, event type) — the canonical
    Structured Streaming enrichment pattern (the static side is
    re-resolvable per micro-batch, needs no watermark, and adds no
    streaming state; aggregation state is the tiny segment×type keyspace).
    The dimension grows with SF (customers), so the join carries NO
    broadcast hint (r13 audit; r6 constant-size rule): Spark still
    auto-broadcasts it below autoBroadcastJoinThreshold and degrades to a
    shuffle join when the dimension outgrows executor memory.

    Integer-ized sum per the package convention so the availableNow final
    output hash-equals the batch/oracle result on complete data.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    return (
        events.withWatermark("ts", watermark)
        .join(dim, "user_id")
        .groupBy("mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias(
                "sum_value_millionths"
            ),
        )
    )


def countmin_stream(events: DataFrame, d: int = 3, w: int = 64) -> DataFrame:
    """Mergeable Count-Min counter table over a stream of keyed events.

    Each event increments one bucket per hash row (d rows × w counters,
    md5-derived — the same bucket expression as the batch
    ``events_countmin_accuracy`` harness), so the counter table is a plain
    streaming aggregation: associative, mergeable across micro-batches and
    partitions, with state bounded at d·w rows REGARDLESS of key
    cardinality or stream length — the defining property that makes
    sketches the right streaming state.  In update mode each micro-batch
    emits the touched counters; counts are monotone, so the final value
    per counter is the max emission (what the availableNow twin reduces
    with).
    """
    return (
        events.select(
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i"),
            F.col("user_id"),
        )
        .select(
            "i",
            F.expr(
                f"CAST(conv(substr(md5(concat('cm', CAST(i AS STRING), ':', "
                f"CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % {w}"
            ).alias("bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hll_register_stream(events: DataFrame) -> DataFrame:
    """Mergeable HyperLogLog register table over a stream of keyed events.

    Each event hashes its user_id with the SAME md5 expressions as the
    batch ``events_hll_estimate`` harness (top 6 bits → register index,
    leading-zero rank of the low 54 bits via ``bin()`` length) and the
    register keeps the running MAX rank — a plain streaming max
    aggregation: associative, idempotent (replays are free), mergeable
    across micro-batches and partitions, with state bounded at
    |types| × 64 rows regardless of key cardinality or stream length.
    In update mode each micro-batch emits the touched registers; ranks
    are monotone, so the final value per register is the max emission
    (what the availableNow twin reduces with).  Read-out (harmonic sum →
    estimate) stays a batch projection over the final register table.
    """
    return (
        events.select(
            "event_type",
            F.expr(
                "CAST(conv(substr(md5(concat('hll:', CAST(user_id AS STRING))),"
                " 1, 15), 16, 10) AS BIGINT)"
            ).alias("hv"),
        )
        .select(
            "event_type",
            F.expr("hv div shiftleft(CAST(1 AS BIGINT), 54)").alias("idx"),
            F.expr(
                "CASE WHEN hv % shiftleft(CAST(1 AS BIGINT), 54) = 0 THEN 55"
                " ELSE 55 - length(bin(hv % shiftleft(CAST(1 AS BIGINT), 54))) END"
            ).alias("rho"),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("reg"))
    )


# --- stateful sequential probability ratio test -----------------------------

SPRT_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("k", LongType()),
        StructField("llr_final_ppm", LongType()),
        StructField("decision_t", LongType()),
        StructField("decision", LongType()),
    ]
)

_SPRT_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("k", LongType()),
        StructField("decision_t", LongType()),
        StructField("decision", LongType()),
    ]
)


def _sprt_fn_factory(threshold: float, a_ppm: int, b_ppm: int, bound_ppm: int):
    """Build the per-key SPRT fold.  State is FOUR integers per key —
    the sequential test is just a cumulative success count because the
    Bernoulli LLR has constant per-observation increments, so the
    streaming form carries no window at all (contrast the EWMA twin's
    bounded value array)."""

    def _fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        t, k, decision_t, decision = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            if state.exists:
                state.update((t, k, decision_t, decision))
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        for r in pdf.itertuples(index=False):
            t += 1
            if float(r.value) > threshold:
                k += 1
            llr = k * a_ppm + (t - k) * b_ppm
            if decision_t == 0:
                if llr >= bound_ppm:
                    decision_t, decision = t, 1
                elif llr <= -bound_ppm:
                    decision_t, decision = t, -1
        state.update((t, k, decision_t, decision))
        llr = k * a_ppm + (t - k) * b_ppm
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n": [t],
                "k": [k],
                "llr_final_ppm": [llr],
                "decision_t": [decision_t],
                "decision": [decision],
            }
        )

    return _fn


def running_sprt(
    events: DataFrame,
    threshold: float,
    a_ppm: int,
    b_ppm: int,
    bound_ppm: int,
) -> DataFrame:
    """The STREAMING form of the batch ``events_sprt`` catalog query
    (Wald 1945): per event type, a four-integer state tuple
    (t, k, first-crossing, decision) updated per micro-batch — the
    experiment stops ITSELF the moment the boundary is crossed, which is
    the whole point of running SPRT on a stream instead of a batch
    horizon.  Emissions are the running decision row per type (update
    mode); on complete data the final emission equals the batch query
    bit-for-bit because both fold the identical integer LLR in
    (ts, event_id) order."""
    return (
        events.select("event_type", "event_id", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _sprt_fn_factory(threshold, a_ppm, b_ppm, bound_ppm),
            outputStructType=SPRT_OUTPUT_SCHEMA,
            stateStructType=_SPRT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
