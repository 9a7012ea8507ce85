"""Round-7l addendum: late-data semantics certification.

``stream_late_data_twin`` is the missing piece of SURVEY §2.8's
streaming story: every other availableNow twin certifies WHAT a
streaming aggregation computes; this one certifies what it REFUSES to
compute — that rows arriving behind the watermark are dropped, and that
append mode emits each finalized window exactly once.

Spark's real contract (verified empirically on this build, and the
reason this twin exists): the watermark is an EVICTION threshold, not a
row filter — a late row whose window state is still live is absorbed;
the drop is only guaranteed once the watermark that closed the window
was established in an EARLIER micro-batch.  The replay is therefore
three batches, engineered to be bit-deterministic:
- batch 1: the ON-TIME file (first 20 days) — establishes the
  watermark at max(on-time ts) − 36 h ≈ day 18.5;
- batch 2: days 20-24 — processing it finalizes/evicts every window
  behind the batch-1 watermark (days 0-17 emitted exactly once);
- batch 3: days 25-30 PLUS re-keyed late duplicates of the first 10
  days — their windows are evicted AND the watermark that closed them
  predates this batch, so Spark MUST drop them (leakage would either
  double a count or re-emit an evicted window — both break the hash);
- ``maxFilesPerTrigger=1`` + ordered file mtimes force the batch order,
  and the 36-HOUR delay keeps the watermark off every daily window
  boundary so the ≤/< edge of the eviction rule can never matter.
The final append output covers exactly the windows whose end precedes
the final watermark, with on-time counts only.

The DuckDB oracle replays the same rules arithmetically: it computes
the two watermarks from MIN/MAX timestamps and emits the daily rollup
of the on-time rows for every window that finalized — if Spark leaked
ONE late duplicate into a closed window, or re-emitted a window, the
value hash diverges.

Reference anchor: the reference connector is at-least-once with offset
rewind (DseSinkTask flush/offset semantics, SURVEY §2.8); event-time
lateness is the Structured-Streaming-native face of the same
"what happens to stragglers" contract.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.plans.stream_twin import finish_stream_twin
from kafka_sink_spark.session import load_tables

_LATE_RUNS = itertools.count()

_ONTIME_DAYS = 20  # batch 1: day index < 20
_MID_DAYS = 25  # batch 2: 20 <= day index < 25 (advances + evicts)
_LATE_DAYS = 10  # duplicates of day index < 10 ride in batch 3
_WM = "36 hours"  # never lands on a daily window boundary

_LATE_ORACLE = f"""
    WITH base AS (
      SELECT event_id, ts, event_type,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS v_us,
             date_diff('day', (SELECT MIN(CAST(ts AS DATE)) FROM events),
                       CAST(ts AS DATE)) AS didx
      FROM events
    ), wm2 AS (
      -- final watermark: max event time over BOTH files (the late
      -- duplicates are older, so this is the global max) minus 36 h
      SELECT MAX(ts) - INTERVAL 36 HOUR AS wm FROM base
    ), emitted AS (
      -- append mode emits a daily window iff its END precedes the final
      -- watermark; late duplicates were dropped (their windows closed
      -- behind the batch-1 watermark), so finalized windows hold exactly
      -- the on-time rows
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
             COUNT(*) AS n_events, SUM(v_us) AS sum_value_us
      FROM base, wm2
      WHERE CAST(ts AS DATE) + INTERVAL 1 DAY < wm2.wm
      GROUP BY 1, 2
    )
    SELECT day, event_type, CAST(n_events AS BIGINT) AS n_events,
           CAST(sum_value_us AS BIGINT) AS sum_value_us
    FROM emitted
    """


@register("stream_late_data_twin", oracle=_LATE_ORACLE)
def stream_late_data_twin(spark, sf_dir):
    """Watermark/late-data certification: a REAL three-batch
    availableNow replay — batch 1 carries the first {d1} days
    (establishing the watermark), batch 2 carries days {d1}-{d2m}
    (processing it finalizes and EVICTS every window behind that
    watermark), and batch 3 carries the remaining days PLUS re-keyed
    duplicates of the first {d2} days.  With a {wm} watermark and a
    daily tumbling count in APPEND mode, Spark must (a) DROP every
    late duplicate — their windows were evicted by a watermark set in
    an EARLIER batch, the exact condition under which Structured
    Streaming guarantees the drop (verified empirically: a late row
    into still-live state is absorbed, which is why the replay needs
    three batches, not two) — and (b) emit each finalized window
    exactly once, withholding windows the final watermark has not
    passed.  The oracle reconstructs that contract arithmetically from
    MIN/MAX timestamps; one leaked late row or double emission breaks
    the value hash.  This is the drop-side companion to the 12
    compute-side twins.

    Scale shape: streaming state is the watermark-bounded set of open
    daily windows per type (constant in stream length); the replay's
    file ordering is metadata, not data movement; the final compare is
    grid-sized.
    """
    import os
    import tempfile
    import time as _time

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    base = ev.select(
        "event_id",
        "ts",
        "event_type",
        F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("v_us"),
    )
    d0 = base.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    b = base.crossJoin(F.broadcast(d0)).withColumn(
        "didx", F.datediff(F.col("ts").cast("date"), F.col("d0"))
    )
    # The three batch frames (on-time / mid / tail+re-keyed late dups)
    # are staged by ONE partitioned write instead of three write jobs
    # that would each re-scan events (guide §1.2: fewer passes).  Rows
    # with didx < _LATE_DAYS appear TWICE — on time in batch 1 and
    # re-keyed (+1e9) in batch 3 — via an exploded per-row batch list;
    # every other row carries exactly its pipeline-order batch tag.
    dup_pair = F.array(
        F.struct(F.lit(1).alias("bt"), F.col("event_id").alias("eid")),
        F.struct(
            F.lit(3).alias("bt"),
            (F.col("event_id") + F.lit(1_000_000_000)).alias("eid"),
        ),
    )
    single = F.array(
        F.struct(
            F.when(F.col("didx") < _ONTIME_DAYS, F.lit(1))
            .when(F.col("didx") < _MID_DAYS, F.lit(2))
            .otherwise(F.lit(3))
            .alias("bt"),
            F.col("event_id").alias("eid"),
        )
    )
    tagged = b.select(
        "ts",
        "event_type",
        "v_us",
        F.explode(
            F.when(F.col("didx") < _LATE_DAYS, dup_pair).otherwise(single)
        ).alias("be"),
    ).select(
        F.col("be.eid").alias("event_id"),
        "ts",
        "event_type",
        "v_us",
        F.col("be.bt").alias("bt"),
    )
    src = tempfile.mkdtemp(prefix="stream_late_src_")
    stage = tempfile.mkdtemp(prefix="stream_late_stage_")
    tagged.coalesce(1).write.mode("overwrite").partitionBy("bt").parquet(
        stage
    )
    # strictly increasing mtimes so FileStreamSource orders the three
    # micro-batches deterministically
    now = _time.time()
    tmp_dirs = [stage]
    for i in (1, 2, 3):
        stamp = now + 10 * (i - 1)
        bdir = os.path.join(stage, f"bt={i}")
        moved = 0
        for f in sorted(os.listdir(bdir)):
            if f.endswith(".parquet"):
                dst = os.path.join(src, f"b{i}-{f}")
                os.replace(os.path.join(bdir, f), dst)
                os.utime(dst, (stamp, stamp))
                moved += 1
        assert moved == 1, f"batch b{i} must be a single file"
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, v_us long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    name = f"stream_late_twin_{next(_LATE_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_late_ck_")
    q = (
        stream.withWatermark("ts", _WM)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_us").cast("bigint").alias("sum_value_us"),
        )
        .select(
            F.col("w.start").cast("date").cast("string").alias("day"),
            "event_type",
            "n_events",
            "sum_value_us",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    result = spark.table(name).select(
        "day",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value_us",
    )
    return finish_stream_twin(spark, q, name, result, (src, *tmp_dirs, ck))


stream_late_data_twin.__doc__ = stream_late_data_twin.__doc__.format(
    d1=_ONTIME_DAYS, d2=_LATE_DAYS, d2m=_MID_DAYS, wm=_WM
)
