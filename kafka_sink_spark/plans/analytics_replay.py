"""Round-8b replay / accuracy / calibration wave.

- ``stream_upsert_twin``  the sink's core semantic — last-write-wins
  upsert with delete-on-null tombstones — executed through the REAL
  streaming shell (file source → 3 ordered micro-batches →
  ``process_micro_batch``'s decode→map→route inside foreachBatch) and
  reduced with ``replay_final_state``; the oracle is the plain SQL
  last-record-per-key readout.  Certifies batch-boundary invariance of
  the pipeline: the routed rows of 3 micro-batches replay to exactly
  the single-batch state (reference at-least-once semantics,
  SimpleEndToEndSimulacronIT upsert/delete rows, SURVEY §2.8).
- ``lineitem_sampled_quantile_error``  estimate-vs-exact harness for
  uniform-sample quantiles: a deterministic md5 bottom-k sample
  (k=1000) estimates p50/p90/p99 of the price distribution against the
  exact nearest-rank quantiles off the value ladder (two-phase bucket
  prefix), signed error in ppm — the "how wrong is a sample sketch"
  certificate beside the Bloom/Count-Min/KMV accuracy rows.
- ``customer_calibration_bins``  train/eval calibration audit: urgency
  rates learned per spend-decile on EVEN customers are scored against
  the observed rates of ODD customers in the same bins — per-bin
  predicted vs observed rate and the signed calibration gap in ppm
  (the reliability-diagram readout of any score used for targeting).

Determinism per the package convention: integers end-to-end, md5-prefix
hashes, sign-split truncating division, bounded grids via
plans/prefix.py.

Reference anchor: the reference connector's observable surface is the
upsert/delete/writetime state machine the twin certifies
(sink/src/it/.../SimpleEndToEndSimulacronIT.java delete + upsert rows);
the analytics rows extend COVERAGE.md's north-star inventory.
"""

from __future__ import annotations

import os
import tempfile
import time as _time

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.plans.stream_twin import finish_stream_twin
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Streaming upsert/delete twin through the real sink pipeline
# --------------------------------------------------------------------------

_UPSERT_RUNS = iter(range(1_000_000))

_UPSERT_ORACLE = """
    WITH recs AS (
      SELECT user_id, event_id, event_type,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS v_us,
             (event_id % 37 = 0) AS tombstone,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events
    )
    SELECT user_id AS user_pk, event_type AS etype, v_us
    FROM recs WHERE rn = 1 AND NOT tombstone
    """


@register("stream_upsert_twin", oracle=_UPSERT_ORACLE)
def stream_upsert_twin(spark, sf_dir):
    """Last-write-wins + delete-on-null through the REAL streaming sink
    shell: events become Kafka-shaped records (offset = event_id, key =
    user_id; every 37th record is a null-value tombstone), staged as
    THREE ordered files replayed as separate micro-batches
    (``maxFilesPerTrigger=1``, increasing mtimes).  Each micro-batch
    runs the full decode→map→route pipeline (``process_micro_batch``
    with a capturing writer), and the union of routed batches reduces
    with ``replay_final_state`` — per key the highest-offset write wins
    and a winning DELETE erases the row.  The oracle is the plain SQL
    last-record-per-key readout, so ANY batch-boundary leakage (a
    tombstone lost between batches, an upsert applied out of order)
    diverges the value hash.

    Scale shape: the pipeline stages are stateless projections per
    micro-batch; the replay is one partial-combined max_by per key —
    the same shapes certified by sink_upsert_replay, now under the
    streaming shell.
    """
    from kafka_sink_spark.config import ColumnSpec, SinkConfig, TableConfig, TableSchema
    from kafka_sink_spark.mapping.parser import parse_mapping
    from kafka_sink_spark.operators.writes import replay_final_state
    from kafka_sink_spark.streaming.pipeline import SinkMetrics, start_sink_stream
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    events = load_tables(spark, sf_dir, ("events",))["events"]
    records = events.select(
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.when(F.col("event_id") % 37 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.to_json(
                F.struct(
                    F.col("event_type"),
                    F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias(
                        "v_us"
                    ),
                )
            )
        )
        .alias("value"),
    )
    # three offset-range batches with strictly increasing mtimes, staged
    # by ONE partitioned write (a per-batch write loop would re-scan the
    # events projection three times — guide §1.2: fewer passes; the
    # batch-range semantics are unchanged: floor((offset-lo)/span) capped
    # at 2 reproduces [lo+i·span, lo+(i+1)·span) with batch 2 open-ended)
    src = tempfile.mkdtemp(prefix="stream_upsert_src_")
    bounds = records.agg(
        F.min("offset").alias("lo"), F.max("offset").alias("hi")
    ).collect()[0]
    span = max(1, (bounds["hi"] - bounds["lo"] + 1) // 3)
    tmp = tempfile.mkdtemp(prefix="stream_upsert_stage_")
    records.withColumn(
        "b",
        F.least(
            F.lit(2),
            F.expr(f"(offset - {bounds['lo']}) div {span}").cast("int"),
        ),
    ).coalesce(1).write.mode("overwrite").partitionBy("b").parquet(tmp)
    now = _time.time()
    for i in range(3):
        stamp = now + 10 * i
        bdir = os.path.join(tmp, f"b={i}")
        for f in sorted(os.listdir(bdir)):
            if f.endswith(".parquet"):
                dst = os.path.join(src, f"b{i}-{f}")
                os.replace(os.path.join(bdir, f), dst)
                os.utime(dst, (stamp, stamp))

    schema = TableSchema(
        "ks",
        "user_last",
        [
            ColumnSpec("user_pk", "bigint", primary_key=True),
            ColumnSpec("etype", "string"),
            ColumnSpec("v_us", "bigint"),
        ],
    )
    table = TableConfig(
        "events", "ks", "user_last", parse_mapping("user_pk=key, etype=value.event_type, v_us=value.v_us")
    )
    cfg = SinkConfig(tables=[table])
    vs = {
        "events": StructType(
            [
                StructField("event_type", StringType()),
                StructField("v_us", LongType()),
            ]
        )
    }
    captured: list = []

    def writer(routed, tbl, sch):
        captured.append(routed.localCheckpoint(eager=True))
        return {"rows": captured[-1].count()}

    stream = spark.readStream.schema(
        "topic string, partition int, offset long, timestamp timestamp,"
        " key string, value string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    ck = tempfile.mkdtemp(prefix="stream_upsert_ck_")
    name = f"stream_upsert_twin_{next(_UPSERT_RUNS)}"
    q = start_sink_stream(
        spark,
        stream,
        cfg,
        {("ks", "user_last"): schema},
        ck,
        writer,
        value_schemas=vs,
        metrics=SinkMetrics(),
        trigger_once=True,
    )
    import functools
    import shutil

    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_upsert_twin did not finish in 300s")
        assert len(captured) == 3, f"expected 3 micro-batches, got {len(captured)}"
        routed_all = functools.reduce(lambda a, b: a.unionByName(b), captured)
        out = replay_final_state(routed_all, schema).select(
            "user_pk", "etype", "v_us"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Sampled-quantile accuracy harness
# --------------------------------------------------------------------------

_SQ_K = 1000
_SQ_PS = (50, 90, 99)


def _sq_oracle() -> str:
    ps = ", ".join(f"({p})" for p in _SQ_PS)
    return f"""
    WITH v AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c,
             ('0x' || substr(md5(concat('sq:', CAST(l_orderkey AS STRING),
                ':', CAST(l_linenumber AS STRING))), 1, 15))::BIGINT AS h
      FROM lineitem
    ), n AS (SELECT COUNT(*) AS n FROM v),
    samp AS (
      SELECT c, row_number() OVER (ORDER BY h, c) AS hrk
      FROM v QUALIFY hrk <= {_SQ_K}
    ), srank AS (
      SELECT c, row_number() OVER (ORDER BY c, hrk) AS rk FROM samp
    ), lad AS (
      SELECT c, COUNT(*) AS t FROM v GROUP BY c
    ), cum AS (
      SELECT c, t, COALESCE(SUM(t) OVER (ORDER BY c
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM lad
    ), targets AS (
      SELECT p.p, ((p.p * (n.n - 1)) // 100) + 1 AS r,
             ((p.p * ({_SQ_K} - 1)) // 100) + 1 AS sr
      FROM (VALUES {ps}) AS p(p), n
    )
    SELECT t.p,
           MAX(CASE WHEN cum.below < t.r AND t.r <= cum.below + cum.t
               THEN cum.c END) AS exact_cents,
           MAX(sr2.c) AS sample_cents,
           CAST(CASE WHEN MAX(sr2.c) >= MAX(CASE WHEN cum.below < t.r
                          AND t.r <= cum.below + cum.t THEN cum.c END)
                THEN ((MAX(sr2.c) - MAX(CASE WHEN cum.below < t.r
                        AND t.r <= cum.below + cum.t THEN cum.c END))
                      * 1000000)
                     // MAX(CASE WHEN cum.below < t.r
                            AND t.r <= cum.below + cum.t THEN cum.c END)
                ELSE -(((MAX(CASE WHEN cum.below < t.r
                          AND t.r <= cum.below + cum.t THEN cum.c END)
                         - MAX(sr2.c)) * 1000000)
                       // MAX(CASE WHEN cum.below < t.r
                              AND t.r <= cum.below + cum.t THEN cum.c END))
           END AS BIGINT) AS err_signed_ppm
    FROM targets t
    JOIN cum ON cum.below < t.r AND t.r <= cum.below + cum.t
    JOIN srank sr2 ON sr2.rk = t.sr
    GROUP BY t.p
    """


@register("lineitem_sampled_quantile_error", oracle=_sq_oracle())
def lineitem_sampled_quantile_error(spark, sf_dir):
    """Uniform-sample quantile accuracy: a deterministic md5 bottom-k
    sample (k={k} — the keys with the {k} smallest 60-bit hashes, i.e.
    a uniform without-replacement sample reproducible in both engines)
    estimates p50/p90/p99 of the price-cents distribution; the exact
    nearest-rank quantiles come off the value ladder via the two-phase
    bucket prefix.  Signed estimate error in ppm — the sample-sketch
    accuracy certificate beside the Bloom FPR / Count-Min / KMV rows
    (how far a {k}-row sample drifts from the truth the full data
    defines).

    Scale shape: the sample is a TakeOrderedAndProject bottom-k by
    hash (per-partition top-k + k-row merge); sample ranks are a
    window over the {k} surviving rows; the exact side is the ladder +
    bounded $10-bucket grid prefix; the final readout is a 3-row
    targets join.
    """
    from kafka_sink_spark.plans.prefix import ladder_with_below

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    v = li.select(
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias("c"),
        F.expr(
            "CAST(conv(substr(md5(concat('sq:', CAST(l_orderkey AS STRING),"
            " ':', CAST(l_linenumber AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    # the hashed projection feeds THREE consumers (total count, bottom-k
    # sample, exact ladder): persist so lineitem is scanned and md5-hashed
    # once, not three times (guide §5)
    from pyspark import StorageLevel

    v = v.persist(StorageLevel.MEMORY_AND_DISK)
    n = v.agg(F.count("*").cast("long").alias("n"))
    samp = v.orderBy("h", "c").limit(_SQ_K)
    from pyspark.sql import Window

    hrk_w = Window.orderBy("h", "c")
    srank = (
        samp.select("c", F.row_number().over(hrk_w).alias("hrk"))
        .select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").asc(), F.col("hrk").asc()))
            .alias("rk"),
        )
    )
    ladder = ladder_with_below(v.select("c"), "c", bucket_size=1_000)
    targets = (
        spark.range(1)
        .select(
            F.explode(F.array(*[F.lit(p) for p in _SQ_PS])).alias("p")
        )
        .crossJoin(F.broadcast(n))
        .select(
            "p",
            F.expr("((p * (n - 1)) div 100) + 1").alias("r"),
            F.expr(f"((p * ({_SQ_K} - 1)) div 100) + 1").alias("sr"),
        )
    )
    exact = targets.join(
        ladder,
        (F.col("below") < F.col("r"))
        & (F.col("r") <= F.col("below") + F.col("t")),
    ).select("p", "sr", F.col("c").alias("exact_cents"))
    est = exact.join(
        F.broadcast(srank), F.col("sr") == F.col("rk")
    ).select(
        "p",
        "exact_cents",
        F.col("c").alias("sample_cents"),
    )
    return est.select(
        F.col("p").cast("int").alias("p"),
        "exact_cents",
        "sample_cents",
        F.expr(
            "CAST(CASE WHEN sample_cents >= exact_cents"
            " THEN ((sample_cents - exact_cents) * 1000000) div exact_cents"
            " ELSE -(((exact_cents - sample_cents) * 1000000) div exact_cents)"
            " END AS BIGINT)"
        ).alias("err_signed_ppm"),
    )


lineitem_sampled_quantile_error.__doc__ = (
    lineitem_sampled_quantile_error.__doc__.format(k=_SQ_K)
)


# --------------------------------------------------------------------------
# Train/eval calibration bins
# --------------------------------------------------------------------------

_CAL_BINS = 10

_CAL_ORACLE = f"""
    WITH spend AS (
      SELECT o_custkey AS ck,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS sp,
             MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS resp
      FROM orders GROUP BY o_custkey
    ), train AS (SELECT * FROM spend WHERE ck % 2 = 0),
    eval_ AS (SELECT * FROM spend WHERE ck % 2 = 1),
    tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM train),
    tr AS (
      SELECT ck, sp, resp,
             row_number() OVER (ORDER BY sp DESC, ck) AS rk
      FROM train
    ), tbin AS (
      SELECT resp, sp, ((rk - 1) * {_CAL_BINS}) // tn.n AS bin FROM tr, tn
    ), cuts AS (
      SELECT bin, MIN(sp) AS lo FROM tbin GROUP BY bin
    ), pred AS (
      SELECT bin, CAST(SUM(resp) * 1000000 // COUNT(*) AS BIGINT)
               AS predicted_ppm
      FROM tbin GROUP BY bin
    ), ebin AS (
      SELECT e.resp,
             COALESCE((SELECT MAX(c.bin) FROM cuts c WHERE c.lo > e.sp),
                      -1) + 1 AS bin
      FROM eval_ e
    ), obs AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(resp) * 1000000 // COUNT(*) AS BIGINT) AS observed_ppm
      FROM ebin GROUP BY bin
    )
    SELECT pred.bin, pred.predicted_ppm,
           COALESCE(obs.n_eval, 0) AS n_eval,
           COALESCE(obs.observed_ppm, 0) AS observed_ppm,
           CAST(COALESCE(obs.observed_ppm, 0) - pred.predicted_ppm AS BIGINT)
             AS gap_signed_ppm
    FROM pred LEFT JOIN obs ON obs.bin = pred.bin
    """


@register("customer_calibration_bins", oracle=_CAL_ORACLE)
def customer_calibration_bins(spark, sf_dir):
    """Train/eval calibration audit of the spend→urgency score: urgency
    rates learned per spend-decile on EVEN customers (the training
    half) are compared against the observed rates of ODD customers
    falling in the same spend bins — the reliability-diagram readout
    (predicted vs observed rate per bin, signed gap in ppm) that
    certifies a targeting score generalizes across the split.

    Bin boundaries are the train deciles' minimum spends; an eval
    customer lands in the lowest bin whose cut exceeds its spend plus
    one (i.e. binning by comparison against 9 broadcast cuts).  Decile
    ranks on the train half reuse the catalog's bucket-prefix decile
    shape via one global row_number over the train ladder — expressed
    here with the same two-phase pattern as customer_decile_lift.

    Scale shape: per-customer spend partial-combines once; train decile
    ranks ride the $10k bucket-prefix grid; the cuts/pred tables are
    {b} rows broadcast against the eval half; readout is a {b}-row
    join.
    """
    from kafka_sink_spark.plans.prefix import with_exclusive_prefix

    od = load_tables(spark, sf_dir, ("orders",))["orders"]
    spend = od.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).alias("sp"),
        F.max(
            F.expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END")
        ).alias("resp"),
    )
    train = spend.where(F.col("ck") % 2 == 0)
    evalh = spend.where(F.col("ck") % 2 == 1)
    tn = train.agg(F.count("*").cast("long").alias("n"))
    # global spend-desc rank on the train half via the two-phase prefix:
    # count of customers with strictly higher spend (ties broken by ck)
    lad = train.groupBy("sp").agg(F.count("*").alias("t"))
    above = with_exclusive_prefix(
        lad, "sp", {"above": "t"}, bucket_size=1_000_000, descending=True
    )
    from pyspark.sql import Window

    in_bucket_w = Window.partitionBy("sp").orderBy("ck")
    ranked = (
        train.join(F.broadcast(above.select("sp", "above")), "sp")
        .select(
            "resp",
            "sp",
            (F.col("above") + F.row_number().over(in_bucket_w)).alias("rk"),
        )
    )
    tbin = ranked.crossJoin(F.broadcast(tn)).select(
        "resp", "sp", F.expr(f"((rk - 1) * {_CAL_BINS}) div n").alias("bin")
    )
    cuts = tbin.groupBy("bin").agg(F.min("sp").alias("lo"))
    pred = tbin.groupBy("bin").agg(
        F.expr("CAST(SUM(resp) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "predicted_ppm"
        )
    )
    # eval binning: number of cuts strictly above the customer's spend
    ebin = (
        evalh.crossJoin(F.broadcast(cuts))
        .groupBy("ck", "resp")
        .agg(
            F.max(F.when(F.col("lo") > F.col("sp"), F.col("bin"))).alias(
                "max_above"
            )
        )
        .select(
            "resp",
            (F.coalesce(F.col("max_above"), F.lit(-1)) + 1).alias("bin"),
        )
    )
    obs = ebin.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.expr("CAST(SUM(resp) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "observed_ppm"
        ),
    )
    return (
        pred.join(obs, "bin", "left")
        .select(
            F.col("bin").cast("long").alias("bin"),
            "predicted_ppm",
            F.coalesce("n_eval", F.lit(0)).cast("long").alias("n_eval"),
            F.coalesce("observed_ppm", F.lit(0)).cast("long").alias(
                "observed_ppm"
            ),
            (
                F.coalesce("observed_ppm", F.lit(0)) - F.col("predicted_ppm")
            )
            .cast("long")
            .alias("gap_signed_ppm"),
        )
    )


customer_calibration_bins.__doc__ = customer_calibration_bins.__doc__.format(
    b=_CAL_BINS
)
