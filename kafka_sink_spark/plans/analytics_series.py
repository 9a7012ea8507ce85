"""Round-6d wave: sliding event-time windows, exact exponential smoothing,
embedding-label classification eval, and scale-shaped corpus growth curves.

- ``stream_sliding_rollup_twin``  the SLIDING-window streaming operator
  (window/slide overlap — the one window shape the streaming surface lacked)
  executed on batch input and oracle-paired, like the other stream twins.
- ``events_ewma``  per-user exponentially-weighted moving average with a
  DYADIC decay (α = 1/2): weights are powers of two over a bounded 16-event
  horizon, so the whole smoother is exact integer arithmetic — the
  transcendental-free form of the classic time-series operator.
- ``knn_label_vote``  k-NN majority-vote classification of query vectors
  against their exact fixed-point top-k, scored against the stored label —
  the eval harness for the embeddings' label structure (companion to
  knn_ivf_pq_recall's index-quality eval).
- ``corpus_vocab_growth``  Heaps'-law vocabulary growth: new-types per doc
  and the running vocabulary size, computed with a TWO-PHASE prefix sum
  (within-bucket cumsum + broadcast bucket prefixes) instead of the
  single-partition global window a naive cumulative would plan.

Determinism per the package convention: integers end-to-end; any reported
float is one division of exact integers (micro-units), truncating integer
division before the float division so no round() half-edge exists.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes); this module extends SURVEY.md §2's
extension inventory.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions import similarity, text
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.plans.stream_twin import finish_stream_twin
from kafka_sink_spark.session import load_tables
from kafka_sink_spark.streaming.analytics import sliding_rollup_stream

# --------------------------------------------------------------------------
# Sliding-window rollup, driver-certified via the batch twin
# --------------------------------------------------------------------------

_SLIDE_US = 15 * 60 * 1_000_000  # 15-minute slide
_WINDOW_SLICES = 4  # 1-hour window / 15-minute slide


@register(
    "stream_sliding_rollup_twin",
    oracle=f"""
    WITH e AS (
      SELECT event_type, value,
             (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US} AS floor_us
      FROM events
    ), fan AS (
      SELECT event_type, value, floor_us - k * {_SLIDE_US} AS bucket_start_us
      FROM e, unnest(range({_WINDOW_SLICES})) AS u(k)
    )
    SELECT bucket_start_us, event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_value_millionths
    FROM fan GROUP BY 1, 2
    """,
)
def stream_sliding_rollup_twin(spark, sf_dir):
    """The sliding-window streaming rollup (streaming/analytics.py
    sliding_rollup_stream: 1-hour window, 15-minute slide, watermark),
    executed on batch input and oracle-paired — Spark expands each event
    into its window/slide = 4 overlapping buckets identically in batch and
    streaming, so this row certifies the overlap semantics the tumbling
    twin can't. The oracle replays the expansion arithmetically: the 4
    window starts are floor₁₅ₘ(ts) − k·15 min, k ∈ 0..3.

    Scale shape: one partial-combined aggregation after a bounded 4× row
    fan-out (the Expand node) — linear, no window function, no join;
    streaming state is bounded by (watermark+window)/slide open buckets."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    return sliding_rollup_stream(events).select(
        F.unix_micros(F.col("bucket_start")).alias("bucket_start_us"),
        "event_type",
        "n_events",
        "sum_value_millionths",
    )


# --------------------------------------------------------------------------
# Exact dyadic EWMA over a bounded per-user horizon
# --------------------------------------------------------------------------

_EWMA_H = 16  # horizon: current event + 15 lags; weight of lag j is 2^(15-j)


def _ewma_oracle(h: int = _EWMA_H) -> str:
    lags = ",\n             ".join(
        f"lag(vm, {j}) OVER w AS l{j}" for j in range(1, h)
    )
    num = " + ".join(
        ["vm * %d" % (1 << (h - 1))]
        + [f"COALESCE(l{j} * {1 << (h - 1 - j)}, 0)" for j in range(1, h)]
    )
    den = " + ".join(
        ["%d" % (1 << (h - 1))]
        + [
            f"CASE WHEN l{j} IS NULL THEN 0 ELSE {1 << (h - 1 - j)} END"
            for j in range(1, h)
        ]
    )
    nwin = " + ".join(
        ["1"] + [f"CASE WHEN l{j} IS NULL THEN 0 ELSE 1 END" for j in range(1, h)]
    )
    return f"""
    WITH b AS (
      SELECT event_id, user_id, ts, value,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
      FROM events
    ), l AS (
      SELECT event_id, user_id, value, vm,
             {lags}
      FROM b
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, value,
           CAST({nwin} AS INTEGER) AS n_window,
           CAST(({num}) // ({den}) AS DOUBLE) / 1000000.0 AS ewma
    FROM l
    """


@register("events_ewma", oracle=_ewma_oracle())
def events_ewma(spark, sf_dir):
    """Per-user exponentially-weighted moving average with DYADIC decay —
    α = 1/2 over a bounded {h}-event horizon, so every weight is a power of
    two and the smoother is EXACT integer arithmetic end-to-end: fixed-point
    values × integer weights, renormalized by the weights actually present
    (ramp-up at each user's head), truncating integer division before the
    single float division. No transcendental, no float accumulation order,
    no round() — bit-identical cross-engine, unlike the textbook recursive
    float EWMA which is neither parallelizable nor deterministic.

    Scale shape: ONE user-keyed window materializes the {h}-lag frame (the
    same single exchange any per-user sequence feature needs — shared shape
    with events_markov_transitions); everything after is a pure codegen
    projection. The horizon bounds per-row state, so rows are fixed-width
    regardless of user history length."""
    h = _EWMA_H
    events = load_tables(spark, sf_dir, ("events",))["events"]
    b = events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_cols = [F.lag("vm", j).over(w).alias(f"l{j}") for j in range(1, h)]
    led = b.select("event_id", "user_id", "value", "vm", *lag_cols)
    num = F.col("vm") * F.lit(1 << (h - 1))
    den = F.lit(1 << (h - 1))
    nwin = F.lit(1)
    for j in range(1, h):
        present = F.col(f"l{j}").isNotNull()
        num = num + F.coalesce(F.col(f"l{j}") * F.lit(1 << (h - 1 - j)), F.lit(0))
        den = den + F.when(present, F.lit(1 << (h - 1 - j))).otherwise(F.lit(0))
        nwin = nwin + F.when(present, F.lit(1)).otherwise(F.lit(0))
    return led.select(
        "event_id",
        "user_id",
        "value",
        nwin.cast("int").alias("n_window"),
        num.alias("_num"),
        den.alias("_den"),
    ).select(
        "event_id",
        "user_id",
        "value",
        "n_window",
        (F.expr("_num div _den").cast("double") / 1e6).alias("ewma"),
    )


# --------------------------------------------------------------------------
# EWMA-residual anomaly flags (composed forecaster + exact z-score)
# --------------------------------------------------------------------------


def _ewma_prev_sql(h: int = _EWMA_H) -> tuple:
    """(num, den) SQL expressions for the PREVIOUS-events EWMA (lags 1..h-1,
    excluding the current event) — the one-step-ahead forecast."""
    num = " + ".join(
        f"COALESCE(l{j} * {1 << (h - 1 - j)}, 0)" for j in range(1, h)
    )
    den = " + ".join(
        f"CASE WHEN l{j} IS NULL THEN 0 ELSE {1 << (h - 1 - j)} END"
        for j in range(1, h)
    )
    return num, den


def _ewma_anomaly_oracle(h: int = _EWMA_H) -> str:
    lags = ",\n             ".join(
        f"lag(vm, {j}) OVER w AS l{j}" for j in range(1, h)
    )
    num, den = _ewma_prev_sql(h)
    return f"""
    WITH b AS (
      SELECT event_id, user_id, ts, event_type, value,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
      FROM events
    ), l AS (
      SELECT event_id, user_id, event_type, value, vm,
             {lags}
      FROM b
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), r AS (
      SELECT event_id, event_type, value,
             CAST(({num}) // ({den}) AS DOUBLE) / 1000000.0 AS predicted,
             vm - ({num}) // ({den}) AS res
      FROM l WHERE l1 IS NOT NULL
    ), st AS (
      SELECT event_type, COUNT(*) AS n, SUM(res) AS s,
             SUM(CAST(res AS HUGEINT) * res) AS q
      FROM r GROUP BY event_type
    )
    SELECT r.event_id, r.event_type, r.value, r.predicted,
           CAST(r.res AS BIGINT) AS residual_fixed,
           CAST(
             (CAST(st.n AS HUGEINT) * r.res - st.s)
               * (CAST(st.n AS HUGEINT) * r.res - st.s)
             > 9 * (st.n * st.q - CAST(st.s AS HUGEINT) * st.s)
           AS INTEGER) AS is_anomaly
    FROM r JOIN st USING (event_type)
    """


@register("events_ewma_anomaly", oracle=_ewma_anomaly_oracle())
def events_ewma_anomaly(spark, sf_dir):
    """Forecast-residual anomaly detection — the composed shape a monitoring
    pipeline runs: the dyadic EWMA over each user's PREVIOUS events (lags
    1..15, excluding the current one) is the one-step-ahead forecast, the
    residual is the fixed-point surprise, and the flag is the exact-integer
    3-sigma test of events_value_outliers applied to residuals per event
    type ((n·r − S)² > 9(n·Q − S²), wide products in decimal(38,0) ≙
    HUGEINT). First events per user have no forecast and are excluded.
    Residuals may be negative, so nothing divides them — the predicted
    value's truncating division has a non-negative numerator by the data's
    value domain, and the z-test is multiplication-only.

    Scale shape: the same single user-keyed window as events_ewma, one
    partial-combined residual-stats aggregation onto the tiny event_type
    keyspace, a broadcast join back, then pure projection."""
    h = _EWMA_H
    events = load_tables(spark, sf_dir, ("events",))["events"]
    b = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    led = b.select(
        "event_id",
        "event_type",
        "value",
        "vm",
        *[F.lag("vm", j).over(w).alias(f"l{j}") for j in range(1, h)],
    )
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for j in range(1, h):
        num = num + F.coalesce(F.col(f"l{j}") * F.lit(1 << (h - 1 - j)), F.lit(0))
        den = den + F.when(
            F.col(f"l{j}").isNotNull(), F.lit(1 << (h - 1 - j))
        ).otherwise(F.lit(0))
    r = (
        led.filter(F.col("l1").isNotNull())
        .select(
            "event_id",
            "event_type",
            "value",
            "vm",
            num.alias("_num"),
            den.alias("_den"),
        )
        .select(
            "event_id",
            "event_type",
            "value",
            (F.expr("_num div _den").cast("double") / 1e6).alias("predicted"),
            (F.col("vm") - F.expr("_num div _den")).alias("res"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("res").alias("s"),
        F.sum(dec(F.col("res")) * dec(F.col("res"))).alias("q"),
    )
    j = r.join(F.broadcast(st), "event_type")
    dev = dec(F.col("n")) * dec(F.col("res")) - dec(F.col("s"))
    var_num = dec(F.col("n")) * F.col("q") - dec(F.col("s")) * dec(F.col("s"))
    return j.select(
        "event_id",
        "event_type",
        "value",
        "predicted",
        F.col("res").cast("bigint").alias("residual_fixed"),
        F.when(dev * dev > F.lit(9) * var_num, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# BPE merge application: the step after the pair count
# --------------------------------------------------------------------------


@register(
    "corpus_bpe_merge_apply",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents
    ), p AS (
      SELECT substr(w, i + 1, 1) AS c1, substr(w, i + 2, 1) AS c2
      FROM w, unnest(range(len(w) - 1)) AS u(i)
      WHERE len(w) >= 2
    ), top1 AS (
      SELECT c1 || c2 AS pair FROM (
        SELECT c1, c2, COUNT(*) AS n_pairs
        FROM p GROUP BY c1, c2
        ORDER BY n_pairs DESC, c1 ASC, c2 ASC LIMIT 1)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(w.w)) AS BIGINT) AS symbols_before,
           CAST(SUM(len(w.w) - len(replace(w.w, t.pair, '0'))) AS BIGINT)
             AS n_merges,
           CAST(SUM(len(replace(w.w, t.pair, '0'))) AS BIGINT)
             AS symbols_after
    FROM w CROSS JOIN top1 t
    GROUP BY doc_id
    """,
)
def corpus_bpe_merge_apply(spark, sf_dir):
    """The APPLY half of a BPE merge round (corpus_bpe_pair_counts is the
    count half): the winning pair (count desc, ties lexicographic — the
    published Sennrich et al. 2016 rule) is merged into every word as a
    single symbol, and each document reports its symbol count before/after
    and the number of merges. Merging is leftmost non-overlapping — both
    engines' literal replace() — and counted by the length delta (each
    merge shrinks the word by exactly one symbol), so the whole round is
    integer arithmetic on string lengths.

    Scale shape: the winning pair is a broadcast single-row aggregate
    (the scalar-subquery crossJoin shape used across the catalog); the
    apply pass is one codegen projection over the word explode + one
    partial-combined per-doc aggregation. Iterated BPE = this query in a
    loop with the growing merge table broadcast each round."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("w"),
    )
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> struct(substring(w, i, 1) AS c1, substring(w, i + 1, 1) AS c2))"
                )
            ).alias("pp")
        )
        .select(F.col("pp.c1").alias("c1"), F.col("pp.c2").alias("c2"))
    )
    top1 = (
        pairs.groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), F.col("c1").asc(), F.col("c2").asc())
        .limit(1)
        .select(F.concat(F.col("c1"), F.col("c2")).alias("pair"))
    )
    merged_len = F.length(F.expr("replace(w, pair, '0')"))
    return (
        words.crossJoin(F.broadcast(top1))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("w")).cast("bigint").alias("symbols_before"),
            F.sum(F.length("w") - merged_len).cast("bigint").alias("n_merges"),
            F.sum(merged_len).cast("bigint").alias("symbols_after"),
        )
    )


# --------------------------------------------------------------------------
# k-NN label-vote classification eval
# --------------------------------------------------------------------------

_VOTE_K = 5
_VOTE_QUERIES = 50
_VOTE_DIM = 64


def _label_vote_oracle(
    k: int = _VOTE_K, n_queries: int = _VOTE_QUERIES, dim: int = _VOTE_DIM
) -> str:
    return f"""
    WITH comp AS (
      SELECT vec_id AS vid, CAST(i AS INTEGER) AS comp,
             CAST(round(embedding[i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS x
      FROM embeddings, unnest(range({dim})) AS u(i)
    ), ex AS (
      SELECT q.vid AS query_id, v.vid AS neighbor_id,
             SUM((q.x - v.x) * (q.x - v.x)) AS d
      FROM comp q JOIN comp v ON v.comp = q.comp AND v.vid <> q.vid
      WHERE q.vid < {n_queries}
      GROUP BY 1, 2
    ), topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id, row_number() OVER (
                 PARTITION BY query_id ORDER BY d, neighbor_id) AS rn
        FROM ex) WHERE rn <= {k}
    ), votes AS (
      SELECT t.query_id, e.label, COUNT(*) AS n_votes
      FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
      GROUP BY 1, 2
    ), best AS (
      SELECT query_id, label AS pred_label, n_votes FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY n_votes DESC, label ASC) AS rn
        FROM votes) WHERE rn = 1
    )
    SELECT b.query_id, q.label AS true_label, b.pred_label,
           CAST(b.n_votes AS BIGINT) AS n_votes,
           CAST(b.pred_label = q.label AS INTEGER) AS is_correct
    FROM best b JOIN embeddings q ON q.vec_id = b.query_id
    """


@register("knn_label_vote", oracle=_label_vote_oracle())
def knn_label_vote(spark, sf_dir):
    """k-NN majority-vote classification over the embedding labels: each of
    the first {n} query vectors takes its EXACT fixed-point top-{k}
    (knn_exact_fixed — broadcast queries, one linear corpus scan), the
    neighbors vote with their stored labels, and the plurality label (ties
    to the lower label id) is scored against the query's own label. The
    per-query accuracy rows are the eval a labeled-embedding pipeline runs
    before trusting nearest-neighbor transfer — knn_ivf_pq_recall grades
    the INDEX, this grades the SIGNAL.

    Scale shape: ground truth over a query SAMPLE (n × corpus, never
    corpus²); the label lookup is a join against the (vec_id, label)
    projection; voting is a (query, label)-keyed partial-combined count and
    a query-keyed argmax window on ≤ k·n rows."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    topk = similarity.knn_exact_fixed(
        emb, k=_VOTE_K, n_queries=_VOTE_QUERIES, dim=_VOTE_DIM
    )
    labels = emb.select("vec_id", "label")
    votes = (
        topk.join(
            labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    best = (
        votes.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )
    truth = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return best.join(truth, "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        F.col("n_votes").cast("bigint").alias("n_votes"),
        (F.col("pred_label") == F.col("true_label")).cast("int").alias("is_correct"),
    )


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth with a two-phase prefix sum
# --------------------------------------------------------------------------

_VG_BUCKET = 50  # docs per prefix-sum bucket (sized so #buckets stays small)


@register(
    "corpus_vocab_growth",
    oracle="""
    WITH w AS (
      SELECT t.tok AS word, MIN(doc_id) AS first_doc
      FROM (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
      ) t
      GROUP BY t.tok
    ), npd AS (
      SELECT first_doc AS doc_id, COUNT(*) AS n_new FROM w GROUP BY 1
    ), j AS (
      SELECT d.doc_id, COALESCE(n.n_new, 0) AS n_new_words
      FROM documents d LEFT JOIN npd n ON n.doc_id = d.doc_id
    )
    SELECT doc_id, CAST(n_new_words AS BIGINT) AS n_new_words,
           CAST(SUM(n_new_words) OVER (
             ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
    FROM j
    """,
)
def corpus_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth: per document (in doc_id order), the
    number of word types seen for the FIRST time and the running vocabulary
    size — the curve a corpus team reads to judge marginal data value.
    First occurrence is min(doc_id) per word; the running total is a
    TWO-PHASE prefix sum: a within-bucket cumulative window partitioned by
    bucket (doc_id div {B} — all buckets in parallel) plus bucket-prefix
    offsets from a window over the bucket-totals table. The oracle's global
    ORDER BY window is the semantic spec; the Spark plan never sorts the
    corpus in one partition — the only single-partition window runs over
    #buckets rows, which the bucket size keeps ~1e4 at any corpus scale.

    Scale shape: one tokenize+explode, a word-keyed partial-combined min,
    a doc-keyed count, then the two-phase sum — every stage linear, the
    prefix exchange broadcast-sized."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("word")
    )
    first = toks.groupBy("word").agg(F.min("doc_id").alias("doc_id"))
    npd = first.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_new"))
    j = (
        docs.select("doc_id")
        .join(npd, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new_words"),
            F.expr(f"doc_id div {_VG_BUCKET}").alias("b"),
        )
    )
    win_in = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = j.withColumn("cum_in_b", F.sum("n_new_words").over(win_in))
    btot = j.groupBy("b").agg(F.sum("n_new_words").alias("bt"))
    win_pre = (
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = btot.select(
        "b", F.coalesce(F.sum("bt").over(win_pre), F.lit(0)).alias("prefix")
    )
    return within.join(F.broadcast(bpre), "b").select(
        "doc_id",
        F.col("n_new_words").cast("bigint").alias("n_new_words"),
        (F.col("prefix") + F.col("cum_in_b")).cast("bigint").alias("vocab_size"),
    )


# --------------------------------------------------------------------------
# Streaming stateful EWMA, driver-certified by executing the real query
# --------------------------------------------------------------------------

_STREAM_EWMA_RUNS = iter(range(1_000_000))


@register("stream_ewma_twin", oracle=_ewma_oracle())
def stream_ewma_twin(spark, sf_dir):
    """The CUSTOM STATEFUL streaming EWMA (streaming/analytics.py
    running_ewma: applyInPandasWithState, per-user state = the last ≤15
    fixed-point values), certified by EXECUTING the real streaming query —
    the events table replays through a file source with
    trigger(availableNow=True) and the append-mode emissions (one row per
    event) must hash-equal the BATCH events_ewma oracle, because both sides
    run the identical exact-integer formula (Python ``//`` ≡ Spark ``div``
    on the non-negative numerator). This is the strongest stateful-operator
    certification in the catalog: a Python state machine reproducing a
    window-function query bit-for-bit.

    Scale shape: state is a fixed ≤15-long array per user (bounded by key
    cardinality, not stream length); Arrow batches keep the Python hop
    vectorized; the only shuffle is the user_id exchange the batch window
    needs anyway."""
    import tempfile

    events = load_tables(spark, sf_dir, ("events",))["events"]
    sel = events.select("event_id", "ts", "user_id", "value")
    src = tempfile.mkdtemp(prefix="stream_ewma_src_")
    sel.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(src)
    from kafka_sink_spark.streaming.analytics import running_ewma

    name = f"stream_ewma_twin_{next(_STREAM_EWMA_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_ewma_ck_")
    q = (
        running_ewma(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    return finish_stream_twin(spark, q, name, spark.table(name), (src, ck))
