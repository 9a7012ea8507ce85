"""Round-6g wave: per-document keyword extraction, Z-order layout
diagnostics, and sequential path mining — three more operators a
large-scale curation/analytics stack runs routinely.

- ``docs_keyword_topk``  per-document top-3 keywords by a transcendental-
  free TF-IDF score (tf · N·1e6 div df — one truncating division, so the
  ranking is bit-identical cross-engine): the per-doc twin of the global
  ``corpus_top_terms`` ranking, and the metadata a retrieval index stores
  alongside each chunk.
- ``lineitem_zorder_layout``  Morton/Z-order interleaving of the
  (l_partkey, l_suppkey) pair into 16 layout buckets, reporting each
  bucket's row count and per-dimension min/max envelope — the math behind
  multi-dimensional data-layout clustering: a Z-bucket bounds BOTH key
  ranges at once, so files written in Z-order can be skipped by predicates
  on either column (a linear sort bounds only its leading column).
- ``events_top_paths``  the 10 most common 3-step event-type paths across
  user sessions (lead-window n-grams over per-user sequences) — the
  path-mining generalization of the 1-step ``events_markov_transitions``
  and the free-form complement of the fixed-funnel
  ``events_funnel_conversion``.

Determinism per the package convention: integers end-to-end, truncating
integer division on non-negative operands only, ties broken on the value
column then the key.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Per-document top-k keywords by transcendental-free TF-IDF
# --------------------------------------------------------------------------

_KW_TOPK = 3


_KW_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), nn AS (
      SELECT COUNT(*) AS n FROM documents
    ), sc AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST((tf.tf * nn.n * 1000000) // df.df AS BIGINT) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY (tf.tf * nn.n * 1000000) // df.df DESC, tf.term
             ) AS rk
      FROM tf JOIN df USING (term), nn
    )
    SELECT doc_id, rk AS rank, term, tf, df, score
    FROM sc WHERE rk <= {_KW_TOPK}
    """


@register("docs_keyword_topk", oracle=_KW_ORACLE)
def docs_keyword_topk(spark, sf_dir):
    """Top-3 keywords per document by TF-IDF, transcendental-free: score =
    tf · (N·1e6) div df — a single truncating integer division, monotone in
    tf and 1/df exactly like tf·log(N/df) for ranking purposes, and
    bit-identical in Spark and DuckDB (no float log whose last ulp could
    flip a rank).  Ties break by term for determinism.

    Scale shape: (doc,term) counts and the document-frequency table are
    partial-combined aggregations; the score join is term-keyed (never a
    broadcast of the vocabulary — it can be billions of terms at corpus
    scale); the per-doc top-3 is a rank filter that Spark executes as
    WindowGroupLimit — each partition keeps ≤3 rows per doc before the
    doc-keyed exchange, so the window never sees the full scored table.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    nn = docs.agg(F.count("*").alias("n"))
    win = Window.partitionBy("doc_id").orderBy(
        F.expr("tf * n * 1000000 div df").desc(), F.col("term")
    )
    return (
        tf.join(df.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(nn))
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= _KW_TOPK)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "term",
            "tf",
            "df",
            F.expr("tf * n * 1000000 div df").alias("score"),
        )
    )


# --------------------------------------------------------------------------
# Z-order layout diagnostics over (l_partkey, l_suppkey)
# --------------------------------------------------------------------------

_Z_BITS = 8  # 8 bits per dimension -> 16-bit Morton code
_Z_BUCKET_SHIFT = 12  # keep the top 4 bits -> 16 layout buckets


def _morton_expr(bp: str, bs: str, shift: bool) -> str:
    """Bit-interleave expression; `shift=True` emits DuckDB's `<<`/`>>`
    operators, else Spark's shiftleft/shiftright functions. Same arithmetic
    either way."""
    terms = []
    for i in range(_Z_BITS):
        if shift:
            terms.append(f"((({bp} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({bs} >> {i}) & 1) << {2 * i + 1})")
        else:
            terms.append(f"shiftleft(shiftright({bp}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({bs}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


_Z_ORACLE = f"""
    WITH mx AS (
      SELECT MAX(l_partkey) AS pm, MAX(l_suppkey) AS sm FROM lineitem
    ), b AS (
      SELECT l_partkey, l_suppkey,
             (l_partkey * {1 << _Z_BITS}) // (mx.pm + 1) AS bp,
             (l_suppkey * {1 << _Z_BITS}) // (mx.sm + 1) AS bs
      FROM lineitem, mx
    ), z AS (
      SELECT l_partkey, l_suppkey,
             ({_morton_expr('bp', 'bs', shift=True)}) AS zv
      FROM b
    )
    SELECT zv // {1 << _Z_BUCKET_SHIFT} AS z_bucket,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
           MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max
    FROM z GROUP BY 1
    """


@register("lineitem_zorder_layout", oracle=_Z_ORACLE)
def lineitem_zorder_layout(spark, sf_dir):
    """Z-order (Morton) layout diagnostics: quantize (l_partkey, l_suppkey)
    to 8 bits each against their max (monotone bucketing), interleave the
    bits into a 16-bit Morton code, and report the 16 top-level Z buckets
    with their per-dimension min/max envelopes.  The envelopes are the
    point: a Z bucket bounds BOTH keys simultaneously, so parquet files
    written bucket-per-file are skippable by predicates on EITHER column —
    the multi-dimensional clustering a plain ORDER BY cannot give.  This is
    the planning query you run before choosing a 100 TB table's layout.

    Scale shape: one scalar max (broadcast), one pure-projection Morton
    code (16 codegen bit terms, no UDF), one 16-group partial-combined
    aggregate.  Zero wide shuffles.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        "l_partkey", "l_suppkey"
    )
    mx = li.agg(
        F.max("l_partkey").alias("pm"), F.max("l_suppkey").alias("sm")
    )
    b = li.crossJoin(F.broadcast(mx)).select(
        "l_partkey",
        "l_suppkey",
        F.expr(f"l_partkey * {1 << _Z_BITS} div (pm + 1)").alias("bp"),
        F.expr(f"l_suppkey * {1 << _Z_BITS} div (sm + 1)").alias("bs"),
    )
    z = b.select(
        "l_partkey",
        "l_suppkey",
        F.expr(_morton_expr("bp", "bs", shift=False)).alias("zv"),
    )
    return z.groupBy(
        F.expr(f"zv div {1 << _Z_BUCKET_SHIFT}").alias("z_bucket")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("p_min"),
        F.max("l_partkey").alias("p_max"),
        F.min("l_suppkey").alias("s_min"),
        F.max("l_suppkey").alias("s_max"),
    )


# --------------------------------------------------------------------------
# Top event-type paths (3-step sequences across users)
# --------------------------------------------------------------------------

_PATH_TOPK = 10


_PATHS_ORACLE = f"""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), p AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    ), c AS (
      SELECT path, COUNT(*) AS cnt FROM p GROUP BY path
    ), tot AS (
      -- Σ cnt equals Σ_user max(n_u - 2, 0): computable from a plain
      -- per-user count, no second pass over the window pipeline.
      SELECT SUM(GREATEST(cn - 2, 0)) AS n
      FROM (SELECT COUNT(*) AS cn FROM events GROUP BY user_id)
    ), r AS (
      SELECT path, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, path) AS rk
      FROM c
    )
    SELECT r.rk AS rank, r.path, r.cnt,
           CAST((r.cnt * 1000000) // MAX(tot.n) AS BIGINT) AS share_ppm
    FROM r, tot
    WHERE r.rk <= {_PATH_TOPK}
    GROUP BY r.rk, r.path, r.cnt
    """


@register("events_top_paths", oracle=_PATHS_ORACLE)
def events_top_paths(spark, sf_dir):
    """The 10 most common 3-step event-type paths: per-user sequences
    (ordered by ts, event_id) yield lead-window trigrams; global counts
    rank them with exact ppm share.  Generalizes the 1-step Markov
    transition matrix to path mining, without enumerating a fixed funnel.

    Scale shape: one user-keyed window (two lead()s share a single Window
    node and the sessionize family's partitioning), one partial-combined
    path count (path cardinality ≤ |event types|³, tiny), and a
    TakeOrderedAndProject top-10 — no global sort, no self-join chain (the
    classic funnel-join formulation is quadratic in path length).
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    c = s.select(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    ).groupBy("path").agg(F.count("*").alias("cnt"))
    # Σ cnt ≡ Σ_user max(n_u - 2, 0) — a plain per-user count, so the
    # denominator never re-executes the lead-window pipeline.
    tot = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("cn"))
        .agg(F.sum(F.greatest(F.col("cn") - 2, F.lit(0))).alias("n"))
    )
    win = Window.orderBy(F.col("cnt").desc(), F.col("path"))
    return (
        c.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= _PATH_TOPK)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "path",
            "cnt",
            F.expr("cnt * 1000000 div n").alias("share_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Hilbert-curve layout diagnostics over (l_partkey, l_suppkey)
# --------------------------------------------------------------------------

_H_BITS = 8
_H_N = 1 << _H_BITS  # 256x256 grid -> 16-bit Hilbert index
_H_BUCKET_SHIFT = 12  # keep the top 4 bits -> 16 layout buckets


def _hilbert_stage(s: int) -> tuple[str, str, str, str, str]:
    """Portable SQL for one xy2d round (Hilbert 1891; the standard
    public bit-twiddling formulation): rx/ry tests, quadrant distance
    increment, and the reflect-then-swap rotation.  Plain &, CASE and
    arithmetic — the same text runs in Spark SQL and DuckDB."""
    rx = f"CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END"
    ry = f"CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END"
    quad = (
        "CASE WHEN rx = 1 AND ry = 0 THEN 3"
        " WHEN rx = 1 AND ry = 1 THEN 2"
        " WHEN rx = 0 AND ry = 1 THEN 1 ELSE 0 END"
    )
    d = f"hd + {s * s} * ({quad})"
    new_x = (
        f"CASE WHEN ry = 0 THEN"
        f" (CASE WHEN rx = 1 THEN {_H_N} - 1 - hy ELSE hy END)"
        f" ELSE hx END"
    )
    new_y = (
        f"CASE WHEN ry = 0 THEN"
        f" (CASE WHEN rx = 1 THEN {_H_N} - 1 - hx ELSE hx END)"
        f" ELSE hy END"
    )
    return rx, ry, d, new_x, new_y


def _hilbert_oracle() -> str:
    ctes = [
        "h0 AS (SELECT l_partkey, l_suppkey, bp AS hx, bs AS hy,"
        " 0 AS hd FROM b)"
    ]
    for i in range(_H_BITS):
        s = _H_N >> (i + 1)
        rx, ry, d, nx, ny = _hilbert_stage(s)
        ctes.append(
            f"r{i + 1} AS (SELECT *, {rx} AS rx, {ry} AS ry FROM h{i})"
        )
        ctes.append(
            f"h{i + 1} AS (SELECT l_partkey, l_suppkey, {nx} AS hx,"
            f" {ny} AS hy, {d} AS hd FROM r{i + 1})"
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH mx AS (
      SELECT MAX(l_partkey) AS pm, MAX(l_suppkey) AS sm FROM lineitem
    ), b AS (
      SELECT l_partkey, l_suppkey,
             (l_partkey * {_H_N}) // (mx.pm + 1) AS bp,
             (l_suppkey * {_H_N}) // (mx.sm + 1) AS bs
      FROM lineitem, mx
    ),
    {chain}
    SELECT hd // {1 << _H_BUCKET_SHIFT} AS h_bucket,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
           MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max,
           CAST((MAX(l_partkey) - MIN(l_partkey) + 1)
                * (MAX(l_suppkey) - MIN(l_suppkey) + 1) AS BIGINT)
             AS envelope_area
    FROM h{_H_BITS} GROUP BY 1
    """


@register("lineitem_hilbert_layout", oracle=_hilbert_oracle())
def lineitem_hilbert_layout(spark, sf_dir):
    """Hilbert-curve layout diagnostics over (l_partkey, l_suppkey) —
    the locality-better sibling of ``lineitem_zorder_layout``: quantize
    both keys to 8 bits, map through 8 unrolled rounds of the standard
    xy2d bit transform (distance increment per quadrant, reflect-then-
    swap rotation — the curve where consecutive indices are always
    grid-adjacent, unlike Morton's discontinuous jumps), and report the
    16 top-level Hilbert buckets with per-dimension envelopes AND the
    envelope area — the number to compare against the Z-order buckets
    when choosing a 100 TB table's multi-dimensional clustering
    (Delta/Iceberg expose exactly this choice).

    Scale shape: one scalar max (broadcast), then a pure zero-shuffle
    projection chain — 8 rounds of CASE/AND bit arithmetic that
    Catalyst collapses into one codegen span — and one 16-group
    partial-combined aggregate.  Identical cost shape to the Z-order
    audit: layout choice costs one scan either way.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        "l_partkey", "l_suppkey"
    )
    mx = li.agg(
        F.max("l_partkey").alias("pm"), F.max("l_suppkey").alias("sm")
    )
    cur = li.crossJoin(F.broadcast(mx)).select(
        "l_partkey",
        "l_suppkey",
        F.expr(f"l_partkey * {_H_N} div (pm + 1)").alias("hx"),
        F.expr(f"l_suppkey * {_H_N} div (sm + 1)").alias("hy"),
        F.lit(0).alias("hd"),
    )
    for i in range(_H_BITS):
        s = _H_N >> (i + 1)
        rx, ry, d, nx, ny = _hilbert_stage(s)
        staged = cur.select(
            "l_partkey",
            "l_suppkey",
            "hx",
            "hy",
            "hd",
            F.expr(rx).alias("rx"),
            F.expr(ry).alias("ry"),
        )
        cur = staged.select(
            "l_partkey",
            "l_suppkey",
            F.expr(nx).alias("hx"),
            F.expr(ny).alias("hy"),
            F.expr(d).alias("hd"),
        )
    return cur.groupBy(
        F.expr(f"hd div {1 << _H_BUCKET_SHIFT}").alias("h_bucket")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("p_min"),
        F.max("l_partkey").alias("p_max"),
        F.min("l_suppkey").alias("s_min"),
        F.max("l_suppkey").alias("s_max"),
        F.expr(
            "CAST((MAX(l_partkey) - MIN(l_partkey) + 1)"
            " * (MAX(l_suppkey) - MIN(l_suppkey) + 1) AS BIGINT)"
        ).alias("envelope_area"),
    )
