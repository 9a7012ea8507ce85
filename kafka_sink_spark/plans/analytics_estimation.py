"""Round-7j wave: estimation and retrieval quality — Zipf-law fitting,
graded retrieval evaluation, sketch-vs-exact set similarity, a streaming
drift twin, and item-item neighborhood similarity — five more published
techniques in the catalog's exact-integer, oracle-twinned style.

- ``corpus_zipf_alpha``  Zipf exponent by doubling-bucket regression:
  frequencies sampled at ranks 1, 2, 4, … 2^G, log2 taken EXACTLY on
  the integer part (length(bin(f)) − 1) with a deterministic
  linear-within-octave fractional part in ppm — no transcendental calls
  — then the OLS slope over (g, lg₂f) points via the catalog's
  sufficient-statistics form.  −slope IS α, the corpus-shape constant
  behind vocabulary sizing and sampling-rate planning.
- ``knn_label_ndcg``  NDCG@5 of brute-force cosine retrieval with the
  embedding label as graded relevance (Järvelin & Kekäläinen 2002):
  DCG discounts 1/log2(i+1) are FIXED ppm constants (the only five
  values ever needed at k=5), IDCG is the cumulative-weight prefix at
  min(k, R) — retrieval QUALITY next to the family's recall harnesses.
- ``docs_kmv_jaccard``  KMV/bottom-k sketch Jaccard (Broder 1997; the
  Theta-sketch set-operation trick): the k smallest 60-bit hashes of
  the UNION estimate J by the fraction also present in both sides —
  certified against the exact Jaccard with a signed error in ppm, the
  house estimator-certification pattern.
- ``stream_drift_twin``  the STREAMING half of events_value_drift_tvd:
  the (bucket, half) histogram builds as a real availableNow streaming
  aggregation (update mode; counts are monotone so the final register
  is the max emission), then the batch readout emits the IDENTICAL
  drift row — certified against the same DuckDB oracle as the batch
  query, the Count-Min/HLL twin discipline applied to drift monitoring.
- ``parts_jaccard_similarity``  item-item neighborhood Jaccard (the
  classical item-based collaborative-filtering similarity, Sarwar et
  al. 2001) over the support-pruned co-purchase graph:
  |N(a)∩N(b)| / |N(a)∪N(b)| in exact ppm via common-neighbor counts
  and degrees (|∪| = d_a + d_b − |∩|), top-50 pairs.

Determinism per the package convention: integer arithmetic end-to-end,
sign-split truncating division, fixed ppm constant tables, md5 60-bit
hashing shared with the dedup family.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.plans.stream_twin import finish_stream_twin
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Zipf exponent by doubling-bucket regression
# --------------------------------------------------------------------------

_ZIPF_MAX_G = 12  # ranks 1..4096


_ZIPF_ORACLE = rf"""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), tc AS (
      SELECT term, COUNT(*) AS f FROM toks GROUP BY term
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, term) AS rk
      FROM tc QUALIFY rk <= {2 ** _ZIPF_MAX_G}
    ), pts AS (
      SELECT CAST(log2(rk) AS BIGINT) AS g,
             (length(bin(f)) - 1) * 1000000
             + ((f - (1::BIGINT << (length(bin(f)) - 1))) * 1000000)
               // (1::BIGINT << (length(bin(f)) - 1)) AS y
      FROM ranked
      WHERE rk IN ({", ".join(str(2 ** g) for g in range(_ZIPF_MAX_G + 1))})
    ), v AS (SELECT COUNT(*) AS vocab FROM tc),
    s AS (
      SELECT COUNT(*) AS n, SUM(g) AS sx, SUM(y) AS sy,
             SUM(g * g) AS sxx, SUM(g::HUGEINT * y) AS sxy
      FROM pts
    )
    SELECT CAST(s.n AS BIGINT) AS n_points, CAST(v.vocab AS BIGINT) AS vocab,
           CAST(CASE WHEN s.n * s.sxy - s.sx::HUGEINT * s.sy <= 0
                THEN (s.sx::HUGEINT * s.sy - s.n * s.sxy)
                     // (s.n::HUGEINT * s.sxx - s.sx::HUGEINT * s.sx)
                ELSE -((s.n * s.sxy - s.sx::HUGEINT * s.sy)
                       // (s.n::HUGEINT * s.sxx - s.sx::HUGEINT * s.sx))
           END AS BIGINT) AS alpha_ppm
    FROM s, v
    """


@register("corpus_zipf_alpha", oracle=_ZIPF_ORACLE)
def corpus_zipf_alpha(spark, sf_dir):
    """Zipf exponent α of the corpus frequency–rank law f ∝ r^−α, fitted
    by DOUBLING-BUCKET regression: the frequency is sampled exactly at
    ranks 1, 2, 4, …, 2^{g} (so x = lg₂ rank is an exact small
    integer), lg₂ f is computed WITHOUT any transcendental call —
    integer part from length(bin(f)) − 1, fractional part by the
    deterministic linear-within-octave interpolation
    ((f − 2^⌊lg f⌋)·1e6) // 2^⌊lg f⌋ (max 0.086-bit error, identical in
    both engines) — and the OLS slope comes from the catalog's
    five-sufficient-statistics form.  α is emitted as −slope in
    ppm-bits-per-doubling ≙ ppm; natural text sits near 1e6 (α ≈ 1),
    and the fitted value feeds vocabulary sizing and temperature
    resampling.

    Scale shape: one partial-combined term count (the corpus-sized
    shuffle every vocabulary statistic pays); the rank filter is a
    WindowGroupLimit top-2^{g} extraction (per-task O(k) heads); the
    regression runs over ≤{g}+1 CONSTANT points.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tc = (
        docs.select(F.explode(text_ops.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("f"))
    )
    ranked = tc.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), F.col("term")))
        .alias("rk"),
    ).filter(F.col("rk") <= 2**_ZIPF_MAX_G)
    powers = [2**g for g in range(_ZIPF_MAX_G + 1)]
    pts = ranked.filter(F.col("rk").isin(powers)).select(
        F.expr("CAST(log2(rk) AS BIGINT)").alias("g"),
        F.expr(
            "(length(bin(f)) - 1) * 1000000"
            " + ((f - shiftleft(CAST(1 AS BIGINT), length(bin(f)) - 1))"
            " * 1000000) div shiftleft(CAST(1 AS BIGINT), length(bin(f)) - 1)"
        ).alias("y"),
    )
    v = tc.agg(F.count("*").cast("long").alias("vocab"))
    s = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("g").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("sxx"),
        F.sum(F.expr("CAST(g AS DECIMAL(38,0)) * y")).alias("sxy"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    num = f"({dec.format('n')} * sxy - {dec.format('sx')} * sy)"
    den = f"({dec.format('n')} * sxx - {dec.format('sx')} * sx)"
    return s.crossJoin(F.broadcast(v)).select(
        F.col("n").alias("n_points"),
        "vocab",
        F.expr(
            f"CAST(CASE WHEN {num} <= 0 THEN (-({num})) div {den}"
            f" ELSE -({num} div {den}) END AS BIGINT)"
        ).alias("alpha_ppm"),
    )


corpus_zipf_alpha.__doc__ = corpus_zipf_alpha.__doc__.format(g=_ZIPF_MAX_G)


# --------------------------------------------------------------------------
# NDCG@5 of label-relevance retrieval
# --------------------------------------------------------------------------

_NDCG_K = 5
_NDCG_QUERIES = 100
# 1e6 / log2(i + 1) for i = 1..5, truncated — the only discounts NDCG@5
# ever needs, pinned as constants so no engine computes a logarithm.
_NDCG_W_PPM = (1000000, 630929, 500000, 430676, 386852)
_NDCG_CUM = tuple(itertools.accumulate(_NDCG_W_PPM))


def _ndcg_oracle(k: int = _NDCG_K, nq: int = _NDCG_QUERIES, dim: int = 64) -> str:
    from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql

    w_case = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W_PPM)
    )
    cum_case = " ".join(
        f"WHEN {i + 1} THEN {c}" for i, c in enumerate(_NDCG_CUM)
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS ql
      FROM embeddings WHERE vec_id < {nq}
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS ce, label AS cl
      FROM embeddings
    ), s AS (
      SELECT query_id, ql, neighbor_id, cl,
             round(({_dot_sql('qe', 'ce', dim)})
                   / ({_norm_sql('qe', dim)} * {_norm_sql('ce', dim)}), 6)
               AS cos_sim
      FROM q, c WHERE query_id <> neighbor_id
    ), r AS (
      SELECT query_id, ql, cl,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM s
    ), dcg AS (
      SELECT query_id, ql,
             SUM(CASE WHEN cl = ql
                 THEN CASE rk {w_case} ELSE 0 END ELSE 0 END) AS dcg_ppm
      FROM r WHERE rk <= {k} GROUP BY query_id, ql
    ), rel AS (
      SELECT q.query_id, COUNT(*) AS n_relevant
      FROM q JOIN c ON c.cl = q.ql AND c.neighbor_id <> q.query_id
      GROUP BY q.query_id
    )
    SELECT dcg.query_id, CAST(dcg.ql AS BIGINT) AS label,
           CAST(COALESCE(rel.n_relevant, 0) AS BIGINT) AS n_relevant,
           CAST(dcg.dcg_ppm AS BIGINT) AS dcg_ppm,
           CAST(CASE LEAST({k}, COALESCE(rel.n_relevant, 0)) {cum_case}
                ELSE 0 END AS BIGINT) AS idcg_ppm,
           CAST(CASE WHEN COALESCE(rel.n_relevant, 0) = 0 THEN 0
                ELSE dcg.dcg_ppm * 1000000
                     // (CASE LEAST({k}, rel.n_relevant) {cum_case} END)
           END AS BIGINT) AS ndcg_ppm
    FROM dcg LEFT JOIN rel ON rel.query_id = dcg.query_id
    """


@register("knn_label_ndcg", oracle=_ndcg_oracle())
def knn_label_ndcg(spark, sf_dir):
    """NDCG@{k} of brute-force cosine retrieval, with the embedding
    LABEL as binary relevance (same class = relevant) — the graded
    ranking-quality metric (Järvelin & Kekäläinen 2002) beside the
    family's recall harnesses: recall asks "did the right ids come
    back", NDCG asks "were they ranked FIRST".  The five discounts
    1/log2(i+1) are pinned ppm constants ({w}) so neither engine
    computes a logarithm; IDCG is the cumulative-weight prefix at
    min(k, R) with R the query's total relevant-corpus count.  One row
    per query vector.

    Scale shape: the {q}-query panel is broadcast against one corpus
    scan (the knn-family shape); the top-{k} rank is a per-query
    WindowGroupLimit; relevant counts ride a label-keyed broadcast
    join; everything after is per-query constant arithmetic.
    """
    from kafka_sink_spark.extensions import similarity

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < _NDCG_QUERIES)
    knn = similarity.knn_bruteforce(emb, queries, k=_NDCG_K)
    labels = emb.select("vec_id", "label")
    w_case = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W_PPM)
    )
    cum_case = " ".join(
        f"WHEN {i + 1} THEN {c}" for i, c in enumerate(_NDCG_CUM)
    )
    scored = (
        knn.join(
            F.broadcast(
                queries.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("ql"),
                )
            ),
            "query_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("cl"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "ql")
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN cl = ql THEN CASE rank {w_case} ELSE 0 END"
                    " ELSE 0 END"
                )
            ).alias("dcg_ppm")
        )
    )
    rel = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql"))
        .join(
            emb.select(F.col("vec_id").alias("nid"), F.col("label").alias("cl")),
            F.expr("cl = ql AND nid <> query_id"),
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_relevant"))
    )
    return (
        scored.join(F.broadcast(rel), "query_id", "left")
        .select(
            "query_id",
            F.col("ql").cast("long").alias("label"),
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            F.col("dcg_ppm").cast("long").alias("dcg_ppm"),
            F.expr(
                f"CAST(CASE LEAST({_NDCG_K}, COALESCE(n_relevant, 0))"
                f" {cum_case} ELSE 0 END AS BIGINT)"
            ).alias("idcg_ppm"),
            F.expr(
                "CAST(CASE WHEN COALESCE(n_relevant, 0) = 0 THEN 0"
                " ELSE dcg_ppm * 1000000 div"
                f" (CASE LEAST({_NDCG_K}, n_relevant) {cum_case} END)"
                " END AS BIGINT)"
            ).alias("ndcg_ppm"),
        )
    )


knn_label_ndcg.__doc__ = knn_label_ndcg.__doc__.format(
    k=_NDCG_K, q=_NDCG_QUERIES, w=", ".join(str(w) for w in _NDCG_W_PPM)
)


# --------------------------------------------------------------------------
# KMV bottom-k sketch Jaccard vs exact
# --------------------------------------------------------------------------

_KMV_K = 256


_KMV_ORACLE = rf"""
    WITH arr AS (
      SELECT CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 'A'
                  ELSE 'B' END AS side,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT side,
             CASE WHEN len(t) >= 3
                  THEN ('0x' || substr(md5(array_to_string(t[u.i+1:u.i+3], ' ')),
                        1, 15))::BIGINT
                  ELSE ('0x' || substr(md5(array_to_string(t, ' ')), 1, 15))::BIGINT
             END AS h
      FROM arr, unnest(range(CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 1 END))
           AS u(i)
    ), sets AS (
      SELECT h,
             MAX(CASE WHEN side = 'A' THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN side = 'B' THEN 1 ELSE 0 END) AS in_b
      FROM sh GROUP BY h
    ), exact AS (
      SELECT SUM(in_a) AS n_a, SUM(in_b) AS n_b,
             SUM(in_a * in_b) AS n_both, COUNT(*) AS n_union
      FROM sets
    ), bottomk AS (
      SELECT in_a, in_b,
             row_number() OVER (ORDER BY h) AS rk
      FROM sets QUALIFY rk <= {_KMV_K}
    ), est AS (
      SELECT COUNT(*) AS k_used,
             SUM(in_a * in_b) AS k_both
      FROM bottomk
    )
    SELECT CAST(est.k_used AS BIGINT) AS k,
           CAST(exact.n_a AS BIGINT) AS n_a, CAST(exact.n_b AS BIGINT) AS n_b,
           CAST(exact.n_both * 1000000 // exact.n_union AS BIGINT)
             AS exact_jaccard_ppm,
           CAST(est.k_both * 1000000 // est.k_used AS BIGINT)
             AS kmv_jaccard_ppm,
           CAST(CASE WHEN est.k_both * 1000000 // est.k_used
                     >= exact.n_both * 1000000 // exact.n_union
                THEN est.k_both * 1000000 // est.k_used
                     - exact.n_both * 1000000 // exact.n_union
                ELSE -(exact.n_both * 1000000 // exact.n_union
                       - est.k_both * 1000000 // est.k_used)
           END AS BIGINT) AS err_ppm
    FROM exact, est
    """


@register("docs_kmv_jaccard", oracle=_KMV_ORACLE)
def docs_kmv_jaccard(spark, sf_dir):
    """Bottom-k (KMV) sketch Jaccard between the shingle sets of the two
    source halves (src0-9 vs src10-19), certified against the exact
    Jaccard: over the k = {k} smallest 60-bit hashes of the UNION, the
    fraction present in BOTH sides is an unbiased Jaccard estimate
    (Broder 1997 — the resemblance trick Theta sketches generalize),
    with the signed estimate error in ppm.  This is the set-OPERATION
    sketch companion to shingle_kmv_estimate's cardinality readout: the
    same bottom-k register answers |A∩B|/|A∪B| with no second pass.

    Scale shape: shingle hashes partial-combine to per-hash side flags
    (the one corpus-sized shuffle); the exact side is a four-sum
    aggregate over distinct hashes; the bottom-k extraction is a
    rank-{k} filter (WindowGroupLimit / TakeOrderedAndProject heads) —
    the union never materializes per-pair work.
    """
    from kafka_sink_spark.extensions.dedup import shingle_hashes

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sides = docs.select(
        "doc_id",
        F.when(
            F.expr("CAST(substr(source, 4, 10) AS INT) < 10"), "A"
        )
        .otherwise("B")
        .alias("side"),
    )
    # NOTE: no broadcast hint on `sides` — it is doc-count-sized (scales
    # with the corpus); AQE may still broadcast it while it is small.
    sh = (
        shingle_hashes(docs, "text")
        .join(sides, "doc_id")
        .select("side", "h")
        .distinct()
    )
    sets = sh.groupBy("h").agg(
        F.max(F.when(F.col("side") == "A", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("side") == "B", 1).otherwise(0)).alias("in_b"),
    )
    exact = sets.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        F.count("*").cast("long").alias("n_union"),
    )
    bottomk = sets.select(
        "in_a",
        "in_b",
        F.row_number().over(Window.orderBy("h")).alias("rk"),
    ).filter(F.col("rk") <= _KMV_K)
    est = bottomk.agg(
        F.count("*").cast("long").alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("k_both"),
    )
    out = exact.crossJoin(F.broadcast(est))
    ex = "(n_both * 1000000 div n_union)"
    es = "(k_both * 1000000 div k_used)"
    return out.select(
        F.col("k_used").alias("k"),
        "n_a",
        "n_b",
        F.expr(f"CAST({ex} AS BIGINT)").alias("exact_jaccard_ppm"),
        F.expr(f"CAST({es} AS BIGINT)").alias("kmv_jaccard_ppm"),
        F.expr(
            f"CAST(CASE WHEN {es} >= {ex} THEN {es} - {ex}"
            f" ELSE -({ex} - {es}) END AS BIGINT)"
        ).alias("err_ppm"),
    )


docs_kmv_jaccard.__doc__ = docs_kmv_jaccard.__doc__.format(k=_KMV_K)


# --------------------------------------------------------------------------
# Streaming drift twin (availableNow replay of the TVD histogram)
# --------------------------------------------------------------------------

_STREAM_DRIFT_RUNS = itertools.count()


def _tvd_oracle() -> str:
    from kafka_sink_spark.plans.analytics_profiles import _TVD_ORACLE

    return _TVD_ORACLE


@register("stream_drift_twin", oracle=_tvd_oracle())
def stream_drift_twin(spark, sf_dir):
    """The STREAMING half of ``events_value_drift_tvd``: the
    (bucket, half) histogram builds as a REAL availableNow streaming
    aggregation — the events replay through a file stream, the count
    per register is a plain streaming aggregate (update mode; counts
    are monotone, so the final register value is the max emission, the
    HLL/Count-Min twin discipline) — and the batch readout then emits
    the IDENTICAL single drift row, certified against the SAME DuckDB
    oracle as the batch query.  The bucket grid (lo, width) is a batch
    pre-pass over the static table, exactly how a production drift
    monitor pins its reference grid before watching the stream.

    Scale shape: streaming state is ≤ {b}×2 register rows — constant in
    stream length; the only streaming shuffle is the (bucket, half)
    exchange of any streaming aggregation; the readout is the batch
    query's constant-grid arithmetic.
    """
    import tempfile

    from kafka_sink_spark.plans.analytics_profiles import _TVD_BUCKETS

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    v = ev.select(
        F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("c"),
        F.expr("CASE WHEN dayofmonth(ts) <= 15 THEN 1 ELSE 2 END").alias(
            "half"
        ),
    )
    # Batch pre-pass pins the reference grid (2 scalars) — the monitor's
    # configuration step, not part of the streaming aggregation.
    lo, width = (
        v.agg(
            F.min("c").alias("lo"),
            F.expr(f"((MAX(c) - MIN(c)) div {_TVD_BUCKETS}) + 1").alias(
                "width"
            ),
        )
        .collect()[0]
    )
    src = tempfile.mkdtemp(prefix="stream_drift_src_")
    v.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("c long, half int").parquet(src)
    name = f"stream_drift_twin_{next(_STREAM_DRIFT_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_drift_ck_")
    q = (
        stream.select(
            F.expr(f"(c - CAST({lo} AS BIGINT)) div {width}").alias("bucket"),
            "half",
        )
        .groupBy("bucket", "half")
        .agg(F.count("*").alias("cnt"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    b = (
        spark.table(name)
        .groupBy("bucket", "half")
        .agg(F.max("cnt").alias("cnt"))
    )
    n = b.agg(
        F.sum(F.when(F.col("half") == 1, F.col("cnt")).otherwise(0)).alias(
            "n1"
        ),
        F.sum(F.when(F.col("half") == 2, F.col("cnt")).otherwise(0)).alias(
            "n2"
        ),
    )
    pq = (
        b.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == 1, F.col("cnt")).otherwise(0)).alias(
                "c1"
            ),
            F.sum(F.when(F.col("half") == 2, F.col("cnt")).otherwise(0)).alias(
                "c2"
            ),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "bucket",
            F.expr("c1 * 1000000 div n1").alias("p_ppm"),
            F.expr("c2 * 1000000 div n2").alias("q_ppm"),
            "n1",
            "n2",
        )
    )
    agg = pq.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(F.abs(F.col("p_ppm") - F.col("q_ppm"))).alias("sdiff"),
    )
    peak = (
        pq.select(
            "bucket",
            F.abs(F.col("p_ppm") - F.col("q_ppm")).alias("d"),
            F.row_number()
            .over(
                Window.orderBy(
                    F.abs(F.col("p_ppm") - F.col("q_ppm")).desc(), "bucket"
                )
            )
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("bucket").alias("peak_bucket"),
            F.col("d").alias("peak_diff_ppm"),
        )
    )
    result = agg.crossJoin(F.broadcast(peak)).select(
        F.col("n1").cast("long").alias("n_first"),
        F.col("n2").cast("long").alias("n_second"),
        F.lit(_TVD_BUCKETS).cast("long").alias("n_buckets"),
        F.expr("CAST(sdiff div 2 AS BIGINT)").alias("tvd_ppm"),
        F.col("peak_bucket").cast("long").alias("peak_bucket"),
        F.col("peak_diff_ppm").cast("long").alias("peak_diff_ppm"),
    )
    return finish_stream_twin(spark, q, name, result, (src, ck))


stream_drift_twin.__doc__ = stream_drift_twin.__doc__.format(b=16)


# --------------------------------------------------------------------------
# Item-item neighborhood Jaccard similarity
# --------------------------------------------------------------------------

_JSIM_TOPK = 50


_JSIM_ORACLE = f"""
    WITH li AS (
      SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), e AS (
      SELECT a.pk AS src, b.pk AS dst
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src
    ), cn AS (
      SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS common
      FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
      GROUP BY e1.dst, e2.dst
    ), scored AS (
      SELECT cn.a, cn.b, cn.common, da.d AS deg_a, db.d AS deg_b,
             cn.common * 1000000 // (da.d + db.d - cn.common) AS jaccard_ppm
      FROM cn JOIN deg da ON da.node = cn.a JOIN deg db ON db.node = cn.b
    )
    SELECT a, b, CAST(common AS BIGINT) AS common_neighbors,
           CAST(deg_a AS BIGINT) AS degree_a, CAST(deg_b AS BIGINT) AS degree_b,
           CAST(jaccard_ppm AS BIGINT) AS jaccard_ppm
    FROM scored
    QUALIFY ROW_NUMBER() OVER (ORDER BY jaccard_ppm DESC, a, b) <= {_JSIM_TOPK}
    """


@register("parts_jaccard_similarity", oracle=_JSIM_ORACLE)
def parts_jaccard_similarity(spark, sf_dir):
    """Item-item neighborhood Jaccard (the item-based collaborative-
    filtering similarity of Sarwar et al. 2001) over the SUPPORT≥2
    co-purchase graph: for part pairs sharing neighbors,
    J(a,b) = |N(a)∩N(b)| / |N(a)∪N(b)| in exact ppm, with the union
    cleared as d_a + d_b − common (no set materialization).  Where
    parts_link_prediction scores MISSING edges for recommendation,
    this ranks the top-{k} most SUBSTITUTABLE pairs — items whose
    baskets look alike — the other half of the item-item CF toolkit.

    Scale shape: rides the persisted support-pruned edge substrate
    (shared with parts_link_prediction in-session — measured ~10⁴
    wedges at sf0.1); common counts partial-combine on the (a, b) key;
    degrees broadcast; the top-{k} plans as TakeOrderedAndProject.
    """
    from kafka_sink_spark.plans.analytics_profiles import _support_edges

    e = _support_edges(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    cn = (
        e.select(F.col("src").alias("z"), F.col("dst").alias("a"))
        .join(e.select(F.col("src").alias("z"), F.col("dst").alias("b")), "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    # deg is catalog-sized (grows with SF) — no forced broadcast; AQE
    # broadcasts it at runtime while it is actually small.
    scored = (
        cn.join(
            deg.select(F.col("node").alias("a"), F.col("d").alias("deg_a")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("d").alias("deg_b")),
            "b",
        )
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common_neighbors"),
            F.col("deg_a").cast("long").alias("degree_a"),
            F.col("deg_b").cast("long").alias("degree_b"),
            F.expr(
                "CAST(common * 1000000 div (deg_a + deg_b - common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )
    return (
        scored.orderBy(F.col("jaccard_ppm").desc(), "a", "b")
        .limit(_JSIM_TOPK)
    )


parts_jaccard_similarity.__doc__ = parts_jaccard_similarity.__doc__.format(
    k=_JSIM_TOPK
)
