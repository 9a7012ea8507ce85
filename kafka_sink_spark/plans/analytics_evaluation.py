"""Round-7b wave: rank-comparison, nonparametric testing, lexical
diversity, inner-product retrieval, and the streaming HLL twin — five
more published techniques in the catalog's exact-integer, oracle-twinned
style.

- ``corpus_rank_biased_overlap``  RBO (Webber, Moffat & Zobel 2010)
  between the collection-frequency and document-frequency term rankings,
  truncated at depth 16 with p = 1/2 — the DYADIC persistence makes every
  geometric weight a power of two, so the whole indefinite-rank measure
  is exact integers over lcm(1..16)·2¹⁶ denominators.
- ``orders_mann_whitney``  exact Mann-Whitney U (Wilcoxon rank-sum)
  between finished and open order values: U is doubled (U2) so midrank
  ties stay integral, the tie-corrected normal z² clears every
  denominator by cross-multiplication, and the cumulative-below counts
  come from the same two-phase bucket-prefix pattern as the exact
  quantiles/Gini — no global sort.
- ``docs_mattr``  Moving-Average Type-Token Ratio (Covington & McFall
  2010), the window-stabilized lexical-diversity measure: the sum of
  per-window distinct counts collapses to ONE lag window via the
  first-occurrence-in-window identity (an instance at position p with
  previous occurrence q is "new" for exactly the window starts in
  (q, p]), so the O(L·W) sliding windows cost O(L).
- ``knn_mips``  exact maximum-inner-product top-k — the retrieval
  objective of dot-product-trained embedding models (complementing the
  L2/cosine family already in the catalog); fixed-point integer dot
  products, rank via per-query WindowGroupLimit.
- ``stream_hll_twin``  the STREAMING HyperLogLog register build
  (streaming/analytics.py hll_register_stream) certified by a real
  availableNow replay: max-aggregated register state is associative,
  idempotent and mergeable, so the final streaming registers must equal
  the batch register table bit-for-bit.

Determinism per the package convention: md5-derived hashes, integer
arithmetic end-to-end, sign-split truncating division for signed ppm,
identical aliases in Spark and SQL.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.plans.stream_twin import finish_stream_twin
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Rank-biased overlap between term rankings (p = 1/2, depth 16)
# --------------------------------------------------------------------------

_RBO_D = 16
_RBO_LCM = 720720  # lcm(1..16)

_RBO_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), stats AS (
      SELECT term, COUNT(*) AS total, COUNT(DISTINCT doc_id) AS df
      FROM toks GROUP BY term
    ), ra AS (
      SELECT term, row_number() OVER (ORDER BY total DESC, term) AS rk
      FROM stats QUALIFY rk <= {_RBO_D}
    ), rb AS (
      SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rk
      FROM stats QUALIFY rk <= {_RBO_D}
    ), joined AS (
      SELECT COALESCE(ra.term, rb.term) AS term,
             COALESCE(ra.rk, {_RBO_D + 1}) AS rka,
             COALESCE(rb.rk, {_RBO_D + 1}) AS rkb
      FROM ra FULL OUTER JOIN rb ON rb.term = ra.term
    ), xd AS (
      SELECT d.d,
             CAST(SUM(CASE WHEN j.rka <= d.d AND j.rkb <= d.d THEN 1 ELSE 0 END)
                  AS BIGINT) AS x_d
      FROM (SELECT unnest(range(1, {_RBO_D + 1})) AS d) d
      CROSS JOIN joined j
      GROUP BY d.d
    )
    SELECT CAST(d AS BIGINT) AS d, x_d,
           CAST(x_d * 1000000 // d AS BIGINT) AS agree_ppm,
           CAST(SUM(x_d * ({_RBO_LCM} // d)
                    * (1::BIGINT << ({_RBO_D} - d)))
                  OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                * 1000000
                // ({_RBO_LCM}::HUGEINT * (1::BIGINT << {_RBO_D}))
                AS BIGINT) AS rbo_ppm
    FROM xd
    """


@register("corpus_rank_biased_overlap", oracle=_RBO_ORACLE)
def corpus_rank_biased_overlap(spark, sf_dir):
    """Rank-biased overlap between the two natural term rankings of the
    corpus — by collection frequency (raw count) and by document frequency
    — truncated at depth {d} with persistence p = 1/2.  RBO's geometric
    weights p^(d-1) are powers of two, so the truncated sum
    (1−p)·Σ p^(d−1)·X_d/d is EXACT over the common denominator
    lcm(1..{d})·2^{d}: each depth contributes X_d·(lcm/d)·2^({d}−d)
    integer mass, and one final ppm division reports the cumulative RBO
    at every depth (the d={d} row is the headline score).  The standard
    top-k ranking-similarity measure for comparing retrieval/scoring
    variants without an arbitrary overlap cutoff.

    Scale shape: both rankings are per-task-O(k) top-{d} extractions over
    the partial-aggregated term stats (one shuffle on term); everything
    after operates on ≤ 2·{d} rows.  The depth fan-out is a 16-row
    broadcast.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id", F.explode(text_ops.tokens(F.col("text"))).alias("term")
    )
    stats = toks.groupBy("term").agg(
        F.count("*").cast("long").alias("total"),
        F.count_distinct("doc_id").cast("long").alias("df"),
    )
    ra = stats.select(
        "term",
        F.row_number()
        .over(Window.orderBy(F.col("total").desc(), F.col("term")))
        .alias("rka"),
    ).filter(F.col("rka") <= _RBO_D)
    rb = stats.select(
        "term",
        F.row_number()
        .over(Window.orderBy(F.col("df").desc(), F.col("term")))
        .alias("rkb"),
    ).filter(F.col("rkb") <= _RBO_D)
    joined = (
        ra.join(rb, "term", "full_outer")
        .select(
            F.coalesce("rka", F.lit(_RBO_D + 1)).alias("rka"),
            F.coalesce("rkb", F.lit(_RBO_D + 1)).alias("rkb"),
        )
    )
    xd = (
        spark.range(1, _RBO_D + 1)
        .select(F.col("id").cast("long").alias("d"))
        .crossJoin(F.broadcast(joined))
        .groupBy("d")
        .agg(
            F.sum(
                F.when(
                    (F.col("rka") <= F.col("d")) & (F.col("rkb") <= F.col("d")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("x_d")
        )
    )
    cum_w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    masses = xd.select(
        "d",
        "x_d",
        F.expr("CAST(x_d * 1000000 div d AS BIGINT)").alias("agree_ppm"),
        F.expr(
            f"x_d * ({_RBO_LCM} div d) * shiftleft(CAST(1 AS BIGINT), {_RBO_D} - d)"
        ).alias("_mass"),
    ).select(
        "d", "x_d", "agree_ppm", F.sum("_mass").over(cum_w).alias("_cum_mass")
    )
    return masses.select(
        "d",
        "x_d",
        "agree_ppm",
        F.expr(
            f"CAST(CAST(_cum_mass AS DECIMAL(38,0)) * 1000000"
            f" div (CAST({_RBO_LCM} AS DECIMAL(38,0))"
            f" * shiftleft(CAST(1 AS BIGINT), {_RBO_D})) AS BIGINT)"
        ).alias("rbo_ppm"),
    )


corpus_rank_biased_overlap.__doc__ = corpus_rank_biased_overlap.__doc__.format(
    d=_RBO_D
)


# --------------------------------------------------------------------------
# Exact Mann-Whitney U between finished and open order values
# --------------------------------------------------------------------------

_MW_BUCKET = 100_000  # cents per prefix bucket ($1000): bounded by the domain
# chi-square_1 = z^2 critical value at alpha=0.05: 3.841459
_MW_Z2_CRIT_PPM = 3_841_459

_MW_ORACLE = f"""
    WITH v AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ), lad AS (
      SELECT c, SUM(is_f) AS c_f, SUM(1 - is_f) AS c_o
      FROM v GROUP BY c
    ), cum AS (
      SELECT c, c_f, c_o,
             COALESCE(SUM(c_o) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below_o
      FROM lad
    ), tot AS (
      SELECT SUM(is_f) AS n_f, SUM(1 - is_f) AS n_o,
             SUM(1) AS n
      FROM v
    ), u AS (
      SELECT SUM(c_f::HUGEINT * (2 * below_o + c_o)) AS u2,
             SUM(((c_f + c_o)::HUGEINT * (c_f + c_o) * (c_f + c_o))
                 - (c_f + c_o)) AS s_t
      FROM cum
    )
    SELECT CAST(tot.n_f AS BIGINT) AS n_f, CAST(tot.n_o AS BIGINT) AS n_o,
           CAST(u.u2 AS BIGINT) AS u2,
           CAST(u.u2 * 1000000 // (2::HUGEINT * tot.n_f * tot.n_o) AS BIGINT)
             AS cles_ppm,
           CAST((3::HUGEINT * (u.u2 - tot.n_f * tot.n_o)
                 * (u.u2 - tot.n_f * tot.n_o) * tot.n * (tot.n - 1)) * 1000000
                // (tot.n_f::HUGEINT * tot.n_o
                    * (tot.n::HUGEINT * tot.n * tot.n - tot.n - u.s_t))
                AS BIGINT) AS z2_ppm,
           CAST(CASE WHEN
                  (3::HUGEINT * (u.u2 - tot.n_f * tot.n_o)
                   * (u.u2 - tot.n_f * tot.n_o) * tot.n * (tot.n - 1)) * 1000000
                  // (tot.n_f::HUGEINT * tot.n_o
                      * (tot.n::HUGEINT * tot.n * tot.n - tot.n - u.s_t))
                  > {_MW_Z2_CRIT_PPM} THEN 1 ELSE 0 END AS INTEGER)
             AS reject_5pct
    FROM u, tot
    """


@register("orders_mann_whitney", oracle=_MW_ORACLE)
def orders_mann_whitney(spark, sf_dir):
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between the value
    distributions of finished ('F') and open ('O') orders.  U is kept
    DOUBLED (U2 = 2·Σ_v c_F(v)·(2·C_O(<v) + c_O(v))/2 — i.e. wins count 2,
    ties count 1) so midrank ties stay integral; the common-language
    effect size U/(n_F·n_O) and the tie-corrected z² =
    3·(U2−n_F·n_O)²·n(n−1) / (n_F·n_O·(n³−n−Σ(t³−t))) clear every
    denominator by cross-multiplication — decimal(38) ≙ HUGEINT products,
    one truncating ppm division, and the α=5% verdict compares the
    truncated z2_ppm against χ²₁'s 3.841459 — deterministic cross-engine.
    The nonparametric complement to events_ab_test's parametric z² and
    lineitem_ks_test's whole-distribution D.

    Scale shape: one partial-combined count per distinct cent value; the
    cumulative-below counts come from the two-phase bucket-prefix pattern
    (plans/prefix.py) — the only unpartitioned window runs over the
    bounded $1000-bucket price grid, the within-bucket remainder is a
    partitioned window, and no raw order row crosses a second shuffle.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    v = orders.filter(F.col("o_orderstatus").isin("F", "O")).select(
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_f"),
    )
    lad = v.groupBy("c").agg(
        F.sum("is_f").alias("c_f"), F.sum(F.lit(1) - F.col("is_f")).alias("c_o")
    )
    # Two-phase bucket prefix ($1000 buckets over the cent ladder): the
    # only global window runs over the bounded price-domain grid; the
    # ladder itself is ~one row per order at these SFs and must never
    # cross a single-partition window.
    from kafka_sink_spark.plans.prefix import with_exclusive_prefix

    cum = with_exclusive_prefix(
        lad, "c", {"below_o": "c_o"}, bucket_size=100_000
    )
    tot = v.agg(
        F.sum("is_f").cast("long").alias("n_f"),
        F.sum(F.lit(1) - F.col("is_f")).cast("long").alias("n_o"),
        F.count("*").cast("long").alias("n"),
    )
    u = cum.agg(
        F.sum(
            F.expr("CAST(c_f AS DECIMAL(38,0)) * (2 * below_o + c_o)")
        ).alias("u2"),
        F.sum(
            F.expr(
                "CAST(c_f + c_o AS DECIMAL(38,0)) * (c_f + c_o) * (c_f + c_o)"
                " - (c_f + c_o)"
            )
        ).alias("s_t"),
    )
    z2_num = (
        "(CAST(3 AS DECIMAL(38,0)) * (u2 - CAST(n_f AS DECIMAL(38,0)) * n_o)"
        " * (u2 - CAST(n_f AS DECIMAL(38,0)) * n_o) * n * (n - 1)) * 1000000"
    )
    z2_den = (
        "(CAST(n_f AS DECIMAL(38,0)) * n_o"
        " * (CAST(n AS DECIMAL(38,0)) * n * n - n - s_t))"
    )
    return u.crossJoin(F.broadcast(tot)).select(
        "n_f",
        "n_o",
        F.col("u2").cast("long").alias("u2"),
        F.expr(
            "CAST(u2 * 1000000 div (CAST(2 AS DECIMAL(38,0)) * n_f * n_o)"
            " AS BIGINT)"
        ).alias("cles_ppm"),
        F.expr(f"CAST({z2_num} div {z2_den} AS BIGINT)").alias("z2_ppm"),
        F.expr(
            f"CAST(CASE WHEN {z2_num} div {z2_den} > {_MW_Z2_CRIT_PPM}"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("reject_5pct"),
    )


# --------------------------------------------------------------------------
# MATTR: moving-average type-token ratio per document
# --------------------------------------------------------------------------

_MATTR_W = 25  # token window (Covington & McFall use 10-100; 25 fits the corpus)

_MATTR_ORACLE = rf"""
    WITH arr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, CAST(u.p AS BIGINT) AS p, t[u.p + 1] AS term
      FROM arr, unnest(range(len(t))) AS u(p)
    ), lens AS (
      SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id
    ), lagged AS (
      SELECT t.doc_id, t.p,
             lag(t.p) OVER (PARTITION BY t.doc_id, t.term ORDER BY t.p) AS q
      FROM toks t
    ), contrib AS (
      SELECT l.doc_id, lens.len,
             LEAST({_MATTR_W}, lens.len) AS win_len,
             lens.len - LEAST({_MATTR_W}, lens.len) + 1 AS n_windows,
             GREATEST(0,
               LEAST(l.p, lens.len - LEAST({_MATTR_W}, lens.len))
               - GREATEST(0, l.p - LEAST({_MATTR_W}, lens.len) + 1,
                          COALESCE(l.q, -1) + 1)
               + 1) AS c
      FROM lagged l JOIN lens ON lens.doc_id = l.doc_id
    )
    SELECT doc_id, CAST(len AS BIGINT) AS n_tokens,
           CAST(win_len AS BIGINT) AS win_len,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST(SUM(c) AS BIGINT) AS distinct_mass,
           CAST(SUM(c) * 1000000 // (win_len * n_windows) AS BIGINT)
             AS mattr_ppm
    FROM contrib
    GROUP BY doc_id, len, win_len, n_windows
    """


@register("docs_mattr", oracle=_MATTR_ORACLE)
def docs_mattr(spark, sf_dir):
    """Moving-Average Type-Token Ratio (Covington & McFall 2010): the mean
    type/token ratio over every {w}-token sliding window — the lexical-
    diversity measure that, unlike raw TTR, does not collapse with
    document length.  The naive cost is O(L·W) distinct-counts; the exact
    rewrite here is O(L): a token instance at position p whose previous
    occurrence sits at q is the window-first occurrence for EXACTLY the
    window starts in [max(0, p−W+1, q+1), min(p, L−W)] (the window must
    still contain p and must exclude q), so summing that per-instance
    count equals Σ_windows distinct(window), and MATTR =
    mass/(W·n_windows) in exact ppm.  Documents shorter than the window degrade to plain TTR
    (win_len = L, one window) under the same formula.

    Scale shape: one posexplode + ONE (doc, term)-keyed lag window + a
    partial-combined per-doc rollup — the same single-exchange budget as
    any per-doc sequence feature; no window materializes W-sized state.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id", F.posexplode(text_ops.tokens(F.col("text"))).alias("p", "term")
    )
    lens = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("len"))
    lag_w = Window.partitionBy("doc_id", "term").orderBy("p")
    lagged = toks.select(
        "doc_id", "p", F.lag("p").over(lag_w).alias("q")
    )
    contrib = lagged.join(lens, "doc_id").select(
        "doc_id",
        "len",
        F.expr(f"LEAST(CAST({_MATTR_W} AS BIGINT), len)").alias("win_len"),
        F.expr(
            f"len - LEAST(CAST({_MATTR_W} AS BIGINT), len) + 1"
        ).alias("n_windows"),
        F.expr(
            f"GREATEST(0,"
            f" LEAST(CAST(p AS BIGINT),"
            f" len - LEAST(CAST({_MATTR_W} AS BIGINT), len))"
            f" - GREATEST(CAST(0 AS BIGINT),"
            f" p - LEAST(CAST({_MATTR_W} AS BIGINT), len) + 1,"
            f" COALESCE(q, -1) + 1)"
            f" + 1)"
        ).alias("c"),
    )
    return contrib.groupBy("doc_id", "len", "win_len", "n_windows").agg(
        F.sum("c").cast("long").alias("distinct_mass")
    ).select(
        "doc_id",
        F.col("len").alias("n_tokens"),
        "win_len",
        "n_windows",
        "distinct_mass",
        F.expr(
            "CAST(distinct_mass * 1000000 div (win_len * n_windows) AS BIGINT)"
        ).alias("mattr_ppm"),
    )


docs_mattr.__doc__ = docs_mattr.__doc__.format(w=_MATTR_W)


# --------------------------------------------------------------------------
# Exact maximum-inner-product top-k retrieval
# --------------------------------------------------------------------------

_MIPS_QUERIES = 10
_MIPS_K = 5

_MIPS_ORACLE = f"""
    WITH comp AS (
      SELECT vec_id AS vid, i.i,
             CAST(round(embedding[i.i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS xm
      FROM embeddings, (SELECT unnest(range(64)) AS i) i
    ), dots AS (
      SELECT q.vid AS query_id, c.vid AS neighbor_id,
             SUM(q.xm::HUGEINT * c.xm) AS dot_fix
      FROM comp q JOIN comp c ON c.i = q.i AND c.vid <> q.vid
      WHERE q.vid < {_MIPS_QUERIES}
      GROUP BY q.vid, c.vid
    )
    SELECT query_id, neighbor_id, CAST(dot_fix AS BIGINT) AS dot_fix,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT query_id, neighbor_id, dot_fix,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot_fix DESC, neighbor_id) AS rank
      FROM dots)
    WHERE rank <= {_MIPS_K}
    """


@register("knn_mips", oracle=_MIPS_ORACLE)
def knn_mips(spark, sf_dir):
    """Exact maximum-inner-product top-{k} retrieval for {q} query vectors
    — the objective of dot-product-trained retrieval embeddings (DPR-style
    biencoders), where neither L2 nor cosine ranking is equivalent because
    document norms carry signal.  Inner products are exact fixed-point
    integers (micro-unit components, decimal(38) partial sums); ranking is
    deterministic (dot desc, neighbor_id asc).

    Scale shape: the query side is {q} vectors broadcast as component
    rows; the corpus is scanned ONCE with a partial-aggregated per-(query,
    vector) dot product, and the per-query top-{k} plans as
    WindowGroupLimit (O(k) per task).  At 100 TB the same plan takes the
    MIPS-to-L2 reduction (augment with ‖x‖² components) through the IVF-PQ
    index already in the catalog — this query is the exact ground truth
    that path is measured against.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    comp = emb.select(
        F.col("vec_id").alias("vid"), F.posexplode("embedding").alias("i", "x")
    ).select(
        "vid",
        "i",
        F.round(F.col("x").cast("double") * 1_000_000.0).cast("bigint").alias("xm"),
    )
    q = comp.filter(F.col("vid") < _MIPS_QUERIES).select(
        F.col("vid").alias("query_id"), "i", F.col("xm").alias("qxm")
    )
    dots = (
        comp.join(F.broadcast(q), "i")
        .filter(F.col("vid") != F.col("query_id"))
        .groupBy("query_id", F.col("vid").alias("neighbor_id"))
        .agg(
            F.sum(F.expr("CAST(qxm AS DECIMAL(38,0)) * xm")).alias("dot_dec")
        )
    )
    ranked = dots.select(
        "query_id",
        "neighbor_id",
        F.col("dot_dec").cast("long").alias("dot_fix"),
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.col("dot_dec").desc(), F.col("neighbor_id")
            )
        )
        .cast("int")
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= _MIPS_K)


knn_mips.__doc__ = knn_mips.__doc__.format(q=_MIPS_QUERIES, k=_MIPS_K)


# --------------------------------------------------------------------------
# Streaming HLL register build, certified via a REAL availableNow replay
# --------------------------------------------------------------------------

_STREAM_HLL_RUNS = iter(range(1_000_000))

_STREAM_HLL_ORACLE = """
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM events
    ), r AS (
      SELECT event_type, hv // (1::BIGINT << 54) AS idx,
             CASE WHEN hv % (1::BIGINT << 54) = 0 THEN 55
                  ELSE 55 - length(bin(hv % (1::BIGINT << 54))) END AS rho
      FROM h
    )
    SELECT event_type, CAST(idx AS BIGINT) AS idx,
           CAST(MAX(rho) AS BIGINT) AS reg
    FROM r GROUP BY event_type, idx
    """


@register("stream_hll_twin", oracle=_STREAM_HLL_ORACLE)
def stream_hll_twin(spark, sf_dir):
    """The STREAMING HyperLogLog register build (streaming/analytics.py
    hll_register_stream), certified by executing the real streaming query:
    the events table replays through a file stream with
    ``trigger(availableNow=True)`` in update mode, and the per-register
    max emission (ranks are monotone) must equal the batch register table
    — together with ``events_hll_estimate`` (which reads registers out
    into the estimate vs ground truth) this certifies the full sketch
    lifecycle under micro-batch semantics, the same two-piece discipline
    as the Count-Min pair.

    Scale shape: streaming state is exactly |types|×64 register rows —
    constant in stream length and key cardinality; the only shuffle is
    the (type, idx) exchange of any streaming aggregation.
    """
    import tempfile

    from kafka_sink_spark.streaming.analytics import hll_register_stream

    events = load_tables(spark, sf_dir, ("events",))["events"]
    src = tempfile.mkdtemp(prefix="stream_hll_src_")
    events.select("event_type", "user_id").write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("event_type string, user_id long").parquet(src)
    name = f"stream_hll_twin_{next(_STREAM_HLL_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_hll_ck_")
    q = (
        hll_register_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    result = (
        spark.table(name)
        .groupBy("event_type", "idx")
        .agg(F.max("reg").cast("long").alias("reg"))
        .select("event_type", F.col("idx").cast("long").alias("idx"), "reg")
    )
    return finish_stream_twin(spark, q, name, result, (src, ck))
