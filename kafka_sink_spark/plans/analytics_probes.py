"""Round-7a wave: five more published large-scale analytics techniques in
the catalog's exact-integer, oracle-twinned style — a cardinality sketch,
a distribution test, a time-series probe, a dimensionality-reduction
harness, and a corpus burstiness measure.

- ``events_hll_estimate``  HyperLogLog (Flajolet et al. 2007) distinct-user
  estimation per event type with md5-derived register hashes, evaluated
  against the exact distinct count.  The whole estimator is EXACT dyadic
  arithmetic: registers hold leading-zero ranks, the harmonic sum
  Σ 2^{-reg} is scaled by 2^60 into exact integers, and the raw estimate
  α·m²·2^60/S is one decimal(38) division — no floats, no transcendentals
  (the small-range linear-counting correction needs ln and is deliberately
  omitted; the zero-register count V is emitted so a reader can apply it).
- ``lineitem_ks_test``  exact two-sample Kolmogorov-Smirnov statistic
  (returned vs normal-status quantities): D = max |F̂_R − F̂_N| computed as
  max |C_R·n_N − C_N·n_R| over the merged distinct-value ladder — exact
  cross-multiplied integers, with the α=5% decision c=1.358 squared into a
  ppm compare (the same trick as events_ab_test's z²).
- ``events_autocorrelation``  sample autocorrelation r_k (k=1..3) per event
  type in exact integers: with S=Σx, Q=Σx², P_k=Σx_t·x_{t+k} and the
  head/tail sums, n²·num_k and n·den clear every x̄ denominator, so r_k
  emits as one signed ppm division of exact decimal(38) products.
- ``embedding_jl_distortion``  Johnson-Lindenstrauss random-signs
  projection (Achlioptas 2003): 64-dim embeddings × a deterministic
  md5-parity ±1 matrix → 16-dim codes; for sample pairs the projected
  squared distance over k·d²_orig is emitted in ppm — the distortion the
  JL lemma bounds, certified against a brute-force oracle.
- ``docs_term_dispersion``  corpus burstiness (Church & Gale 1995): per
  frequent term, the variance-to-mean ratio of per-document counts with
  zeros included — VMR = (N·Q − T²)/(N·T) exact — separating bursty
  content words (VMR ≫ 1) from uniformly sprinkled function words.

Determinism per the package convention: 60-bit md5 hashes via
``CAST(conv(substr(md5,1,15),16,10) AS BIGINT)`` ⇔
``('0x'||substr(md5,1,15))::BIGINT``, integer arithmetic end-to-end,
sign-split truncating division for signed ppm (Spark ``div`` truncates
toward zero, DuckDB ``//`` floors — they agree only on non-negatives),
``bin()`` lengths for exact floor-log2.

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
# HyperLogLog distinct-user estimate per event type
# --------------------------------------------------------------------------

_HLL_M = 64  # registers (b=6 index bits off a 60-bit md5 hash)
# alpha_64 = 0.709 (Flajolet et al. 2007, Fig. 3 constants): kept as the
# exact rational 709/1000 so the estimate is one integer division.
_HLL_ALPHA_NUM = 709
_HLL_ALPHA_DEN = 1000

_HLL_ORACLE = f"""
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
    ), regs AS (
      SELECT event_type, idx, MAX(rho) AS reg
      FROM r GROUP BY event_type, idx
    ), grid AS (
      SELECT t.event_type, g.j, COALESCE(regs.reg, 0) AS reg
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(range({_HLL_M})) AS j) g
      LEFT JOIN regs ON regs.event_type = t.event_type AND regs.idx = g.j
    ), s AS (
      SELECT event_type,
             SUM(((1::BIGINT << (60 - reg)))::HUGEINT) AS harmonic,
             SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS n_zero_regs
      FROM grid GROUP BY event_type
    ), ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, CAST({_HLL_M} AS BIGINT) AS m,
           CAST(s.n_zero_regs AS BIGINT) AS n_zero_regs,
           CAST(ex.exact_users AS BIGINT) AS exact_users,
           CAST(({_HLL_ALPHA_NUM}::HUGEINT * {_HLL_M} * {_HLL_M}
                 * (1::BIGINT << 60))
                // ({_HLL_ALPHA_DEN}::HUGEINT * s.harmonic) AS BIGINT)
             AS hll_est,
           CAST(CASE WHEN est.v >= ex.exact_users
                     THEN (est.v - ex.exact_users) * 1000000 // ex.exact_users
                     ELSE -((ex.exact_users - est.v) * 1000000 // ex.exact_users)
                END AS BIGINT) AS err_ppm
    FROM s JOIN ex ON ex.event_type = s.event_type,
    LATERAL (SELECT CAST(({_HLL_ALPHA_NUM}::HUGEINT * {_HLL_M} * {_HLL_M}
                          * (1::BIGINT << 60))
                         // ({_HLL_ALPHA_DEN}::HUGEINT * s.harmonic) AS BIGINT)
                      AS v) est
    """


@register("events_hll_estimate", oracle=_HLL_ORACLE)
def events_hll_estimate(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event type, evaluated against
    ground truth.  Each user hashes to a 60-bit md5 integer; the top 6 bits
    pick one of m=64 registers and the register keeps the maximum
    leading-zero rank ρ = 55 − bitlen(low 54 bits) — computed exactly via
    ``length(bin(w))``, no float log anywhere.  The raw HLL estimator
    α₆₄·m²/Σ2^{−reg} is evaluated in exact integers by scaling the harmonic
    sum with 2^60 (Σ 2^{60−reg} ≤ m·2^60 rides HUGEINT ⇔ decimal(38)) and
    α₆₄ as the rational 709/1000.  The signed error vs the exact distinct
    count is emitted in sign-split-truncated ppm.  Linear-counting small-
    range correction is omitted (it needs ln); n_zero_regs is emitted so
    the read-out can apply it — at production load V=0 and raw IS the
    estimator.

    Scale shape: the sketch state is m rows per event type NO MATTER the
    stream length — groupBy(type, idx) max with map-side partial combine is
    the whole build; the 64-row-per-type grid fan-in and the estimate are
    driver-trivial.  This is the mergeable-across-shards cardinality
    companion to the KMV estimator (shingle_kmv_estimate) and the Count-Min
    frequency sketch already in the catalog.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    h = events.select(
        "event_type",
        "user_id",
        F.expr(
            "CAST(conv(substr(md5(concat('hll:', CAST(user_id AS STRING))), 1, 15),"
            " 16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    r = h.select(
        "event_type",
        F.expr("hv div shiftleft(CAST(1 AS BIGINT), 54)").alias("idx"),
        F.expr(
            "CASE WHEN hv % shiftleft(CAST(1 AS BIGINT), 54) = 0 THEN 55"
            " ELSE 55 - length(bin(hv % shiftleft(CAST(1 AS BIGINT), 54))) END"
        ).alias("rho"),
    )
    regs = r.groupBy("event_type", "idx").agg(F.max("rho").alias("reg"))
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(_HLL_M).select(F.col("id").cast("long").alias("j"))
            )
        )
        .join(
            regs.withColumnRenamed("idx", "j"),
            ["event_type", "j"],
            "left",
        )
        .select("event_type", "j", F.coalesce("reg", F.lit(0)).alias("reg"))
    )
    s = grid.groupBy("event_type").agg(
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), 60 - reg) AS DECIMAL(38,0))"
            )
        ).alias("harmonic"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_regs"),
    )
    ex = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    )
    est_expr = (
        f"CAST((CAST({_HLL_ALPHA_NUM} AS DECIMAL(38,0)) * {_HLL_M} * {_HLL_M}"
        f" * shiftleft(CAST(1 AS BIGINT), 60))"
        f" div (CAST({_HLL_ALPHA_DEN} AS DECIMAL(38,0)) * harmonic) AS BIGINT)"
    )
    return (
        s.join(ex, "event_type")
        .select(
            "event_type",
            F.lit(_HLL_M).cast("long").alias("m"),
            "n_zero_regs",
            "exact_users",
            F.expr(est_expr).alias("hll_est"),
        )
        .select(
            "event_type",
            "m",
            "n_zero_regs",
            "exact_users",
            "hll_est",
            F.expr(
                "CAST(CASE WHEN hll_est >= exact_users"
                " THEN (hll_est - exact_users) * 1000000 div exact_users"
                " ELSE -((exact_users - hll_est) * 1000000 div exact_users)"
                " END AS BIGINT)"
            ).alias("err_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov test
# --------------------------------------------------------------------------

# c(alpha=0.05) = 1.358; compared squared in ppm: c^2 = 1.844164
_KS_C2_PPM = 1_844_164

_KS_ORACLE = f"""
    WITH v AS (
      SELECT CAST(FLOOR(l_quantity * 100) AS BIGINT) AS q,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ), c AS (
      SELECT q, SUM(is_r) AS c_r, SUM(1 - is_r) AS c_n
      FROM v GROUP BY q
    ), cum AS (
      SELECT q,
             SUM(c_r) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS cum_r,
             SUM(c_n) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS cum_n
      FROM c
    ), tot AS (
      SELECT SUM(is_r) AS n_r, SUM(1 - is_r) AS n_n FROM v
    )
    SELECT CAST(tot.n_r AS BIGINT) AS n_r, CAST(tot.n_n AS BIGINT) AS n_n,
           CAST(MAX(ABS(cum.cum_r * tot.n_n - cum.cum_n * tot.n_r)) AS BIGINT)
             AS d_num,
           CAST(MAX(ABS(cum.cum_r * tot.n_n - cum.cum_n * tot.n_r)) * 1000000
                // (tot.n_r * tot.n_n) AS BIGINT) AS d_ppm,
           CAST(CASE WHEN
                  CAST(MAX(ABS(cum.cum_r * tot.n_n - cum.cum_n * tot.n_r))
                       * 1000000 // (tot.n_r * tot.n_n) AS HUGEINT)
                  * (MAX(ABS(cum.cum_r * tot.n_n - cum.cum_n * tot.n_r))
                     * 1000000 // (tot.n_r * tot.n_n))
                  * tot.n_r * tot.n_n
                  > {_KS_C2_PPM}::HUGEINT * (tot.n_r + tot.n_n) * 1000000
                THEN 1 ELSE 0 END AS INTEGER) AS reject_5pct
    FROM cum, tot
    GROUP BY tot.n_r, tot.n_n
    """


@register("lineitem_ks_test", oracle=_KS_ORACLE)
def lineitem_ks_test(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov statistic between the quantity
    distributions of returned ('R') and normal ('N') line items:
    D = max over the merged value ladder of |F̂_R − F̂_N|, computed as
    max |C_R·n_N − C_N·n_R| in exact cross-multiplied integers (never a
    float ECDF), emitted in ppm with the α=5% decision taken by comparing
    d_ppm²·n_R·n_N against c²·(n_R+n_N)·10⁶ (c=1.358) — the truncation of
    d_ppm happens identically in both engines, so the verdict bit is
    deterministic.

    Scale shape: one partial-combined count per distinct quantity value
    (the ladder is ~100 cents-valued rungs — BOUNDED by the domain, not the
    data), one single-partition cumulative over those bounded rungs, one
    broadcast totals row.  The canonical distribution-drift gate between
    two corpus slices at any scale.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    v = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.expr("CAST(FLOOR(l_quantity * 100) AS BIGINT)").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_r"),
    )
    c = v.groupBy("q").agg(
        F.sum("is_r").alias("c_r"), F.sum(F.lit(1) - F.col("is_r")).alias("c_n")
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        "q",
        F.sum("c_r").over(w).alias("cum_r"),
        F.sum("c_n").over(w).alias("cum_n"),
    )
    tot = v.agg(
        F.sum("is_r").cast("long").alias("n_r"),
        F.sum(F.lit(1) - F.col("is_r")).cast("long").alias("n_n"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n_r",
            "n_n",
            F.abs(
                F.col("cum_r") * F.col("n_n") - F.col("cum_n") * F.col("n_r")
            ).alias("gap"),
        )
        .groupBy("n_r", "n_n")
        .agg(F.max("gap").cast("long").alias("d_num"))
    )
    return d.select(
        "n_r",
        "n_n",
        "d_num",
        F.expr("CAST(d_num * 1000000 div (n_r * n_n) AS BIGINT)").alias("d_ppm"),
        F.expr(
            "CAST(CASE WHEN"
            " CAST(d_num * 1000000 div (n_r * n_n) AS DECIMAL(38,0))"
            " * (d_num * 1000000 div (n_r * n_n)) * n_r * n_n"
            f" > CAST({_KS_C2_PPM} AS DECIMAL(38,0)) * (n_r + n_n) * 1000000"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("reject_5pct"),
    )


# --------------------------------------------------------------------------
# Exact sample autocorrelation per event type (lags 1..3)
# --------------------------------------------------------------------------

_ACF_LAGS = 3


def _acf_oracle(lags: int = _ACF_LAGS) -> str:
    leads = ",\n             ".join(
        f"lead(xm, {k}) OVER w AS x{k}" for k in range(1, lags + 1)
    )
    per_k = []
    for k in range(1, lags + 1):
        per_k.append(
            f"SUM(CASE WHEN x{k} IS NULL THEN 0"
            f" ELSE xm::HUGEINT * x{k} END) AS p{k},"
            f" SUM(CASE WHEN x{k} IS NULL THEN 0 ELSE xm END) AS h{k},"
            f" SUM(CASE WHEN x{k} IS NULL THEN 0 ELSE x{k} END) AS t{k},"
            f" SUM(CASE WHEN x{k} IS NULL THEN 0 ELSE 1 END) AS np{k}"
        )
    aggs = ",\n             ".join(per_k)
    rows = []
    for k in range(1, lags + 1):
        num = (
            f"(n::HUGEINT * n * p{k} - n::HUGEINT * s * (h{k} + t{k})"
            f" + (n - {k})::HUGEINT * s * s)"
        )
        den = "(n::HUGEINT * (n::HUGEINT * q2 - s::HUGEINT * s))"
        rows.append(
            f"SELECT event_type, CAST({k} AS BIGINT) AS lag,"
            f" CAST(np{k} AS BIGINT) AS n_pairs,"
            f" CAST(CASE WHEN {num} >= 0"
            f" THEN ({num} * 1000000) // {den}"
            f" ELSE -((-({num}) * 1000000) // {den}) END AS BIGINT) AS r_ppm"
            f" FROM agg"
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
    WITH b AS (
      SELECT event_type, event_id, ts,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS xm
      FROM events
    ), l AS (
      SELECT event_type, xm,
             {leads}
      FROM b
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), agg AS (
      SELECT event_type,
             COUNT(*) AS n, SUM(xm) AS s,
             SUM(xm::HUGEINT * xm) AS q2,
             {aggs}
      FROM l GROUP BY event_type
    )
    {union}
    """


@register("events_autocorrelation", oracle=_acf_oracle())
def events_autocorrelation(spark, sf_dir):
    """Sample autocorrelation r_k (k = 1..{lags}) of the time-ordered value
    series per event type, in EXACT integers: with S=Σx, Q=Σx²,
    P_k=Σx_t·x_{{t+k}} and head/tail sums H_k, T_k over the overlapping
    window, the textbook r_k = Σ(x_t−x̄)(x_{{t+k}}−x̄) / Σ(x_t−x̄)² clears
    its x̄ = S/n denominators by cross-multiplying with n²:
    r_k = (n²P_k − nS(H_k+T_k) + (n−k)S²) / (n(nQ − S²)) — every product
    rides decimal(38,0) ≙ HUGEINT and the single division is sign-split
    truncating ppm.  White noise ⇒ r_k ≈ 0; the seasonality/trend probe
    complementing the CUSUM (location), runs (randomness) and EWMA
    (smoothing) screens.

    Scale shape: ONE type-keyed ordered window materializes the {lags}
    leads (the same single exchange every per-type sequence feature pays),
    then a partial-combined per-type rollup; the lag union is a projection
    of that 5-row aggregate.  No joins, no global sort.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    b = events.select(
        "event_type",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("xm"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    led = b.select(
        "event_type",
        "xm",
        *[F.lead("xm", k).over(w).alias(f"x{k}") for k in range(1, _ACF_LAGS + 1)],
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum("xm").cast("long").alias("s"),
        F.sum(F.expr(dec.format("xm") + " * xm")).alias("q2"),
    ]
    for k in range(1, _ACF_LAGS + 1):
        aggs += [
            F.sum(
                F.when(F.col(f"x{k}").isNull(), F.lit(0).cast("decimal(38,0)"))
                .otherwise(F.expr(dec.format("xm") + f" * x{k}"))
            ).alias(f"p{k}"),
            F.sum(F.when(F.col(f"x{k}").isNull(), 0).otherwise(F.col("xm")))
            .cast("long")
            .alias(f"h{k}"),
            F.sum(F.coalesce(F.col(f"x{k}"), F.lit(0))).cast("long").alias(f"t{k}"),
            F.sum(F.when(F.col(f"x{k}").isNull(), 0).otherwise(1))
            .cast("long")
            .alias(f"np{k}"),
        ]
    agg = led.groupBy("event_type").agg(*aggs)
    parts = []
    for k in range(1, _ACF_LAGS + 1):
        num = (
            f"(CAST(n AS DECIMAL(38,0)) * n * p{k}"
            f" - CAST(n AS DECIMAL(38,0)) * s * (h{k} + t{k})"
            f" + CAST(n - {k} AS DECIMAL(38,0)) * s * s)"
        )
        den = (
            "(CAST(n AS DECIMAL(38,0))"
            " * (CAST(n AS DECIMAL(38,0)) * q2 - CAST(s AS DECIMAL(38,0)) * s))"
        )
        parts.append(
            agg.select(
                "event_type",
                F.lit(k).cast("long").alias("lag"),
                F.col(f"np{k}").alias("n_pairs"),
                F.expr(
                    f"CAST(CASE WHEN {num} >= 0"
                    f" THEN ({num} * 1000000) div {den}"
                    f" ELSE -((-({num}) * 1000000) div {den}) END AS BIGINT)"
                ).alias("r_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


events_autocorrelation.__doc__ = events_autocorrelation.__doc__.format(
    lags=_ACF_LAGS
)


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random-signs projection distortion
# --------------------------------------------------------------------------

_JL_K = 16  # target dimensions
_JL_D = 64  # source dimensions
_JL_PAIR_IDS = 10  # distortion evaluated over C(10,2) = 45 sample pairs

_JL_ORACLE = f"""
    WITH signs AS (
      SELECT i.i, j.j,
             CASE WHEN ('0x' || substr(md5('jl:' || CAST(i.i AS VARCHAR) || ':'
                          || CAST(j.j AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM (SELECT unnest(range({_JL_D})) AS i) i
      CROSS JOIN (SELECT unnest(range({_JL_K})) AS j) j
    ), comp AS (
      SELECT vec_id AS vid, i.i,
             CAST(round(embedding[i.i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS xm
      FROM embeddings, (SELECT unnest(range({_JL_D})) AS i) i
      WHERE vec_id < {_JL_PAIR_IDS}
    ), proj AS (
      SELECT comp.vid, signs.j, SUM(comp.xm * signs.s) AS y
      FROM comp JOIN signs ON signs.i = comp.i
      GROUP BY comp.vid, signs.j
    ), d_orig AS (
      SELECT a.vid AS vid_a, b.vid AS vid_b,
             SUM((a.xm - b.xm)::HUGEINT * (a.xm - b.xm)) AS d2_orig
      FROM comp a JOIN comp b ON a.i = b.i AND a.vid < b.vid
      GROUP BY a.vid, b.vid
    ), d_proj AS (
      SELECT a.vid AS vid_a, b.vid AS vid_b,
             SUM((a.y - b.y)::HUGEINT * (a.y - b.y)) AS d2_proj
      FROM proj a JOIN proj b ON a.j = b.j AND a.vid < b.vid
      GROUP BY a.vid, b.vid
    )
    SELECT o.vid_a, o.vid_b,
           CAST(o.d2_orig AS BIGINT) AS d2_orig,
           CAST(p.d2_proj AS BIGINT) AS d2_proj,
           CAST(p.d2_proj * 1000000 // ({_JL_K}::HUGEINT * o.d2_orig) AS BIGINT)
             AS ratio_ppm
    FROM d_orig o JOIN d_proj p
      ON p.vid_a = o.vid_a AND p.vid_b = o.vid_b
    WHERE o.d2_orig > 0
    """


@register("embedding_jl_distortion", oracle=_JL_ORACLE)
def embedding_jl_distortion(spark, sf_dir):
    """Johnson-Lindenstrauss dimensionality reduction with a DETERMINISTIC
    random-signs matrix (Achlioptas 2003: ±1 entries work as well as
    Gaussians): s_ij = ±1 from md5 parity, y_j = Σ_i s_ij·x_i maps 64-dim
    embeddings to 16-dim integer codes with E‖Δy‖² = k·‖Δx‖².  For the
    C({q},2) sample pairs the ratio ‖Δy‖²/(k·‖Δx‖²) is emitted in exact
    ppm — the per-pair distortion whose concentration around 1e6 is what
    the JL lemma guarantees, here certified against the brute-force oracle.

    Scale shape: the projection is corpus-linear — component rows × a
    BROADCAST {d}×{k} sign table, partial-combined per (vector, j); at
    100 TB this is THE standard first stage before any ANN index (4×
    fewer dimensions = 4× cheaper distance math downstream, composable
    with the PQ compression already in the catalog).  Pair scoring touches
    only the sampled query rows.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    sample = emb.filter(F.col("vec_id") < _JL_PAIR_IDS)
    comp = sample.select(
        F.col("vec_id").alias("vid"),
        F.posexplode("embedding").alias("i", "x"),
    ).select(
        "vid",
        "i",
        F.round(F.col("x").cast("double") * 1_000_000.0).cast("bigint").alias("xm"),
    )
    signs = (
        spark.range(_JL_D)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(spark.range(_JL_K).select(F.col("id").cast("int").alias("j")))
        .select(
            "i",
            "j",
            F.expr(
                "CASE WHEN CAST(conv(substr(md5(concat('jl:', CAST(i AS STRING),"
                " ':', CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2 = 0"
                " THEN 1 ELSE -1 END"
            ).alias("s"),
        )
    )
    proj = (
        comp.join(F.broadcast(signs), "i")
        .groupBy("vid", "j")
        .agg(F.sum(F.col("xm") * F.col("s")).alias("y"))
    )
    d_orig = (
        comp.alias("a")
        .join(
            comp.alias("b"),
            (F.col("a.i") == F.col("b.i")) & (F.col("a.vid") < F.col("b.vid")),
        )
        .groupBy(
            F.col("a.vid").alias("vid_a"), F.col("b.vid").alias("vid_b")
        )
        .agg(
            F.sum(
                F.expr("CAST(a.xm - b.xm AS DECIMAL(38,0)) * (a.xm - b.xm)")
            ).alias("d2_orig")
        )
    )
    d_proj = (
        proj.alias("a")
        .join(
            proj.alias("b"),
            (F.col("a.j") == F.col("b.j")) & (F.col("a.vid") < F.col("b.vid")),
        )
        .groupBy(
            F.col("a.vid").alias("vid_a"), F.col("b.vid").alias("vid_b")
        )
        .agg(
            F.sum(
                F.expr("CAST(a.y - b.y AS DECIMAL(38,0)) * (a.y - b.y)")
            ).alias("d2_proj")
        )
    )
    return (
        d_orig.join(d_proj, ["vid_a", "vid_b"])
        .filter(F.col("d2_orig") > 0)
        .select(
            "vid_a",
            "vid_b",
            F.col("d2_orig").cast("long").alias("d2_orig"),
            F.col("d2_proj").cast("long").alias("d2_proj"),
            F.expr(
                f"CAST(d2_proj * 1000000 div (CAST({_JL_K} AS DECIMAL(38,0))"
                " * d2_orig) AS BIGINT)"
            ).alias("ratio_ppm"),
        )
    )


embedding_jl_distortion.__doc__ = embedding_jl_distortion.__doc__.format(
    q=_JL_PAIR_IDS, d=_JL_D, k=_JL_K
)


# --------------------------------------------------------------------------
# Term burstiness: variance-to-mean dispersion with zeros included
# --------------------------------------------------------------------------

_DISP_TOPK = 100  # emitted terms, ranked by total count
_DISP_MIN_DF = 5  # ignore terms in fewer docs (VMR of rare terms is noise)

_DISP_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), per_doc AS (
      SELECT term, doc_id, COUNT(*) AS c
      FROM toks GROUP BY term, doc_id
    ), stats AS (
      SELECT term, COUNT(*) AS df, SUM(c) AS total,
             SUM(c::HUGEINT * c) AS q
      FROM per_doc GROUP BY term
      HAVING COUNT(*) >= {_DISP_MIN_DF}
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), ranked AS (
      SELECT term, df, total, q,
             row_number() OVER (ORDER BY total DESC, term) AS rk
      FROM stats
    )
    SELECT CAST(rk AS BIGINT) AS rk, term,
           CAST(df AS BIGINT) AS df, CAST(total AS BIGINT) AS total,
           CAST((n.n_docs::HUGEINT * q - total::HUGEINT * total) * 1000000
                // (n.n_docs::HUGEINT * total) AS BIGINT) AS vmr_ppm
    FROM ranked, n
    WHERE rk <= {_DISP_TOPK}
    """


@register("docs_term_dispersion", oracle=_DISP_ORACLE)
def docs_term_dispersion(spark, sf_dir):
    """Corpus burstiness (Church & Gale 1995): for the top-{k} terms by
    collection frequency, the variance-to-mean ratio of per-document counts
    WITH zeros included — VMR = (N·Σc² − T²)/(N·T) in exact integers (the
    zeros enter through N without materializing a single zero row).
    Poisson-sprinkled function words sit at VMR ≈ 1e6 ppm; bursty content
    words blow past it — the standard topicality signal for keyword
    extraction and stop-word discovery, complementing the tf-idf ranking
    (docs_keyword_topk) with a second, frequency-profile axis.

    Scale shape: one tokenize+explode, a partial-combined (term, doc)
    count, a partial-combined per-term rollup, a 1-row broadcast, and a
    rank-filter top-{k} the optimizer executes as WindowGroupLimit —
    per-task state is O(k), never the vocabulary.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id", F.explode(text_ops.tokens(F.col("text"))).alias("term")
    )
    per_doc = toks.groupBy("term", "doc_id").agg(F.count("*").alias("c"))
    stats = (
        per_doc.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("c").cast("long").alias("total"),
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("q"),
        )
        .filter(F.col("df") >= _DISP_MIN_DF)
    )
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    ranked = stats.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("total").desc(), F.col("term")))
        .cast("long")
        .alias("rk"),
    ).filter(F.col("rk") <= _DISP_TOPK)
    return ranked.crossJoin(F.broadcast(n)).select(
        "rk",
        "term",
        "df",
        "total",
        F.expr(
            "CAST((CAST(n_docs AS DECIMAL(38,0)) * q"
            " - CAST(total AS DECIMAL(38,0)) * total) * 1000000"
            " div (CAST(n_docs AS DECIMAL(38,0)) * total) AS BIGINT)"
        ).alias("vmr_ppm"),
    )


docs_term_dispersion.__doc__ = docs_term_dispersion.__doc__.format(k=_DISP_TOPK)
