"""Round-9a tails/keyness wave.

- ``orders_hill_tail_index``  Hill estimator of the order-value tail
  (Hill 1975, the standard extreme-value tail-index estimator): over the
  top-k order prices, gamma = (1/k)·Σ ln(x_i / x_k) — the reciprocal
  tail index alpha says how heavy the spend tail is (alpha < 2: infinite
  variance, plan for whales).  Reported for a k-ladder {50, 100, 200}.
- ``corpus_keyness_g2``  Dunning log-likelihood keyness (Dunning 1993):
  per source, the term whose frequency most over-represents that source
  vs the rest of the corpus by the G² statistic — the classic
  corpus-linguistics "what words mark this source" report, the
  data-auditor's first question about a mixed training corpus.
- ``supplier_lorenz_curve``  decile Lorenz curve of supplier revenue
  concentration: L(d) = share of total revenue earned by the poorest
  d/10 of suppliers — the concentration curve behind the Gini/HHI
  scalars already in the catalog, point-wise and exact.

Determinism per the package convention: octave-log2 ppm-bits for every
logarithm (counts/cents only inside the log, the KL/entropy discipline),
exact integer cents, truncating division with sign-splits where operands
can be negative, ties broken on ids.  The Hill top-k rides an
``orderBy().limit()`` spine (the sanctioned bounded-input window form);
the Lorenz ranks ride the two-phase bucket-prefix sum — no
catalog-unsanctioned unpartitioned windows.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's statistics/corpus families.
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
from kafka_sink_spark.plans.prefix import with_exclusive_prefix
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Hill tail-index estimator over the top order values
# --------------------------------------------------------------------------

_HILL_KS = (50, 100, 200)
_HILL_TOP = max(_HILL_KS)
# gamma is estimated in octave-log2 ppm-bits; alpha = 1/gamma needs nats:
# ln 2 = 0.693147... kept as the shared ppm constant.
_LN2_PPM = 693147


def _hill_oracle() -> str:
    lg = _DUCK_LOG2.format(x="price_cents")
    lgk = _DUCK_LOG2.format(x="thresh_cents")
    ks = ", ".join(str(k) for k in _HILL_KS)
    return f"""
    WITH top AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents,
             row_number() OVER (
               ORDER BY FLOOR(o_totalprice * 100) DESC, o_orderkey ASC
             ) AS rk
      FROM orders
      ORDER BY price_cents DESC, o_orderkey ASC LIMIT {_HILL_TOP}
    ), grid AS (SELECT unnest([{ks}]) AS k),
    th AS (
      SELECT g.k, t.price_cents AS thresh_cents
      FROM grid g JOIN top t ON t.rk = g.k
    ), terms AS (
      SELECT th.k, th.thresh_cents,
             SUM({lg} - {lgk}) AS sum_ppm_bits
      FROM th JOIN top t ON t.rk <= th.k
      GROUP BY th.k, th.thresh_cents
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(thresh_cents AS BIGINT) AS thresh_cents,
           CAST(sum_ppm_bits // k AS BIGINT) AS gamma_ppm_bits,
           CAST(CASE WHEN sum_ppm_bits > 0
                     THEN (CAST(k AS HUGEINT) * 1000000000000)
                          // (sum_ppm_bits * {_LN2_PPM} // 1000000)
                     ELSE 0 END AS BIGINT) AS alpha_micro
    FROM terms ORDER BY k
    """


@register("orders_hill_tail_index", oracle=_hill_oracle())
def orders_hill_tail_index(spark, sf_dir):
    """Hill tail-index estimator of the order-price distribution over a
    top-k ladder: gamma_k = (1/k)·Σ_{i≤k} (log2 x_i − log2 x_k) in
    octave-ppm-bits and alpha = 1/(gamma·ln2) in micro-units — the
    heavy-tail certificate for spend distributions (alpha stabilizing
    across the k-ladder is the classic "Hill horror plot" sanity check).

    Scale shape: ONE TakeOrderedAndProject over orders (top-200 by
    price — the distributed top-k primitive, never a global sort), a
    200-row sanctioned limit-spine rank, then everything lives on the
    3×200 bounded grid.  The log2 difference of per-value octave logs is
    the shared deterministic stand-in for ln(x/t) (bias < 0.0861 bits
    per term, identical in both engines).
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    top = (
        orders.select(
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
            "o_orderkey",
        )
        .orderBy(F.col("price_cents").desc(), F.col("o_orderkey").asc())
        .limit(_HILL_TOP)
    )
    # bounded 200-row input → sanctioned limit-spine window
    rk = Window.orderBy(F.col("price_cents").desc(), F.col("o_orderkey").asc())
    ranked = top.select(
        "price_cents", F.row_number().over(rk).cast("long").alias("rk")
    )
    grid = spark.createDataFrame([(k,) for k in _HILL_KS], "k long")
    th = F.broadcast(
        ranked.join(F.broadcast(grid), F.col("rk") == F.col("k")).select(
            "k", F.col("price_cents").alias("thresh_cents")
        )
    )
    lg = _SPARK_LOG2.format(x="price_cents")
    lgk = _SPARK_LOG2.format(x="thresh_cents")
    terms = (
        ranked.join(th, F.col("rk") <= F.col("k"))
        .groupBy("k", "thresh_cents")
        .agg(F.expr(f"SUM({lg} - {lgk})").alias("sum_ppm_bits"))
    )
    return terms.select(
        F.col("k").cast("long").alias("k"),
        F.col("thresh_cents").cast("long").alias("thresh_cents"),
        F.expr("CAST(sum_ppm_bits div k AS BIGINT)").alias("gamma_ppm_bits"),
        F.expr(
            f"CAST(CASE WHEN sum_ppm_bits > 0"
            f" THEN (CAST(k AS DECIMAL(38,0)) * 1000000000000)"
            f" div (sum_ppm_bits * {_LN2_PPM} div 1000000)"
            f" ELSE 0 END AS BIGINT)"
        ).alias("alpha_micro"),
    ).orderBy("k")


# --------------------------------------------------------------------------
# Dunning G² keyness per source
# --------------------------------------------------------------------------


def _g2_oracle() -> str:
    # Bounded probability-ratio form (r10, analytics_readability.py
    # note): the G² log ratios a·N/(r·g) and b·N/(s·g) are
    # P(term|source)/P(term) and P(term|rest)/P(term) — probabilities
    # in 1e12 fixed point, brackets lg(p_pt) − lg(q_pt): arguments
    # bounded by 1e12 (no count-product int64 cliff at any corpus) and
    # the octave biases cancel for non-key terms, keeping their G² ~0.
    # The outer a·bracket / b·bracket multiplies ride HUGEINT.
    pa_pt = duck_ratio_pt("a", "r")
    pb_pt = duck_ratio_pt("b", "s")
    q_pt = duck_ratio_pt("g", "nn")
    bracket_a = f"(({_DUCK_LOG2.format(x=pa_pt)}) - ({_DUCK_LOG2.format(x=q_pt)}))"
    bracket_b = f"(({_DUCK_LOG2.format(x=pb_pt)}) - ({_DUCK_LOG2.format(x=q_pt)}))"
    return f"""
    WITH toks AS (
      SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ), tf AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS a
      FROM toks GROUP BY source, term
    ), rt AS (SELECT source, SUM(a) AS r FROM tf GROUP BY source),
    gt AS (SELECT term, SUM(a) AS g FROM tf GROUP BY term),
    nt AS (SELECT SUM(a) AS nn FROM tf),
    j AS (
      SELECT tf.source, tf.term, tf.a, rt.r, gt.g, nt.nn,
             gt.g - tf.a AS b, nt.nn - rt.r AS s
      FROM tf JOIN rt ON rt.source = tf.source
              JOIN gt ON gt.term = tf.term, nt
    ), scored AS (
      SELECT source, term, a, r,
             2 * (a::HUGEINT * {bracket_a}
                  + CASE WHEN b > 0 THEN b::HUGEINT * {bracket_b}
                         ELSE 0 END) AS g2
      FROM j
    ), packed AS (
      SELECT source, CAST(MAX(r) AS BIGINT) AS n_tokens,
             MAX(lpad(CAST(GREATEST(g2, 0) AS VARCHAR), 19, '0') || term) AS mk
      FROM scored GROUP BY source
    )
    SELECT source, n_tokens,
           substr(mk, 20) AS top_term,
           CAST(substr(mk, 1, 19) AS BIGINT) AS top_g2_ppm_bits
    FROM packed
    """


@register("corpus_keyness_g2", oracle=_g2_oracle())
def corpus_keyness_g2(spark, sf_dir):
    """Dunning log-likelihood keyness: for each source, the term whose
    observed frequency most exceeds its expectation under the pooled
    corpus, by G² = 2·[a·ln(aN/rg) + b·ln(bN/sg)] (a = in-source count,
    b = elsewhere count, r/s = source/rest token totals, g = a+b) in
    octave-ppm-bits — counts only inside every log, so the whole
    statistic is exact integers; the per-source argmax rides the
    fixed-width packed-string MAX (G² zero-clamped for the pack, ties
    broken toward the lexicographically larger term in both engines).
    The log ratios ride the bounded probability-ratio convention (r10,
    analytics_readability.py): lg(P(term|source)·1e12) −
    lg(P(term)·1e12) — arguments bounded by 1e12 at any corpus size
    (no count-product int64 cliff) and the octave biases cancel for
    non-key terms; the outer a·bracket multiply rides
    DECIMAL(38,0)/HUGEINT, and the packed G² readout (19-digit pack,
    int64 cast) holds to ~9.2e18 ppm-bits — a single term would need
    ≳10¹¹ occurrences at a full 40-bit log ratio to reach it.

    Scale shape: one corpus-sized (source, term) partial-combined count,
    a vocabulary-keyed equi-join for the term totals (unhinted — vocab
    scales with the corpus), a |sources|-row broadcast for row totals,
    and a grid-sized argmax rollup.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tf = (
        docs.select(
            "source",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    rt = tf.groupBy("source").agg(F.sum("a").alias("r"))
    nt = tf.agg(F.sum("a").alias("nn"))
    # Bounded probability-ratio form (r10) — see the oracle note.  The
    # outer a·bracket / b·bracket multiplies ride DECIMAL(38,0) so no
    # count-product ever has to fit int64.
    # lg(q) depends only on the term — evaluate it ONCE per vocab row
    # before the (source, term) join (|sources|× fewer lg evaluations),
    # and stage the per-row probabilities as bigint columns so the lg
    # template's 4 argument references are plain reads, not repeated
    # DECIMAL divisions.
    gt = (
        tf.groupBy("term")
        .agg(F.sum("a").alias("g"))
        .crossJoin(F.broadcast(nt))
        .select(
            "term",
            "g",
            F.expr(spark_ratio_pt("g", "nn")).alias("q_pt"),
        )
        .select(
            "term",
            "g",
            F.expr(_SPARK_LOG2.format(x="q_pt")).alias("lgq"),
        )
    )
    j = (
        tf.join(F.broadcast(rt), "source")
        .join(gt.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(nt))
        .select(
            "source", "term", "a", "r", "lgq",
            (F.col("g") - F.col("a")).alias("b"),
            (F.col("nn") - F.col("r")).alias("s"),
        )
    )
    j = j.select(
        "source",
        "term",
        "a",
        "b",
        "r",
        "lgq",
        F.expr(spark_ratio_pt("a", "r")).alias("pa_pt"),
        F.expr(spark_ratio_pt("b", "s")).alias("pb_pt"),
    )
    bracket_a = f"(({_SPARK_LOG2.format(x='pa_pt')}) - lgq)"
    bracket_b = f"(({_SPARK_LOG2.format(x='pb_pt')}) - lgq)"
    scored = j.select(
        "source",
        "term",
        "r",
        F.expr(
            f"2 * (CAST(a AS DECIMAL(38,0)) * {bracket_a}"
            f" + CASE WHEN b > 0 THEN CAST(b AS DECIMAL(38,0)) * {bracket_b}"
            f" ELSE CAST(0 AS DECIMAL(38,0)) END)"
        ).alias("g2"),
    )
    packed = scored.groupBy("source").agg(
        F.max("r").cast("long").alias("n_tokens"),
        F.max(
            F.concat(
                F.lpad(F.greatest(F.col("g2"), F.lit(0)).cast("string"), 19, "0"),
                F.col("term"),
            )
        ).alias("mk"),
    )
    return packed.select(
        "source",
        "n_tokens",
        F.expr("substr(mk, 20)").alias("top_term"),
        F.expr("CAST(substr(mk, 1, 19) AS BIGINT)").alias("top_g2_ppm_bits"),
    )


# --------------------------------------------------------------------------
# Supplier revenue Lorenz curve (decile concentration points)
# --------------------------------------------------------------------------

# supplier revenue in cents spans ~[1e6, 1e9]: 1e6-cent buckets keep the
# prefix grid at a few thousand rows at any SF (domain-, not row-bounded)
_LORENZ_BUCKET = 1_000_000


def _lorenz_oracle() -> str:
    return f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS rev_c
      FROM lineitem GROUP BY l_suppkey
    ), ranked AS (
      SELECT rev_c,
             row_number() OVER (ORDER BY rev_c ASC, l_suppkey ASC) AS rk,
             SUM(rev_c) OVER (
               ORDER BY rev_c ASC, l_suppkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_c
      FROM rev
    ), tot AS (SELECT COUNT(*) AS n, SUM(rev_c) AS t FROM rev),
    grid AS (SELECT unnest(range(1, 10)) AS d)
    SELECT CAST(g.d AS BIGINT) AS decile,
           CAST((tot.n * g.d) // 10 AS BIGINT) AS rank_at,
           CAST(r.cum_c AS BIGINT) AS cum_rev_cents,
           -- HUGEINT: cum·1e6 exceeds int64 once total revenue passes
           -- ~9e12 cents (sf10 rehearsal)
           CAST(r.cum_c::HUGEINT * 1000000 // tot.t AS BIGINT) AS lorenz_ppm
    FROM grid g, tot
    JOIN ranked r ON r.rk = (tot.n * g.d) // 10
    ORDER BY decile
    """


@register("supplier_lorenz_curve", oracle=_lorenz_oracle())
def supplier_lorenz_curve(spark, sf_dir):
    """Decile Lorenz curve of supplier revenue: for each d/10 of suppliers
    (poorest first), the exact share of total revenue they earn, in ppm —
    the point-wise concentration curve whose area gap is the Gini and
    whose square-sum is the HHI (both already scalar-certified in the
    catalog).  L(0.9) ≈ 0.5 reads "the top 10% of suppliers book half the
    revenue".

    Scale shape: supplier-keyed partial-combined revenue sum over
    lineitem (the one big shuffle), then the global rank and running sum
    are the two-phase bucket-prefix decomposition over the
    domain-bounded cent ladder (never an unpartitioned window); the
    decile probe is a 9-row broadcast against the ladder.  Within-value
    ties are interchangeable, so bucket-local arithmetic reproduces the
    oracle's row-ordered running sum exactly at the probed ranks.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    lad = rev.groupBy("rev_c").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("rev_c").cast("long").alias("val_sum"),
    )
    lad = with_exclusive_prefix(
        lad, "rev_c", {"below_cnt": "cnt", "below_rev": "val_sum"}, _LORENZ_BUCKET
    )
    tot = rev.agg(
        F.count("*").cast("long").alias("n"), F.sum("rev_c").alias("t")
    )
    grid = spark.createDataFrame([(d,) for d in range(1, 10)], "d long")
    probes = grid.crossJoin(F.broadcast(tot)).select(
        "d", "n", "t", F.expr("(n * d) div 10").alias("rank_at")
    )
    # broadcast the 9-row probe side AT the join (a hint on the grid does
    # not survive the crossJoin+select) — the ladder side scales with the
    # supplier count and must stay partitioned.
    hit = lad.join(
        F.broadcast(probes),
        (F.col("below_cnt") < F.col("rank_at"))
        & (F.col("rank_at") <= F.col("below_cnt") + F.col("cnt")),
    )
    return hit.select(
        F.col("d").cast("long").alias("decile"),
        F.col("rank_at").cast("long").alias("rank_at"),
        F.expr("below_rev + (rank_at - below_cnt) * rev_c")
        .cast("long")
        .alias("cum_rev_cents"),
        # DECIMAL(38,0): cum·1e6 exceeds int64 once total revenue passes
        # ~9e12 cents (sf10 rehearsal)
        F.expr(
            "CAST(CAST((below_rev + (rank_at - below_cnt) * rev_c)"
            " AS DECIMAL(38,0)) * 1000000 div t AS BIGINT)"
        ).alias("lorenz_ppm"),
    ).orderBy("decile")
