"""Round-7i wave: resampling, agreement, decision splits, graph reach,
and embedding-space diagnostics — five more published techniques in the
catalog's exact-integer, oracle-twinned style.

- ``events_bootstrap_ci``  Poisson bootstrap percentile CI (the
  resampling scheme behind the Bag of Little Bootstraps and every
  large-scale bootstrap: per replicate, each row enters Multinomial ≈
  Poisson(1) times): replicate weights are DERANDOMIZED through the
  catalog's 60-bit md5 stream (u = h(event_id, b) mod 1e6 inverted
  through the exact Poisson(1) CDF in ppm), so both engines resample
  identically and the CI is reproducible bit-for-bit.
- ``docs_cohens_kappa``  Cohen's κ (Cohen 1960) between two document
  quality raters (length gate vs type-token-diversity gate):
  κ = (n·agree − Σ aᵢbᵢ)/(n² − Σ aᵢbᵢ) after clearing denominators —
  the chance-corrected agreement score, exact and sign-split.
- ``lineitem_gini_split``  CART decision-stump split (Breiman et al.
  1984): the Gini-impurity-minimizing price threshold predicting
  l_returnflag = 'R', with impurity in the sqrt/log-free form
  1 − Σ(cᵢ/n)² = (n² − Σcᵢ²)/n² over a 32-boundary candidate grid —
  the supervised-split primitive, exact end to end.
- ``parts_bfs_depths``  synchronized BFS reach profile from the
  top-degree hub: both engines unroll the SAME 4 frontier-expansion
  rounds, emitting the node count at each depth plus the unreached
  remainder — the diameter/reach probe beside PageRank and k-core.
- ``embedding_knn_reciprocity``  kNN-graph reciprocity + hubness
  (Radovanović et al. 2010): over a fixed vector panel, the fraction
  of directed top-k edges that are mutual, the max in-degree (hub) and
  the antihub count (in-degree 0) — the standard diagnostic for
  whether an embedding space is healthy or hub-dominated.

Determinism per the package convention: integer arithmetic end-to-end
(cosines rounded to 6 dp on identical doubles before ranking, as in the
knn family), sign-split truncating division, md5-derandomized sampling,
fixed unrolled iteration counts shared by both engines.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables, spread_small_scan

# --------------------------------------------------------------------------
# Deterministic Poisson bootstrap CI for the mean event value
# --------------------------------------------------------------------------

_BOOT_B = 40
# Exact Poisson(1) CDF in ppm (truncated): P(X<=k) for k = 0..4; the tail
# (>=5, ~0.04%) is capped at 5 identically in both engines.
_POIS_CDF_PPM = (367879, 735758, 919698, 981011, 996340)


def _boot_count_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_CDF_PPM)
    )
    return f"CASE {branches} ELSE 5 END"


_BOOT_ORACLE = f"""
    WITH v AS (
      SELECT event_id, CAST(FLOOR(value * 1000000) AS BIGINT) AS c
      FROM events
    ), rep AS (
      SELECT v.c, b.b,
             ('0x' || substr(md5(CAST(v.event_id AS VARCHAR) || '|'
                                 || CAST(b.b AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 AS u
      FROM v, unnest(range(1, {_BOOT_B + 1})) AS b(b)
    ), w AS (
      SELECT b, {_boot_count_case('u')} AS cnt, c FROM rep
    ), means AS (
      SELECT b, SUM(cnt::HUGEINT * c) // SUM(cnt) AS mean_us
      FROM w GROUP BY b HAVING SUM(cnt) > 0
    ), ranked AS (
      SELECT mean_us,
             ROW_NUMBER() OVER (ORDER BY mean_us, b) AS rk,
             COUNT(*) OVER () AS nb
      FROM means
    ), point AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c::HUGEINT) // COUNT(*) AS m
      FROM v
    )
    SELECT point.n, CAST(ranked.nb AS BIGINT) AS n_replicates,
           CAST(point.m AS BIGINT) AS mean_us,
           CAST(MAX(CASE WHEN rk = ((25 * (nb - 1)) // 1000) + 1
                         THEN mean_us END) AS BIGINT) AS ci_lo_us,
           CAST(MAX(CASE WHEN rk = ((975 * (nb - 1)) // 1000) + 1
                         THEN mean_us END) AS BIGINT) AS ci_hi_us
    FROM ranked, point
    GROUP BY point.n, ranked.nb, point.m
    """


@register("events_bootstrap_ci", oracle=_BOOT_ORACLE)
def events_bootstrap_ci(spark, sf_dir):
    """Percentile bootstrap confidence interval for the mean event value
    via the POISSON bootstrap (each row's replicate weight ~ Poisson(1),
    the scheme that makes bootstrapping embarrassingly parallel at scale
    — no global resample, one pass, weights independent per row).  The
    randomness is DERANDOMIZED: u = md5₆₀(event_id | replicate) mod 1e6
    inverted through the exact Poisson(1) CDF in ppm ({cdf}, tail capped
    at 5), so both engines draw the SAME {b} resamples and the
    2.5/97.5-percentile interval (nearest-rank over the replicate means)
    is bit-reproducible.  The point estimate is the plain mean in
    value-micros.

    Scale shape: the {b}-way replicate expansion is a constant-factor
    projection (no shuffle); replicate sums partial-combine on the
    {b}-value replicate key; the rank pick runs over {b} CONSTANT rows.
    The md5-mod-1e6 uniform has ≤2⁻⁴⁰ modulo bias — documented, not
    hidden.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # The 40x replicate expansion computes one md5 per (row, replicate); a
    # single-row-group input would serialize all of it on one core (guide
    # §2.2/§6): spread the scan before the fan-out.
    v = spread_small_scan(ev, spark).select(
        "event_id", F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("c")
    )
    rep = v.select(
        "c",
        F.explode(F.expr(f"sequence(1, {_BOOT_B})")).alias("b"),
        "event_id",
    ).select(
        "c",
        "b",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(event_id AS STRING), '|',"
            " CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) % 1000000"
        ).alias("u"),
    )
    w = rep.select("b", "c", F.expr(_boot_count_case("u")).alias("cnt"))
    means = (
        w.groupBy("b")
        .agg(
            F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * c")).alias("s"),
            F.sum("cnt").alias("m"),
        )
        .filter(F.col("m") > 0)
        .select("b", F.expr("s div m").alias("mean_us"))
    )
    every = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = means.select(
        "mean_us",
        F.row_number().over(Window.orderBy("mean_us", "b")).alias("rk"),
        F.count("*").over(every).alias("nb"),
    )
    point = v.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("CAST(SUM(CAST(c AS DECIMAL(38,0))) div COUNT(*) AS BIGINT)")
        .alias("m"),
    )
    ci = ranked.groupBy().agg(
        F.max("nb").cast("long").alias("n_replicates"),
        F.max(
            F.when(
                F.expr("rk = ((25 * (nb - 1)) div 1000) + 1"), F.col("mean_us")
            )
        )
        .cast("long")
        .alias("ci_lo_us"),
        F.max(
            F.when(
                F.expr("rk = ((975 * (nb - 1)) div 1000) + 1"),
                F.col("mean_us"),
            )
        )
        .cast("long")
        .alias("ci_hi_us"),
    )
    return (
        point.crossJoin(F.broadcast(ci))
        .select(
            "n",
            "n_replicates",
            F.col("m").alias("mean_us"),
            "ci_lo_us",
            "ci_hi_us",
        )
    )


events_bootstrap_ci.__doc__ = events_bootstrap_ci.__doc__.format(
    cdf=", ".join(str(t) for t in _POIS_CDF_PPM), b=_BOOT_B
)


# --------------------------------------------------------------------------
# Cohen's kappa between two document quality raters
# --------------------------------------------------------------------------

_KAPPA_MIN_TOKENS = 100

_KAPPA_ORACLE = rf"""
    WITH r AS (
      SELECT CASE WHEN len(list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x <> '')) >= {_KAPPA_MIN_TOKENS}
                  THEN 1 ELSE 0 END AS ra,
             CASE WHEN len(list_distinct(
                         list_filter(regexp_split_to_array(text, '\s+'),
                                     x -> x <> ''))) * 2
                       >= len(list_filter(regexp_split_to_array(text, '\s+'),
                                          x -> x <> ''))
                  THEN 1 ELSE 0 END AS rb
      FROM documents
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS n00,
             SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS n01,
             SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS n10,
             SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS n11
      FROM r
    ), k AS (
      SELECT n, n00, n01, n10, n11,
             (n00 + n11) AS agree,
             ((n00 + n01)::HUGEINT * (n00 + n10)
              + (n10 + n11)::HUGEINT * (n01 + n11)) AS chance
      FROM g
    )
    SELECT n, CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
           CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
           CAST(agree * 1000000 // n AS BIGINT) AS po_ppm,
           CAST(chance * 1000000 // (n::HUGEINT * n) AS BIGINT) AS pe_ppm,
           CAST(CASE WHEN n::HUGEINT * n = chance THEN 0
                WHEN n * agree - chance >= 0
                THEN ((n * agree - chance) * 1000000)
                     // (n::HUGEINT * n - chance)
                ELSE -(((chance - n * agree) * 1000000)
                       // (n::HUGEINT * n - chance))
           END AS BIGINT) AS kappa_ppm
    FROM k
    """


@register("docs_cohens_kappa", oracle=_KAPPA_ORACLE)
def docs_cohens_kappa(spark, sf_dir):
    """Cohen's κ (Cohen 1960) between two independent document quality
    raters — the length gate (≥{m} tokens) and the lexical-diversity
    gate (type-token ratio ≥ ½, compared as 2·|types| ≥ |tokens|, no
    division) — the chance-corrected agreement that answers "do these
    two heuristics measure the same thing?".  With margins aᵢ, bᵢ,
    κ = (p_o − p_e)/(1 − p_e) clears to
    (n·agree − Σaᵢbᵢ)/(n² − Σaᵢbᵢ): one signed ppm division of
    decimal(38) ≙ HUGEINT products, sign-split so both engines truncate
    identically.  κ ≈ 0 certifies the gates are complementary (worth
    keeping both in a filter pipeline); κ → 1 means one is redundant.

    Scale shape: ONE zero-shuffle projection computes both verdicts per
    document (the token array is staged once per row); the 2×2 grid is
    a single partial-combined aggregate; the κ arithmetic is one row.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = text_ops.tokens(F.col("text"))
    r = docs.select(
        F.when(F.size(toks) >= _KAPPA_MIN_TOKENS, 1).otherwise(0).alias("ra"),
        F.when(
            F.size(F.array_distinct(toks)) * 2 >= F.size(toks), 1
        )
        .otherwise(0)
        .alias("rb"),
    )
    g = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END")).alias(
            "n00"
        ),
        F.sum(F.expr("CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END")).alias(
            "n01"
        ),
        F.sum(F.expr("CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END")).alias(
            "n10"
        ),
        F.sum(F.expr("CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END")).alias(
            "n11"
        ),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    k = g.select(
        "n",
        "n00",
        "n01",
        "n10",
        "n11",
        (F.col("n00") + F.col("n11")).alias("agree"),
        F.expr(
            f"{dec.format('n00 + n01')} * (n00 + n10)"
            f" + {dec.format('n10 + n11')} * (n01 + n11)"
        ).alias("chance"),
    )
    num = f"({dec.format('n')} * agree - chance)"
    den = f"({dec.format('n')} * n - chance)"
    return k.select(
        "n",
        F.col("n00").cast("long").alias("n00"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n11").cast("long").alias("n11"),
        F.expr("CAST(agree * 1000000 div n AS BIGINT)").alias("po_ppm"),
        F.expr(
            f"CAST(chance * 1000000 div ({dec.format('n')} * n) AS BIGINT)"
        ).alias("pe_ppm"),
        F.expr(
            f"CAST(CASE WHEN {dec.format('n')} * n = chance THEN 0"
            f" WHEN {num} >= 0 THEN ({num} * 1000000) div {den}"
            f" ELSE -((-({num}) * 1000000) div {den}) END AS BIGINT)"
        ).alias("kappa_ppm"),
    )


docs_cohens_kappa.__doc__ = docs_cohens_kappa.__doc__.format(
    m=_KAPPA_MIN_TOKENS
)


# --------------------------------------------------------------------------
# CART decision-stump split by Gini impurity
# --------------------------------------------------------------------------

_SPLIT_BUCKETS = 32

_GSPLIT_ORACLE = f"""
    WITH v AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), stats AS (
      SELECT MIN(c) AS lo, ((MAX(c) - MIN(c)) // {_SPLIT_BUCKETS}) + 1 AS width,
             CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS r
      FROM v
    ), hist AS (
      SELECT (v.c - stats.lo) // stats.width AS bucket,
             COUNT(*) AS nb, SUM(v.y) AS rb
      FROM v, stats GROUP BY 1
    ), cum AS (
      SELECT bucket + 1 AS t,
             SUM(nb) OVER (ORDER BY bucket) AS nl,
             SUM(rb) OVER (ORDER BY bucket) AS rl
      FROM hist
    ), cand AS (
      SELECT t, nl, rl, stats.n - nl AS nr, stats.r - rl AS rr,
             stats.lo + t * stats.width AS threshold_cents, stats.n, stats.r
      FROM cum, stats
      WHERE nl > 0 AND stats.n - nl > 0
    ), scored AS (
      SELECT t, threshold_cents, nl, nr, n,
             (n::HUGEINT * 1000000
              - (rl::HUGEINT * rl + (nl - rl)::HUGEINT * (nl - rl)) * 1000000
                // nl
              - (rr::HUGEINT * rr + (nr - rr)::HUGEINT * (nr - rr)) * 1000000
                // nr) // n AS imp_ppm,
             (n::HUGEINT * 1000000
              - (r::HUGEINT * r + (n - r)::HUGEINT * (n - r)) * 1000000 // n)
               // n AS base_ppm
      FROM cand
    )
    SELECT CAST(threshold_cents AS BIGINT) AS threshold_cents,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           CAST(imp_ppm AS BIGINT) AS impurity_ppm,
           CAST(base_ppm AS BIGINT) AS baseline_ppm,
           CAST(base_ppm - imp_ppm AS BIGINT) AS gain_ppm
    FROM scored
    QUALIFY ROW_NUMBER() OVER (ORDER BY imp_ppm, t) = 1
    """


@register("lineitem_gini_split", oracle=_GSPLIT_ORACLE)
def lineitem_gini_split(spark, sf_dir):
    """CART decision stump (Breiman et al. 1984): the extended-price
    threshold minimizing weighted Gini impurity for predicting
    l_returnflag = 'R', over the {b}-boundary equal-width candidate
    grid.  Gini needs neither log nor sqrt: per side,
    1 − Σ(cᵢ/n)² = (n² − Σcᵢ²)/n², so the weighted impurity is
    (n·1e6 − Σ_side (Σcᵢ²)·1e6/n_side)/n — every product in
    decimal(38) ≙ HUGEINT, every division the catalog's truncation.
    Reported beside the no-split baseline and the gain; near-zero gain
    certifies price carries no signal about returns (the expected
    verdict here — certified, not assumed).

    Scale shape: ONE partial-combined pass builds the {b}-bucket
    (count, positives) histogram; the cumulative, candidate scoring,
    and argmin run over ≤{b} CONSTANT rows (bounded prefix pattern) —
    the same shape a distributed decision-tree learner (e.g. MLlib's)
    uses for split finding.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    v = li.select(
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias("c"),
        F.expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END").alias("y"),
    )
    # single-row stats feed both the bucketize pass and the candidate
    # scoring — checkpoint so the lineitem scan is not re-derived per use
    stats = v.agg(
        F.min("c").alias("lo"),
        F.expr(f"((MAX(c) - MIN(c)) div {_SPLIT_BUCKETS}) + 1").alias("width"),
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("r"),
    ).localCheckpoint(eager=True)
    hist = (
        v.crossJoin(F.broadcast(stats))
        .select(F.expr("(c - lo) div width").alias("bucket"), "y")
        .groupBy("bucket")
        .agg(F.count("*").alias("nb"), F.sum("y").alias("rb"))
    )
    cum_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        (F.col("bucket") + 1).alias("t"),
        F.sum("nb").over(cum_w).alias("nl"),
        F.sum("rb").over(cum_w).alias("rl"),
    )
    cand = cum.crossJoin(F.broadcast(stats)).filter(
        (F.col("nl") > 0) & (F.col("n") - F.col("nl") > 0)
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    scored = cand.select(
        "t",
        F.expr("lo + t * width").alias("threshold_cents"),
        "nl",
        (F.col("n") - F.col("nl")).alias("nr"),
        "n",
        F.expr(
            f"({dec.format('n')} * 1000000"
            f" - ({dec.format('rl')} * rl"
            f" + {dec.format('nl - rl')} * (nl - rl)) * 1000000 div nl"
            f" - ({dec.format('r - rl')} * (r - rl)"
            f" + {dec.format('(n - nl) - (r - rl)')} * ((n - nl) - (r - rl)))"
            " * 1000000 div (n - nl)) div n"
        ).alias("imp_ppm"),
        F.expr(
            f"({dec.format('n')} * 1000000"
            f" - ({dec.format('r')} * r + {dec.format('n - r')} * (n - r))"
            " * 1000000 div n) div n"
        ).alias("base_ppm"),
    )
    best = scored.select(
        "*",
        F.row_number().over(Window.orderBy("imp_ppm", "t")).alias("rk"),
    ).filter(F.col("rk") == 1)
    return best.select(
        F.col("threshold_cents").cast("long").alias("threshold_cents"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.col("imp_ppm").cast("long").alias("impurity_ppm"),
        F.col("base_ppm").cast("long").alias("baseline_ppm"),
        (F.col("base_ppm") - F.col("imp_ppm")).cast("long").alias("gain_ppm"),
    )


lineitem_gini_split.__doc__ = lineitem_gini_split.__doc__.format(
    b=_SPLIT_BUCKETS
)


# --------------------------------------------------------------------------
# Synchronized BFS depth profile from the top-degree hub
# --------------------------------------------------------------------------

_BFS_ROUNDS = 4


def _bfs_oracle(rounds: int = _BFS_ROUNDS) -> str:
    ctes = [
        """li AS (
      SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), e AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src
    ), hub AS (
      SELECT node FROM deg ORDER BY d DESC, node LIMIT 1
    ), v0 AS (SELECT node, 0 AS depth FROM hub)"""
    ]
    prev = "v0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"""v{i} AS (
      SELECT node, depth FROM {prev}
      UNION ALL
      SELECT f.node, {i} AS depth FROM (
        SELECT DISTINCT e.dst AS node
        FROM e JOIN {prev} p ON p.node = e.src AND p.depth = {i - 1}
      ) f WHERE NOT EXISTS (SELECT 1 FROM {prev} q WHERE q.node = f.node)
    )"""
        )
        prev = f"v{i}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    , depths AS (
      SELECT d.depth, COUNT(v.node) AS n_nodes
      FROM (SELECT unnest(range(0, {rounds + 1})) AS depth) d
      LEFT JOIN {prev} v ON v.depth = d.depth
      GROUP BY d.depth
    ), unreached AS (
      SELECT -1 AS depth,
             (SELECT COUNT(*) FROM deg) - (SELECT COUNT(*) FROM {prev})
               AS n_nodes
    )
    SELECT CAST(depth AS BIGINT) AS depth, CAST(n_nodes AS BIGINT) AS n_nodes
    FROM (SELECT * FROM depths UNION ALL SELECT * FROM unreached)
    """
    )


@register("parts_bfs_depths", oracle=_bfs_oracle())
def parts_bfs_depths(spark, sf_dir):
    """Synchronized BFS reach profile of the co-purchase graph from its
    top-degree hub (ties broken by lowest part id): both engines unroll
    the SAME {r} frontier-expansion rounds and report the node count at
    every depth 0..{r} plus the depth=−1 unreached remainder — the
    small-world/reach probe that tells you how many hops of graph
    expansion a recommendation or contamination query must pay.  A
    near-total reach by depth 2–3 is the co-occurrence-graph signature.

    Scale shape: rides the PERSISTED src-partitioned edge substrate;
    each round is one semi-join-shaped frontier expansion (join on the
    src partitioning + anti-join against the visited set) with the
    visited set (node, depth — node ids only) eagerly localCheckpointed
    so round N never re-executes rounds 1..N−1 (the k-core/HashMin
    lineage discipline).
    """
    from kafka_sink_spark.plans.analytics_mining import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    hub = (
        deg.orderBy(F.col("d").desc(), "node")
        .limit(1)
        .select("node", F.lit(0).alias("depth"))
    )
    visited = hub.localCheckpoint(eager=True)
    for i in range(1, _BFS_ROUNDS + 1):
        frontier = visited.filter(F.col("depth") == i - 1).select(
            F.col("node").alias("src")
        )
        nxt = (
            e.join(frontier, "src", "left_semi")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(i).alias("depth"))
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
    depth_grid = spark.createDataFrame(
        [(d,) for d in range(_BFS_ROUNDS + 1)], "depth int"
    )
    reached = visited.groupBy("depth").agg(F.count("*").alias("cnt"))
    depths = (
        depth_grid.join(F.broadcast(reached), "depth", "left")
        .select(
            F.col("depth").cast("long").alias("depth"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n_nodes"),
        )
    )
    totals = deg.agg(F.count("*").alias("all_nodes")).crossJoin(
        F.broadcast(visited.agg(F.count("*").alias("seen")))
    )
    unreached = totals.select(
        F.lit(-1).cast("long").alias("depth"),
        (F.col("all_nodes") - F.col("seen")).cast("long").alias("n_nodes"),
    )
    return depths.unionByName(unreached)


parts_bfs_depths.__doc__ = parts_bfs_depths.__doc__.format(r=_BFS_ROUNDS)


# --------------------------------------------------------------------------
# kNN-graph reciprocity and hubness over a vector panel
# --------------------------------------------------------------------------

_RECIP_PANEL = 300
_RECIP_K = 5


def _recip_oracle(panel: int = _RECIP_PANEL, k: int = _RECIP_K, dim: int = 64) -> str:
    from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql

    return f"""
    WITH p AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {panel}
    ), s AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(({_dot_sql('a.embedding', 'b.embedding', dim)})
                   / ({_norm_sql('a.embedding', dim)}
                      * {_norm_sql('b.embedding', dim)}), 6) AS cos_sim
      FROM p a, p b WHERE a.vec_id <> b.vec_id
    ), knn AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY cos_sim DESC, dst) AS rk
        FROM s
      ) WHERE rk <= {k}
    ), m AS (
      SELECT COUNT(*) AS n_mutual
      FROM knn a JOIN knn b ON a.src = b.dst AND a.dst = b.src
    ), ind AS (
      SELECT dst, COUNT(*) AS indeg FROM knn GROUP BY dst
    ), np AS (SELECT COUNT(*) AS n_panel FROM p)
    SELECT CAST(np.n_panel AS BIGINT) AS n_panel,
           CAST({k} AS BIGINT) AS k,
           CAST(np.n_panel * {k} AS BIGINT) AS n_edges,
           CAST(m.n_mutual AS BIGINT) AS n_mutual,
           CAST(m.n_mutual * 1000000 // (np.n_panel * {k}) AS BIGINT)
             AS reciprocity_ppm,
           CAST((SELECT MAX(indeg) FROM ind) AS BIGINT) AS max_in_degree,
           CAST(np.n_panel - (SELECT COUNT(*) FROM ind) AS BIGINT)
             AS n_antihubs
    FROM np, m
    """


@register("embedding_knn_reciprocity", oracle=_recip_oracle())
def embedding_knn_reciprocity(spark, sf_dir):
    """kNN-graph reciprocity and hubness diagnostics (Radovanović et al.
    2010) over a fixed {p}-vector panel: the fraction of directed
    top-{k} cosine edges that are MUTUAL (healthy embedding spaces are
    highly reciprocal), the maximum in-degree (hub severity — vectors
    that appear in everyone's neighbor lists), and the antihub count
    (vectors in NOBODY's list).  Hub-dominated spaces break ANN recall
    and nearest-neighbor dedup; this is the certificate a pipeline
    checks before trusting either.  Cosines are rounded to 6 dp on
    identical doubles before the (sim desc, id) rank, the knn-family
    discipline.

    Scale shape: the panel is CONSTANT-bounded ({p}² pairs regardless of
    corpus size — the statistical sample, not a scan); dot products are
    JVM-side HOF arithmetic; the mutual check is one self-join on the
    (src, dst) key and the in-degree profile one partial-combined count.
    """
    from kafka_sink_spark.extensions import similarity

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    panel = emb.filter(F.col("vec_id") < _RECIP_PANEL)
    knn = similarity.knn_bruteforce(panel, panel, k=_RECIP_K).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    m = knn.alias("a").join(
        knn.alias("b"),
        (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
    )
    mutual = m.agg(F.count("*").cast("long").alias("n_mutual"))
    ind = knn.groupBy("dst").agg(F.count("*").alias("indeg"))
    hub = ind.agg(
        F.max("indeg").cast("long").alias("max_in_degree"),
        F.count("*").alias("n_with_in"),
    )
    np_ = panel.agg(F.count("*").cast("long").alias("n_panel"))
    return (
        np_.crossJoin(F.broadcast(mutual))
        .crossJoin(F.broadcast(hub))
        .select(
            "n_panel",
            F.lit(_RECIP_K).cast("long").alias("k"),
            (F.col("n_panel") * _RECIP_K).cast("long").alias("n_edges"),
            "n_mutual",
            F.expr(
                f"CAST(n_mutual * 1000000 div (n_panel * {_RECIP_K})"
                " AS BIGINT)"
            ).alias("reciprocity_ppm"),
            "max_in_degree",
            (F.col("n_panel") - F.col("n_with_in"))
            .cast("long")
            .alias("n_antihubs"),
        )
    )


embedding_knn_reciprocity.__doc__ = embedding_knn_reciprocity.__doc__.format(
    p=_RECIP_PANEL, k=_RECIP_K
)
