"""Round-6j wave: Pareto-front extraction, market-concentration indexing,
and skip-window co-occurrence — three more analytics shapes with
scale-sane distributed plans.

- ``parts_price_size_skyline``  the 2-D skyline (Börzsönyi et al. 2001,
  public): parts not dominated on (price, size).  The distributed rewrite
  is a PREFIX-MIN, not a pairwise join: sorted by price, a part is
  dominated iff a strictly-cheaper part is no larger (or an equal-priced
  part is strictly smaller) — evaluated with the same two-phase
  bucket-prefix pattern as the running sums, so the catalog's quadratic
  NOT EXISTS oracle semantics run as a linear plan.
- ``supplier_revenue_hhi``  Herfindahl-Hirschman concentration of supplier
  revenue within each nation, in exact ppm integers — the market-structure
  rollup over the lineitem⋈supplier join.
- ``corpus_skipgram_cooccurrence``  skip-window co-occurrence counts
  (distances 1 and 2, the word2vec/GloVe context shape) with the
  transcendental-free lift of corpus_bigram_lift generalized to skip
  pairs; wide lift products ride decimal(38,0) ≙ HUGEINT.

Determinism per the package convention: integers end-to-end; truncating
division on non-negative operands; cents/ppm fixed-point money.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions import text
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# 2-D skyline: parts minimizing (retail price, size)
# --------------------------------------------------------------------------

_SKY_BUCKET = 500  # price cents per prefix-min bucket


_SKYLINE_ORACLE = """
    WITH b AS (
      SELECT p_partkey, CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT p_partkey, price_c, size
    FROM b t
    WHERE NOT EXISTS (
      SELECT 1 FROM b o
      WHERE o.price_c <= t.price_c AND o.size <= t.size
        AND (o.price_c < t.price_c OR o.size < t.size)
    )
    """


@register("parts_price_size_skyline", oracle=_SKYLINE_ORACLE)
def parts_price_size_skyline(spark, sf_dir):
    """Pareto front of parts minimizing (price, size): a part survives iff
    no other part is ≤ in both dimensions and < in one.  The oracle states
    the quadratic NOT-EXISTS semantics; the Spark plan is the linear
    prefix-min rewrite: with P(b) = min size among STRICTLY cheaper parts
    and E(b) = min size among equal-priced parts, b is dominated iff
    P(b) ≤ size(b) or E(b) < size(b).

    Scale shape: the strict-cheaper prefix-min is two-phase — a per-bucket
    RANGE-frame window (RANGE .. 1 PRECEDING excludes equal prices inside
    the bucket, all buckets in parallel) plus a running min over the tiny
    bucket-minimum table (broadcast back) — and the equal-price min is one
    partial-combined aggregate.  No self-join, no single-partition sort of
    the part table; the same shape at 10⁹ parts.
    """
    part = load_tables(spark, sf_dir, ("part",))["part"]
    b = part.select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    ).withColumn("bk", F.expr(f"price_c div {_SKY_BUCKET}"))
    # strict-cheaper min WITHIN the bucket: RANGE frame up to price_c - 1
    win_in = (
        Window.partitionBy("bk")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    within = b.withColumn("min_in_bk", F.min("size").over(win_in))
    # bucket minimums -> running min over STRICTLY EARLIER buckets
    btot = b.groupBy("bk").agg(F.min("size").alias("bmin"))
    win_pre = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    bpre = btot.select(
        "bk", F.min("bmin").over(win_pre).alias("pre_min")
    )
    # equal-price min
    eq = b.groupBy("price_c").agg(F.min("size").alias("eq_min"))
    big = F.lit(1 << 60).cast("long")
    joined = (
        within.join(F.broadcast(bpre), "bk")
        .join(eq, "price_c")
        .select(
            "p_partkey",
            "price_c",
            "size",
            F.least(
                F.coalesce(F.col("min_in_bk"), big),
                F.coalesce(F.col("pre_min"), big),
            ).alias("cheaper_min"),
            "eq_min",
        )
    )
    return joined.where(
        (F.col("cheaper_min") > F.col("size")) & (F.col("eq_min") == F.col("size"))
    ).select("p_partkey", "price_c", "size")


# --------------------------------------------------------------------------
# Herfindahl-Hirschman revenue concentration per nation
# --------------------------------------------------------------------------

_HHI_ORACLE = """
    WITH rev AS (
      SELECT l.l_suppkey,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM lineitem l GROUP BY l.l_suppkey
    ), s AS (
      SELECT su.s_nationkey AS nationkey, r.l_suppkey, r.rev_c
      FROM rev r JOIN supplier su ON su.s_suppkey = r.l_suppkey
    ), tot AS (
      SELECT nationkey, SUM(rev_c) AS nation_rev FROM s GROUP BY nationkey
    ), sh AS (
      SELECT s.nationkey, (s.rev_c * 1000000) // t.nation_rev AS share_ppm
      FROM s JOIN tot t ON s.nationkey = t.nationkey
    )
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MAX(t.nation_rev) AS BIGINT) AS nation_rev_cents,
           CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
    FROM sh JOIN tot t ON sh.nationkey = t.nationkey
            JOIN nation n ON n.n_nationkey = sh.nationkey
    GROUP BY n.n_name
    """


@register("supplier_revenue_hhi", oracle=_HHI_ORACLE)
def supplier_revenue_hhi(spark, sf_dir):
    """Herfindahl-Hirschman index of supplier revenue concentration within
    each nation: per-supplier revenue (exact cents), each supplier's
    nation-revenue share in truncated ppm, HHI = Σ share² rescaled to ppm
    (1e6 = monopoly, 1e6/n = perfectly even).  All integer arithmetic, so
    the concentration report is bit-deterministic.

    Scale shape: supplier-keyed partial-combined revenue sum over lineitem
    (the only big shuffle), broadcast joins to the supplier/nation dims,
    a nation-keyed total, and a 25-row rollup.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    rev = (
        t["lineitem"]
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_c")
        )
    )
    # supplier grows with SF — no broadcast hint (r13 audit; r6 rule);
    # nation (25 rows) below keeps its hint.
    s = rev.join(
        t["supplier"].select("s_suppkey", "s_nationkey"),
        rev.l_suppkey == F.col("s_suppkey"),
    ).select(F.col("s_nationkey").alias("nationkey"), "rev_c")
    tot = s.groupBy("nationkey").agg(F.sum("rev_c").alias("nation_rev"))
    sh = s.join(F.broadcast(tot), "nationkey").select(
        "nationkey",
        "nation_rev",
        F.expr("rev_c * 1000000 div nation_rev").alias("share_ppm"),
    )
    return (
        sh.groupBy("nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.max("nation_rev").cast("long").alias("nation_rev_cents"),
            F.expr("CAST(sum(share_ppm * share_ppm) div 1000000 AS BIGINT)").alias(
                "hhi_ppm"
            ),
        )
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            "nationkey",
        )
        .select("nation", "n_suppliers", "nation_rev_cents", "hhi_ppm")
    )


# --------------------------------------------------------------------------
# Skip-window co-occurrence lift (word2vec/GloVe context counts)
# --------------------------------------------------------------------------

_SKIP_MIN_CNT = 5
_SKIP_DISTS = (1, 2)


_SKIPGRAM_ORACLE = f"""
    WITH toks AS (
      SELECT list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), u AS (
      SELECT w AS term, COUNT(*) AS c FROM toks, unnest(t) AS x(w) GROUP BY w
    ), nu AS (
      SELECT SUM(c) AS n FROM u
    ), p AS (
      SELECT t[i + 1] AS term_a, t[i + 1 + d] AS term_b
      FROM toks, unnest(range(len(t))) AS ui(i), unnest([{', '.join(map(str, _SKIP_DISTS))}]) AS ud(d)
      WHERE i + 1 + d <= len(t)
    ), c AS (
      SELECT term_a, term_b, COUNT(*) AS cnt FROM p GROUP BY term_a, term_b
    ), np AS (
      SELECT SUM(cnt) AS n FROM c
    )
    SELECT c.term_a, c.term_b, c.cnt,
           CAST((c.cnt * CAST(nu.n AS HUGEINT) * nu.n * 1000000)
                // (np.n * CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT) AS lift_ppm
    FROM c, nu, np, u ua, u ub
    WHERE ua.term = c.term_a AND ub.term = c.term_b
      AND c.cnt >= {_SKIP_MIN_CNT}
    """


@register("corpus_skipgram_cooccurrence", oracle=_SKIPGRAM_ORACLE)
def corpus_skipgram_cooccurrence(spark, sf_dir):
    """Skip-window co-occurrence mining at distances 1 and 2 — the context
    pairs a word2vec/GloVe-style embedding trainer counts — with the
    catalog's transcendental-free lift: lift = P(ab)/(P(a)P(b)) rendered as
    (cnt_ab·Nu²·1e6) div (Np·cnt_a·cnt_b), wide products in decimal(38,0)
    ≙ HUGEINT so the ranking survives any corpus size.  Pairs are ordered
    (a before b) and pruned at cnt ≥ 5.

    Scale shape: a bounded 2× position fan-out (one per skip distance),
    one partial-combined pair count, a unigram count joined twice on the
    term key (never broadcast — the vocabulary is corpus-sized), and two
    broadcast scalars.  Linear in corpus length.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = docs.select(text.tokens(F.col("text")).alias("_t"))
    u = (
        staged.select(F.explode("_t").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    nu = u.agg(F.sum("c").alias("nu"))
    pairs = (
        staged.select(F.posexplode("_t").alias("i", "term_a"), F.col("_t"))
        .select(
            "term_a",
            # F.get is 0-based and returns NULL past the end (ANSI-safe),
            # so the boundary positions fall out via the isNotNull filter.
            F.explode(
                F.array(*[F.get(F.col("_t"), F.col("i") + d) for d in _SKIP_DISTS])
            ).alias("term_b"),
        )
        .where(F.col("term_b").isNotNull())
    )
    c = pairs.groupBy("term_a", "term_b").agg(F.count("*").alias("cnt"))
    np_ = c.agg(F.sum("cnt").alias("np"))
    return (
        c.where(F.col("cnt") >= _SKIP_MIN_CNT)
        .join(
            u.select(F.col("term").alias("term_a"), F.col("c").alias("ca"))
            .hint("shuffle_hash"),
            "term_a",
        )
        .join(
            u.select(F.col("term").alias("term_b"), F.col("c").alias("cb"))
            .hint("shuffle_hash"),
            "term_b",
        )
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(np_))
        .select(
            "term_a",
            "term_b",
            "cnt",
            # IntegralDivide (`div`) on decimal operands truncates like
            # DuckDB's HUGEINT `//` (operands non-negative); a decimal `/`
            # would ROUND and diverge.
            F.expr(
                "CAST((CAST(cnt AS DECIMAL(38,0)) * nu * nu * 1000000)"
                " div (CAST(np AS DECIMAL(38,0)) * ca * cb) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
