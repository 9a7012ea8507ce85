"""Round-7f wave: frequency-mass estimation, vocabulary coverage, Pareto
classification, and graph-core extraction — four more published techniques
in the catalog's exact-integer, oracle-twinned style.

- ``corpus_good_turing``  Good-Turing frequency-of-frequencies (Good
  1953): for low counts r, the adjusted count r* = (r+1)·N_{r+1}/N_r and
  the probability mass r·N_r/N — including the r=1 hapax row whose mass
  IS the Good-Turing unseen-probability estimate.  Pure count ratios in
  exact ppm; the smoothing backbone of classical language models and the
  standard "how much vocabulary is still unseen" probe for corpus sizing.
- ``corpus_vocab_coverage``  token-coverage checkpoints: what fraction of
  all token occurrences the top-10/100/1000 vocabulary types cover — the
  curve that sizes tokenizer vocabularies; top-k extraction is per-task
  O(k), the cumulative runs over ≤1000 bounded rows.
- ``orders_abc_classification``  ABC/Pareto analysis: parts classed A/B/C
  at 80%/95% cumulative revenue share, with the cumulative rank computed
  by the catalog's two-phase bucket-prefix pattern (bucket histogram +
  bounded prefix + bucket-local windows) — never a global sort.
- ``parts_kcore``  k-core decomposition (k=3) of the co-purchase graph by
  synchronized peeling: each round drops nodes with degree < k and
  recomputes degrees over surviving edges.  Both engines unroll the SAME
  fixed number of rounds, so the emitted core is bit-identical even
  mid-convergence; the published graph-cleaning primitive (dense-core
  extraction) beside PageRank / label propagation / triangles.

Determinism per the package convention: integer arithmetic end-to-end,
truncating division on non-negative operands, fixed unrolled iteration
counts shared by both engines.

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
# Good-Turing frequency of frequencies
# --------------------------------------------------------------------------

_GT_MAX_R = 5

_GT_ORACLE = rf"""
    WITH arr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ), toks AS (
      SELECT CASE WHEN len(t) >= 3
                  THEN ('0x' || substr(md5(array_to_string(t[u.i+1:u.i+3], ' ')),
                        1, 15))::BIGINT
                  ELSE ('0x' || substr(md5(array_to_string(t, ' ')), 1, 15))::BIGINT
             END AS term
      FROM arr, unnest(range(CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 1 END))
           AS u(i)
    ), tc AS (
      SELECT term, COUNT(*) AS c FROM toks GROUP BY term
    ), ff AS (
      SELECT c AS r, COUNT(*) AS n_types FROM tc GROUP BY c
    ), n AS (
      SELECT SUM(c) AS n_tokens FROM tc
    )
    SELECT f.r, CAST(f.n_types AS BIGINT) AS n_types,
           CAST(COALESCE(f2.n_types, 0) AS BIGINT) AS next_n_types,
           CAST((f.r + 1) * COALESCE(f2.n_types, 0) * 1000000 // f.n_types
                AS BIGINT) AS r_star_ppm,
           CAST(f.r * f.n_types * 1000000 // n.n_tokens AS BIGINT) AS mass_ppm
    FROM ff f LEFT JOIN ff f2 ON f2.r = f.r + 1, n
    WHERE f.r <= {_GT_MAX_R}
    """


@register("corpus_good_turing", oracle=_GT_ORACLE)
def corpus_good_turing(spark, sf_dir):
    """Good-Turing frequency of frequencies over the corpus's 3-gram
    SHINGLE population (the hapax-rich domain — single tokens in this
    corpus all recur, making token-level GT vacuous): for each low count
    r ≤ {m}, the number of shingle types seen exactly r times (N_r), the
    adjusted count r* = (r+1)·N_{{r+1}}/N_r in ppm-of-a-count, and the
    probability mass r·N_r/N in ppm.  The r=1 row's mass is the
    Good-Turing estimate of the UNSEEN probability mass — for shingles,
    exactly the "how much novel text is still out there" number that
    drives dedup and corpus-growth planning.  Exact count ratios only; no
    smoothing fits, no floats; shingles ride the same 60-bit md5 hashes
    as the dedup family.

    Scale shape: shingle counts partial-combine on the hash key (the one
    corpus-sized shuffle every shingle statistic pays); the
    frequency-of-frequencies rollup partial-combines on the count value
    (≤ a few thousand distinct counts); the final join is over ≤ {m}
    rows with a single-row total broadcast.
    """
    from kafka_sink_spark.extensions.dedup import shingle_hashes

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tc = (
        shingle_hashes(docs, "text")
        .select(F.col("h").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    ff = tc.groupBy(F.col("c").alias("r")).agg(F.count("*").alias("n_types"))
    n = tc.agg(F.sum("c").cast("long").alias("n_tokens"))
    f2 = ff.select((F.col("r") - 1).alias("r"), F.col("n_types").alias("next_n"))
    return (
        ff.filter(F.col("r") <= _GT_MAX_R)
        .join(f2, "r", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "r",
            F.col("n_types").cast("long").alias("n_types"),
            F.coalesce("next_n", F.lit(0)).cast("long").alias("next_n_types"),
            F.expr(
                "CAST((r + 1) * COALESCE(next_n, 0) * 1000000 div n_types"
                " AS BIGINT)"
            ).alias("r_star_ppm"),
            F.expr(
                "CAST(r * n_types * 1000000 div n_tokens AS BIGINT)"
            ).alias("mass_ppm"),
        )
    )


corpus_good_turing.__doc__ = corpus_good_turing.__doc__.format(m=_GT_MAX_R)


# --------------------------------------------------------------------------
# Vocabulary coverage checkpoints
# --------------------------------------------------------------------------

_COV_KS = (10, 100, 1000)

_COV_ORACLE = rf"""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), tc AS (
      SELECT term, COUNT(*) AS c FROM toks GROUP BY term
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk
      FROM tc QUALIFY rk <= {max(_COV_KS)}
    ), cum AS (
      SELECT rk, SUM(c) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS cum_c
      FROM ranked
    ), n AS (
      SELECT SUM(c) AS n_tokens, COUNT(*) AS n_types FROM tc
    )
    SELECT k.k, CAST(n.n_types AS BIGINT) AS n_types,
           CAST(COALESCE(cum.cum_c, tot.all_c) AS BIGINT) AS covered_tokens,
           CAST(COALESCE(cum.cum_c, tot.all_c) * 1000000 // n.n_tokens
                AS BIGINT) AS coverage_ppm
    FROM (VALUES {", ".join(f"({k})" for k in _COV_KS)}) AS k(k)
    LEFT JOIN cum ON cum.rk = k.k
    CROSS JOIN (SELECT MAX(cum_c) AS all_c FROM cum) tot, n
    """


@register("corpus_vocab_coverage", oracle=_COV_ORACLE)
def corpus_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage checkpoints: the fraction of ALL token
    occurrences covered by the top-{ks} most frequent types — the
    Zipf-mass curve that decides tokenizer vocabulary sizes and stop-list
    depths (a handful of types typically covers a large share of tokens).
    Exact ppm; if the vocabulary is smaller than a checkpoint, the
    checkpoint saturates at the full vocabulary's coverage.

    Scale shape: one partial-combined term count; the top-k extraction is
    per-task O(k) (TakeOrderedAndProject / WindowGroupLimit); the
    cumulative runs over ≤ max-k CONSTANT rows and the totals are a
    single-row broadcast.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tc = (
        docs.select(F.explode(text_ops.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    ranked = tc.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("term")))
        .alias("rk"),
    ).filter(F.col("rk") <= max(_COV_KS))
    cum = ranked.select(
        "rk",
        F.sum("c")
        .over(Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_c"),
    )
    n = tc.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
    )
    tot = cum.agg(F.max("cum_c").alias("all_c"))
    ks = spark.createDataFrame([(k,) for k in _COV_KS], "k int")
    return (
        ks.join(F.broadcast(cum.withColumnRenamed("rk", "k")), "k", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n))
        .select(
            "k",
            "n_types",
            F.coalesce("cum_c", F.col("all_c")).cast("long").alias(
                "covered_tokens"
            ),
            F.expr(
                "CAST(COALESCE(cum_c, all_c) * 1000000 div n_tokens AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


corpus_vocab_coverage.__doc__ = corpus_vocab_coverage.__doc__.format(
    ks="/".join(str(k) for k in _COV_KS)
)


# --------------------------------------------------------------------------
# ABC / Pareto revenue classification without a global sort
# --------------------------------------------------------------------------

_ABC_BUCKET = 100_000  # cents per prefix bucket ($1000)
_ABC_A_PCT = 80
_ABC_B_PCT = 95

_ABC_ORACLE = f"""
    WITH pr AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT SUM(rev) AS total FROM pr),
    cum AS (
      SELECT pk, rev,
             SUM(rev) OVER (ORDER BY rev DESC, pk
               ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM pr
    ), classed AS (
      SELECT pk, rev,
             CASE WHEN cum_rev * 100 <= {_ABC_A_PCT} * tot.total THEN 'A'
                  WHEN cum_rev * 100 <= {_ABC_B_PCT} * tot.total THEN 'B'
                  ELSE 'C' END AS abc
      FROM cum, tot
    )
    SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS BIGINT) AS revenue_cents,
           CAST(SUM(rev) * 1000000 // tot.total AS BIGINT) AS share_ppm
    FROM classed, tot
    GROUP BY abc, tot.total
    """


@register("orders_abc_classification", oracle=_ABC_ORACLE)
def orders_abc_classification(spark, sf_dir):
    """ABC / Pareto classification of parts by revenue: class A holds the
    parts whose cumulative revenue (ranked by revenue desc, partkey asc)
    stays within {a}% of the total, B within {b}%, C the tail — the
    standard inventory/priority segmentation, with every compare in exact
    integers (cum·100 ≤ pct·total).

    Scale shape: the cumulative rank uses the catalog's TWO-PHASE
    bucket-prefix pattern (per-part revenues partial-combine; a bounded
    ${{10}}-sized bucket histogram + bounded prefix sum gives each bucket
    its revenue-above offset; a bucket-local window finishes the exact
    cumulative) — parallelism scales with buckets, never a global
    range-sorted exchange.  The oracle states the same semantics as the
    naive global cumulative.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("rev")
    )
    tot = pr.agg(F.sum("rev").cast("long").alias("total"))
    b = pr.select("pk", "rev", F.expr(f"rev div {_ABC_BUCKET}").alias("bk"))
    # bucket totals + EXCLUSIVE prefix of revenue in strictly-higher buckets
    bstats = b.groupBy("bk").agg(F.sum("rev").alias("brev"))
    above_w = (
        Window.orderBy(F.col("bk").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    bpre = bstats.select(
        "bk", F.coalesce(F.sum("brev").over(above_w), F.lit(0)).alias("above")
    )
    in_bucket_w = (
        Window.partitionBy("bk")
        .orderBy(F.col("rev").desc(), F.col("pk"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        b.join(F.broadcast(bpre), "bk")
        .select(
            "pk",
            "rev",
            (F.col("above") + F.sum("rev").over(in_bucket_w)).alias("cum_rev"),
        )
    )
    classed = cum.crossJoin(F.broadcast(tot)).select(
        "pk",
        "rev",
        F.when(
            F.col("cum_rev") * 100 <= F.lit(_ABC_A_PCT) * F.col("total"), "A"
        )
        .when(F.col("cum_rev") * 100 <= F.lit(_ABC_B_PCT) * F.col("total"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc",
            "n_parts",
            "revenue_cents",
            F.expr("CAST(revenue_cents * 1000000 div total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


orders_abc_classification.__doc__ = orders_abc_classification.__doc__.format(
    a=_ABC_A_PCT, b=_ABC_B_PCT
)


# --------------------------------------------------------------------------
# k-core decomposition of the co-purchase graph
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 4


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    ctes = [
        """li AS (
      SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), e AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
    ), a0 AS (
      SELECT src AS node FROM e GROUP BY src HAVING COUNT(*) >= {k}
    )""".format(k=k)
    ]
    prev = "a0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"""a{i} AS (
      SELECT e.src AS node FROM e
      JOIN {prev} s ON s.node = e.src JOIN {prev} d ON d.node = e.dst
      GROUP BY e.src HAVING COUNT(*) >= {k}
    )"""
        )
        prev = f"a{i}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e JOIN {prev} s ON s.node = e.src JOIN {prev} d ON d.node = e.dst
    GROUP BY e.src
    """
    )


@register("parts_kcore", oracle=_kcore_oracle())
def parts_kcore(spark, sf_dir):
    """k-core decomposition (k={k}) of the part co-purchase graph by
    synchronized peeling: every round drops nodes whose degree among
    surviving nodes falls below {k}, then recomputes degrees — the
    standard dense-core extraction for graph cleaning (peripheral nodes
    are pruned before community/embedding work).  Both engines unroll the
    SAME {r} peeling rounds, so the emitted core and per-node in-core
    degrees are bit-identical even if the peel has not fully converged —
    the same fixed-iteration discipline as PageRank and label
    propagation.  The output reports each surviving node's degree within
    the final survivor set.

    Scale shape: reuses the PERSISTED src-partitioned edge substrate;
    each round is two semi-joins on the src-partitioning plus a
    partial-combined degree count — no shuffle beyond the node key, and
    the surviving edge set only shrinks.  The alive set (node ids only —
    tiny relative to edges) is eagerly localCheckpointed per round so
    round N's plan does not re-execute rounds 1..N−1 (the same lineage
    truncation the HashMin connected-components pass uses).
    """
    from kafka_sink_spark.plans.analytics_mining import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    alive = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= _KCORE_K)
        .select("node")
        .localCheckpoint(eager=True)
    )
    for _ in range(_KCORE_ROUNDS):
        surviving = e.join(
            alive.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
        alive = (
            surviving.groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("node")
            .localCheckpoint(eager=True)
        )
    final = e.join(
        alive.withColumnRenamed("node", "src"), "src", "left_semi"
    ).join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
    return final.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("core_degree")
    )


parts_kcore.__doc__ = parts_kcore.__doc__.format(k=_KCORE_K, r=_KCORE_ROUNDS)
