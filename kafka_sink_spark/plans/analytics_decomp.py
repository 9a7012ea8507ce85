"""Round-10b decomposition/tuning wave.

- ``lineitem_theil_decomposition``  the between/within decomposition that
  makes Theil T the inequality index a PARTITIONED engine wants
  (Theil 1967; Shorrocks 1980 for the decomposability class):
  T = T_between + Σ_g w_g·T_within_g with w_g the group revenue share.
  Groups are supplier nations; cells are per-(nation, part) discounted
  revenues.  Each nation's internal inequality rolls up independently of
  every other nation — the map-side-combinable shape — and the between
  term reads straight off the |nations|-row grid.  Reported per nation
  plus '*between*' and '*total*' rows; the decomposition identity holds
  up to per-term ppm truncation (pinned by the unit twin).
- ``knn_ivf_nprobe_sweep``  the IVF operating curve: recall@k of the
  cell-probed search against the exact top-k, for nprobe ∈ {1, 2, 4},
  with the exact candidate volume each setting scores — the
  recall-vs-cost readout an index owner tunes before fixing nprobe
  (Jégou et al. 2011's IVF trade-off, measured not guessed).  Shares
  the certified first-C-centroids coarse quantizer with the knn_ivf /
  embedding_ivf_balance family.

Determinism per the package convention: exact integer cents, the
bounded probability-ratio log2 convention (analytics_readability.py)
for every Theil log, rounded(6dp)-cosine ranking with id tie-breaks for
the ANN sweep, per-term sign-split truncation, ties on ids.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's statistics/ANN-QA families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.extensions import similarity
from kafka_sink_spark.plans.analytics_readability import (
    _DUCK_LOG2,
    _SPARK_LOG2,
    duck_ratio_pt,
    spark_ratio_pt,
)
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Theil between/within decomposition over supplier nations
# --------------------------------------------------------------------------

_LN2_PPM = 693_147  # ln(2) in ppm, truncated — pinned (analytics_ranking)


def _sign_split_duck(num: str, den: str) -> str:
    return (
        f"CASE WHEN ({num}) >= 0 THEN ({num}) // ({den})"
        f" ELSE -((-({num})) // ({den})) END"
    )


def _sign_split_spark(num: str, den: str) -> str:
    return (
        f"CASE WHEN ({num}) >= 0 THEN ({num}) div ({den})"
        f" ELSE -((-({num})) div ({den})) END"
    )


def _theil_decomp_oracle() -> str:
    lg_w = (
        f"({_DUCK_LOG2.format(x=duck_ratio_pt('c.rev', 'g.sg'))}"
        f" - {_DUCK_LOG2.format(x=duck_ratio_pt('1', 'g.ng'))})"
    )
    t_within = _sign_split_duck(f"c.rev::HUGEINT * {lg_w}", "g.sg")
    lg_b = (
        f"({_DUCK_LOG2.format(x=duck_ratio_pt('g.sg', 't.s'))}"
        f" - {_DUCK_LOG2.format(x=duck_ratio_pt('g.ng', 't.n'))})"
    )
    t_between = _sign_split_duck(f"g.sg::HUGEINT * {lg_b}", "t.s")
    lg_t = (
        f"({_DUCK_LOG2.format(x=duck_ratio_pt('c.rev', 't.s'))}"
        f" - {_DUCK_LOG2.format(x=duck_ratio_pt('1', 't.n'))})"
    )
    t_total = _sign_split_duck(f"c.rev::HUGEINT * {lg_t}", "t.s")
    return f"""
    WITH cells AS (
      SELECT n.n_name AS grp, l.l_partkey AS pk,
             SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                 AS BIGINT)) AS rev
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_name, l.l_partkey
      HAVING SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                 AS BIGINT)) > 0
    ), grp AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(rev) AS BIGINT) AS sg
      FROM cells GROUP BY grp
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev) AS BIGINT) AS s
      FROM cells
    ), within AS (
      SELECT c.grp, CAST(SUM({t_within}) AS BIGINT) AS tw
      FROM cells c JOIN grp g ON g.grp = c.grp
      GROUP BY c.grp
    ), rows_ AS (
      SELECT g.grp AS component, g.ng AS n_cells, g.sg AS total_cents,
             w.tw AS theil_ppm_bits,
             CAST(g.sg::HUGEINT * 1000000 // t.s AS BIGINT) AS weight_ppm
      FROM grp g JOIN within w ON w.grp = g.grp, tot t
    )
    SELECT * FROM rows_
    UNION ALL
    SELECT '*between*' AS component,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX(t.s) AS BIGINT) AS total_cents,
           CAST(SUM({t_between}) AS BIGINT) AS theil_ppm_bits,
           CAST(1000000 AS BIGINT) AS weight_ppm
    FROM grp g, tot t
    UNION ALL
    SELECT '*total*' AS component,
           CAST(MAX(t.n) AS BIGINT) AS n_cells,
           CAST(MAX(t.s) AS BIGINT) AS total_cents,
           CAST(SUM({t_total}) AS BIGINT) AS theil_ppm_bits,
           CAST(1000000 AS BIGINT) AS weight_ppm
    FROM cells c, tot t
    """


@register("lineitem_theil_decomposition", oracle=_theil_decomp_oracle())
def lineitem_theil_decomposition(spark, sf_dir):
    """Theil T between/within decomposition of per-(nation, part)
    discounted revenues over supplier nations: per nation its internal
    Theil (T_within, over its own revenue cells), the '*between*' row
    (Theil of the nation revenue shares against their cell-count
    shares), and the '*total*' row (the undecomposed Theil over all
    cells).  T_total = T_between + Σ_g (S_g/S)·T_g exactly in real
    arithmetic; under the octave-log2 approximation the identity holds
    to the interpolation bound — each log carries ≤ 0.0861 bits of
    position-dependent bias and the three computations pair their
    ratio arguments differently, so the composed and direct totals can
    differ by up to ~2×0.0861 bits (≈172 000 ppm; measured ~54 000 at
    sf0.001, pinned by the unit twin) — this additive roll-up is WHY a
    partitioned engine prefers Theil to Gini: each partition's
    inequality aggregates map-side, the between term needs only the
    |groups|-row grid, and at 100 TB the exact-real identity lets a
    coordinator audit shard-local Theils against the global one.

    Every log rides the bounded probability-ratio convention
    (analytics_readability.py): within = lg(share-in-group·1e12) −
    lg(uniform-in-group·1e12), between = lg(revenue-share·1e12) −
    lg(cell-share·1e12) — arguments bounded at any SF, octave biases
    cancelling on uniform distributions.

    Scale shape: one fact-sized supplier equi-join (unhinted — supplier
    scales with SF) + a 25-row nation broadcast, ONE partial-combined
    (nation, part) rollup (checkpointed: three consumers), then
    grid-sized aggregates; no unpartitioned windows at all.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    cells = (
        t["lineitem"]
        .select("l_suppkey", "l_partkey", "l_extendedprice", "l_discount")
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(F.col("n_name").alias("grp"), F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)"
                    " AS BIGINT)"
                )
            ).alias("rev")
        )
        .where(F.col("rev") > 0)
    )
    # three consumers (group grid, total, the two term passes) — the
    # rollup is one row per (nation, part), orders of magnitude smaller
    # than lineitem; checkpoint so the fact join runs once
    cells = cells.localCheckpoint(eager=True)
    grp = cells.groupBy("grp").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("rev").cast("long").alias("sg"),
    )
    tot = cells.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rev").cast("long").alias("s"),
    )
    # Stage the fixed-point probabilities and the signed product once
    # per row (the lg template reads its argument 4×, the sign-split
    # CASE the product 3× — inlined, the DECIMAL division would run up
    # to 24× per cell; same staging discipline as keyness/MI/KL).
    lg_w = (
        f"(({_SPARK_LOG2.format(x='p_pt')})"
        f" - ({_SPARK_LOG2.format(x='q_pt')}))"
    )
    within = (
        cells.join(F.broadcast(grp), "grp")
        .select(
            "grp",
            "ng",
            "sg",
            "rev",
            F.expr(spark_ratio_pt("rev", "sg")).alias("p_pt"),
            F.expr(spark_ratio_pt("1", "ng")).alias("q_pt"),
        )
        .select(
            "grp",
            "ng",
            "sg",
            F.expr(f"CAST(rev AS DECIMAL(38,0)) * {lg_w}").alias("prod"),
        )
        .select(
            "grp",
            "ng",
            "sg",
            F.expr(_sign_split_spark("prod", "sg")).alias("tw_term"),
        )
        .groupBy("grp")
        .agg(
            F.max("ng").alias("ng"),
            F.max("sg").alias("sg"),
            F.sum("tw_term").cast("long").alias("tw"),
        )
    )
    rows = within.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias("component"),
        F.col("ng").alias("n_cells"),
        F.col("sg").alias("total_cents"),
        F.col("tw").alias("theil_ppm_bits"),
        F.expr(
            "CAST(CAST(sg AS DECIMAL(38,0)) * 1000000 div s AS BIGINT)"
        ).alias("weight_ppm"),
    )
    lg_b = (
        f"(({_SPARK_LOG2.format(x='p_pt')})"
        f" - ({_SPARK_LOG2.format(x='q_pt')}))"
    )
    between = (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "sg",
            "s",
            F.expr(spark_ratio_pt("sg", "s")).alias("p_pt"),
            F.expr(spark_ratio_pt("ng", "n")).alias("q_pt"),
        )
        .select(
            F.expr(f"CAST(sg AS DECIMAL(38,0)) * {lg_b}").alias("prod"),
            "s",
        )
        .select(
            F.expr(_sign_split_spark("prod", "s")).alias("tb_term"),
            "s",
        )
        .agg(
            F.lit("*between*").alias("component"),
            F.count("*").cast("long").alias("n_cells"),
            F.max("s").cast("long").alias("total_cents"),
            F.sum("tb_term").cast("long").alias("theil_ppm_bits"),
            F.lit(1000000).cast("long").alias("weight_ppm"),
        )
    )
    lg_t = (
        f"(({_SPARK_LOG2.format(x='p_pt')})"
        f" - ({_SPARK_LOG2.format(x='q_pt')}))"
    )
    total = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "rev",
            "n",
            "s",
            F.expr(spark_ratio_pt("rev", "s")).alias("p_pt"),
            F.expr(spark_ratio_pt("1", "n")).alias("q_pt"),
        )
        .select(
            F.expr(f"CAST(rev AS DECIMAL(38,0)) * {lg_t}").alias("prod"),
            "n",
            "s",
        )
        .select(
            F.expr(_sign_split_spark("prod", "s")).alias("tt_term"),
            "n",
            "s",
        )
        .agg(
            F.lit("*total*").alias("component"),
            F.max("n").cast("long").alias("n_cells"),
            F.max("s").cast("long").alias("total_cents"),
            F.sum("tt_term").cast("long").alias("theil_ppm_bits"),
            F.lit(1000000).cast("long").alias("weight_ppm"),
        )
    )
    return rows.unionByName(between).unionByName(total)


# --------------------------------------------------------------------------
# IVF nprobe recall/cost sweep
# --------------------------------------------------------------------------

_NPROBE_GRID = (1, 2, 4)
_SWEEP_CELLS = 8
_SWEEP_QUERIES = 10
_SWEEP_K = 5
_SWEEP_DIM = 64


def _dot_sql(a: str, b: str, dim: int) -> str:
    return " + ".join(
        f"{a}[{i + 1}]::DOUBLE * {b}[{i + 1}]::DOUBLE" for i in range(dim)
    )


def _norm_sql(v: str, dim: int) -> str:
    return (
        "sqrt("
        + " + ".join(f"{v}[{i + 1}]::DOUBLE * {v}[{i + 1}]::DOUBLE" for i in range(dim))
        + ")"
    )


def _nprobe_oracle() -> str:
    dot = _dot_sql("v.embedding", "c.embedding", _SWEEP_DIM)
    nv = _norm_sql("v.embedding", _SWEEP_DIM)
    nc = _norm_sql("c.embedding", _SWEEP_DIM)
    qdot = _dot_sql("q.embedding", "x.embedding", _SWEEP_DIM)
    qn = _norm_sql("q.embedding", _SWEEP_DIM)
    xn = _norm_sql("x.embedding", _SWEEP_DIM)
    # one-row derived-table aggregates cross-joined per sweep point —
    # scalar subqueries in the projection made DuckDB's planner blow up
    # ("bad allocation") even on 500 vectors
    per = []
    for np_ in _NPROBE_GRID:
        per.append(
            f"""
    SELECT CAST({np_} AS BIGINT) AS nprobe,
           CAST({_SWEEP_QUERIES} AS BIGINT) AS n_queries,
           cnt.n_candidates, h.hits
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM (SELECT vid AS query_id, cid AS cell FROM scored
            WHERE vid < {_SWEEP_QUERIES} AND rn <= {np_}) p
      JOIN cells ON cells.cell = p.cell
      WHERE cells.neighbor_id <> p.query_id
    ) cnt CROSS JOIN (
      SELECT CAST(COUNT(*) AS BIGINT) AS hits FROM (
        SELECT query_id, neighbor_id FROM (
          SELECT b.query_id, b.neighbor_id,
                 row_number() OVER (
                   PARTITION BY b.query_id
                   ORDER BY b.cs DESC, b.neighbor_id ASC) AS rk
          FROM (
            SELECT p.query_id, cells.neighbor_id,
                   round(({qdot}) / ({qn} * {xn}), 6) AS cs
            FROM (SELECT vid AS query_id, cid AS cell FROM scored
                  WHERE vid < {_SWEEP_QUERIES} AND rn <= {np_}) p
            JOIN cells ON cells.cell = p.cell
            JOIN embeddings q ON q.vec_id = p.query_id
            JOIN embeddings x ON x.vec_id = cells.neighbor_id
            WHERE cells.neighbor_id <> p.query_id
          ) b
        ) WHERE rk <= {_SWEEP_K}
      ) l JOIN exact e
        ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    ) h"""
        )
    body = "\nUNION ALL\n".join(per)
    # MATERIALIZED: each UNION branch references scored/cells/exact —
    # without the hint DuckDB re-inlines the 64-term-dot window plans
    # per reference and the planner dies with a bogus "out of memory"
    # on 500 vectors (bisected: 1 branch fine, 2 branches OOM)
    return f"""
    WITH cent AS MATERIALIZED (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id < {_SWEEP_CELLS}
    ), scored AS MATERIALIZED (
      SELECT vid, cid, rn FROM (
        SELECT v.vec_id AS vid, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(({dot}) / ({nv} * {nc}), 6) DESC, c.cid ASC
               ) AS rn
        FROM embeddings v, cent c)
    ), cells AS MATERIALIZED (
      SELECT vid AS neighbor_id, cid AS cell FROM scored WHERE rn = 1
    ), exact AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(({qdot}) / ({qn} * {xn}), 6) DESC,
                          x.vec_id ASC) AS rk
        FROM (SELECT * FROM embeddings WHERE vec_id < {_SWEEP_QUERIES}) q,
             embeddings x
        WHERE x.vec_id <> q.vec_id
      ) WHERE rk <= {_SWEEP_K}
    )
    SELECT nprobe, n_queries, n_candidates, hits,
           CAST(hits * 1000000 // {_SWEEP_QUERIES * _SWEEP_K} AS BIGINT)
             AS recall_ppm
    FROM ({body})
    ORDER BY nprobe
    """


@register("knn_ivf_nprobe_sweep", oracle=_nprobe_oracle())
def knn_ivf_nprobe_sweep(spark, sf_dir):
    """IVF recall-vs-cost operating curve: for nprobe ∈ {1, 2, 4}, the
    recall@5 of cell-probed search against the exact top-5 and the
    exact candidate volume each setting scores (the cost knob: expected
    candidates ≈ nprobe/C of the corpus per query).  The tuning readout
    next to ``knn_recall_vs_planes`` (LSH side) and
    ``embedding_ivf_balance`` (cell skew side): together they answer
    "which index, and at what setting" with measured numbers.

    Scale shape: ONE corpus × broadcast-centroid scoring pass shared by
    all sweep points (the per-vector rank keeps both the cell
    assignment and every probe list), cell-bucketed candidate joins per
    nprobe (never all-pairs), and the exact baseline is the certified
    brute-force top-k over the 10-query panel — 10 rows × corpus, one
    pass.  Grid output: 3 rows.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    exact = similarity.knn_bruteforce(
        emb, emb.filter(F.col("vec_id") < _SWEEP_QUERIES), k=_SWEEP_K
    ).select("query_id", "neighbor_id")
    exact = exact.localCheckpoint(eager=True)
    scored = similarity.ivf_scored(emb, n_centroids=_SWEEP_CELLS)
    # one row per (vector, centroid) with rank — both the cell table and
    # every probe list read it; persist-by-checkpoint so the corpus ×
    # centroid pass runs once for the whole sweep
    scored = scored.select("vid", "cid", "crank").localCheckpoint(eager=True)
    cells = scored.filter(F.col("crank") == 1).select(
        F.col("vid").alias("neighbor_id"), F.col("cid").alias("cell")
    )
    vecs = emb.select(
        F.col("vec_id").alias("_vid"), similarity.as_double(F.col("embedding")).alias("_v")
    )
    out = None
    for np_ in _NPROBE_GRID:
        probes = scored.filter(
            (F.col("vid") < _SWEEP_QUERIES) & (F.col("crank") <= np_)
        ).select(F.col("vid").alias("query_id"), F.col("cid").alias("cell"))
        cand = (
            F.broadcast(probes)
            .join(cells, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
        n_cand = cand.groupBy().agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates")
        )
        ranked = (
            cand.join(
                F.broadcast(
                    vecs.select(
                        F.col("_vid").alias("query_id"), F.col("_v").alias("qv")
                    ).filter(F.col("query_id") < _SWEEP_QUERIES)
                ),
                "query_id",
            )
            .join(
                vecs.select(
                    F.col("_vid").alias("neighbor_id"), F.col("_v").alias("cv")
                ),
                "neighbor_id",
            )
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    similarity.cosine(F.col("qv"), F.col("cv")), 6
                ).alias("cs"),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("cs").desc(), F.col("neighbor_id").asc()
        )
        topk = (
            ranked.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _SWEEP_K)
            .select("query_id", "neighbor_id")
        )
        hits = topk.join(exact, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).cast("long").alias("hits")
        )
        row = (
            n_cand.crossJoin(hits)
            .select(
                F.lit(np_).cast("long").alias("nprobe"),
                F.lit(_SWEEP_QUERIES).cast("long").alias("n_queries"),
                "n_candidates",
                "hits",
                F.expr(
                    f"CAST(hits * 1000000 div {_SWEEP_QUERIES * _SWEEP_K}"
                    " AS BIGINT)"
                ).alias("recall_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("nprobe")
