"""Round-10c wave: release-assurance operators — distribution-level
privacy, distribution-free prediction audit, corpus-level paragraph
dedup, and diversified retrieval.

- ``events_t_closeness``  t-closeness audit (Li, Li & Venkatasubramanian,
  ICDE 2007): the third rung of the privacy ladder after
  ``events_k_anonymity`` (class size) and ``events_l_diversity``
  (distinct sensitive values) — per quasi-identifier equivalence class,
  the ordered Earth Mover's Distance between the class's sensitive-value
  distribution and the global one.  A class can be k-anonymous AND
  l-diverse yet still leak (all its values in the top octave); EMD
  catches that.  Sensitive attribute = the octave band of the event
  value (integer bit length of cents — no float log anywhere), EMD over
  the ordered band ladder = mean |cumulative difference|, exact by
  cross-multiplication.  Banded census like the l-diversity readout.
- ``lineitem_conformal_interval``  split conformal prediction audit
  (Papadopoulos et al. 2002; Lei et al. 2018; Angelopoulos & Bates 2021
  tutorial): content-hash 50/25/25 train/calibration/test split, a
  per-quantity-group mean price predictor fit on train, the nonconformity
  ladder |y − ŷ| on calibration, q̂ = the ⌈(n+1)(1−α)⌉-th smallest
  score (α = 10%), and the marginal + per-returnflag coverage of
  ŷ ± q̂ on test — the distribution-free guarantee check every
  model-assisted curation pipeline should ship with.
- ``docs_ccnet_paragraph_dedup``  CCNet-style paragraph-level dedup
  census (Wenzek et al. 2020): documents split into fixed 32-token
  paragraphs, each hashed; a paragraph instance is a duplicate when its
  hash occurs more than once in the corpus; per-source duplicated-
  paragraph share in ppm (plus the '*' corpus row) — the signal CCNet
  thresholds to drop boilerplate-heavy sources.  Distinct from
  ``docs_chunk_overlap`` (which emits overlapping retrieval chunks) and
  ``dedup_exact`` (whole-document): this is the sub-document dedup RATE.
- ``embedding_mmr_rerank``  Maximal Marginal Relevance re-ranking
  (Carbonell & Goldstein, SIGIR 1998): greedy diversified top-K from a
  top-P candidate pool — step 1 takes the most relevant candidate, step
  t maximizes λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s).  THE classic
  diversity selector for RAG context assembly; the knn family measures
  diversity (``knn_aggregate_diversity``) but nothing selected for it.
  λ = 0.7 in tenths, relevance and pairwise similarity are EXACT
  fixed-point inner products (micro² units, decimal(38) sums), so the
  greedy argmax is pure integer arithmetic with id tie-breaks.

Determinism per the package convention: integer arithmetic end-to-end,
truncating division only on non-negative operands (documented), md5-based
split assignment, bit-length octave bands instead of float log2, exact
fixed-point dot products shared with the knn family substrate.

Reference anchor: datastax/kafka-sink has no analytics surface
(sink/src/main is record mapping + DSE writes, SURVEY.md §2); this module
extends COVERAGE.md's governance / evaluation / dedup / ANN families.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions import similarity, text
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_DEC = "CAST({} AS DECIMAL(38,0))"

# --------------------------------------------------------------------------
# t-closeness audit over (user bucket × hour) classes
# --------------------------------------------------------------------------

_TCL_ORACLE = """
    WITH qi AS (
      SELECT user_id // 10 AS ub,
             CAST(hour(ts) AS BIGINT) AS hod,
             CAST(length(bin(CAST(FLOOR(value * 100) AS BIGINT))) AS BIGINT)
               AS band
      FROM events
    ), cb AS (
      SELECT ub, hod, band, CAST(COUNT(*) AS BIGINT) AS a
      FROM qi GROUP BY ub, hod, band
    ), classes AS (
      SELECT ub, hod, CAST(SUM(a) AS BIGINT) AS n_c FROM cb GROUP BY ub, hod
    ), grid AS (
      SELECT band, g,
             CAST(SUM(g) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cg
      FROM (SELECT band, CAST(SUM(a) AS BIGINT) AS g FROM cb GROUP BY band)
    ), tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS m
      FROM grid
    ), full_g AS (
      SELECT c.ub, c.hod, c.n_c, g.band, g.cg,
             COALESCE(cb.a, 0) AS a
      FROM classes c CROSS JOIN grid g
      LEFT JOIN cb ON cb.ub = c.ub AND cb.hod = c.hod AND cb.band = g.band
    ), cum AS (
      SELECT ub, hod, n_c, band, cg,
             CAST(SUM(a) OVER (PARTITION BY ub, hod ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS ca
      FROM full_g
    ), emd AS (
      SELECT ub, hod, n_c,
             CAST(SUM(abs(ca::HUGEINT * t.n - cg::HUGEINT * n_c)) * 1000000
                  // ((t.m - 1)::HUGEINT * n_c * t.n) AS BIGINT) AS t_ppm
      FROM cum, tot t
      GROUP BY ub, hod, n_c, t.m, t.n
    ), banded AS (
      SELECT CASE WHEN t_ppm <= 50000 THEN '1:<=5%'
                  WHEN t_ppm <= 100000 THEN '2:<=10%'
                  WHEN t_ppm <= 200000 THEN '3:<=20%'
                  ELSE '4:>20%' END AS t_band,
             n_c, t_ppm
      FROM emd
    ), btot AS (SELECT SUM(n_c) AS n_rows_t FROM banded)
    SELECT t_band,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(n_c) AS BIGINT) AS n_rows,
           CAST(SUM(n_c) * 1000000 // btot.n_rows_t AS BIGINT) AS rows_ppm,
           CAST(MAX(t_ppm) AS BIGINT) AS max_t_ppm
    FROM banded, btot
    GROUP BY t_band, btot.n_rows_t
    """


@register("events_t_closeness", oracle=_TCL_ORACLE)
def events_t_closeness(spark, sf_dir):
    """t-closeness audit (Li et al. 2007) over the catalog's standing
    quasi-identifier classes (user bucket × hour): per class, the ordered
    EMD between the class's sensitive-value distribution and the global
    one, where the sensitive attribute is the OCTAVE BAND of the event
    value (bit length of cents — an integer, so no float log exists
    anywhere).  Ordered EMD over an m-band ladder is the mean absolute
    cumulative difference; with class size n_c and corpus size N it is
    computed exactly as Σ_j |C_cj·N − G_j·n_c| / ((m−1)·n_c·N) in ppm by
    cross-multiplication (decimal(38): C·N ≤ N² stays inside headroom at
    any corpus size).  Classes are censused into closeness bands — the
    same readout shape as events_l_diversity, so the three privacy rungs
    (k, l, t) read side by side.

    Scale shape: one partial-combined (class, band) count is the only
    corpus-sized shuffle; the band grid is BOUNDED by the value domain's
    bit length (≤ 64 rows — the only unpartitioned window, sanctioned),
    the class×grid expansion is a broadcast nested-loop against that
    bounded grid (≤ 64× the class table, linear), and the per-class
    cumulative window is partitioned by class.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    qi = ev.select(
        F.expr("user_id div 10").alias("ub"),
        F.hour("ts").cast("long").alias("hod"),
        F.length(
            F.conv(F.expr("CAST(FLOOR(value * 100) AS BIGINT)"), 10, 2)
        )
        .cast("long")
        .alias("band"),
    )
    cb = qi.groupBy("ub", "hod", "band").agg(
        F.count("*").cast("long").alias("a")
    )
    cb = cb.localCheckpoint(eager=True)  # three consumers, one shuffle
    classes = cb.groupBy("ub", "hod").agg(
        F.sum("a").cast("long").alias("n_c")
    )
    bands = cb.groupBy("band").agg(F.sum("a").cast("long").alias("g"))
    # the ONE unpartitioned window: the bit-length band grid (≤ 64 rows,
    # bounded by the value domain, never the row count)
    gw = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grid = bands.select(
        "band", "g", F.sum("g").over(gw).cast("long").alias("cg")
    )
    tot = grid.agg(
        F.sum("g").cast("long").alias("n"),
        F.count("*").cast("long").alias("m"),
    )
    full = (
        classes.crossJoin(F.broadcast(grid.select("band", "cg")))
        .join(cb, ["ub", "hod", "band"], "left")
        .select(
            "ub",
            "hod",
            "n_c",
            "band",
            "cg",
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
        )
    )
    cw = (
        Window.partitionBy("ub", "hod")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = full.select(
        "ub", "hod", "n_c", "cg", F.sum("a").over(cw).cast("long").alias("ca")
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("ub", "hod", "n_c", "m", "n")
        .agg(
            F.sum(
                F.expr(f"abs({_DEC.format('ca')} * n - {_DEC.format('cg')} * n_c)")
            ).alias("_d")
        )
        .select(
            "n_c",
            F.expr(
                f"CAST(_d * 1000000 div ((m - 1) * {_DEC.format('n_c')} * n)"
                " AS BIGINT)"
            ).alias("t_ppm"),
        )
    )
    banded = emd.select(
        F.when(F.col("t_ppm") <= 50_000, "1:<=5%")
        .when(F.col("t_ppm") <= 100_000, "2:<=10%")
        .when(F.col("t_ppm") <= 200_000, "3:<=20%")
        .otherwise("4:>20%")
        .alias("t_band"),
        "n_c",
        "t_ppm",
    )
    btot = banded.agg(F.sum("n_c").alias("n_rows_t"))
    return (
        banded.groupBy("t_band")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum("n_c").cast("long").alias("n_rows"),
            F.max("t_ppm").cast("long").alias("max_t_ppm"),
        )
        .crossJoin(F.broadcast(btot))
        .select(
            "t_band",
            "n_classes",
            "n_rows",
            F.expr("CAST(n_rows * 1000000 div n_rows_t AS BIGINT)").alias(
                "rows_ppm"
            ),
            "max_t_ppm",
        )
    )


# --------------------------------------------------------------------------
# Split conformal prediction-interval coverage audit
# --------------------------------------------------------------------------

_CFM_SPLIT = (
    "('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||"
    " CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 4"
)

_CFM_ORACLE = f"""
    WITH rows_s AS (
      SELECT CAST(l_quantity AS BIGINT) AS grp,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS y,
             l_returnflag AS flag,
             {_CFM_SPLIT} AS sp
      FROM lineitem
    ), fit AS (
      SELECT grp, CAST(SUM(y) // COUNT(*) AS BIGINT) AS yhat
      FROM rows_s WHERE sp <= 1 GROUP BY grp
    ), gfit AS (
      SELECT CAST(SUM(y) // COUNT(*) AS BIGINT) AS gy
      FROM rows_s WHERE sp <= 1
    ), cal AS (
      SELECT abs(r.y - COALESCE(f.yhat, g.gy)) AS s
      FROM rows_s r LEFT JOIN fit f ON f.grp = r.grp, gfit g
      WHERE r.sp = 2
    ), nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
    pick AS (
      SELECT CAST(s AS BIGINT) AS qhat, n_cal
      FROM (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM cal), nc
      WHERE rn = least((9 * n_cal + 18) // 10, n_cal)
    ), test AS (
      SELECT r.flag, abs(r.y - COALESCE(f.yhat, g.gy)) AS s
      FROM rows_s r LEFT JOIN fit f ON f.grp = r.grp, gfit g
      WHERE r.sp = 3
    )
    SELECT COALESCE(t.flag, '*') AS stratum,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.s <= p.qhat THEN 1 ELSE 0 END) AS BIGINT)
             AS n_covered,
           CAST(SUM(CASE WHEN t.s <= p.qhat THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS coverage_ppm,
           CAST(p.qhat AS BIGINT) AS qhat_dollars,
           CAST(p.n_cal AS BIGINT) AS n_cal
    FROM test t, pick p
    GROUP BY ROLLUP(t.flag), p.qhat, p.n_cal
    """


@register("lineitem_conformal_interval", oracle=_CFM_ORACLE)
def lineitem_conformal_interval(spark, sf_dir):
    """Split conformal prediction audit (Papadopoulos 2002; Lei 2018):
    rows are split 50/25/25 into train/calibration/test by the catalog's
    md5 content-hash device (stable under repartition and re-runs); the
    predictor is the per-quantity-group mean dollar price fit on TRAIN
    ONLY (unseen groups fall back to the global train mean); the
    calibration nonconformity ladder s = |y − ŷ| yields
    q̂ = the ⌈0.9·(n_cal+1)⌉-th smallest score (nearest-rank, clamped to
    n_cal), and the readout is the marginal ('*') and per-returnflag
    coverage of ŷ ± q̂ on TEST in ppm — split conformal guarantees the
    marginal row ≥ 900 000 ppm in expectation REGARDLESS of how wrong the
    model is; the per-flag rows expose where conditional coverage sags.

    Scale shape: one scan builds the split projection; the fit is a
    partial-combined aggregate on the bounded quantity grid (broadcast
    back); the rank pick rides the two-phase bucket prefix
    (plans/prefix.py — the only unpartitioned window runs over the
    bounded $1000-bucket score grid); coverage is one partial-combined
    rollup.  No raw row crosses more than one shuffle.
    """
    from kafka_sink_spark.plans.prefix import ladder_with_below

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    rows = li.select(
        F.expr("CAST(l_quantity AS BIGINT)").alias("grp"),
        F.expr("CAST(FLOOR(l_extendedprice) AS BIGINT)").alias("y"),
        F.col("l_returnflag").alias("flag"),
        (
            text.md5_long(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            )
            % 4
        ).alias("sp"),
    )
    # the split projection (one md5 per row) feeds FOUR consumers — the
    # group fit, the global fallback, the calibration ladder and the test
    # scoring: persist so lineitem is scanned and hashed once, not four
    # times (guide §5: reuse + recompute-cost justify the cache)
    from pyspark import StorageLevel

    rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
    train = rows.filter(F.col("sp") <= 1)
    # per-group mean on the bounded quantity grid + the global fallback
    fit = train.groupBy("grp").agg(
        F.expr("CAST(SUM(y) div COUNT(*) AS BIGINT)").alias("yhat")
    )
    gfit = train.agg(
        F.expr("CAST(SUM(y) div COUNT(*) AS BIGINT)").alias("gy")
    )
    def scored(sp_val):
        return (
            rows.filter(F.col("sp") == sp_val)
            .join(F.broadcast(fit), "grp", "left")
            .crossJoin(F.broadcast(gfit))
            .select(
                "flag",
                F.abs(
                    F.col("y") - F.coalesce(F.col("yhat"), F.col("gy"))
                ).alias("s"),
            )
        )

    cal = scored(2)
    ladder = ladder_with_below(cal.select("s"), "s", bucket_size=1000)
    nc = ladder.agg(F.sum("t").cast("long").alias("n_cal"))
    pick = (
        nc.select(
            "n_cal",
            F.expr(
                "least((9 * n_cal + 18) div 10, n_cal)"
            ).alias("r"),
        )
        .join(
            F.broadcast(ladder),
            (F.col("below") < F.col("r"))
            & (F.col("r") <= F.col("below") + F.col("t")),
        )
        .select(F.col("s").cast("long").alias("qhat"), "n_cal")
    )
    test = scored(3)
    return (
        test.crossJoin(F.broadcast(pick))
        .rollup("flag")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(F.when(F.col("s") <= F.col("qhat"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
            F.max("qhat").cast("long").alias("qhat_dollars"),
            F.max("n_cal").cast("long").alias("n_cal"),
        )
        .select(
            F.coalesce(F.col("flag"), F.lit("*")).alias("stratum"),
            "n_test",
            "n_covered",
            F.expr("CAST(n_covered * 1000000 div n_test AS BIGINT)").alias(
                "coverage_ppm"
            ),
            "qhat_dollars",
            "n_cal",
        )
    )


# --------------------------------------------------------------------------
# CCNet-style paragraph-level dedup census per source
# --------------------------------------------------------------------------

_PARA_W = 32  # tokens per paragraph segment

_CCNET_ORACLE = rf"""
    WITH arr AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
      FROM documents
    ), paras AS (
      SELECT source,
             ('0x' || substr(md5(array_to_string(
                list_slice(t, p.p * {_PARA_W} + 1, p.p * {_PARA_W} + {_PARA_W}),
                ' ')), 1, 15))::BIGINT AS h
      FROM arr, unnest(range((len(t) + {_PARA_W} - 1) // {_PARA_W}))
             AS p(p)
      WHERE len(t) > 0
    ), hc AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS cnt FROM paras GROUP BY h
    ), flagged AS (
      SELECT p.source, CASE WHEN hc.cnt > 1 THEN 1 ELSE 0 END AS dup
      FROM paras p JOIN hc ON hc.h = p.h
    )
    SELECT COALESCE(source, '*') AS source,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(SUM(dup) AS BIGINT) AS dup_paras,
           CAST(SUM(dup) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
    FROM flagged
    GROUP BY ROLLUP(source)
    """


@register("docs_ccnet_paragraph_dedup", oracle=_CCNET_ORACLE)
def docs_ccnet_paragraph_dedup(spark, sf_dir):
    """CCNet-style paragraph dedup census (Wenzek et al. 2020 §3.1 run
    per-source): each document is segmented into fixed {w}-token
    paragraphs (the corpus has no line structure, so fixed windows play
    the role of CCNet's lines; the trailing partial segment is kept), and
    a paragraph INSTANCE counts as duplicated when its 60-bit content
    hash occurs more than once corpus-wide.  The per-source duplicated-
    paragraph share in ppm — plus the '*' corpus rollup — is exactly the
    boilerplate signal CCNet thresholds to drop template-heavy sources
    before training.

    Scale shape: segmentation is a zero-shuffle explode projection
    (~n/{w} rows per doc); ONE shuffle builds the hash histogram and the
    flag join re-shuffles the same key (co-partitioned exchange reuse);
    the census is a partial-combined rollup on |sources|+1 groups.  No
    all-pairs stage exists — duplication is detected through the
    histogram, never pairwise.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = docs.select(
        "source", text.tokens(F.col("text")).alias("_t")
    ).select("source", "_t", F.size("_t").alias("n"))
    paras = (
        staged.filter(F.col("n") > 0)
        .select(
            "source",
            "_t",
            F.explode(
                F.sequence(F.lit(0), F.expr(f"(n - 1) div {_PARA_W}"))
            ).alias("pi"),
        )
        .select(
            "source",
            text.md5_long(
                F.concat_ws(
                    " ", F.slice(F.col("_t"), F.col("pi") * _PARA_W + 1, _PARA_W)
                )
            ).alias("h"),
        )
    )
    hc = paras.groupBy("h").agg(F.count("*").cast("long").alias("cnt"))
    flagged = paras.join(hc, "h").select(
        "source", F.when(F.col("cnt") > 1, 1).otherwise(0).alias("dup")
    )
    return (
        flagged.rollup("source")
        .agg(
            F.count("*").cast("long").alias("n_paras"),
            F.sum("dup").cast("long").alias("dup_paras"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("*")).alias("source"),
            "n_paras",
            "dup_paras",
            F.expr("CAST(dup_paras * 1000000 div n_paras AS BIGINT)").alias(
                "dup_ppm"
            ),
        )
    )


docs_ccnet_paragraph_dedup.__doc__ = docs_ccnet_paragraph_dedup.__doc__.format(
    w=_PARA_W
)


# --------------------------------------------------------------------------
# Maximal Marginal Relevance diversified top-K
# --------------------------------------------------------------------------

_MMR_Q = 6  # query vectors (vec_id < Q)
_MMR_POOL = 8  # candidate pool per query (top-P by relevance)
_MMR_K = 4  # diversified selections per query
# λ = 0.7 in tenths: score = 7·rel − 3·maxsim (integer, micro² units)
_MMR_LAM10 = 7


def _mmr_oracle() -> str:
    steps = []
    sel_union = "SELECT qid, cid FROM s1"
    final = [
        "SELECT qid AS query_id, 1 AS step, cid AS picked_id,"
        " rel AS rel_fix, ms AS maxsim_fix, score AS score_fix FROM s1"
    ]
    for t in range(2, _MMR_K + 1):
        steps.append(
            f"""sel{t - 1} AS ({sel_union}),
    c{t} AS (
      SELECT p.qid, p.cid, p.rel FROM pool p
      LEFT JOIN sel{t - 1} s ON s.qid = p.qid AND s.cid = p.cid
      WHERE s.cid IS NULL
    ), m{t} AS (
      SELECT c.qid, c.cid, c.rel, MAX(ps.sim) AS ms
      FROM c{t} c
      JOIN ps ON ps.qid = c.qid AND ps.a = c.cid
      JOIN sel{t - 1} s ON s.qid = ps.qid AND s.cid = ps.b
      GROUP BY c.qid, c.cid, c.rel
    ), s{t} AS (
      SELECT qid, cid, rel, ms, {_MMR_LAM10} * rel - {10 - _MMR_LAM10} * ms
               AS score
      FROM (SELECT qid, cid, rel, ms,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY {_MMR_LAM10} * rel - {10 - _MMR_LAM10} * ms
                       DESC, cid) AS rk
            FROM m{t})
      WHERE rk = 1
    )"""
        )
        sel_union += f" UNION ALL SELECT qid, cid FROM s{t}"
        final.append(
            f"SELECT qid, {t}, cid, rel, ms,"
            f" score FROM s{t}"
        )
    step_sql = ",\n    ".join(steps)
    return f"""
    WITH comp AS (
      SELECT vec_id AS vid, i.i,
             CAST(round(embedding[i.i + 1]::DOUBLE * 1000000.0) AS BIGINT)
               AS xm
      FROM embeddings, (SELECT unnest(range(64)) AS i) i
    ), rel0 AS (
      SELECT q.vid AS qid, c.vid AS cid,
             SUM(q.xm::HUGEINT * c.xm) AS rel
      FROM comp q JOIN comp c ON c.i = q.i AND c.vid <> q.vid
      WHERE q.vid < {_MMR_Q}
      GROUP BY q.vid, c.vid
    ), pool AS MATERIALIZED (
      SELECT qid, cid, CAST(rel AS BIGINT) AS rel
      FROM (SELECT qid, cid, rel,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY rel DESC, cid) AS rk
            FROM rel0)
      WHERE rk <= {_MMR_POOL}
    ), ps AS MATERIALIZED (
      SELECT p1.qid, p1.cid AS a, p2.cid AS b,
             CAST(SUM(c1.xm::HUGEINT * c2.xm) AS BIGINT) AS sim
      FROM pool p1
      JOIN pool p2 ON p2.qid = p1.qid AND p2.cid <> p1.cid
      JOIN comp c1 ON c1.vid = p1.cid
      JOIN comp c2 ON c2.vid = p2.cid AND c2.i = c1.i
      GROUP BY p1.qid, p1.cid, p2.cid
    ), s1 AS (
      SELECT qid, cid, rel, CAST(0 AS BIGINT) AS ms,
             {_MMR_LAM10} * rel AS score
      FROM (SELECT qid, cid, rel,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY rel DESC, cid) AS rk
            FROM pool)
      WHERE rk = 1
    ),
    {step_sql}
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(step AS INTEGER) AS step,
           CAST(picked_id AS BIGINT) AS picked_id,
           CAST(rel_fix AS BIGINT) AS rel_fix,
           CAST(maxsim_fix AS BIGINT) AS maxsim_fix,
           CAST(score_fix AS BIGINT) AS score_fix
    FROM ({" UNION ALL ".join(final)})
      AS u(query_id, step, picked_id, rel_fix, maxsim_fix, score_fix)
    """


@register("embedding_mmr_rerank", oracle=_mmr_oracle())
def embedding_mmr_rerank(spark, sf_dir):
    """Maximal Marginal Relevance diversified top-{k} (Carbonell &
    Goldstein 1998) for {q} query vectors over a top-{p} relevance pool:
    step 1 picks the most relevant candidate; step t picks
    argmax_c λ·rel(c) − (1−λ)·max_(s∈S) sim(c, s) with λ = 0.7 —
    the greedy that trades relevance against redundancy when assembling
    a RAG context window.  Relevance and pairwise similarity are EXACT
    fixed-point inner products on the knn family's shared micro-unit
    component substrate (decimal(38) sums → bigint), λ is carried in
    tenths (score = 7·rel − 3·maxsim), and every argmax tie-breaks on
    candidate id — bit-identical greedy trajectories in both engines.

    Scale shape: ONE corpus scan computes the {q}-query relevance dots
    (query components broadcast, partial-combined sums, per-query top-{p}
    plans as WindowGroupLimit); everything after — the {q}×{p}×{p}
    pairwise sim table and {k} greedy rounds — lives on the
    query-bounded pool (checkpointed, ≤ {q}·{p} rows), so the greedy's
    inherent sequentiality costs {k} joins over a constant-size table,
    never another corpus pass.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    comp = similarity.component_rows(emb, 1, 64)  # (vid, m, comp, x)
    qc = comp.filter(F.col("vid") < _MMR_Q).select(
        F.col("vid").alias("qid"), "comp", F.col("x").alias("qx")
    )
    rel = (
        comp.join(F.broadcast(qc), "comp")
        .filter(F.col("vid") != F.col("qid"))
        .groupBy("qid", F.col("vid").alias("cid"))
        .agg(F.sum(F.expr(f"{_DEC.format('qx')} * x")).alias("_rel"))
    )
    pw = Window.partitionBy("qid").orderBy(
        F.col("_rel").desc(), F.col("cid").asc()
    )
    pool = (
        rel.withColumn("rk", F.row_number().over(pw))
        .filter(F.col("rk") <= _MMR_POOL)
        .select("qid", "cid", F.col("_rel").cast("long").alias("rel"))
        .localCheckpoint(eager=True)
    )
    pc = comp.join(
        F.broadcast(pool.select("qid", "cid")),
        comp["vid"] == F.col("cid"),
    ).select("qid", "cid", "comp", "x")
    ps = (
        pc.alias("a")
        .join(
            pc.alias("b"),
            (F.col("a.qid") == F.col("b.qid"))
            & (F.col("a.comp") == F.col("b.comp"))
            & (F.col("a.cid") != F.col("b.cid")),
        )
        .groupBy(
            F.col("a.qid").alias("qid"),
            F.col("a.cid").alias("a"),
            F.col("b.cid").alias("b"),
        )
        .agg(
            F.sum(F.expr("CAST(a.x AS DECIMAL(38,0)) * b.x"))
            .cast("long")
            .alias("sim")
        )
        .localCheckpoint(eager=True)
    )
    pick = (
        pool.withColumn("rk", F.row_number().over(pw.orderBy(
            F.col("rel").desc(), F.col("cid").asc()
        )))
        .filter(F.col("rk") == 1)
        .select(
            "qid",
            "cid",
            "rel",
            F.lit(0).cast("long").alias("ms"),
            (F.lit(_MMR_LAM10) * F.col("rel")).alias("score"),
        )
    )
    out = pick.select(
        F.col("qid"), F.lit(1).alias("step"), "cid", "rel", "ms", "score"
    )
    selected = pick.select("qid", "cid")
    for t in range(2, _MMR_K + 1):
        cand = pool.join(selected, ["qid", "cid"], "left_anti")
        ms = (
            cand.join(
                ps.join(
                    selected.withColumnRenamed("cid", "b"), ["qid", "b"]
                ).select("qid", F.col("a").alias("cid"), "sim"),
                ["qid", "cid"],
            )
            .groupBy("qid", "cid", "rel")
            .agg(F.max("sim").alias("ms"))
        )
        sw = Window.partitionBy("qid").orderBy(
            (
                F.lit(_MMR_LAM10) * F.col("rel")
                - F.lit(10 - _MMR_LAM10) * F.col("ms")
            ).desc(),
            F.col("cid").asc(),
        )
        step_pick = (
            ms.withColumn("rk", F.row_number().over(sw))
            .filter(F.col("rk") == 1)
            .select(
                "qid",
                "cid",
                "rel",
                "ms",
                (
                    F.lit(_MMR_LAM10) * F.col("rel")
                    - F.lit(10 - _MMR_LAM10) * F.col("ms")
                ).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            step_pick.select(
                "qid", F.lit(t).alias("step"), "cid", "rel", "ms", "score"
            )
        )
        selected = selected.unionByName(step_pick.select("qid", "cid"))
    return out.select(
        F.col("qid").cast("long").alias("query_id"),
        F.col("step").cast("int").alias("step"),
        F.col("cid").cast("long").alias("picked_id"),
        F.col("rel").cast("long").alias("rel_fix"),
        F.col("ms").cast("long").alias("maxsim_fix"),
        F.col("score").cast("long").alias("score_fix"),
    )


embedding_mmr_rerank.__doc__ = embedding_mmr_rerank.__doc__.format(
    k=_MMR_K, q=_MMR_Q, p=_MMR_POOL
)
