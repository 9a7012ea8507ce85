"""Round-8a ranking / association queries.

- ``knn_mrr``  Mean-reciprocal-rank readout of brute-force cosine
  retrieval with label relevance: the first-relevant rank per query and
  its reciprocal in exact ppm (1e6 div rank — no float, no constants) —
  the "how soon does the first right answer appear" companion to
  ``knn_label_ndcg``'s graded gain.
- ``corpus_kendall_tau``  Kendall τ-b rank agreement (Kendall 1938; τ-b
  tie correction per Agresti 2010) between term-frequency rankings of
  the even/odd document halves, over the top-100 term panel:
  concordant/discordant/tie pair census and the signed τ-b² in ppm —
  cross-multiplied so no square root is ever taken.
- ``lineitem_theil_index``  Theil T inequality of per-part revenues
  (Theil 1967): T = Σ (x/S)·ln(x·n/S) via the catalog's
  octave-interpolated log2 (bit-length integer part + linear fraction,
  identical in both engines) and the pinned ln(2) ppm constant — the
  decomposable inequality complement to ``lineitem_price_gini``.

Determinism per the package convention: integers end-to-end, per-term
ppm truncation BEFORE order-independent sums, sign-split truncating
division for signed ratios.

Reference anchor: datastax/kafka-sink has no analytics surface
(sink/src/main is record mapping + DSE writes, see SURVEY.md §2); this
module extends the north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# MRR@k with label relevance
# --------------------------------------------------------------------------

_MRR_K = 10
_MRR_QUERIES = 100


def _mrr_oracle(k: int = _MRR_K, nq: int = _MRR_QUERIES, dim: int = 64) -> str:
    from kafka_sink_spark.plans.analytics import _dot_sql, _norm_sql

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
    ), fr AS (
      SELECT query_id, ql, MIN(CASE WHEN cl = ql THEN rk END) AS frr
      FROM r WHERE rk <= {k} GROUP BY query_id, ql
    )
    SELECT query_id, CAST(ql AS BIGINT) AS label,
           CAST(COALESCE(frr, 0) AS BIGINT) AS first_rel_rank,
           CAST(CASE WHEN frr IS NULL THEN 0
                ELSE 1000000 // frr END AS BIGINT) AS rr_ppm
    FROM fr
    """


@register("knn_mrr", oracle=_mrr_oracle())
def knn_mrr(spark, sf_dir):
    """Reciprocal rank@{k} of brute-force cosine retrieval with the
    embedding label as binary relevance: per query, the rank of the
    FIRST same-label neighbor in the top-{k} (0 when none) and its
    reciprocal 1e6 div rank — exact integers, no pinned constants
    needed.  One row per query vector; the panel mean of rr_ppm is the
    MRR.

    Scale shape: identical to knn_label_ndcg — {q}-query broadcast panel
    against one corpus scan, per-query WindowGroupLimit top-{k}, then
    per-query constant arithmetic.  No global sort, no all-pairs stage.
    """
    from kafka_sink_spark.extensions import similarity

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < _MRR_QUERIES)
    knn = similarity.knn_bruteforce(emb, queries, k=_MRR_K)
    labels = emb.select("vec_id", "label")
    return (
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
                F.col("vec_id").alias("neighbor_id"), F.col("label").alias("cl")
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "ql")
        .agg(
            F.min(F.when(F.col("cl") == F.col("ql"), F.col("rank"))).alias("frr")
        )
        .select(
            "query_id",
            F.col("ql").cast("long").alias("label"),
            F.coalesce("frr", F.lit(0)).cast("long").alias("first_rel_rank"),
            F.expr(
                "CAST(CASE WHEN frr IS NULL THEN 0"
                " ELSE 1000000 div frr END AS BIGINT)"
            ).alias("rr_ppm"),
        )
    )


knn_mrr.__doc__ = knn_mrr.__doc__.format(k=_MRR_K, q=_MRR_QUERIES)


# --------------------------------------------------------------------------
# Kendall tau-b between half-corpus term rankings
# --------------------------------------------------------------------------

_KT_PANEL = 100

_KT_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id % 2 AS half,
             unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), tc AS (
      SELECT term,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
      FROM toks GROUP BY term
    ), panel AS (
      SELECT term, ca, cb,
             row_number() OVER (ORDER BY ca + cb DESC, term) AS rk
      FROM tc QUALIFY rk <= {_KT_PANEL}
    ), pairs AS (
      SELECT (x.ca - y.ca) AS da, (x.cb - y.cb) AS db
      FROM panel x JOIN panel y ON x.term < y.term
    ), census AS (
      SELECT COUNT(*) AS n0,
             SUM(CASE WHEN da * db > 0 THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN da * db < 0 THEN 1 ELSE 0 END) AS d,
             SUM(CASE WHEN da = 0 THEN 1 ELSE 0 END) AS ta,
             SUM(CASE WHEN db = 0 THEN 1 ELSE 0 END) AS tb
      FROM pairs
    )
    SELECT CAST({_KT_PANEL} AS BIGINT) AS n_terms,
           CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
           CAST(ta AS BIGINT) AS ties_a, CAST(tb AS BIGINT) AS ties_b,
           CAST(CASE WHEN c >= d
                THEN ((c - d)::HUGEINT * (c - d) * 1000000)
                     // ((n0 - ta)::HUGEINT * (n0 - tb))
                ELSE -(((d - c)::HUGEINT * (d - c) * 1000000)
                       // ((n0 - ta)::HUGEINT * (n0 - tb)))
           END AS BIGINT) AS tau_b2_signed_ppm
    FROM census
    """


@register("corpus_kendall_tau", oracle=_KT_ORACLE)
def corpus_kendall_tau(spark, sf_dir):
    """Kendall τ-b rank agreement between the term-frequency rankings of
    the even and odd document halves, over the top-{p} term panel: the
    split-half consistency certificate for any frequency-derived
    vocabulary (stable τ ⇒ the ranking is a corpus property, not a
    sampling artifact).  The tie-corrected τ-b is reported as signed
    τ-b² in ppm — sign(C−D)·(C−D)²·1e6 div ((n0−t_a)(n0−t_b)) — so no
    square root is ever taken and both engines agree bit-for-bit.

    Scale shape: one corpus-sized token count (partial-combined); the
    top-{p} panel is a TakeOrderedAndProject; the pair census is a
    {p}×{p}/2 broadcast self-join over constant rows — no stage scales
    with the corpus beyond the initial count.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tc = (
        docs.select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(text_ops.tokens(F.col("text"))).alias("term"),
        )
        .groupBy("term")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    panel = tc.orderBy(
        (F.col("ca") + F.col("cb")).desc(), F.col("term")
    ).limit(_KT_PANEL)
    pairs = (
        panel.alias("x")
        .join(
            F.broadcast(panel.alias("y")),
            F.col("x.term") < F.col("y.term"),
        )
        .select(
            (F.col("x.ca") - F.col("y.ca")).alias("da"),
            (F.col("x.cb") - F.col("y.cb")).alias("db"),
        )
    )
    census = pairs.agg(
        F.count("*").alias("n0"),
        F.sum(F.when(F.col("da") * F.col("db") > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("da") * F.col("db") < 0, 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("da") == 0, 1).otherwise(0)).alias("ta"),
        F.sum(F.when(F.col("db") == 0, 1).otherwise(0)).alias("tb"),
    )
    return census.select(
        F.lit(_KT_PANEL).cast("long").alias("n_terms"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.col("ta").cast("long").alias("ties_a"),
        F.col("tb").cast("long").alias("ties_b"),
        F.expr(
            "CAST(CASE WHEN c >= d"
            " THEN (CAST(c - d AS DECIMAL(38,0)) * (c - d) * 1000000)"
            " div (CAST(n0 - ta AS DECIMAL(38,0)) * (n0 - tb))"
            " ELSE -((CAST(d - c AS DECIMAL(38,0)) * (d - c) * 1000000)"
            " div (CAST(n0 - ta AS DECIMAL(38,0)) * (n0 - tb)))"
            " END AS BIGINT)"
        ).alias("tau_b2_signed_ppm"),
    )


corpus_kendall_tau.__doc__ = corpus_kendall_tau.__doc__.format(p=_KT_PANEL)


# --------------------------------------------------------------------------
# Theil T inequality of per-part revenues
# --------------------------------------------------------------------------

_LN2_PPM = 693_147  # ln(2) in ppm, truncated — pinned


def _theil_oracle() -> str:
    from kafka_sink_spark.plans.analytics_readability import _DUCK_LOG2

    # Bounded probability-ratio form (r10, analytics_readability.py
    # note): the Theil log ratio x·n/S is (x/S)/(1/n) — the part's
    # revenue share against the uniform share, both in 1e12 fixed
    # point: arguments bounded by 1e12 (the r9 rev·n cliff caught by
    # the sf10 ladder is gone for good) and the octave biases cancel
    # on a uniform revenue distribution, keeping T ~0 there.
    from kafka_sink_spark.plans.analytics_readability import duck_ratio_pt

    lx = _DUCK_LOG2.format(x=duck_ratio_pt("x.rev", "n.s"))
    ls = _DUCK_LOG2.format(x=duck_ratio_pt("1", "n.n"))
    return f"""
    WITH pr AS (
      SELECT l_partkey AS pk,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT)) AS rev
      FROM lineitem GROUP BY l_partkey
    ), x AS (SELECT pk, rev FROM pr WHERE rev > 0),
    n AS (
      SELECT COUNT(*) AS n, SUM(rev) AS s FROM x
    ), terms AS (
      SELECT CASE
               WHEN (x.rev::HUGEINT * ({lx} - {ls})) >= 0
               THEN (x.rev::HUGEINT * ({lx} - {ls})) // n.s
               ELSE -((-(x.rev::HUGEINT * ({lx} - {ls}))) // n.s)
             END AS t_ppm_bits
      FROM x, n
    )
    SELECT CAST(n.n AS BIGINT) AS n_parts, CAST(n.s AS BIGINT) AS total_cents,
           CAST(SUM(terms.t_ppm_bits) AS BIGINT) AS theil_ppm_bits,
           CAST(CASE WHEN SUM(terms.t_ppm_bits) >= 0
                THEN SUM(terms.t_ppm_bits) * {_LN2_PPM} // 1000000
                ELSE -((-SUM(terms.t_ppm_bits)) * {_LN2_PPM} // 1000000)
           END AS BIGINT) AS theil_nats_ppm
    FROM terms, n
    GROUP BY n.n, n.s
    """


@register("lineitem_theil_index", oracle=_theil_oracle())
def lineitem_theil_index(spark, sf_dir):
    """Theil T inequality of per-part discounted revenues:
    T = Σ (x/S)·ln(x·n/S), computed log-free via the catalog's
    octave-interpolated log2 (bit-length + linear within-octave fraction,
    bit-identical cross-engine, ≤0.0861-bit octave bias) and one pinned
    ln(2) ppm constant.  Theil complements the Gini
    (`lineitem_price_gini`): it is additively DECOMPOSABLE across
    subgroups, which makes it the inequality measure a partitioned
    engine can roll up hierarchically.

    Per-term t = sign-split (x · (log2(x·n) − log2(S))) div S, truncated
    to ppm-bits BEFORE the order-independent sum; the nats conversion is
    one final ln2 multiply.

    Scale shape: one fact-sized partial-combined revenue rollup; the
    (n, S) pair is a single-row broadcast; the term pass is one
    projection + one partial-combined sum.  The log ratio rides the
    bounded probability-ratio convention (r10,
    analytics_readability.py): lg(revenue-share·1e12) −
    lg(uniform-share·1e12), arguments bounded by 1e12 at any SF (the
    r9 rev·n product form hit its cliff at rev·n ≈ 2^63, caught by the
    sf10 ladder) and octave biases cancelling on uniform revenues.
    """
    from kafka_sink_spark.plans.analytics_readability import _SPARK_LOG2

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.expr(
                "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)"
                " AS BIGINT)"
            )
        ).alias("rev")
    )
    # Two consumers ((n,S) aggregate + the term pass) read the rollup;
    # localCheckpoint it so the fact scan runs once (the drift-probe
    # discipline) — the checkpointed table is one row per part, orders of
    # magnitude smaller than lineitem.
    x = pr.where(F.col("rev") > 0).localCheckpoint(eager=True)
    n = x.agg(
        F.count("*").cast("long").alias("n"), F.sum("rev").cast("long").alias("s")
    )
    # Bounded probability-ratio form (r10) — see the oracle note:
    # lg(revenue-share·1e12) − lg(uniform-share·1e12).
    from kafka_sink_spark.plans.analytics_readability import spark_ratio_pt

    # Stage the fixed-point probabilities, then the signed product, each
    # once per row (the lg template reads its argument 4×, the sign-split
    # CASE the product 3× — same staging discipline as keyness/MI/KL).
    lx = _SPARK_LOG2.format(x="p_pt")
    ls = _SPARK_LOG2.format(x="q_pt")
    terms = (
        x.crossJoin(F.broadcast(n))
        .select(
            "n",
            "s",
            "rev",
            F.expr(spark_ratio_pt("rev", "s")).alias("p_pt"),
            F.expr(spark_ratio_pt("1", "n")).alias("q_pt"),
        )
        .select(
            "n",
            "s",
            F.expr(
                f"CAST(rev AS DECIMAL(38,0)) * (({lx}) - ({ls}))"
            ).alias("prod"),
        )
        .select(
            "n",
            "s",
            F.expr(
                "CASE WHEN prod >= 0 THEN prod div s"
                " ELSE -((-prod) div s) END"
            ).alias("t_ppm_bits"),
        )
    )
    return terms.groupBy("n", "s").agg(
        F.sum("t_ppm_bits").cast("long").alias("theil_ppm_bits")
    ).select(
        F.col("n").alias("n_parts"),
        F.col("s").alias("total_cents"),
        "theil_ppm_bits",
        F.expr(
            "CAST(CASE WHEN theil_ppm_bits >= 0"
            f" THEN theil_ppm_bits * {_LN2_PPM} div 1000000"
            f" ELSE -((-theil_ppm_bits) * {_LN2_PPM} div 1000000)"
            " END AS BIGINT)"
        ).alias("theil_nats_ppm"),
    )
