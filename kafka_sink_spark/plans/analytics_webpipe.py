"""Round-13 wave: the END-TO-END web-curation funnel (r12 verdict ask #6).

The catalog separately certifies every stage a CCNet/RefinedWeb-shaped
corpus build runs — URL canonical dedup (Wenzek et al. 2020 CCNet; Penedo
et al. 2023 RefinedWeb §4.1), line dedup (CCNet §3.1), the fastText-style
quality classifier (Joulin et al. 2016), the held-out Kneser-Ney bigram
perplexity screen (CCNet's KenLM stage), benchmark decontamination (the
DF-pruned rare-shingle rule), and exact-substring span excision (Lee et
al. 2022).  This module composes them into the SINGLE readout a 100 TB
curation run actually publishes when it commits the cut: per source (and
as a corpus-wide stage ladder), the doc and token mass surviving
URL-dedup → line-dedup → classifier → perplexity → decontamination →
excision.

Composition semantics (documented, deliberate): each stage's per-doc
decision comes from its CERTIFIED frame, computed corpus-wide — the
funnel ATTRIBUTES each dropped doc to its first failing stage in pipeline
order rather than re-running later stages on the shrunken corpus (the
per-stage recompute is the individual certified queries' job; the
attribution readout is what the pipeline publishes — RefinedWeb Fig. 2
style).  Doc-level stages: a doc is dropped at url_dedup when it is not
the first (min doc_id) occurrence of its canonical URL; at classifier
when score_micro < 0 (docs with no tokens score as dropped); at
perplexity when it is a held-out doc (doc_id%10>=8) whose NLL-per-bigram
reaches the fixed 5.0 bits cut (train-split docs pass — they ARE the LM's
training data); at decontamination when it hits the rare-shingle overlap
rule.  Content-level stages never drop docs: line_dedup's cut is measured
in joined-line chars (tokens + separator spaces — its own certified
unit), span_excision's in token chars, so the two are published as
separate attribution columns and only the span cut participates in the
token-char ledger (subtracting line chars from token chars would mix
units).

Scale shape: six certified per-doc frames — two of them the persisted
excision/line substrates — joined on the single doc_id key
(co-partitioned equi-joins), then ONE partial-combined rollup.  The
composition itself adds NO hints (r6 constant-size rule; every funnel
side scales with the corpus); the only hints in the analyzed plan are the
substrates' own sanctioned five — the excision dup-set shuffle_hash (the
r12 sf10 OOM fix), the excision coverage-join merge pin and the two decon
shuffle pins (the r13 sf30 OOM fixes), and the KN chain's 1-row total
broadcast — pinned by tests/test_plan_invariants.py.  Every published number is an exact
integer, so the DuckDB twin hash-matches bit-for-bit.

Reference anchor: datastax/kafka-sink has no analytics surface
(sink/src/main is record mapping + DSE writes, SURVEY.md §2); this module
completes COVERAGE.md's curation family with the composed funnel.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions.web import canonicalize_url
from kafka_sink_spark.plans.analytics_curation import (
    _DECON_CTES,
    _decon_flagged,
)
from kafka_sink_spark.plans.analytics_readability import _DUCK_LOG2
from kafka_sink_spark.plans.analytics_sanitize import (
    _CLS2_CTES,
    _EXC_CTES,
    _LIN_CTES,
    _cls_scored,
    _excision_per_doc,
    _line_per_doc,
)
from kafka_sink_spark.plans.analytics_weblm import (
    _CANON_DUCK,
    _KN_CTES,
    _KN_KEEP_QBITS,
    _P_PT_DUCK,
    _URL_SQL_DUCK,
    _URL_SQL_SPARK,
    _kn_scored,
)
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# ---------------------------------------------------------------------------
# Shared oracle CTE chain: every certified stage fragment + the funnel spine.
# Fragments are imported from their owning modules (single-source, per the
# r11 log2-template lesson); only the spine/attribution SQL lives here.
# ---------------------------------------------------------------------------

_KN_FRAG = _KN_CTES.format(p_pt=_P_PT_DUCK, lg=_DUCK_LOG2.format(x="p_pt"))

_SPINE_CTES = f"""{_EXC_CTES}, {_LIN_CTES}, {_CLS2_CTES}, {_KN_FRAG},
    raw AS (
      SELECT doc_id, {_URL_SQL_DUCK} AS raw_url FROM documents
    ), {_CANON_DUCK}, urlkeep AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY curl ORDER BY doc_id) AS urn
      FROM canon
    ), {_DECON_CTES}, spine AS (
      SELECT d.doc_id, d.source,
             COALESCE(p.removed_chars + p.kept_chars, 0) AS tc,
             COALESCE(p.removed_chars, 0) AS sr,
             COALESCE(p.kept_chars, 0) AS ek,
             COALESCE(l.line_removed_chars, 0) AS lr,
             (u.urn > 1) AS url_drop,
             (COALESCE(s.score_micro, -1) < 0) AS cls_drop,
             (d.doc_id % 10 >= 8
              AND COALESCE((pd.nll_sum // pd.n_bg) // 62500, 0)
                  >= {_KN_KEEP_QBITS}) AS ppl_drop,
             (f.train_id IS NOT NULL) AS dec_drop
      FROM documents d
      JOIN urlkeep u ON u.doc_id = d.doc_id
      LEFT JOIN per p ON p.doc_id = d.doc_id
      LEFT JOIN lin l ON l.doc_id = d.doc_id
      LEFT JOIN scored2 s ON s.doc_id = d.doc_id
      LEFT JOIN perdoc pd ON pd.doc_id = d.doc_id
      LEFT JOIN flagged f ON f.train_id = d.doc_id
    ), att AS (
      SELECT doc_id, source, tc, sr, ek, lr,
             CASE WHEN url_drop THEN 1 ELSE 0 END AS a_url,
             CASE WHEN NOT url_drop AND cls_drop THEN 1 ELSE 0 END AS a_cls,
             CASE WHEN NOT url_drop AND NOT cls_drop AND ppl_drop
                  THEN 1 ELSE 0 END AS a_ppl,
             CASE WHEN NOT url_drop AND NOT cls_drop AND NOT ppl_drop
                       AND dec_drop THEN 1 ELSE 0 END AS a_dec,
             CASE WHEN NOT url_drop AND NOT cls_drop AND NOT ppl_drop
                       AND NOT dec_drop THEN 1 ELSE 0 END AS sv
      FROM spine
    )"""


def _web_spine(spark, sf_dir):
    """Per-doc funnel spine: (doc_id, source, tc, sr, ek, lr, a_url, a_cls,
    a_ppl, a_dec, sv) — token chars, span-removed/kept chars, line-removed
    chars, the four first-fail drop attributions, and the survive flag.
    The Spark twin of the ``att`` CTE above, built from the six certified
    stage frames joined on doc_id.

    Intentional population choice: the funnel keeps the doc_id % 97 == 0
    benchmark-proxy docs IN the corpus as droppable members (dec_drop can
    fire on a bench doc), whereas the certified docs_decontaminate_report
    excludes them from its train spine.  A production curation run treats
    every corpus doc — including any that happen to mirror a benchmark —
    as a removal candidate; the per-stage certified query answers the
    narrower "how much of the *train-only* split is contaminated"
    question.  Spark and the DuckDB oracle agree under either reading;
    the oracle's ``spine`` CTE above encodes the same choice."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    exc = _excision_per_doc(spark, sf_dir).select(
        "doc_id", "removed_chars", "kept_chars"
    )
    lin = _line_per_doc(spark, sf_dir).select(
        "doc_id", F.col("removed_chars").alias("_lr")
    )
    cls = _cls_scored(spark, sf_dir).select("doc_id", "score_micro")
    kn = _kn_scored(spark, sf_dir)
    flag = _decon_flagged(spark, sf_dir).withColumn("_dec", F.lit(1))
    canon = docs.select(
        "doc_id", F.expr(_URL_SQL_SPARK).alias("raw_url")
    ).select("doc_id", *canonicalize_url(F.col("raw_url")))
    urlkeep = canon.select(
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("curl").orderBy(F.col("doc_id").asc()))
        .alias("urn"),
    )
    joined = (
        docs.select("doc_id", "source")
        .join(urlkeep, "doc_id")
        .join(exc, "doc_id", "left")
        .join(lin, "doc_id", "left")
        .join(cls, "doc_id", "left")
        .join(kn, "doc_id", "left")
        .join(flag, "doc_id", "left")
    )
    url_drop = F.col("urn") > 1
    cls_drop = F.coalesce(F.col("score_micro"), F.lit(-1)) < 0
    ppl_drop = (F.col("doc_id") % 10 >= 8) & (
        F.expr("COALESCE((nll_sum div n_bg) div 62500, 0)")
        >= F.lit(_KN_KEEP_QBITS)
    )
    dec_drop = F.col("_dec").isNotNull()
    flag1 = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return joined.select(
        "doc_id",
        "source",
        F.coalesce(F.col("removed_chars") + F.col("kept_chars"), F.lit(0))
        .cast("long")
        .alias("tc"),
        F.coalesce(F.col("removed_chars"), F.lit(0)).cast("long").alias("sr"),
        F.coalesce(F.col("kept_chars"), F.lit(0)).cast("long").alias("ek"),
        F.coalesce(F.col("_lr"), F.lit(0)).cast("long").alias("lr"),
        flag1(url_drop).alias("a_url"),
        flag1(~url_drop & cls_drop).alias("a_cls"),
        flag1(~url_drop & ~cls_drop & ppl_drop).alias("a_ppl"),
        flag1(~url_drop & ~cls_drop & ~ppl_drop & dec_drop).alias("a_dec"),
        flag1(~url_drop & ~cls_drop & ~ppl_drop & ~dec_drop).alias("sv"),
    )


@register(
    "pipeline_web_curation_report",
    oracle=f"""
    WITH {_SPINE_CTES}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(a_url) AS BIGINT) AS url_dropped,
           CAST(SUM(a_cls) AS BIGINT) AS cls_dropped,
           CAST(SUM(a_ppl) AS BIGINT) AS ppl_dropped,
           CAST(SUM(a_dec) AS BIGINT) AS decon_dropped,
           CAST(SUM(sv) AS BIGINT) AS surviving_docs,
           CAST(SUM(tc) AS BIGINT) AS token_chars_total,
           CAST(SUM(sv * tc) AS BIGINT) AS token_chars_surviving,
           CAST(SUM(sv * lr) AS BIGINT) AS line_removed_chars,
           CAST(SUM(sv * sr) AS BIGINT) AS span_removed_chars,
           CAST(SUM(sv * ek) AS BIGINT) AS token_chars_final
    FROM att GROUP BY source
    """,
)
def pipeline_web_curation_report(spark, sf_dir):
    """Per-source end-to-end curation funnel (module docstring for the
    composition semantics): doc counts dropped at each doc-level stage
    (first-fail attribution in pipeline order), survivors, and the token
    mass ledger — total token chars, survivors' token chars, the line
    cut (joined-line units) and span cut over survivors, and the final
    post-excision token chars the build would ship.

    Scale shape: six doc_id-keyed equi-joins of certified per-doc frames
    (two persisted substrates shared with their owning queries) + one
    partial-combined per-source rollup; no hints, no cartesians, nothing
    collected."""
    sp = _web_spine(spark, sf_dir)
    sv = F.col("sv")
    return sp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("a_url").cast("long").alias("url_dropped"),
        F.sum("a_cls").cast("long").alias("cls_dropped"),
        F.sum("a_ppl").cast("long").alias("ppl_dropped"),
        F.sum("a_dec").cast("long").alias("decon_dropped"),
        F.sum("sv").cast("long").alias("surviving_docs"),
        F.sum("tc").cast("long").alias("token_chars_total"),
        F.sum(sv * F.col("tc")).cast("long").alias("token_chars_surviving"),
        F.sum(sv * F.col("lr")).cast("long").alias("line_removed_chars"),
        F.sum(sv * F.col("sr")).cast("long").alias("span_removed_chars"),
        F.sum(sv * F.col("ek")).cast("long").alias("token_chars_final"),
    )


@register(
    "pipeline_web_stage_ladder",
    oracle=f"""
    WITH {_SPINE_CTES}, summ AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a_url) AS BIGINT) AS d_url,
             CAST(SUM(a_cls) AS BIGINT) AS d_cls,
             CAST(SUM(a_ppl) AS BIGINT) AS d_ppl,
             CAST(SUM(a_dec) AS BIGINT) AS d_dec,
             CAST(SUM(sv) AS BIGINT) AS n_sv,
             CAST(SUM(a_url * tc) AS BIGINT) AS tc_url_drop,
             CAST(SUM((1 - a_url) * tc) AS BIGINT) AS tc_p1,
             CAST(SUM((1 - a_url) * lr) AS BIGINT) AS lr_p1,
             CAST(SUM(a_cls * tc) AS BIGINT) AS tc_cls_drop,
             CAST(SUM(a_ppl * tc) AS BIGINT) AS tc_ppl_drop,
             CAST(SUM(a_dec * tc) AS BIGINT) AS tc_dec_drop,
             CAST(SUM(sv * tc) AS BIGINT) AS tc_sv,
             CAST(SUM(sv * sr) AS BIGINT) AS sr_sv,
             CAST(SUM(sv * ek) AS BIGINT) AS ek_sv
      FROM att
    )
    SELECT CAST(stage_ord AS INTEGER) AS stage_ord, stage,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_dropped AS BIGINT) AS docs_dropped,
           CAST(docs_out AS BIGINT) AS docs_out,
           CAST(chars_removed AS BIGINT) AS chars_removed,
           CAST(token_chars_out AS BIGINT) AS token_chars_out
    FROM (
      SELECT 1 AS stage_ord, 'url_dedup' AS stage, n AS docs_in,
             d_url AS docs_dropped, n - d_url AS docs_out,
             tc_url_drop AS chars_removed, tc_p1 AS token_chars_out
      FROM summ
      UNION ALL SELECT 2, 'line_dedup', n - d_url, 0, n - d_url,
                       lr_p1, tc_p1 FROM summ
      UNION ALL SELECT 3, 'classifier', n - d_url, d_cls,
                       n - d_url - d_cls, tc_cls_drop,
                       tc_p1 - tc_cls_drop FROM summ
      UNION ALL SELECT 4, 'perplexity', n - d_url - d_cls, d_ppl,
                       n - d_url - d_cls - d_ppl, tc_ppl_drop,
                       tc_p1 - tc_cls_drop - tc_ppl_drop FROM summ
      UNION ALL SELECT 5, 'decontamination', n - d_url - d_cls - d_ppl,
                       d_dec, n_sv, tc_dec_drop, tc_sv FROM summ
      UNION ALL SELECT 6, 'span_excision', n_sv, 0, n_sv, sr_sv, ek_sv
      FROM summ
    )
    """,
)
def pipeline_web_stage_ladder(spark, sf_dir):
    """Corpus-wide six-row stage ladder of the same funnel: per stage in
    pipeline order, docs in/dropped/out, the char mass the stage removes
    (each stage's own certified unit — joined-line chars for line_dedup,
    token chars everywhere else), and the running token-char ledger
    (line_dedup leaves the token ledger unchanged BY DESIGN: its cut is
    measured in a different unit, published in chars_removed only —
    module docstring).

    Scale shape: the per-doc spine reduces to ONE 1-row aggregate
    (partial-combined), then a constant 6-row stack — the ladder costs
    one pass over the spine regardless of corpus size."""
    sp = _web_spine(spark, sf_dir)
    c = F.col
    agg = sp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a_url").cast("long").alias("d_url"),
        F.sum("a_cls").cast("long").alias("d_cls"),
        F.sum("a_ppl").cast("long").alias("d_ppl"),
        F.sum("a_dec").cast("long").alias("d_dec"),
        F.sum("sv").cast("long").alias("n_sv"),
        F.sum(c("a_url") * c("tc")).cast("long").alias("tc_url_drop"),
        F.sum((1 - c("a_url")) * c("tc")).cast("long").alias("tc_p1"),
        F.sum((1 - c("a_url")) * c("lr")).cast("long").alias("lr_p1"),
        F.sum(c("a_cls") * c("tc")).cast("long").alias("tc_cls_drop"),
        F.sum(c("a_ppl") * c("tc")).cast("long").alias("tc_ppl_drop"),
        F.sum(c("a_dec") * c("tc")).cast("long").alias("tc_dec_drop"),
        F.sum(c("sv") * c("tc")).cast("long").alias("tc_sv"),
        F.sum(c("sv") * c("sr")).cast("long").alias("sr_sv"),
        F.sum(c("sv") * c("ek")).cast("long").alias("ek_sv"),
    )
    return agg.selectExpr(
        """stack(6,
           1, 'url_dedup', n, d_url, n - d_url, tc_url_drop, tc_p1,
           2, 'line_dedup', n - d_url, CAST(0 AS BIGINT), n - d_url,
              lr_p1, tc_p1,
           3, 'classifier', n - d_url, d_cls, n - d_url - d_cls,
              tc_cls_drop, tc_p1 - tc_cls_drop,
           4, 'perplexity', n - d_url - d_cls, d_ppl,
              n - d_url - d_cls - d_ppl, tc_ppl_drop,
              tc_p1 - tc_cls_drop - tc_ppl_drop,
           5, 'decontamination', n - d_url - d_cls - d_ppl, d_dec, n_sv,
              tc_dec_drop, tc_sv,
           6, 'span_excision', n_sv, CAST(0 AS BIGINT), n_sv, sr_sv, ek_sv
        ) AS (stage_ord, stage, docs_in, docs_dropped, docs_out,
              chars_removed, token_chars_out)"""
    ).select(
        F.col("stage_ord").cast("int").alias("stage_ord"),
        "stage",
        F.col("docs_in").cast("long").alias("docs_in"),
        F.col("docs_dropped").cast("long").alias("docs_dropped"),
        F.col("docs_out").cast("long").alias("docs_out"),
        F.col("chars_removed").cast("long").alias("chars_removed"),
        F.col("token_chars_out").cast("long").alias("token_chars_out"),
    )
