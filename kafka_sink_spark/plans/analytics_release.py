"""Round-7e capstone: the composed RELEASE-AUDIT pipeline.

``pipeline_release_audit`` chains three catalog stages end-to-end — Gopher
quality gating (docs_gopher_filter's exact rule set), exact content dedup
(the dedup_exact survivor rule), and MATTR lexical diversity
(docs_mattr's O(L) rewrite) — into the per-language release-readiness
report a training-data pipeline runs before shipping a corpus snapshot:
how many documents survive each gate, the end-to-end retention, and the
mean lexical diversity of what ships.  The third composed capstone beside
``pipeline_training_data`` (profile→filter→dedup) and
``pipeline_curation_v2`` (bigram-substrate curation).

Determinism: every stage reuses the exact expressions its standalone
query certifies; the only new arithmetic is truncating ppm ratios of
exact counts and the truncated mean of per-doc truncated ppm values —
deterministic cross-engine by construction.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.analytics_evaluation import _MATTR_W
from kafka_sink_spark.plans.analytics_quality import _GOPHER, _SW_LIST
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_RELEASE_ORACLE = rf"""
    WITH t AS (
      SELECT doc_id, lang, text,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id, lang, text,
        CAST(len(toks) AS BIGINT) AS n_words,
        round(CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS DOUBLE)
              / greatest(len(toks), 1), 6) AS mean_word_len,
        round(CAST(len(list_filter(toks,
                x -> starts_with(x, '#') OR contains(x, '...'))) AS DOUBLE)
              / greatest(len(toks), 1), 6) AS symbol_ratio,
        round(CAST(len(list_filter(toks,
                x -> regexp_matches(lower(x), '[a-z]'))) AS DOUBLE)
              / greatest(len(toks), 1), 6) AS alpha_frac,
        CAST(len(list_filter(toks,
                x -> list_contains([{_SW_LIST}], lower(x)))) AS BIGINT) AS n_stop
      FROM t
    ), pass AS (
      SELECT doc_id, lang, text FROM m
      WHERE n_words BETWEEN {_GOPHER["min_words"]} AND {_GOPHER["max_words"]}
        AND mean_word_len BETWEEN {_GOPHER["min_mean_len"]}
            AND {_GOPHER["max_mean_len"]}
        AND symbol_ratio < {_GOPHER["max_symbol_ratio"]}
        AND alpha_frac > {_GOPHER["min_alpha_frac"]}
        AND n_stop >= {_GOPHER["min_stopwords"]}
    ), keep AS (
      SELECT MIN(doc_id) AS doc_id FROM pass GROUP BY md5(text)
    ), surv AS (
      SELECT p.doc_id, p.lang, p.text FROM pass p
      JOIN keep k ON k.doc_id = p.doc_id
    ), sarr AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS st
      FROM surv
    ), stoks AS (
      SELECT doc_id, lang, CAST(u.p AS BIGINT) AS p, st[u.p + 1] AS term
      FROM sarr, unnest(range(len(st))) AS u(p)
    ), slens AS (
      SELECT doc_id, COUNT(*) AS len FROM stoks GROUP BY doc_id
    ), slagged AS (
      SELECT s.doc_id, s.lang, s.p,
             lag(s.p) OVER (PARTITION BY s.doc_id, s.term ORDER BY s.p) AS q
      FROM stoks s
    ), scontrib AS (
      SELECT l.doc_id, l.lang,
             LEAST({_MATTR_W}, slens.len) AS win_len,
             slens.len - LEAST({_MATTR_W}, slens.len) + 1 AS n_windows,
             GREATEST(0,
               LEAST(l.p, slens.len - LEAST({_MATTR_W}, slens.len))
               - GREATEST(0, l.p - LEAST({_MATTR_W}, slens.len) + 1,
                          COALESCE(l.q, -1) + 1)
               + 1) AS c
      FROM slagged l JOIN slens ON slens.doc_id = l.doc_id
    ), smattr AS (
      SELECT doc_id, lang,
             SUM(c) * 1000000 // (win_len * n_windows) AS mattr_ppm
      FROM scontrib GROUP BY doc_id, lang, win_len, n_windows
    ), raw_c AS (
      SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY lang
    ), pass_c AS (
      SELECT lang, COUNT(*) AS n_quality FROM pass GROUP BY lang
    ), surv_c AS (
      SELECT lang, COUNT(*) AS n_unique, SUM(mattr_ppm) AS mattr_sum
      FROM smattr GROUP BY lang
    )
    SELECT raw_c.lang, CAST(raw_c.n_raw AS BIGINT) AS n_raw,
           CAST(COALESCE(pass_c.n_quality, 0) AS BIGINT) AS n_quality,
           CAST(COALESCE(surv_c.n_unique, 0) AS BIGINT) AS n_unique,
           CAST(COALESCE(surv_c.n_unique, 0) * 1000000 // raw_c.n_raw AS BIGINT)
             AS retention_ppm,
           CAST(CASE WHEN COALESCE(surv_c.n_unique, 0) = 0 THEN 0
                     ELSE surv_c.mattr_sum // surv_c.n_unique END AS BIGINT)
             AS mean_mattr_ppm
    FROM raw_c
    LEFT JOIN pass_c ON pass_c.lang = raw_c.lang
    LEFT JOIN surv_c ON surv_c.lang = raw_c.lang
    """


@register("pipeline_release_audit", oracle=_RELEASE_ORACLE)
def pipeline_release_audit(spark, sf_dir):
    """Composed release audit: Gopher quality gate → exact content dedup →
    MATTR lexical diversity, rolled up per language.  For each language:
    raw document count, quality survivors, unique survivors (lowest doc_id
    per content hash — the dedup_exact rule), end-to-end retention in ppm,
    and the mean MATTR of what ships (mean of per-doc truncated ppm,
    itself truncated — deterministic).  Every stage reuses the exact
    expressions its standalone catalog query certifies, so this row
    certifies the COMPOSITION: gates feeding gates without a collect or a
    re-read between them.

    Scale shape: the quality gate is the zero-shuffle staged projection of
    docs_gopher_filter; dedup is one shuffle on the content hash + an
    unhinted semi join on doc_id (broadcast while small, shuffle at
    100 TB); MATTR is one doc-keyed exchange carrying both the length
    window and the (doc, term) lag window (subset rule) over survivors
    only; the final rollup partial-combines on the tiny language key.
    Stage boundaries are the only shuffles — the same one-shuffle-per-gate
    budget as pipeline_training_data — and the quality-gate frame is
    persisted once for its three consumers (r14).
    """
    from pyspark import StorageLevel

    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    flags = text_ops.gopher_flags(docs, **_GOPHER)
    pass_ids = flags.filter(F.col("ok_all") == 1).select("doc_id")
    # passed feeds the dedup hash rollup, the survivor semi-join AND the
    # per-language quality count — without the persist each consumer re-runs
    # the full Gopher staged projection over the corpus scan (r14, guide
    # §7.2: three consumers, one pass).
    passed = (
        docs.join(pass_ids, "doc_id", "left_semi")
        .select("doc_id", "lang", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    keep = (
        passed.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = passed.join(keep, "doc_id", "left_semi")

    stoks = surv.select(
        "doc_id",
        "lang",
        F.posexplode(text_ops.tokens(F.col("text"))).alias("p", "term"),
    )
    # Document length rides a doc-keyed window over the SAME exploded pass
    # instead of a separate aggregation branch + join (which re-executed the
    # whole survivor explode). The doc_id exchange it plans first satisfies
    # the (doc_id, term) lag window's clustering by the subset rule, so the
    # lag pass adds only a local sort — one exchange total (r14, guide §2.4).
    len_w = Window.partitionBy("doc_id")
    lag_w = Window.partitionBy("doc_id", "term").orderBy("p")
    slagged = stoks.withColumn(
        "len", F.count("*").over(len_w).cast("long")
    ).select(
        "doc_id", "lang", "p", "len", F.lag("p").over(lag_w).alias("q")
    )
    scontrib = slagged.select(
        "doc_id",
        "lang",
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
    smattr = (
        scontrib.groupBy("doc_id", "lang", "win_len", "n_windows")
        .agg(F.sum("c").alias("mass"))
        .select(
            "doc_id",
            "lang",
            F.expr("mass * 1000000 div (win_len * n_windows)").alias("mattr_ppm"),
        )
    )

    raw_c = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_raw"))
    pass_c = passed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_quality")
    )
    surv_c = smattr.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_unique"),
        F.sum("mattr_ppm").alias("mattr_sum"),
    )
    return (
        raw_c.join(pass_c, "lang", "left")
        .join(surv_c, "lang", "left")
        .select(
            "lang",
            "n_raw",
            F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.expr(
                "CAST(COALESCE(n_unique, 0) * 1000000 div n_raw AS BIGINT)"
            ).alias("retention_ppm"),
            F.expr(
                "CAST(CASE WHEN COALESCE(n_unique, 0) = 0 THEN 0"
                " ELSE mattr_sum div n_unique END AS BIGINT)"
            ).alias("mean_mattr_ppm"),
        )
    )
