"""Round-12 wave (12a): corpus-sanitizing TRANSFORMS + trained-classifier
scoring — the two stages the r11 verdict named missing from the screening
family (asks #4 and #6).

The catalog already MEASURES repeated spans (``docs_repeated_spans``,
``docs_maximal_spans``) but never removes them.  This module adds the
removal side of the pipeline:

- ``docs_span_excision``       Lee et al. 2022 ("Deduplicating Training
  Data Makes Language Models Better") ExactSubstr-style span excision:
  every token covered by a cross-document duplicated k-token span is
  excised; per-doc removed-token/char counts.
- ``docs_excision_length_dist``  the rewritten-length distribution after
  excision, per source (the acceptance readout for the transform).
- ``docs_line_dedup``          CCNet-style line dedup (Wenzek et al. 2020
  §3.1): the corpus keeps the FIRST occurrence of every line and drops
  every later duplicate occurrence — the classic boilerplate-removal
  pass.  The synthetic corpus carries no newlines, so a line is proxied
  by a fixed-width non-overlapping 10-token segment (documented below;
  on real data the segmenter is split-by-newline and everything
  downstream is unchanged).
- ``docs_quality_classifier``  fastText-style linear quality scorer
  (Joulin et al. 2016; the CCNet/FineWeb screening stage): hashed
  unigram+bigram bag-of-features, fixed-point mean of pinned integer
  weights.  No trained artifact ships in this container, so the weight
  table is the deterministic stand-in used throughout this repo for
  fitted parameters (same discipline as the IVF codebooks): weight of
  feature bucket f is an arithmetic hash of f, pinned below.
- ``docs_classifier_keep_rate``  per-source score distribution and
  keep-rate at the fixed cut — the readout every public pipeline
  publishes for its classifier stage.

Round-12b/12c additions (same module, registered below):
``stream_line_dedup_twin`` (the line ledger as a REAL availableNow
streaming query), ``docs_sanitize_pipeline`` (the composed per-source
report over the three per-doc frames), and
``docs_quality_signal_agreement`` (classifier score × KN perplexity ×
dup fraction on a bounded score grid — the cross-signal calibration
table).

Scale shapes are all linear in Σ tokens: explode → 60-bit-hash shuffles →
hash-keyed joins back; nothing all-pairs, nothing collected.  The per-doc
excision frame is persisted once per (session, sf_dir) and shared by its
two consumers (house substrate discipline, cf. ``_SPAN_HASH_CACHE``).

Reference parity note: the reference sink (datastax/kafka-sink) has no
analytics surface; this module is part of the training-data extension
the build brief requires beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_sink_spark.extensions import text
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables, spread_small_scan

# --------------------------------------------------------------------------
# Exact substring dedup as a transform (Lee et al. 2022 span excision)
# --------------------------------------------------------------------------

# Span length: 8 whitespace tokens, matching the docs_repeated_spans
# signal so the measured dup_frac and the excised mass are comparable.
# (Lee et al. use 50 BPE tokens at web scale; the synthetic docs are
# ~40-80 tokens, so the span must be shorter to exercise the operator.)
_EXC_N = 8

# A span is "duplicated" when it occurs in >= 2 DISTINCT documents — the
# cross-document rule of docs_repeated_spans.  (Lee et al. also excise
# within-document repeats; the within-doc half is covered separately by
# docs_line_dedup's occurrence rule.)
_EXC_DUP_DOCS = 2

_LINE_W = 10  # tokens per "line" segment (newline proxy, see module doc)

# fastText-style classifier pins: feature space and weight hash.
_CLS_BUCKETS = 1_048_576  # 2^20 hashed feature buckets
_CLS_WMOD = 2001          # weights span [0, 2000]; centered by -1000 after
_CLS_WMUL = 2_654_435_761  # Knuth multiplicative constant (public)
_CLS_WMASK = 2_147_483_648  # 2^31
_CLS_BIAS_MICRO = 1_000_000_000  # the -1000-weight center, in micro units

# Shared per-doc excision frame: consumed by docs_span_excision and
# docs_excision_length_dist.  Persisted once per (session, sf_dir) so the
# tokenize→shingle→dup-join subplan runs once, not once per consumer.
_EXCISION_CACHE: dict[tuple[str, str], "DataFrame"] = {}


def _excision_per_doc(spark, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, n_removed_tokens, removed_chars,
    kept_chars) — one row per document with >= 1 token."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EXCISION_CACHE.get(key)
    if cached is not None:
        return cached
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = docs.select(
        "doc_id", "source", text.tokens(F.col("text")).alias("_t")
    )
    # positional k-token spans (docs shorter than k contribute none and
    # therefore can never be excised)
    spans = (
        staged.where(F.size("_t") >= _EXC_N)
        .select(
            "doc_id",
            F.posexplode(
                text.shingles_from_tokens(F.col("_t"), _EXC_N)
            ).alias("i", "_sp"),
        )
        .select("doc_id", "i", text.md5_long(F.col("_sp")).alias("hx"))
    )
    dup = (
        spans.select("doc_id", "hx")
        .distinct()
        .groupBy("hx")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= _EXC_DUP_DOCS)
        .select("hx")
    )
    # covered token positions: every position inside a duplicated span.
    # The duplicate set SCALES WITH THE CORPUS (it is the boilerplate
    # census itself), so the join must shuffle on the 60-bit hash — AQE
    # would happily broadcast it at small SF and then OOM the driver at
    # 100x (the sf10 ladder caught exactly that on the 3-branch k-sweep,
    # where three dup-set broadcasts build concurrently).
    cov = (
        spans.join(dup.hint("shuffle_hash"), "hx")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(_EXC_N - 1))
            ).alias("pos"),
        )
        .distinct()
        .withColumn("_cut", F.lit(1))
    )
    tokpos = staged.select(
        "doc_id", "source", F.posexplode("_t").alias("pos", "w")
    )
    # The covered-position set ALSO scales with the corpus (on a
    # boilerplate-heavy corpus it approaches every token position), so
    # the (doc_id, pos) join back to the token table must never build a
    # broadcast either — the r13 sf30 ladder caught AQE OOMing the driver
    # on exactly that (notEnoughMemoryToBuildAndBroadcastTableError),
    # invisible at sf10.  Pinned sort-merge, not shuffle_hash: BOTH sides
    # are corpus-sized here (unlike the hash-only dup set), and SMJ
    # spills to disk instead of holding a per-task hash map of the
    # coverage census.
    per = (
        tokpos.join(cov.hint("merge"), ["doc_id", "pos"], "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("_cut"), F.lit(0)))
            .cast("long")
            .alias("n_removed_tokens"),
            F.sum(
                F.when(F.col("_cut").isNotNull(), F.length("w")).otherwise(0)
            )
            .cast("long")
            .alias("removed_chars"),
            F.sum(
                F.when(F.col("_cut").isNull(), F.length("w")).otherwise(0)
            )
            .cast("long")
            .alias("kept_chars"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _EXCISION_CACHE[key] = per
    return per


# Shared oracle CTE prefix: token arrays, positional spans, the duplicated
# span set, covered positions, and the per-doc rollup — the DuckDB twin of
# _excision_per_doc (0-based positions in both engines).
_EXC_CTES = f"""
    toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), sp AS (
      SELECT doc_id, i,
             ('0x' || substr(md5(
                array_to_string(list_slice(t, i + 1, i + {_EXC_N}), ' ')
             ), 1, 15))::BIGINT AS hx
      FROM toks, unnest(range(len(t) - {_EXC_N - 1})) AS u(i)
      WHERE len(t) >= {_EXC_N}
    ), dup AS (
      SELECT hx FROM (SELECT DISTINCT doc_id, hx FROM sp)
      GROUP BY hx HAVING COUNT(*) >= {_EXC_DUP_DOCS}
    ), cov AS (
      SELECT DISTINCT sp.doc_id, sp.i + j AS pos
      FROM sp JOIN dup USING (hx), unnest(range({_EXC_N})) AS v(j)
    ), tokpos AS (
      SELECT doc_id, source, i AS pos, t[i + 1] AS w
      FROM toks, unnest(range(len(t))) AS u(i)
    ), per AS (
      SELECT tp.doc_id, tp.source,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_removed_tokens,
             CAST(SUM(CASE WHEN c.pos IS NOT NULL THEN length(tp.w)
                      ELSE 0 END) AS BIGINT) AS removed_chars,
             CAST(SUM(CASE WHEN c.pos IS NULL THEN length(tp.w)
                      ELSE 0 END) AS BIGINT) AS kept_chars
      FROM tokpos tp
      LEFT JOIN cov c ON c.doc_id = tp.doc_id AND c.pos = tp.pos
      GROUP BY tp.doc_id, tp.source
    )"""


@register(
    "docs_span_excision",
    oracle=f"""
    WITH {_EXC_CTES}
    SELECT doc_id, n_tokens, n_removed_tokens, removed_chars, kept_chars,
           CAST(removed_chars * 1000000
                // greatest(removed_chars + kept_chars, 1)
                AS BIGINT) AS removed_ppm
    FROM per
    """,
)
def docs_span_excision(spark, sf_dir):
    """Span-excision transform readout (Lee et al. 2022 ExactSubstr): every
    token covered by any occurrence of a cross-document duplicated
    {n}-token span is excised; per doc, the removed token/char mass and
    the removal fraction in ppm of the doc's token chars.

    Scale shape: positional spans explode (linear in Σ tokens, rows carry
    60-bit hashes) → one hash-keyed groupBy for the duplicate set → one
    hash-keyed join back → positions explode (bounded by k × dup spans)
    → distinct → one (doc, pos)-keyed join against the token table →
    per-doc partial-combined rollup.  Nothing is all-pairs; span STRINGS
    never shuffle, only their hashes.  The per-doc frame is persisted and
    shared with docs_excision_length_dist."""
    per = _excision_per_doc(spark, sf_dir)
    return per.select(
        "doc_id",
        "n_tokens",
        "n_removed_tokens",
        "removed_chars",
        "kept_chars",
        F.expr(
            "CAST(removed_chars * 1000000"
            " div greatest(removed_chars + kept_chars, 1L) AS BIGINT)"
        ).alias("removed_ppm"),
    )


docs_span_excision.__doc__ = docs_span_excision.__doc__.format(n=_EXC_N)

_LEN_BUCKET = 100  # chars per rewritten-length histogram bucket


@register(
    "docs_excision_length_dist",
    oracle=f"""
    WITH {_EXC_CTES}
    SELECT source,
           CAST(kept_chars // {_LEN_BUCKET} AS BIGINT) AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept_chars) AS BIGINT) AS kept_chars,
           CAST(SUM(removed_chars) AS BIGINT) AS removed_chars
    FROM per
    GROUP BY source, len_bucket
    """,
)
def docs_excision_length_dist(spark, sf_dir):
    """Rewritten-length distribution after span excision: per source and
    per {b}-char bucket of the POST-excision length, the doc count and
    kept/removed char mass — the acceptance readout that shows where the
    transform concentrated its cuts.

    Scale shape: one partial-combined rollup over the shared persisted
    per-doc excision frame (built once, cf. docs_span_excision)."""
    per = _excision_per_doc(spark, sf_dir)
    return per.groupBy(
        "source",
        F.expr(f"CAST(kept_chars div {_LEN_BUCKET} AS BIGINT)").alias(
            "len_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("kept_chars").cast("long").alias("kept_chars"),
        F.sum("removed_chars").cast("long").alias("removed_chars"),
    )


docs_excision_length_dist.__doc__ = docs_excision_length_dist.__doc__.format(
    b=_LEN_BUCKET
)


# --------------------------------------------------------------------------
# CCNet-style line dedup (first occurrence kept, later occurrences cut)
# --------------------------------------------------------------------------


# Shared per-doc line-dedup frame: consumed by docs_line_dedup and
# docs_sanitize_pipeline (same substrate discipline as _EXCISION_CACHE).
_LINE_CACHE: dict[tuple[str, str], "DataFrame"] = {}


def _line_per_doc(spark, sf_dir: str) -> DataFrame:
    """(doc_id, n_lines, n_removed_lines, kept_chars, removed_chars) under
    the first-occurrence-kept rule (see docs_line_dedup)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _LINE_CACHE.get(key)
    if cached is not None:
        return cached
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = docs.select("doc_id", text.tokens(F.col("text")).alias("_t"))
    nseg = F.expr(f"CAST((size(_t) + {_LINE_W - 1}) div {_LINE_W} AS INT)")
    seg = staged.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda s: F.array_join(
                    F.slice(F.col("_t"), s * _LINE_W + 1, _LINE_W), " "
                ),
            )
        ).alias("s", "line"),
    ).where(F.length("line") > 0)
    ranked = seg.select(
        "doc_id",
        "s",
        F.length("line").alias("chars"),
        F.row_number()
        .over(
            Window.partitionBy(text.md5_long(F.col("line"))).orderBy(
                F.col("doc_id").asc(), F.col("s").asc()
            )
        )
        .alias("rn"),
    )
    per = (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_removed_lines"),
            F.sum(F.when(F.col("rn") == 1, F.col("chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
            F.sum(F.when(F.col("rn") > 1, F.col("chars")).otherwise(0))
            .cast("long")
            .alias("removed_chars"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _LINE_CACHE[key] = per
    return per


@register(
    "docs_line_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), seg AS (
      SELECT doc_id, s,
             array_to_string(
               list_slice(t, s * {_LINE_W} + 1, s * {_LINE_W} + {_LINE_W}),
               ' ') AS line
      FROM toks,
           unnest(range((len(t) + {_LINE_W - 1}) // {_LINE_W})) AS u(s)
    ), ranked AS (
      SELECT doc_id, s, length(line) AS chars,
             row_number() OVER (
               PARTITION BY ('0x' || substr(md5(line), 1, 15))::BIGINT
               ORDER BY doc_id ASC, s ASC) AS rn
      FROM seg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed_lines,
           CAST(SUM(CASE WHEN rn = 1 THEN chars ELSE 0 END) AS BIGINT)
             AS kept_chars,
           CAST(SUM(CASE WHEN rn > 1 THEN chars ELSE 0 END) AS BIGINT)
             AS removed_chars
    FROM ranked
    GROUP BY doc_id
    """,
)
def docs_line_dedup(spark, sf_dir):
    """CCNet-style line dedup (Wenzek et al. 2020 §3.1): the corpus keeps
    the FIRST occurrence of every line (ordered by doc_id, then line
    index) and removes every later duplicate occurrence — within-doc and
    cross-doc alike.  Lines are proxied by non-overlapping {w}-token
    segments (the corpus has no newlines; on real data the segmenter is
    split('\\n') and everything downstream is unchanged).

    Scale shape: segments explode (linear, 1/{w} of token count) → one
    window over the 60-bit line hash (rank occurrences; partition
    cardinality = distinct lines, rows per partition = occurrence count —
    the skew ceiling is the most-repeated boilerplate line, exactly the
    quantity this pass removes) → per-doc partial-combined rollup.  Line
    STRINGS never shuffle, only hashes and char counts.  The per-doc
    frame is persisted and shared with docs_sanitize_pipeline."""
    return _line_per_doc(spark, sf_dir).select(
        "doc_id",
        "n_lines",
        "n_removed_lines",
        "kept_chars",
        "removed_chars",
    )


docs_line_dedup.__doc__ = docs_line_dedup.__doc__.format(w=_LINE_W)


# --------------------------------------------------------------------------
# fastText-style linear quality classifier (hashed n-gram features)
# --------------------------------------------------------------------------

# Weight of hashed feature bucket f, pinned integer arithmetic (the
# deterministic stand-in for trained weights — cf. module docstring):
#   w(f) = ((f * 2654435761) mod 2^31) mod 2001          in [0, 2000]
# The classifier score is the MEAN feature weight in micro units, centered
# by the 1000-weight midpoint:
#   score_micro = (Σ w(f)) * 1e6 div n_feats  -  1e9
# The pre-centering mean is non-negative, so truncating div (Spark) and
# floor div (DuckDB) agree — the same negative-operand discipline as the
# EWMA/PageRank family.  Keep cut: score_micro >= 0 (mean weight >= 1000).
_CLS_W_SPARK = (
    f"((({{f}} * {_CLS_WMUL}) % {_CLS_WMASK}) % {_CLS_WMOD})"
)
_CLS_W_DUCK = _CLS_W_SPARK  # identical arithmetic, positive operands

# Shared oracle CTEs: hashed unigram+bigram features and the per-doc score.
_CLS_CTES = f"""
    toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(term), 1, 15))::BIGINT % {_CLS_BUCKETS} AS f
      FROM (
        SELECT doc_id, source, unnest(t) AS term FROM toks
        UNION ALL
        SELECT doc_id, source,
               t[i + 1] || ' ' || t[i + 2] AS term
        FROM toks, unnest(range(len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
      )
    ), scored AS (
      SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS n_feats,
             CAST(SUM({_CLS_W_DUCK.format(f="f")}) * 1000000 // COUNT(*)
                  - {_CLS_BIAS_MICRO} AS BIGINT) AS score_micro
      FROM feats GROUP BY doc_id, source
    )"""


# The classifier frame is consumed by five certified queries plus both
# composed web-funnel queries — memoize the persisted per-doc scores per
# (session, sf_dir) so the hashed-feature explode+rollup runs once per
# session, not once per consumer (house substrate discipline, cf.
# _EXCISION_CACHE/_LINE_CACHE above).
_CLS_SCORED_CACHE: dict[tuple[str, str], "DataFrame"] = {}


def _cls_scored(spark, sf_dir) -> DataFrame:
    """(doc_id, source, n_feats, score_micro) — the classifier pass.
    Persisted + memoized per (session, sf_dir) — see _CLS_SCORED_CACHE."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CLS_SCORED_CACHE.get(key)
    if cached is not None:
        return cached
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = spread_small_scan(docs, spark).select(
        "doc_id", "source", text.tokens(F.col("text")).alias("_t")
    ).where(F.size("_t") >= 1)
    feats = staged.select(
        "doc_id",
        "source",
        F.explode(
            F.concat(
                F.col("_t"),
                F.when(
                    F.size("_t") >= 2,
                    text.shingles_from_tokens(F.col("_t"), 2),
                ).otherwise(F.array()),
            )
        ).alias("term"),
    ).select(
        "doc_id",
        "source",
        (text.md5_long(F.col("term")) % _CLS_BUCKETS).alias("f"),
    )
    scored = (
        feats.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.expr(
                f"CAST(SUM({_CLS_W_SPARK.format(f='f')}) * 1000000"
                f" div COUNT(*) - {_CLS_BIAS_MICRO} AS BIGINT)"
            ).alias("score_micro"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CLS_SCORED_CACHE[key] = scored
    return scored


@register(
    "docs_quality_classifier",
    oracle=f"""
    WITH {_CLS_CTES}
    SELECT doc_id, n_feats, score_micro,
           CAST(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END AS INTEGER)
             AS keep
    FROM scored
    """,
)
def docs_quality_classifier(spark, sf_dir):
    """fastText-style linear quality score per document (Joulin et al.
    2016; the CCNet/FineWeb screening stage): hashed unigram+bigram
    bag-of-features into 2^20 buckets, fixed-point mean of pinned integer
    weights, keep flag at the centered cut.

    Scale shape: one explode (linear in Σ tokens; feature STRINGS are
    hashed in the same projection, so only 20-bit bucket ids + doc keys
    shuffle) → one per-doc partial-combined rollup.  The weight "table"
    is arithmetic on the bucket id — no broadcast, no lookup join, which
    is exactly why hashed linear models are the standard 100 TB screen."""
    return _cls_scored(spark, sf_dir).select(
        "doc_id",
        "n_feats",
        "score_micro",
        F.when(F.col("score_micro") >= 0, 1)
        .otherwise(0)
        .cast("int")
        .alias("keep"),
    )


@register(
    "docs_classifier_keep_rate",
    oracle=f"""
    WITH {_CLS_CTES}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS keep_ppm,
           CAST(SUM(score_micro + {_CLS_BIAS_MICRO}) // COUNT(*)
                - {_CLS_BIAS_MICRO} AS BIGINT) AS mean_score_micro,
           CAST(MIN(score_micro) AS BIGINT) AS min_score_micro,
           CAST(MAX(score_micro) AS BIGINT) AS max_score_micro
    FROM scored
    GROUP BY source
    """,
)
def docs_classifier_keep_rate(spark, sf_dir):
    """Per-source classifier readout: doc count, keep count and rate at
    the fixed cut, and the mean/min/max score — the distribution table
    every public pipeline publishes for its quality-classifier stage.
    The mean is computed on bias-shifted (non-negative) scores so Spark's
    truncating div and DuckDB's floor div agree, then re-centered.

    Scale shape: one partial-combined rollup over the classifier pass
    (source cardinality output)."""
    return _cls_scored(spark, sf_dir).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("score_micro") >= 0, 1).otherwise(0))
        .cast("long")
        .alias("kept_docs"),
        F.expr(
            "CAST(SUM(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("keep_ppm"),
        F.expr(
            f"CAST(SUM(score_micro + {_CLS_BIAS_MICRO}) div COUNT(*)"
            f" - {_CLS_BIAS_MICRO} AS BIGINT)"
        ).alias("mean_score_micro"),
        F.min("score_micro").alias("min_score_micro"),
        F.max("score_micro").alias("max_score_micro"),
    )


# --------------------------------------------------------------------------
# Round-12b: streaming line-dedup ledger twin + composed pipeline report
# --------------------------------------------------------------------------

_STREAM_LINE_RUNS = iter(range(1_000_000))

_STREAM_LINE_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), seg AS (
      SELECT doc_id, s,
             array_to_string(
               list_slice(t, s * {_LINE_W} + 1, s * {_LINE_W} + {_LINE_W}),
               ' ') AS line
      FROM toks,
           unnest(range((len(t) + {_LINE_W - 1}) // {_LINE_W})) AS u(s)
    ), led AS (
      SELECT ('0x' || substr(md5(line), 1, 15))::BIGINT AS hx,
             COUNT(*) AS n_occ,
             MIN(doc_id) AS survivor,
             MIN(length(line)) AS chars
      FROM seg WHERE length(line) > 0
      GROUP BY hx
    )
    SELECT CAST(n_occ AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(survivor) AS BIGINT) AS survivor_doc_sum,
           CAST(SUM(chars) AS BIGINT) AS line_chars_sum
    FROM led GROUP BY n_occ
    """


@register("stream_line_dedup_twin", oracle=_STREAM_LINE_ORACLE)
def stream_line_dedup_twin(spark, sf_dir):
    """The line-dedup ledger run as a REAL Structured Streaming query —
    the shape a continuous-ingest boilerplate filter actually runs (lines
    arrive with their documents; the dedup ledger is streaming state):
    segments are staged into a file source, the 60-bit line hash is
    projected inside the stream, and a streaming groupBy(hash) maintains
    the per-line ledger (occurrence count + min-doc_id survivor + line
    chars).  trigger(availableNow=True) + complete-mode memory sink; the
    final state is rolled up into the occurrence histogram, which must
    hash-equal the batch oracle — a lost update or a hash divergence
    between the batch and streaming segmenters breaks the comparison.

    Scale shape: state is one row per DISTINCT line (the ledger itself —
    the minimum any line-dedup service carries); count/min are both
    partial-combinable, so micro-batches combine map-side before touching
    state.  The histogram readout bounds the driver-compared output to
    |distinct occurrence counts| rows."""
    import tempfile

    from kafka_sink_spark.plans.stream_twin import finish_stream_twin

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = docs.select("doc_id", text.tokens(F.col("text")).alias("_t"))
    nseg = F.expr(f"CAST((size(_t) + {_LINE_W - 1}) div {_LINE_W} AS INT)")
    seg = staged.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda s: F.array_join(
                    F.slice(F.col("_t"), s * _LINE_W + 1, _LINE_W), " "
                ),
            )
        ).alias("line"),
    ).where(F.length("line") > 0)
    src = tempfile.mkdtemp(prefix="stream_line_src_")
    seg.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, line string").parquet(src)
    ledger = (
        stream.select(
            "doc_id",
            text.md5_long(F.col("line")).alias("hx"),
            F.length("line").alias("chars"),
        )
        .groupBy("hx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min("doc_id").cast("long").alias("survivor"),
            F.min("chars").cast("long").alias("chars"),
        )
    )
    name = f"stream_line_dedup_twin_{next(_STREAM_LINE_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_line_ck_")
    q = (
        ledger.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    result = (
        spark.table(name)
        .groupBy(F.col("n_occ").alias("n_occurrences"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("survivor").cast("long").alias("survivor_doc_sum"),
            F.sum("chars").cast("long").alias("line_chars_sum"),
        )
    )
    return finish_stream_twin(spark, q, name, result, (src, ck))


# Shared oracle fragments (single-sourced per the r11 log2-template
# lesson): the per-doc line-dedup cut and the classifier score, written
# against the ``toks`` CTE of _EXC_CTES.  Consumed by the
# docs_sanitize_pipeline oracle below AND the composed web-pipeline
# funnel (plans/analytics_webpipe.py).
_LIN_CTES = f"""seg2 AS (
      SELECT doc_id, s,
             array_to_string(
               list_slice(t, s * {_LINE_W} + 1, s * {_LINE_W} + {_LINE_W}),
               ' ') AS line
      FROM toks,
           unnest(range((len(t) + {_LINE_W - 1}) // {_LINE_W})) AS u(s)
    ), ranked2 AS (
      SELECT doc_id, length(line) AS chars,
             row_number() OVER (
               PARTITION BY ('0x' || substr(md5(line), 1, 15))::BIGINT
               ORDER BY doc_id ASC, s ASC) AS rn
      FROM seg2 WHERE length(line) > 0
    ), lin AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN rn > 1 THEN chars ELSE 0 END) AS BIGINT)
               AS line_removed_chars
      FROM ranked2 GROUP BY doc_id
    )"""

_CLS2_CTES = f"""feats2 AS (
      SELECT doc_id,
             ('0x' || substr(md5(term), 1, 15))::BIGINT % {_CLS_BUCKETS} AS f
      FROM (
        SELECT doc_id, unnest(t) AS term FROM toks
        UNION ALL
        SELECT doc_id, t[i + 1] || ' ' || t[i + 2] AS term
        FROM toks, unnest(range(len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
      )
    ), scored2 AS (
      SELECT doc_id,
             CAST(SUM({_CLS_W_DUCK.format(f="f")}) * 1000000 // COUNT(*)
                  - {_CLS_BIAS_MICRO} AS BIGINT) AS score_micro
      FROM feats2 GROUP BY doc_id
    )"""


@register(
    "docs_sanitize_pipeline",
    oracle=f"""
    WITH {_EXC_CTES}, {_LIN_CTES}, {_CLS2_CTES}
    SELECT per.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s.score_micro >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS cls_kept_docs,
           CAST(SUM(per.removed_chars + per.kept_chars) AS BIGINT)
             AS total_token_chars,
           CAST(SUM(per.removed_chars) AS BIGINT) AS span_removed_chars,
           CAST(SUM(l.line_removed_chars) AS BIGINT) AS line_removed_chars,
           CAST(SUM(CASE WHEN s.score_micro >= 0 THEN per.kept_chars
                    ELSE 0 END) AS BIGINT) AS surviving_chars
    FROM per
    JOIN lin l ON l.doc_id = per.doc_id
    JOIN scored2 s ON s.doc_id = per.doc_id
    GROUP BY per.source
    """,
)
def docs_sanitize_pipeline(spark, sf_dir):
    """Composed sanitize-pipeline report, per source: doc count,
    classifier keeps, total token chars, chars the span exciser would
    cut, chars the line dedup would cut, and the chars surviving the
    classifier-gate-then-excise composition — the one-table summary a
    curation run publishes before committing a corpus build.

    Scale shape: three certified per-doc frames (two of them the
    persisted excision/line substrates, built once per session) joined on
    doc_id — co-partitioned single-key joins — then one partial-combined
    per-source rollup."""
    exc = _excision_per_doc(spark, sf_dir)
    lin = _line_per_doc(spark, sf_dir).select(
        "doc_id", F.col("removed_chars").alias("line_removed_chars")
    )
    cls = _cls_scored(spark, sf_dir).select("doc_id", "score_micro")
    return (
        exc.join(lin, "doc_id")
        .join(cls, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("score_micro") >= 0, 1).otherwise(0))
            .cast("long")
            .alias("cls_kept_docs"),
            F.sum(F.col("removed_chars") + F.col("kept_chars"))
            .cast("long")
            .alias("total_token_chars"),
            F.sum("removed_chars").cast("long").alias("span_removed_chars"),
            F.sum("line_removed_chars")
            .cast("long")
            .alias("line_removed_chars"),
            F.sum(
                F.when(F.col("score_micro") >= 0, F.col("kept_chars"))
                .otherwise(0)
            )
            .cast("long")
            .alias("surviving_chars"),
        )
    )


# --------------------------------------------------------------------------
# Round-12c: quality-signal agreement (classifier × LM perplexity × dup)
# --------------------------------------------------------------------------

# Classifier-score bucket width in micro units (0.05 mean-weight units);
# scores live in [-1e9, 1e9], so buckets span 0..40 after the bias shift —
# a bounded grid, never data-dependent.
_AGREE_BUCKET = 50_000_000


def _agreement_oracle() -> str:
    from kafka_sink_spark.plans.analytics_quality import _SPAN_N
    from kafka_sink_spark.plans.analytics_weblm import (
        _KN_CTES,
        _P_PT_DUCK,
    )
    from kafka_sink_spark.plans.analytics_readability import _DUCK_LOG2

    kn = _KN_CTES.format(
        p_pt=_P_PT_DUCK, lg=_DUCK_LOG2.format(x="p_pt")
    )
    return f"""
    WITH {kn}, stoks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), ssp AS (
      SELECT doc_id, CASE WHEN len(t) >= {_SPAN_N}
        THEN list_transform(range(len(t) - {_SPAN_N - 1}),
                            i -> array_to_string(list_slice(t, i + 1, i + {_SPAN_N}), ' '))
        ELSE [array_to_string(t, ' ')] END AS spans
      FROM stoks
    ), sh AS (
      SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS hx
      FROM ssp, unnest(spans) AS u(s)
    ), sdup AS (
      SELECT hx FROM sh GROUP BY hx HAVING COUNT(*) >= 2
    ), sper AS (
      SELECT doc_id, COUNT(*) AS n_spans FROM sh GROUP BY doc_id
    ), sdd AS (
      SELECT sh.doc_id, COUNT(*) AS n_dup
      FROM sh JOIN sdup USING (hx) GROUP BY sh.doc_id
    ), feats2 AS (
      SELECT doc_id,
             ('0x' || substr(md5(term), 1, 15))::BIGINT % {_CLS_BUCKETS} AS f
      FROM (
        SELECT doc_id, unnest(t) AS term FROM stoks
        UNION ALL
        SELECT doc_id, t[i + 1] || ' ' || t[i + 2] AS term
        FROM stoks, unnest(range(len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
      )
    ), scored2 AS (
      SELECT doc_id,
             CAST(SUM({_CLS_W_DUCK.format(f="f")}) * 1000000 // COUNT(*)
                  - {_CLS_BIAS_MICRO} AS BIGINT) AS score_micro
      FROM feats2 GROUP BY doc_id
    )
    SELECT CAST((s.score_micro + {_CLS_BIAS_MICRO}) // {_AGREE_BUCKET}
                AS BIGINT) AS score_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.nll_sum) // SUM(p.n_bg) AS BIGINT) AS kn_nll_ppm_bits,
           CAST(SUM(COALESCE(dd.n_dup, 0)) * 1000000 // SUM(sp.n_spans)
                AS BIGINT) AS dup_span_ppm
    FROM scored2 s
    JOIN perdoc p ON p.doc_id = s.doc_id
    JOIN sper sp ON sp.doc_id = s.doc_id
    LEFT JOIN sdd dd ON dd.doc_id = s.doc_id
    GROUP BY score_bucket
    """


@register("docs_quality_signal_agreement", oracle=_agreement_oracle())
def docs_quality_signal_agreement(spark, sf_dir):
    """Do the three quality screens agree?  Per classifier-score bucket
    (0.05 mean-weight units, bounded 41-cell grid), the mean Kneser-Ney
    bigram NLL and the mean duplicated-span fraction of the held-out
    docs in that bucket — the standard cross-signal diagnostic a curation
    run publishes before composing its filters (a classifier band whose
    perplexity does NOT rise as its score falls is mis-calibrated).

    Joins three CERTIFIED per-doc frames: the classifier pass
    (docs_quality_classifier), the held-out KN scoring pass
    (docs_kn_bigram_nll's perdoc chain, shared substrate), and the
    repeated-spans frontier (docs_repeated_spans' persisted
    ``_span_doc_hashes``).  Scale shape: three doc-keyed joins of
    per-doc aggregates + one partial-combined rollup onto the bounded
    bucket grid; the held-out inner join bounds the scored set to the
    10% split."""
    from kafka_sink_spark.plans.analytics_quality import (
        _SPAN_N,
        _span_doc_hashes,
    )
    from kafka_sink_spark.plans.analytics_weblm import _kn_scored

    cls = _cls_scored(spark, sf_dir).select("doc_id", "score_micro")
    kn = _kn_scored(spark, sf_dir)
    h = _span_doc_hashes(spark, sf_dir, _SPAN_N)
    sdup = (
        h.groupBy("hx")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("hx")
    )
    sper = h.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    # shuffle on hx — the dup set scales with the corpus (see
    # _excision_per_doc)
    sdd = h.join(sdup.hint("shuffle_hash"), "hx").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup")
    )
    joined = (
        cls.join(kn, "doc_id")
        .join(sper, "doc_id")
        .join(sdd, "doc_id", "left")
    )
    return joined.groupBy(
        F.expr(
            f"CAST((score_micro + {_CLS_BIAS_MICRO}) div {_AGREE_BUCKET}"
            " AS BIGINT)"
        ).alias("score_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(nll_sum) div SUM(n_bg) AS BIGINT)").alias(
            "kn_nll_ppm_bits"
        ),
        F.expr(
            "CAST(SUM(COALESCE(n_dup, 0L)) * 1000000 div SUM(n_spans)"
            " AS BIGINT)"
        ).alias("dup_span_ppm"),
    )


# --------------------------------------------------------------------------
# Round-12d: span-length sweep (the k-threshold selection curve)
# --------------------------------------------------------------------------

# The k values a pipeline sweeps to place its excision threshold (Lee et
# al. 2022 report the removed-mass-vs-k curve before fixing k): a bounded
# 3-point grid, never data-dependent.
_SWEEP_KS = (8, 12, 16)


def _k_sweep_oracle() -> str:
    ks = ", ".join(str(k) for k in _SWEEP_KS)
    return f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), sp AS (
      SELECT doc_id, source, k, i,
             ('0x' || substr(md5(
                array_to_string(list_slice(t, i + 1, i + k), ' ')
             ), 1, 15))::BIGINT AS hx
      FROM toks, unnest([{ks}]) AS kk(k),
           unnest(range(len(t) - k + 1)) AS u(i)
      WHERE len(t) >= k
    ), dup AS (
      SELECT k, hx FROM (SELECT DISTINCT doc_id, k, hx FROM sp)
      GROUP BY k, hx HAVING COUNT(*) >= 2
    ), cov AS (
      SELECT DISTINCT sp.doc_id, sp.source, sp.k, sp.i + j AS pos
      FROM sp JOIN dup USING (k, hx), unnest(range(k)) AS v(j)
    ), tot AS (
      SELECT source, CAST(SUM(len(t)) AS BIGINT) AS total_tokens
      FROM toks GROUP BY source
    ), rm AS (
      SELECT source, k,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_affected,
             CAST(COUNT(*) AS BIGINT) AS removed_tokens
      FROM cov GROUP BY source, k
    )
    SELECT rm.source, CAST(rm.k AS BIGINT) AS span_k,
           rm.n_docs_affected, rm.removed_tokens, tot.total_tokens,
           CAST(rm.removed_tokens * 1000000 // tot.total_tokens AS BIGINT)
             AS removed_ppm
    FROM rm JOIN tot ON tot.source = rm.source
    """


@register("docs_excision_k_sweep", oracle=_k_sweep_oracle())
def docs_excision_k_sweep(spark, sf_dir):
    """Span-length selection sweep: for each candidate span length k on a
    bounded 3-point grid {ks}, the per-source excisable token mass under
    the cross-document duplicate rule — the removed-mass-vs-k curve a
    pipeline publishes before fixing its excision threshold (longer spans
    excise less, with higher precision; Lee et al. 2022 §4 report exactly
    this trade).

    Scale shape: one tokenize pass per k (3 positional-span explodes —
    linear in Σ tokens × |grid|, rows carry 60-bit hashes) → per-k dup
    set → per-k coverage → per-(source,k) partial-combined rollup with a
    |sources|-row totals join.  No all-pairs stage at any k; the grid is
    a constant, so the plan size is bounded."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = docs.select(
        "doc_id", "source", text.tokens(F.col("text")).alias("_t")
    )
    tot = staged.groupBy("source").agg(
        F.sum(F.size("_t")).cast("long").alias("total_tokens")
    )
    branches = []
    for k in _SWEEP_KS:
        spans = (
            staged.where(F.size("_t") >= k)
            .select(
                "doc_id",
                "source",
                F.posexplode(
                    text.shingles_from_tokens(F.col("_t"), k)
                ).alias("i", "_sp"),
            )
            .select(
                "doc_id", "source", "i",
                text.md5_long(F.col("_sp")).alias("hx"),
            )
        )
        dup = (
            spans.select("doc_id", "hx")
            .distinct()
            .groupBy("hx")
            .agg(F.count(F.lit(1)).alias("nd"))
            .where(F.col("nd") >= 2)
            .select("hx")
        )
        cov = (
            spans.join(dup.hint("shuffle_hash"), "hx")
            .select(
                "doc_id",
                "source",
                F.explode(
                    F.sequence(F.col("i"), F.col("i") + F.lit(k - 1))
                ).alias("pos"),
            )
            .distinct()
        )
        branches.append(
            cov.groupBy("source").agg(
                F.countDistinct("doc_id").cast("long").alias(
                    "n_docs_affected"
                ),
                F.count(F.lit(1)).cast("long").alias("removed_tokens"),
            ).select(
                "source",
                F.lit(k).cast("long").alias("span_k"),
                "n_docs_affected",
                "removed_tokens",
            )
        )
    import functools

    swept = functools.reduce(lambda a, b: a.unionByName(b), branches)
    return swept.join(tot, "source").select(
        "source",
        "span_k",
        "n_docs_affected",
        "removed_tokens",
        "total_tokens",
        F.expr(
            "CAST(removed_tokens * 1000000 div total_tokens AS BIGINT)"
        ).alias("removed_ppm"),
    )


docs_excision_k_sweep.__doc__ = docs_excision_k_sweep.__doc__.format(
    ks=_SWEEP_KS
)


# --------------------------------------------------------------------------
# Round-12e: streaming classifier keep-rate twin
# --------------------------------------------------------------------------

_STREAM_CLS_RUNS = iter(range(1_000_000))


@register(
    "stream_classifier_keep_twin",
    oracle=f"""
    WITH {_CLS_CTES}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS keep_ppm
    FROM scored GROUP BY source
    """,
)
def stream_classifier_keep_twin(spark, sf_dir):
    """The classifier keep-rate ledger run as a REAL Structured Streaming
    query — the shape a continuous quality monitor actually runs (scored
    documents arrive; the per-source keep counters are streaming state):
    per-doc classifier decisions are staged into a file source and a
    streaming groupBy(source) maintains (n_docs, kept_docs).
    trigger(availableNow=True) + complete-mode memory sink; the final
    counters must hash-equal the batch keep-rate oracle — a lost update
    or a scorer divergence between the batch and streaming paths breaks
    the comparison.

    Scale shape: state is |sources| rows of two counters — the minimum
    any keep-rate monitor carries; both are partial-combinable, so
    micro-batches combine map-side before touching state."""
    import tempfile

    from kafka_sink_spark.plans.stream_twin import finish_stream_twin

    scored = _cls_scored(spark, sf_dir).select(
        "doc_id",
        "source",
        F.when(F.col("score_micro") >= 0, 1).otherwise(0).alias("keep"),
    )
    src = tempfile.mkdtemp(prefix="stream_cls_src_")
    scored.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, source string, keep int"
    ).parquet(src)
    ledger = stream.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("keep").cast("long").alias("kept_docs"),
    )
    name = f"stream_classifier_keep_twin_{next(_STREAM_CLS_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_cls_ck_")
    q = (
        ledger.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    result = spark.table(name).select(
        "source",
        "n_docs",
        "kept_docs",
        F.expr("CAST(kept_docs * 1000000 div n_docs AS BIGINT)").alias(
            "keep_ppm"
        ),
    )
    return finish_stream_twin(spark, q, name, result, (src, ck))
