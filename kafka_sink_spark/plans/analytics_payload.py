"""Round-9c payload/split-quality wave.

- ``multimodal_payload_entropy``  byte-value distribution + Shannon
  entropy of the opaque binary payload corpus — the corruption /
  compressibility screen a blob pipeline runs before decode: ~log2(256)
  bits flags already-compressed or encrypted payloads, very low entropy
  flags zero-padding and truncation.  Reported as the observed byte
  grid (share + per-byte entropy contribution) plus the '*' total row.
  The synthetic corpus is pure ASCII, so byte == character (asserted by
  a canary in the oracle, the ``multimodal_chunk_manifest`` discipline);
  the Spark side still computes from the real ``binary`` payload column.
- ``docs_js_divergence_splits``  Jensen–Shannon divergence of the term
  distributions between the certified train/val/test splits (the
  ``docs_train_split_report`` md5-bucket assignment): near-zero JSD
  certifies the splits are exchangeable samples; a hot JSD means the
  eval split drifted from train — the split-quality audit next to
  ``embedding_split_centroid_shift``.

Determinism per the package convention: octave-log2 ppm-bits with
BOUNDED log arguments (single counts, or the r10 rebased ppm mixture
ratio m2 = trunc(2e6·p/(p+q)) for the JS mixture — never a count
product), per-term truncating division before order-independent sums.

Reference anchor: datastax/kafka-sink's C7 blob parity is the payload
passthrough; these extend COVERAGE.md's multimodal/curation families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.extensions import text
from kafka_sink_spark.plans.analytics_readability import _DUCK_LOG2, _SPARK_LOG2
from kafka_sink_spark.plans.analytics_stats import _SPLIT_TRAIN
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Byte-entropy screen over binary payloads
# --------------------------------------------------------------------------


def _entropy_oracle() -> str:
    lg_n = _DUCK_LOG2.format(x="nn")
    lg_c = _DUCK_LOG2.format(x="c")
    return f"""
    WITH canary AS (
      -- byte == char for this corpus (pure ASCII): the text replay below
      -- is exactly the byte stream the Spark side reads from binary
      SELECT CASE WHEN SUM(CASE WHEN octet_length(encode(text)) <> length(text)
                               THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE NULL END AS ascii_ok
      FROM documents
    ), b AS (
      SELECT ascii(substr(text, i.i + 1, 1)) AS byte
      FROM documents, canary,
           LATERAL (SELECT unnest(range(length(text))) AS i) i
      WHERE canary.ascii_ok = 1
    ), c AS (
      SELECT byte, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY byte
    ), nt AS (SELECT SUM(c) AS nn FROM c),
    terms AS (
      SELECT byte, c, nn,
             (c * ({lg_n} - {lg_c})) // nn AS h_ppm_bits
      FROM c, nt
    )
    SELECT CAST(byte AS BIGINT) AS byte, c AS cnt,
           CAST(c * 1000000 // nn AS BIGINT) AS share_ppm,
           CAST(h_ppm_bits AS BIGINT) AS h_ppm_bits
    FROM terms
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS byte, CAST(MAX(nn) AS BIGINT) AS cnt,
           CAST(1000000 AS BIGINT) AS share_ppm,
           CAST(SUM(h_ppm_bits) AS BIGINT) AS h_ppm_bits
    FROM terms
    """


@register("multimodal_payload_entropy", oracle=_entropy_oracle())
def multimodal_payload_entropy(spark, sf_dir):
    """Byte-value histogram and Shannon entropy over the binary payload
    corpus: per observed byte its count, corpus share, and additive
    entropy contribution h = (c·(log2 N − log2 c)) div N in
    octave-ppm-bits, plus the '*' total row (byte = −1) — the
    pre-decode corruption/compressibility screen of a blob pipeline.

    The Spark side decodes the REAL ``binary`` payload column (UTF-8 —
    byte-exact on this ASCII corpus, same canary discipline as the
    chunk manifest) and explodes one row per byte: an embarrassingly
    parallel projection whose only shuffle is the ≤256-group byte
    rollup — scan-bound at 100 TB, which is the point.
    """
    from kafka_sink_spark.extensions import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    assets = multimodal.documents_as_assets(docs)
    b = assets.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(payload)),"
                " i -> ascii(substr(CAST(payload AS STRING), i, 1)))"
            )
        ).alias("byte")
    )
    c = b.groupBy("byte").agg(F.count(F.lit(1)).cast("long").alias("c"))
    nt = c.agg(F.sum("c").alias("nn"))
    lg_n = _SPARK_LOG2.format(x="nn")
    lg_c = _SPARK_LOG2.format(x="c")
    # ≤256 byte-histogram terms feed both union branches (per-byte rows +
    # the pooled entropy row): persist so the payload byte-explode pass
    # executes once, not once per branch (guide §7.2)
    from pyspark import StorageLevel

    terms = c.crossJoin(F.broadcast(nt)).select(
        "byte",
        "c",
        "nn",
        F.expr(f"(c * ({lg_n} - {lg_c})) div nn").alias("h_ppm_bits"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    rows = terms.select(
        F.col("byte").cast("long").alias("byte"),
        F.col("c").alias("cnt"),
        F.expr("CAST(c * 1000000 div nn AS BIGINT)").alias("share_ppm"),
        F.col("h_ppm_bits").cast("long").alias("h_ppm_bits"),
    )
    total = terms.agg(
        F.lit(-1).cast("long").alias("byte"),
        F.max("nn").cast("long").alias("cnt"),
        F.lit(1000000).cast("long").alias("share_ppm"),
        F.sum("h_ppm_bits").cast("long").alias("h_ppm_bits"),
    )
    return rows.unionByName(total)


# --------------------------------------------------------------------------
# Jensen–Shannon divergence between the train/val/test splits
# --------------------------------------------------------------------------

_JS_PAIRS = (("train", "val"), ("train", "test"), ("val", "test"))

# ordered directions needing a mixture-ratio column m2_{a}_{b}
_JS_DIRS = tuple(
    d for a, b in _JS_PAIRS for d in ((a, b), (b, a))
)


def _octave_log2_ppm(x: int) -> int:
    """The catalog's octave-interpolated log2 in ppm-bits, in Python —
    used only to pin constants that both engines must share exactly."""
    e = x.bit_length() - 1
    return e * 1_000_000 + ((x - (1 << e)) * 1_000_000) // (1 << e)


# octave-log2 of the 1e6 ratio scale: the rebased JS logs subtract it, so
# a term with p == q (m2 == 1e6) contributes exactly 0 — the same octave
# approximation on both sides of the subtraction, not the true log2(1e6).
_LG2_OCT_1E6_PPM = _octave_log2_ppm(1_000_000)


def _m2_duck(a: str, b: str) -> str:
    """Truncated ppm mixture ratio 2·p/(p+q) = 2e6·c_a·t_b div
    (c_a·t_b + c_b·t_a), clamped to ≥1 so its log2 is defined (a term
    absent from ``a`` never reads it — its half-term is 0 by guard).
    HUGEINT throughout: the products reach ~2e6·t² and stay exact for
    split token totals up to ~1e15 (well past a 100 TB corpus)."""
    return (
        f"CAST(GREATEST((2000000::HUGEINT * c_{a} * t_{b})"
        f" // GREATEST(c_{a}::HUGEINT * t_{b} + c_{b}::HUGEINT * t_{a}, 1),"
        f" 1) AS BIGINT)"
    )


def _m2_spark(a: str, b: str) -> str:
    return (
        f"CAST(GREATEST((CAST(2000000 AS DECIMAL(38,0)) * c_{a} * t_{b})"
        f" div GREATEST(CAST(c_{a} AS DECIMAL(38,0)) * t_{b}"
        f" + CAST(c_{b} AS DECIMAL(38,0)) * t_{a}, 1), 1) AS BIGINT)"
    )


def _js_split_sql_duck() -> str:
    return f"""
      SELECT CASE WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100
                       < {_SPLIT_TRAIN} THEN 'train'
                  WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100
                       = {_SPLIT_TRAIN} THEN 'val'
                  ELSE 'test' END AS split,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    """


def _js_pair_duck(a: str, b: str) -> str:
    # Rebased log form (r10): the KL(P||M) half term is
    # p·(log2 m2 − log2 1e6) div A with m2 = trunc(2e6·p/(p+q)) — the
    # log argument is a BOUNDED ppm ratio (≤ 2e6), never a count
    # product, so the int64 log-argument cliff is gone; the outer
    # c·bracket multiply rides HUGEINT.
    lg_p = _DUCK_LOG2.format(x="m2_{a}_{b}")
    lg_q = _DUCK_LOG2.format(x="m2_{b}_{a}")
    half_p = (
        f"CASE WHEN c_{{a}} > 0 THEN "
        f"CASE WHEN (c_{{a}}::HUGEINT * ({lg_p} - {_LG2_OCT_1E6_PPM})) >= 0"
        f" THEN (c_{{a}}::HUGEINT * ({lg_p} - {_LG2_OCT_1E6_PPM})) // t_{{a}}"
        f" ELSE -((-(c_{{a}}::HUGEINT * ({lg_p} - {_LG2_OCT_1E6_PPM})))"
        f" // t_{{a}}) END"
        f" ELSE 0 END"
    )
    half_q = (
        f"CASE WHEN c_{{b}} > 0 THEN "
        f"CASE WHEN (c_{{b}}::HUGEINT * ({lg_q} - {_LG2_OCT_1E6_PPM})) >= 0"
        f" THEN (c_{{b}}::HUGEINT * ({lg_q} - {_LG2_OCT_1E6_PPM})) // t_{{b}}"
        f" ELSE -((-(c_{{b}}::HUGEINT * ({lg_q} - {_LG2_OCT_1E6_PPM})))"
        f" // t_{{b}}) END"
        f" ELSE 0 END"
    )
    expr = f"(({half_p}) + ({half_q})) // 2"
    return expr.format(a=a, b=b)


def _js_oracle() -> str:
    m2_cols = ",\n             ".join(
        f"{_m2_duck(a, b)} AS m2_{a}_{b}" for a, b in _JS_DIRS
    )
    pair_rows = "\nUNION ALL\n".join(
        f"""SELECT '{a}|{b}' AS pair, CAST(MAX(t_{a}) AS BIGINT) AS n_tokens_a,
               CAST(MAX(t_{b}) AS BIGINT) AS n_tokens_b,
               CAST(SUM({_js_pair_duck(a, b)}) AS BIGINT) AS jsd_ppm_bits
        FROM mid"""
        for a, b in _JS_PAIRS
    )
    return f"""
    WITH toks AS ({_js_split_sql_duck()}),
    tf AS (
      SELECT split, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY split, term
    ), wide AS (
      SELECT term,
             SUM(CASE WHEN split = 'train' THEN c ELSE 0 END) AS c_train,
             SUM(CASE WHEN split = 'val' THEN c ELSE 0 END) AS c_val,
             SUM(CASE WHEN split = 'test' THEN c ELSE 0 END) AS c_test,
             SUM(SUM(CASE WHEN split = 'train' THEN c ELSE 0 END)) OVER () AS t_train,
             SUM(SUM(CASE WHEN split = 'val' THEN c ELSE 0 END)) OVER () AS t_val,
             SUM(SUM(CASE WHEN split = 'test' THEN c ELSE 0 END)) OVER () AS t_test
      FROM tf GROUP BY term
    ), mid AS (
      SELECT *,
             {m2_cols}
      FROM wide
    )
    {pair_rows}
    """


def _js_pair_spark(a: str, b: str) -> str:
    # Rebased log form (r10) — bounded ppm-ratio log arguments; see the
    # DuckDB twin.  Outer c·bracket multiply rides DECIMAL(38,0).
    lg_p = _SPARK_LOG2.format(x="m2_{a}_{b}")
    lg_q = _SPARK_LOG2.format(x="m2_{b}_{a}")
    half_p = (
        f"CASE WHEN c_{{a}} > 0 THEN "
        f"CASE WHEN (CAST(c_{{a}} AS DECIMAL(38,0))"
        f" * ({lg_p} - {_LG2_OCT_1E6_PPM})) >= 0"
        f" THEN (CAST(c_{{a}} AS DECIMAL(38,0))"
        f" * ({lg_p} - {_LG2_OCT_1E6_PPM})) div t_{{a}}"
        f" ELSE -((-(CAST(c_{{a}} AS DECIMAL(38,0))"
        f" * ({lg_p} - {_LG2_OCT_1E6_PPM}))) div t_{{a}}) END"
        f" ELSE 0 END"
    )
    half_q = (
        f"CASE WHEN c_{{b}} > 0 THEN "
        f"CASE WHEN (CAST(c_{{b}} AS DECIMAL(38,0))"
        f" * ({lg_q} - {_LG2_OCT_1E6_PPM})) >= 0"
        f" THEN (CAST(c_{{b}} AS DECIMAL(38,0))"
        f" * ({lg_q} - {_LG2_OCT_1E6_PPM})) div t_{{b}}"
        f" ELSE -((-(CAST(c_{{b}} AS DECIMAL(38,0))"
        f" * ({lg_q} - {_LG2_OCT_1E6_PPM}))) div t_{{b}}) END"
        f" ELSE 0 END"
    )
    expr = f"(({half_p}) + ({half_q})) div 2"
    return expr.format(a=a, b=b)


@register("docs_js_divergence_splits", oracle=_js_oracle())
def docs_js_divergence_splits(spark, sf_dir):
    """Jensen–Shannon divergence of the term distributions between every
    pair of the certified md5-bucket splits, in octave-ppm-bits:
    JSD(P,Q) = ½Σ p·log2(2p/(p+q))/A + ½Σ q·log2(2q/(p+q))/B with every
    log argument a BOUNDED ppm mixture ratio m2 = trunc(2e6·p/(p+q)) ≤
    2e6 (rebased r10: the r9 count-product arguments 2·c_a·t_b capped
    split sizes at ~3e9 tokens; the ratio form survives any corpus whose
    per-split token total fits ~1e15, the DECIMAL(38,0)/HUGEINT product
    bound, and the log2 itself never sees more than 21 bits).  A term
    vanishing from one side clamps its ratio to 1 ppm (the guard keeps
    the absent half-term at exactly 0) — near-zero JSD certifies
    exchangeable splits, the drift alarm for leaky or skewed eval sets.
    Per-term sign-split truncation can leave a pair a few ppm-bits
    negative under the shared octave bias; the sign is reported, not
    clamped.

    Scale shape: one corpus-sized (split, term) partial-combined count,
    a vocabulary-keyed conditional-sum pivot (one shuffle on term), a
    1-row broadcast for the three split totals, and three grid-sized
    readout aggregates.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        (text.md5_long(F.col("text")) % 100).alias("bucket"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term"),
    ).select(
        F.when(F.col("bucket") < _SPLIT_TRAIN, F.lit("train"))
        .when(F.col("bucket") == _SPLIT_TRAIN, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "term",
    )
    tf = toks.groupBy("split", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wide = tf.groupBy("term").agg(
        *[
            F.sum(F.when(F.col("split") == s, F.col("c")).otherwise(0)).alias(
                f"c_{s}"
            )
            for s in ("train", "val", "test")
        ]
    )
    tot = wide.agg(
        *[F.sum(f"c_{s}").alias(f"t_{s}") for s in ("train", "val", "test")]
    )
    joined = wide.crossJoin(F.broadcast(tot)).select(
        "*",
        *[
            F.expr(_m2_spark(a, b)).alias(f"m2_{a}_{b}")
            for a, b in _JS_DIRS
        ],
    )
    pairs = [
        joined.agg(
            F.lit(f"{a}|{b}").alias("pair"),
            F.max(f"t_{a}").cast("long").alias("n_tokens_a"),
            F.max(f"t_{b}").cast("long").alias("n_tokens_b"),
            F.sum(F.expr(_js_pair_spark(a, b))).cast("long").alias(
                "jsd_ppm_bits"
            ),
        )
        for a, b in _JS_PAIRS
    ]
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionByName(p)
    return out
