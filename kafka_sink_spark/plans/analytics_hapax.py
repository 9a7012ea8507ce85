"""Round-8j hapax / hash-balance wave.

- ``corpus_hapax_ratio``  hapax legomena profile per source: types
  seen exactly once within the source, as a share of the source's
  types and of its tokens (ppm) — the vocabulary-freshness statistic
  (hapax-rich sources inflate vocab estimates and starve frequency
  models; Good–Turing's unseen-mass estimate leans entirely on this
  count).
- ``docs_simhash_bit_balance``  hash-quality audit of the 16-bit
  SimHash signatures: per bit position, the share of documents with
  the bit set (ppm) and its absolute imbalance from the fair coin —
  a skewed bit wastes a bucket-split everywhere it is used, so this
  is the certificate behind the dedup family's signature scheme.

Determinism per the package convention: integers end-to-end,
truncating division; the SimHash signatures are the certified
``dedup_simhash`` bits.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's corpus/dedup-QA families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Hapax legomena per source
# --------------------------------------------------------------------------

_HAPAX_ORACLE = r"""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), tc AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY source, term
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hapax_type_ppm,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // SUM(c) AS BIGINT) AS hapax_token_ppm
    FROM tc GROUP BY source
    """


@register("corpus_hapax_ratio", oracle=_HAPAX_ORACLE)
def corpus_hapax_ratio(spark, sf_dir):
    """Hapax legomena profile per source: the types occurring exactly
    once within the source, as a share of its types and of its tokens
    (ppm).  A hapax-type share near Zipf's ~50% is healthy natural
    text; far above means noise/IDs flooding the vocabulary, far below
    means templated repetition — and the hapax count is exactly the N₁
    that Good–Turing's unseen-mass estimate is built from
    (`corpus_good_turing`).

    Scale shape: one tokenize pass, a partial-combined (source, term)
    count, one |sources|-bounded rollup.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tc = (
        docs.select(
            "source", F.explode(text_ops.tokens(F.col("text"))).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return tc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.expr(
            "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("hapax_type_ppm"),
        F.expr(
            "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000"
            " div SUM(c) AS BIGINT)"
        ).alias("hapax_token_ppm"),
    )


# --------------------------------------------------------------------------
# SimHash bit balance
# --------------------------------------------------------------------------

_SH_BITS = 16


def _bit_balance_oracle() -> str:
    from kafka_sink_spark.plans.analytics import _simhash_oracle

    # reuse the certified signature derivation; unpack its `sig` CTE by
    # recomputing per doc then exploding the bit positions
    inner = _simhash_oracle(_SH_BITS).strip()
    return f"""
    WITH docsig AS (
      SELECT simhash, n_docs FROM ({inner})
    ), bits AS (
      SELECT b.b AS bit, SUM(CASE WHEN (docsig.simhash >> b.b) & 1 = 1
                                  THEN docsig.n_docs ELSE 0 END) AS set_docs,
             SUM(docsig.n_docs) AS n_docs
      FROM docsig, (SELECT unnest(range({_SH_BITS})) AS b) b
      GROUP BY b.b
    )
    SELECT CAST(bit AS BIGINT) AS bit,
           CAST(set_docs AS BIGINT) AS set_docs,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(set_docs * 1000000 // n_docs AS BIGINT) AS set_ppm,
           CAST(ABS(set_docs * 1000000 // n_docs - 500000) AS BIGINT)
             AS imbalance_ppm
    FROM bits
    """


@register("docs_simhash_bit_balance", oracle=_bit_balance_oracle())
def docs_simhash_bit_balance(spark, sf_dir):
    """Hash-quality audit of the {b}-bit SimHash scheme: per bit
    position, the share of documents with the bit set (ppm) and its
    absolute imbalance from the fair coin (|share − 0.5| in ppm).  A
    systematically skewed bit halves the effective bucket space of
    every scheme that keys on it; near-500000 shares certify the
    md5-derived per-token bits mix well on this corpus.  Computed off
    the SAME signature derivation as `dedup_simhash`, so the audit and
    the operator can never drift.

    Scale shape: the certified signature rollup (per-doc partial-
    combined votes) followed by a {b}-row bit explode and a bounded
    rollup.
    """
    from kafka_sink_spark.extensions import dedup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sig = dedup.simhash_signatures(docs, bits=_SH_BITS).select("simhash")
    bits = sig.select(
        F.explode(F.sequence(F.lit(0), F.lit(_SH_BITS - 1))).alias("bit"),
        "simhash",
    ).select(
        "bit",
        F.expr(
            "CAST(shiftright(simhash, CAST(bit AS INT)) & 1 AS BIGINT)"
        ).alias("set"),
    )
    return bits.groupBy("bit").agg(
        F.sum("set").cast("long").alias("set_docs"),
        F.count("*").cast("long").alias("n_docs"),
        F.expr("CAST(SUM(set) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "set_ppm"
        ),
        F.expr(
            "CAST(ABS(SUM(set) * 1000000 div COUNT(*) - 500000) AS BIGINT)"
        ).alias("imbalance_ppm"),
    )


docs_simhash_bit_balance.__doc__ = docs_simhash_bit_balance.__doc__.format(
    b=_SH_BITS
)
