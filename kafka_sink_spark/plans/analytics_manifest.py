"""Round-8c manifest / fertility / convergence wave.

- ``multimodal_chunk_manifest``  byte-range chunk plan over opaque binary
  payloads: per asset, fixed-size chunks with offset, length, and md5
  fingerprint — the transfer/dedup manifest a 100 TB blob pipeline
  computes before moving anything (chunked upload, content-addressed
  storage, partial retransfer).  The chunking is REAL binary slicing on
  the Spark side (``substring`` over the payload bytes + ``md5``);
  DuckDB replays it on the text because the synthetic corpus is pure
  ASCII (byte length == char length, asserted in the oracle via a
  canary column).
- ``docs_tokenizer_fertility``  per-source tokenizer fertility: BPE-ish
  pre-tokenizer tokens per whitespace word in ppm, plus bytes per
  pre-token — the "how many pieces does this tokenizer cut a word into"
  statistic that drives tokenizer vocab sizing per corpus slice.
- ``dedup_cluster_size_histogram``  near-dup cluster size distribution
  (size → number of clusters) + the duplicate-mass share in ppm — the
  rollup any dedup report leads with, over the certified MinHash-LSH →
  connected-components pipeline.
- ``parts_copurchase_pagerank_residual``  per-iteration L1 residual of
  the integer PageRank (Σ|r_k − r_{k−1}| and its ppm of total mass) —
  the convergence certificate for the fixed-iteration choice: residuals
  must shrink monotonically across the 3 unrolled iterations.

Determinism per the package convention: integers end-to-end, md5
fingerprints, truncating division, per-term truncation before
order-independent sums.

Reference anchor: datastax/kafka-sink has no analytics surface
(sink/src/main is record mapping + DSE writes, SURVEY §2); the chunk
manifest extends the multimodal plumbing family (C7 blob parity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Byte-range chunk manifest over binary payloads
# --------------------------------------------------------------------------

_CHUNK_BYTES = 256

_CHUNK_ORACLE = f"""
    WITH d AS (
      SELECT doc_id AS asset_id, text,
             octet_length(encode(text)) AS blen
      FROM documents
    ), idx AS (
      SELECT asset_id, text, blen,
             unnest(range(CAST((blen + {_CHUNK_BYTES} - 1)
                                // {_CHUNK_BYTES} AS BIGINT))) AS chunk_idx
      FROM d
    )
    SELECT asset_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {_CHUNK_BYTES} AS BIGINT) AS byte_offset,
           CAST(LEAST({_CHUNK_BYTES},
                      blen - chunk_idx * {_CHUNK_BYTES}) AS BIGINT)
             AS chunk_len,
           md5(substr(text, CAST(chunk_idx * {_CHUNK_BYTES} + 1 AS BIGINT),
                      {_CHUNK_BYTES})) AS chunk_md5,
           CAST((blen + {_CHUNK_BYTES} - 1) // {_CHUNK_BYTES} AS BIGINT)
             AS n_chunks
    FROM idx
    """


@register("multimodal_chunk_manifest", oracle=_CHUNK_ORACLE)
def multimodal_chunk_manifest(spark, sf_dir):
    """Chunked-transfer manifest over opaque binary payloads: each asset
    is split into fixed {c}-byte ranges and fingerprinted — (asset_id,
    chunk_idx, byte_offset, chunk_len, md5, n_chunks) — the plan a
    content-addressed blob store or a resumable uploader needs per
    object.  Chunking is real byte slicing (``substring`` on the binary
    payload column, md5 over the slice); no payload ever reaches the
    driver.

    Scale shape: pure per-row projection + a bounded explode (blen/{c}
    chunks per asset) — embarrassingly parallel, no shuffle at all; at
    100 TB the manifest job is scan-bound, which is the point.
    """
    from kafka_sink_spark.extensions import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    assets = multimodal.documents_as_assets(docs)
    c = _CHUNK_BYTES
    with_len = assets.select(
        "asset_id",
        "payload",
        F.length(F.col("payload")).cast("long").alias("blen"),
    ).select(
        "*",
        F.expr(f"CAST((blen + {c} - 1) div {c} AS BIGINT)").alias("n_chunks"),
    )
    return with_len.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)
        ).alias("chunk_idx"),
        "payload",
        "blen",
        "n_chunks",
    ).select(
        "asset_id",
        "chunk_idx",
        (F.col("chunk_idx") * c).alias("byte_offset"),
        F.least(
            F.lit(c).cast("long"), F.col("blen") - F.col("chunk_idx") * c
        ).alias("chunk_len"),
        F.md5(
            F.expr(f"substring(payload, CAST(chunk_idx * {c} + 1 AS INT), {c})")
        ).alias("chunk_md5"),
        "n_chunks",
    )


multimodal_chunk_manifest.__doc__ = multimodal_chunk_manifest.__doc__.format(
    c=_CHUNK_BYTES
)


# --------------------------------------------------------------------------
# Tokenizer fertility per source
# --------------------------------------------------------------------------

_FERT_ORACLE = r"""
    WITH d AS (
      SELECT source,
             octet_length(encode(text)) AS blen,
             len(list_filter(regexp_split_to_array(text, '\s+'),
                             x -> x <> '')) AS n_words,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_pretoks
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_pretoks) AS BIGINT) AS n_pretokens,
           CAST(SUM(n_pretoks) * 1000000 // SUM(n_words) AS BIGINT)
             AS fertility_ppm,
           CAST(SUM(blen) * 1000000 // SUM(n_pretoks) AS BIGINT)
             AS bytes_per_pretoken_ppm
    FROM d GROUP BY source
    """


@register("docs_tokenizer_fertility", oracle=_FERT_ORACLE)
def docs_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per source: BPE-ish pre-tokens (letter runs /
    digit runs / single symbols) per whitespace word, in ppm — fertility
    near 1e6 means the pre-tokenizer rarely splits words; high fertility
    flags sources (code, URLs, numerics) that will inflate token counts
    under any subword scheme.  ``bytes_per_pretoken_ppm`` is the
    compression denominator tokenizer-budget planning uses.

    Scale shape: one scan, two vectorized regex projections, one
    partial-combined rollup by source — no Python, no shuffle beyond
    the |sources|-row aggregate.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = docs.select(
        "source",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("blen"),
        F.size(text_ops.tokens(F.col("text"))).cast("long").alias("n_words"),
        F.size(text_ops.word_tokens(F.col("text"))).cast("long").alias(
            "n_pretoks"
        ),
    )
    return d.groupBy("source").agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_pretoks").cast("long").alias("n_pretokens"),
        F.expr("CAST(SUM(n_pretoks) * 1000000 div SUM(n_words) AS BIGINT)").alias(
            "fertility_ppm"
        ),
        F.expr(
            "CAST(SUM(blen) * 1000000 div SUM(n_pretoks) AS BIGINT)"
        ).alias("bytes_per_pretoken_ppm"),
    )


# --------------------------------------------------------------------------
# Near-dup cluster size histogram
# --------------------------------------------------------------------------


def _cluster_hist_oracle() -> str:
    from kafka_sink_spark.plans.analytics import _clusters_oracle

    return f"""
    WITH assign AS ({_clusters_oracle()}),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS sz FROM assign GROUP BY cluster_id
    ), tot AS (
      SELECT SUM(sz) AS n_docs, COUNT(*) AS n_clusters FROM sizes
    )
    SELECT CAST(sizes.sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * sizes.sz AS BIGINT) AS n_docs,
           CAST((COUNT(*) * (sizes.sz - 1)) * 1000000 // tot.n_docs
                AS BIGINT) AS dup_mass_ppm
    FROM sizes, tot GROUP BY sizes.sz, tot.n_docs
    """


@register("dedup_cluster_size_histogram", oracle=_cluster_hist_oracle())
def dedup_cluster_size_histogram(spark, sf_dir):
    """Near-dup cluster size distribution over the certified
    MinHash-LSH → connected-components pipeline: for each cluster size,
    how many clusters, how many documents they hold, and the duplicate
    mass they contribute (size−1 removable docs per cluster) in ppm of
    the clustered population — the first table of any dedup report
    ("how much would we delete, and is it many small twins or one giant
    blob").

    Scale shape: inherits the certified pair-generation + HashMin
    shapes; the rollup is two partial-combined aggregations over the
    (bounded) cluster table; sizes are grouped on the size VALUE, a
    bounded grid.
    """
    from kafka_sink_spark.extensions import dedup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.2)
    assign = dedup.connected_components(pairs)
    sizes = assign.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    tot = sizes.agg(F.sum("sz").cast("long").alias("n_docs"))
    return (
        sizes.groupBy("sz")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            "n_clusters",
            (F.col("n_clusters") * F.col("sz")).cast("long").alias("n_docs"),
            F.expr(
                "CAST((n_clusters * (sz - 1)) * 1000000 div n_docs AS BIGINT)"
            ).alias("dup_mass_ppm"),
        )
    )


# --------------------------------------------------------------------------
# PageRank convergence residuals
# --------------------------------------------------------------------------


def _residual_oracle() -> str:
    from kafka_sink_spark.plans.analytics_mining import (
        _PR_BASE,
        _PR_SCALE,
        _pr_sum_cte,
    )

    return f"""
    WITH li AS (
      SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), e AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
    ), nodes AS (
      SELECT DISTINCT src AS node FROM e
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src
    ), r0 AS (
      SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM nodes
    ), {_pr_sum_cte('r0', 1)}, {_pr_sum_cte('r1', 2)}, {_pr_sum_cte('r2', 3)},
    res AS (
      SELECT 1 AS iter, SUM(ABS(r1.r - r0.r)) AS l1, SUM(r0.r) AS mass
      FROM r1 JOIN r0 ON r0.node = r1.node
      UNION ALL
      SELECT 2, SUM(ABS(r2.r - r1.r)), SUM(r1.r)
      FROM r2 JOIN r1 ON r1.node = r2.node
      UNION ALL
      SELECT 3, SUM(ABS(r3.r - r2.r)), SUM(r2.r)
      FROM r3 JOIN r2 ON r2.node = r3.node
    )
    SELECT CAST(iter AS BIGINT) AS iter, CAST(l1 AS BIGINT) AS l1_residual,
           CAST(l1 * 1000000 // mass AS BIGINT) AS residual_ppm
    FROM res
    """


@register("parts_copurchase_pagerank_residual", oracle=_residual_oracle())
def parts_copurchase_pagerank_residual(spark, sf_dir):
    """Convergence certificate for the integer PageRank: the L1 residual
    Σ|r_k − r_{k−1}| after each of the 3 unrolled iterations, absolute
    and as ppm of the prior iteration's total mass.  A healthy damped
    iteration contracts by ~the damping factor per round; this readout
    turns "3 iterations is enough" from an assumption into a measured,
    hash-pinned number.

    Scale shape: reuses the persisted per-iteration rank ladder of
    `parts_copurchase_pagerank` (`_pr_rank_ladder` — r11 verdict ask #3:
    the former per-branch lineage re-evaluation was O(iters^2) and made
    this the catalog's slowest query); each residual branch is one
    node-keyed join + partial-combined sum of two cached
    one-row-per-node rank tables.
    """
    from kafka_sink_spark.plans.analytics_mining import (
        _PR_ITERS,
        _pr_rank_ladder,
    )

    ladder = _pr_rank_ladder(spark, sf_dir)
    residuals = []
    for it in range(1, _PR_ITERS + 1):
        nxt = ladder[it]
        prev = ladder[it - 1].select("node", F.col("r").alias("r_prev"))
        residuals.append(
            nxt.join(prev, "node").agg(
                F.lit(it).cast("long").alias("iter"),
                F.sum(F.abs(F.col("r") - F.col("r_prev")))
                .cast("long")
                .alias("l1_residual"),
                F.expr(
                    "CAST(SUM(ABS(r - r_prev)) * 1000000 div SUM(r_prev)"
                    " AS BIGINT)"
                ).alias("residual_ppm"),
            )
        )
    import functools

    return functools.reduce(lambda a, b: a.unionByName(b), residuals)
