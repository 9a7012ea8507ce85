"""Round-9e index/dedup tuning wave — measured knife curves over the
certified sketch and quantizer primitives.

- ``dedup_minhash_band_tuning``  the LSH banding trade-off, measured:
  over the SAME certified k=16 MinHash signatures, candidate-pair count
  and signature-agreement precision at (bands, rows) ∈ {(2,8), (4,4),
  (8,2)} — more bands → more candidates → higher recall at lower
  precision; this 3-point curve is the number that picks the production
  banding (the MinHash analog of ``knn_recall_vs_planes``).
- ``embedding_pq_distortion_by_subspace``  per-subspace quantization
  distortion of the PQ codebook (mean/max of the min squared-L2 to the
  assigned codeword, exact fixed point) — the index-QA readout that
  flags a subspace whose codewords don't cover its data (reconstruction
  error concentrates there, ADC ranking degrades first).
- ``multimodal_chunk_dedup_ratio``  content-addressed savings estimate
  over the certified byte-range chunk manifest: the copies-per-chunk
  histogram plus the global dedup savings ppm (1 − distinct/total) —
  the number a content-addressed blob store quotes before ingest.

Determinism per the package convention: exact fixed-point distances
(round(Σdiff²·1e6) per subspace, the knn_pq discipline), md5 chunk
fingerprints, integer ppm ratios, ties to low ids.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's dedup/ANN/multimodal families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.extensions import dedup
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# MinHash band tuning
# --------------------------------------------------------------------------

_BT_K = 16
_BT_CONFIGS = ((2, 8), (4, 4), (8, 2))
_BT_AGREE_MIN = _BT_K // 2  # precision proxy: >= half the hashes agree


def _bt_oracle() -> str:
    p = dedup.MINHASH_PRIME
    mins = ",\n         ".join(
        f"MIN((hm * {a} + {b}) % {p}) AS m{i}"
        for i, (a, b) in enumerate(dedup.minhash_params(_BT_K))
    )
    agree = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(_BT_K)
    )
    blocks = []
    for bands, rows in _BT_CONFIGS:
        band_selects = "\n        UNION ALL\n        ".join(
            f"SELECT doc_id, {b} AS band_id, md5("
            + " || ',' || ".join(
                f"CAST(m{i} AS VARCHAR)" for i in range(b * rows, (b + 1) * rows)
            )
            + ") AS band_hash FROM sigs"
            for b in range(bands)
        )
        blocks.append(
            f"""
    SELECT CAST({bands} AS BIGINT) AS bands, CAST({rows} AS BIGINT) AS rows_per_band,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN agree >= {_BT_AGREE_MIN} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_agree,
           CAST(SUM(CASE WHEN agree >= {_BT_AGREE_MIN} THEN 1 ELSE 0 END)
                * 1000000 // GREATEST(COUNT(*), 1) AS BIGINT) AS precision_ppm
    FROM (
      SELECT c.doc_a, c.doc_b, {agree.replace('a.', 'sa.').replace('b.', 'sb.')} AS agree
      FROM (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM ({band_selects}) x
        JOIN ({band_selects}) y
          ON x.band_id = y.band_id AND x.band_hash = y.band_hash
             AND x.doc_id < y.doc_id
      ) c
      JOIN sigs sa ON sa.doc_id = c.doc_a
      JOIN sigs sb ON sb.doc_id = c.doc_b
    )"""
        )
    body = "\nUNION ALL\n".join(blocks)
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(len(t) - 2), i -> array_to_string(t[i+1:i+3], ' '))
             ELSE [array_to_string(t, ' ')] END) AS shingle
      FROM toks
    ), hm AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {p} AS hm
      FROM sh
    ), sigs AS (
      SELECT doc_id, {mins} FROM hm GROUP BY doc_id
    )
    {body}
    """


@register("dedup_minhash_band_tuning", oracle=_bt_oracle())
def dedup_minhash_band_tuning(spark, sf_dir):
    """Measured LSH banding curve over the shared k=16 MinHash
    signatures: for (bands, rows) in {(2,8), (4,4), (8,2)}, the distinct
    candidate-pair count and the share whose signatures agree on ≥ 8 of
    16 hashes (an unbiased Jaccard ≥ ~0.5 proxy, integer-exact) — the
    three-point precision/recall trade-off that picks the deployment's
    banding without rescoring the corpus per config.

    Scale shape: ONE signature build (explode + 16-min partial agg),
    then per config a band-bucket equi-self-join (candidates are
    bucket-local, O(bands·n) posting rows, AQE skew-join on degenerate
    buckets) and two signature equi-joins for the agreement count; the
    output is the 3-row curve.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sigs = dedup.minhash_signatures(docs, k=_BT_K).localCheckpoint(eager=True)
    agree = sum(
        F.when(F.col(f"a_m{i}") == F.col(f"b_m{i}"), 1).otherwise(0)
        for i in range(_BT_K)
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a_m{i}") for i in range(_BT_K)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b_m{i}") for i in range(_BT_K)],
    )
    curves = []
    for bands, rows in _BT_CONFIGS:
        cand = dedup.lsh_candidate_pairs(
            sigs, bands=bands, rows_per_band=rows
        ).select("doc_a", "doc_b").distinct()
        scored = cand.join(sa, "doc_a").join(sb, "doc_b").select(
            agree.alias("agree")
        )
        curves.append(
            scored.agg(
                F.lit(bands).cast("long").alias("bands"),
                F.lit(rows).cast("long").alias("rows_per_band"),
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
                F.sum(
                    F.when(F.col("agree") >= _BT_AGREE_MIN, 1).otherwise(0)
                )
                .cast("long")
                .alias("n_agree"),
                F.expr(
                    f"CAST(SUM(CASE WHEN agree >= {_BT_AGREE_MIN} THEN 1"
                    f" ELSE 0 END) * 1000000"
                    f" div GREATEST(COUNT(1), 1) AS BIGINT)"
                ).alias("precision_ppm"),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out


# --------------------------------------------------------------------------
# PQ distortion by subspace
# --------------------------------------------------------------------------

_PQD_M = 8
_PQD_K = 16
_PQD_DIM = 64


def _pqd_oracle() -> str:
    sub_len = _PQD_DIM // _PQD_M

    def d2(m: int) -> str:
        lo = m * sub_len + 1
        return " + ".join(
            f"(c.e[{i}]::DOUBLE - w.e[{i}]::DOUBLE)"
            f" * (c.e[{i}]::DOUBLE - w.e[{i}]::DOUBLE)"
            for i in range(lo, lo + sub_len)
        )

    arms = "\n      UNION ALL\n      ".join(
        f"SELECT c.vid, {m} AS m, w.j, "
        f"CAST(round(({d2(m)}) * 1000000.0) AS BIGINT) AS dfix "
        f"FROM corp c, cwv w"
        for m in range(_PQD_M)
    )
    return f"""
    WITH cwv AS (
      SELECT vec_id AS j, embedding AS e FROM embeddings
      WHERE vec_id < {_PQD_K}
    ), corp AS (
      SELECT vec_id AS vid, embedding AS e FROM embeddings
    ), cdist AS (
      {arms}
    ), best AS (
      SELECT vid, m, MIN(dfix) AS dmin FROM cdist GROUP BY vid, m
    )
    SELECT CAST(m AS BIGINT) AS subspace,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(dmin) AS BIGINT) AS total_dfix,
           CAST(SUM(dmin) // COUNT(*) AS BIGINT) AS mean_dfix,
           CAST(MAX(dmin) AS BIGINT) AS max_dfix
    FROM best GROUP BY m
    """


@register("embedding_pq_distortion_by_subspace", oracle=_pqd_oracle())
def embedding_pq_distortion_by_subspace(spark, sf_dir):
    """Quantization distortion of the PQ codebook per subspace: for every
    vector-subspace the exact fixed-point squared-L2 to its NEAREST
    codeword, rolled up to per-subspace count / total / mean / max — a
    subspace whose mean or max runs hot is where ADC ranking error
    concentrates, the first thing to check before blaming recall on the
    coarse quantizer.

    Scale shape: corpus-subspace rows × the broadcast M×K codebook, a
    partial-combined min per (vid, m), then an M-row rollup — the same
    linear encode pass ``knn_pq`` runs, read out as QA instead of codes.
    """
    from kafka_sink_spark.extensions.similarity import (
        _l2sq_fixed,
        _subspace_rows,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    sub_len = _PQD_DIM // _PQD_M
    cw = _subspace_rows(
        emb.filter(F.col("vec_id") < _PQD_K), "j", _PQD_M, sub_len, "embedding"
    ).select("j", "m", F.col("sub").alias("cw_sub"))
    corpus = _subspace_rows(emb, "vid", _PQD_M, sub_len, "embedding")
    best = (
        corpus.join(F.broadcast(cw), "m")
        .select(
            "vid",
            "m",
            _l2sq_fixed(F.col("sub"), F.col("cw_sub")).alias("dfix"),
        )
        .groupBy("vid", "m")
        .agg(F.min("dfix").alias("dmin"))
    )
    return best.groupBy(F.col("m").cast("long").alias("subspace")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("dmin").cast("long").alias("total_dfix"),
        F.expr("CAST(SUM(dmin) div COUNT(1) AS BIGINT)").alias("mean_dfix"),
        F.max("dmin").cast("long").alias("max_dfix"),
    )


# --------------------------------------------------------------------------
# Chunk-level dedup ratio over the manifest
# --------------------------------------------------------------------------

_CDR_CHUNK = 256


def _cdr_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id AS asset_id, text, octet_length(encode(text)) AS blen
      FROM documents
    ), idx AS (
      SELECT asset_id, text, blen,
             unnest(range(CAST((blen + {_CDR_CHUNK} - 1)
                               // {_CDR_CHUNK} AS BIGINT))) AS chunk_idx
      FROM d
    ), chunks AS (
      SELECT md5(substr(text, CAST(chunk_idx * {_CDR_CHUNK} + 1 AS BIGINT),
                        {_CDR_CHUNK})) AS chunk_md5
      FROM idx
    ), pc AS (
      SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS copies FROM chunks
      GROUP BY chunk_md5
    ), hist AS (
      SELECT copies, CAST(COUNT(*) AS BIGINT) AS n_hashes,
             CAST(copies * COUNT(*) AS BIGINT) AS n_chunks
      FROM pc GROUP BY copies
    )
    SELECT copies, n_hashes, n_chunks, CAST(0 AS BIGINT) AS savings_ppm
    FROM hist
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS copies,
           CAST(SUM(n_hashes) AS BIGINT) AS n_hashes,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST((SUM(n_chunks) - SUM(n_hashes)) * 1000000
                // SUM(n_chunks) AS BIGINT) AS savings_ppm
    FROM hist
    """


@register("multimodal_chunk_dedup_ratio", oracle=_cdr_oracle())
def multimodal_chunk_dedup_ratio(spark, sf_dir):
    """Content-addressed dedup estimate over the certified 256-byte chunk
    manifest: the copies-per-chunk histogram (how many chunk hashes occur
    1×, 2×, …) plus the global summary row (copies = −1) carrying the
    savings 1 − distinct/total in ppm — what a content-addressed store
    saves on ingest, per the same fingerprints the transfer plan uses.

    Scale shape: the manifest's zero-shuffle chunk projection, one
    partial-combined count per chunk hash, then a copies-bounded
    histogram rollup — scan-bound like the manifest itself.
    """
    from kafka_sink_spark.extensions import multimodal
    from kafka_sink_spark.plans.analytics_manifest import (
        multimodal_chunk_manifest,
    )

    manifest = multimodal_chunk_manifest(spark, sf_dir)
    pc = manifest.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).cast("long").alias("copies")
    )
    hist = pc.groupBy("copies").agg(
        F.count(F.lit(1)).cast("long").alias("n_hashes"),
        (F.col("copies") * F.count(F.lit(1))).cast("long").alias("n_chunks"),
    )
    rows = hist.select(
        "copies", "n_hashes", "n_chunks", F.lit(0).cast("long").alias("savings_ppm")
    )
    total = hist.agg(
        F.lit(-1).cast("long").alias("copies"),
        F.sum("n_hashes").cast("long").alias("n_hashes"),
        F.sum("n_chunks").cast("long").alias("n_chunks"),
        F.expr(
            "CAST((SUM(n_chunks) - SUM(n_hashes)) * 1000000"
            " div SUM(n_chunks) AS BIGINT)"
        ).alias("savings_ppm"),
    )
    return rows.unionByName(total)
