"""Per-stage wall-time profile of dedup_semantic (SemDeDup) at any SF.

The r9 verdict asked for per-stage timings on sf10 data to replace the
"17.8x = replica artifact" explanation with evidence.  Stages mirror the
query's own boundaries (plans/analytics_corpus.py dedup_semantic):

  1. train    — component explode + Lloyd codebook (2 rounds, C=8)
  2. assign   — cell assignment (argmin centroid distance), persisted
  3. pairs    — within-cell pair generation (the SemDeDup bucketing)
  4. dots     — fixed-point array dot products over candidate pairs
  5. full     — the whole registered query end-to-end (fresh run)

Each stage is forced with a noop write; stage N's time includes its own
work only where the substrate below it was already forced (train feeds
assign, assign feeds pairs, ...), so the deltas are attributable.

Usage:  python tools/profile_semantic.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from kafka_sink_spark import get_spark
    from kafka_sink_spark.extensions import similarity
    from kafka_sink_spark.plans import QUERIES
    from kafka_sink_spark.plans.analytics_corpus import (
        _SEM_C,
        _SEM_DIM,
        _SEM_ITERS,
    )
    from kafka_sink_spark.session import load_tables

    spark = get_spark(app_name="profile-semantic")
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    n = emb.count()  # warms footers too
    report: dict[str, float] = {}

    t0 = time.perf_counter()
    comp = similarity.component_rows(emb, 1, _SEM_DIM)
    cent = similarity.lloyd_codebook(comp, _SEM_C, _SEM_ITERS)
    force(cent)
    report["train"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dists = similarity._pq_distances(comp, cent)
    cl = (
        dists.select("vid", F.struct(F.col("d"), F.col("j")).alias("_c"))
        .groupBy("vid")
        .agg(F.min("_c").alias("_b"))
        .select("vid", F.col("_b.j").alias("cell"), F.col("_b.d").alias("dcent"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    force(cl)
    report["assign"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    a, b = cl.alias("a"), cl.alias("b")
    prs = a.join(
        b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vid") < F.col("b.vid"))
    ).select(F.col("a.vid").alias("va"), F.col("b.vid").alias("vb"))
    n_pairs = prs.count()
    report["pairs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    xv = F.expr(
        "transform(embedding, e -> cast(round(cast(e as double) * 1000000.0, 0)"
        " as bigint))"
    )
    fixed = emb.select(F.col("vec_id").alias("vid"), xv.alias("xv"))
    fa = fixed.select(F.col("vid").alias("va"), F.col("xv").alias("xa"))
    fb = fixed.select(F.col("vid").alias("vb"), F.col("xv").alias("xb"))
    dots = (
        prs.join(fa, "va")
        .join(fb, "vb")
        .select(
            "va",
            "vb",
            F.aggregate(
                F.zip_with(F.col("xa"), F.col("xb"), lambda x, y: x * y),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("dot"),
        )
    )
    force(dots)
    report["dots"] = time.perf_counter() - t0
    cl.unpersist()

    t0 = time.perf_counter()
    force(QUERIES["dedup_semantic"](spark, SF_DIR))
    report["full"] = time.perf_counter() - t0

    print(
        {
            "sf_dir": SF_DIR,
            "n_vectors": n,
            "n_candidate_pairs": n_pairs,
            "stages_sec": {k: round(v, 2) for k, v in report.items()},
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
