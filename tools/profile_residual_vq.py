"""Per-stage wall-time profile of embedding_residual_vq at any SF
(r10 verdict ask #4: the query is the catalog's slowest at 6.5 s sf0.1 —
attribute the cost to its stages the way profile_semantic.py did for
dedup_semantic).

Stages mirror the query's own boundaries
(plans/analytics_refinement.py::embedding_residual_vq):

  1. components — fixed-point component explode (the corpus pass)
  2. train1     — stage-1 Lloyd codebook (K1=8, 2 seeded rounds)
  3. assign1    — per-vector cell + d1 (argmin over broadcast codebook)
  4. residuals  — x − c1 join, persisted (the stage-2 substrate)
  5. train2     — stage-2 Lloyd codebook on residuals (K2=16)
  6. encode2    — d2 argmin + per-cell rollup (the query's tail)
  7. full       — the whole registered query end-to-end (fresh run)

Each stage is forced with a noop write on top of the persisted substrate
below it, so deltas are attributable.  Stage sums ≈ full (the full run
re-does everything through its own persists).

Usage:  python tools/profile_residual_vq.py [sf_dir] e.g. /tmp/sf10
"""

from __future__ import annotations

import json
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
    from kafka_sink_spark.plans.analytics_refinement import (
        _RVQ_DIM,
        _RVQ_ITERS,
        _RVQ_K1,
        _RVQ_K2,
    )
    from kafka_sink_spark.session import load_tables

    spark = get_spark(app_name="profile-residual-vq")
    times: dict[str, float] = {}

    def stage(name, thunk):
        t0 = time.perf_counter()
        out = thunk()
        times[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name:<11} {times[name]:>8.2f}s", flush=True)
        return out

    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]

    def mk_components():
        comp = similarity.component_rows(
            emb, m_subspaces=1, sub_len=_RVQ_DIM
        ).persist(StorageLevel.MEMORY_AND_DISK)
        force(comp)
        return comp

    comp = stage("components", mk_components)

    def mk_train1():
        cb1 = similarity.lloyd_codebook(
            comp, k_codewords=_RVQ_K1, iterations=_RVQ_ITERS
        ).persist(StorageLevel.MEMORY_AND_DISK)
        force(cb1)
        return cb1

    cb1 = stage("train1", mk_train1)

    def mk_assign1():
        fd1 = similarity._pq_distances(comp, cb1)
        fa1 = (
            fd1.select("vid", F.struct(F.col("d"), F.col("j")).alias("_c"))
            .groupBy("vid")
            .agg(F.min("_c").alias("_b"))
            .select("vid", F.col("_b.j").alias("cell"), F.col("_b.d").alias("d1"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        force(fa1)
        return fa1

    fa1 = stage("assign1", mk_assign1)

    def mk_residuals():
        res = (
            comp.join(fa1.select("vid", "cell"), "vid")
            .join(
                F.broadcast(cb1.withColumnRenamed("j", "cell")),
                ["m", "comp", "cell"],
            )
            .select("vid", "m", "comp", (F.col("x") - F.col("c")).alias("x"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        force(res)
        return res

    res = stage("residuals", mk_residuals)

    def mk_train2():
        cb2 = similarity.lloyd_codebook(
            res, k_codewords=_RVQ_K2, iterations=_RVQ_ITERS
        ).persist(StorageLevel.MEMORY_AND_DISK)
        force(cb2)
        return cb2

    cb2 = stage("train2", mk_train2)

    def mk_encode2():
        fd2 = similarity._pq_distances(res, cb2)
        fa2 = (
            fd2.select("vid", F.struct(F.col("d"), F.col("j")).alias("_c"))
            .groupBy("vid")
            .agg(F.min("_c").alias("_b"))
            .select("vid", F.col("_b.d").alias("d2"))
        )
        rollup = (
            fa1.join(fa2, "vid")
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_vectors"),
                F.sum("d1").cast("long").alias("d1_sum"),
                F.sum("d2").cast("long").alias("d2_sum"),
            )
        )
        force(rollup)

    stage("encode2", mk_encode2)

    for df in (comp, cb1, fa1, res, cb2):
        df.unpersist()

    stage("full", lambda: force(QUERIES["embedding_residual_vq"](spark, SF_DIR)))

    print(json.dumps({"sf_dir": SF_DIR, "stages_sec": times}))
    spark.stop()


if __name__ == "__main__":
    main()
