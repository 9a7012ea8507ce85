"""Per-stage wall-time profile of the two hybrid-retrieval heavies at any
SF (r11 verdict ask #7: docs_hybrid_recall_vs_exact and
docs_hybrid_rrf_indexed were the #2/#4 most expensive local queries —
attribute the cost to their stages the way profile_residual_vq.py did for
embedding_residual_vq).

Stages mirror the queries' own boundaries
(plans/analytics_fusion.py::docs_hybrid_rrf_indexed / _recall_vs_exact):

  indexed hybrid:
    1. lex_posting — posting-list BM25 top-20 (index-build corpus pass +
                     3-term posting probe)
    2. dense_ivfpq — IVF-PQ top-20 (Lloyd coarse fit + PQ fit + cell
                     probe + ADC; the index build dominates and is
                     amortized across queries in production)
    3. fused       — the registered query end-to-end (fresh run)
  recall vs exact:
    4. exact_hybrid   — the exact BM25 × cosine hybrid (full-corpus scan)
    5. indexed_hybrid — stage 3's plan again (shared substrates persist)
    6. recall_join    — the registered query end-to-end (fresh run)

Each stage is forced with a noop write; min-of-$SPARK_GRAFT_BENCH_REPS
(default 2).  Usage: python tools/profile_hybrid.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(make_df, reps=REPS) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(make_df())
        best = min(best, time.perf_counter() - t0)
    return round(best, 1)


def main() -> None:
    from kafka_sink_spark import get_spark
    from kafka_sink_spark.extensions import similarity
    from kafka_sink_spark.plans import QUERIES
    from kafka_sink_spark.plans.analytics_fusion import (
        _HY_SIDE_TOPK,
        _bm25_posting_scored,
    )
    from kafka_sink_spark.plans.analytics_training import (
        _IVFPQ_COARSE_ITERS,
        _IVFPQ_PQ_ITERS,
        _IVFT_C,
        _IVFT_NPROBE,
        _PQT_DIM,
        _PQT_K,
        _PQT_M,
    )
    from kafka_sink_spark.session import load_tables

    spark = get_spark(app_name="profile-hybrid")
    out: dict[str, float] = {}

    out["lex_posting"] = timed(
        lambda: _bm25_posting_scored(spark, SF_DIR).limit(_HY_SIDE_TOPK)
    )
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    out["dense_ivfpq"] = timed(
        lambda: similarity.knn_ivf_pq(
            emb,
            k=_HY_SIDE_TOPK,
            n_queries=1,
            n_centroids=_IVFT_C,
            nprobe=_IVFT_NPROBE,
            m_subspaces=_PQT_M,
            k_codewords=_PQT_K,
            dim=_PQT_DIM,
            coarse_iterations=_IVFPQ_COARSE_ITERS,
            pq_iterations=_IVFPQ_PQ_ITERS,
        )
    )
    out["fused_indexed_full"] = timed(
        lambda: QUERIES["docs_hybrid_rrf_indexed"](spark, SF_DIR)
    )
    out["exact_hybrid_full"] = timed(
        lambda: QUERIES["docs_hybrid_rrf"](spark, SF_DIR)
    )
    out["recall_join_full"] = timed(
        lambda: QUERIES["docs_hybrid_recall_vs_exact"](spark, SF_DIR)
    )
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "stages": out}))
    spark.stop()


if __name__ == "__main__":
    main()
