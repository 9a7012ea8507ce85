"""Scale rehearsal (r8 verdict ask #6): run the most expensive catalog
queries at sf0.1 and sf1 (tools/gen_sf1.py output), record min-of-N wall
times, the sf0.1->sf1 scaling factor, and a plan-shape signature at both
scales — flagging any query whose physical strategy degrades with scale
(a broadcast flipping to shuffle, a new cartesian, super-linear time).

Usage: python tools/scale_rehearsal.py [sf1_dir] [reps]
Prints one JSON line per query plus a summary table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP_QUERIES = [
    "parts_copurchase_pagerank_residual",
    "events_bootstrap_ci",
    "docs_gopher_repetition",
    "pipeline_curation_v2",
    "knn_label_ndcg",
    "parts_copurchase_triangles",
    "parts_graph_cohesion",
    "shingle_kmv_estimate",
    "knn_aggregate_diversity",
    "embedding_prefix_dim_recall",
]

SIG_NODES = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
)


def plan_signature(df) -> dict[str, int]:
    text = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return {n: len(re.findall(rf"\b{n}\b", text)) for n in SIG_NODES}


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from kafka_sink_spark import get_spark
    from kafka_sink_spark.plans import QUERIES

    spark = get_spark(app_name="scale-rehearsal")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results = []
    for sf_dir, sf in (("/root/testdata/sf0.1", 0.1), (sf1_dir, 1.0)):
        force(QUERIES["q1_pricing_summary"](spark, sf_dir))  # warm footers
        for name in TOP_QUERIES:
            df = QUERIES[name](spark, sf_dir)
            sig = plan_signature(df)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                force(QUERIES[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            results.append(
                {"query": name, "sf": sf, "sec": round(best, 3), "plan": sig}
            )
            print(json.dumps(results[-1]), flush=True)

    by_q: dict[str, dict[float, dict]] = {}
    for r in results:
        by_q.setdefault(r["query"], {})[r["sf"]] = r
    print("\nquery                                   sf0.1     sf1   x-factor  plan-diff")
    for q, d in by_q.items():
        a, b = d.get(0.1), d.get(1.0)
        if not (a and b):
            continue
        factor = b["sec"] / max(a["sec"], 1e-9)
        diff = {
            k: (a["plan"].get(k, 0), b["plan"].get(k, 0))
            for k in SIG_NODES
            if a["plan"].get(k, 0) != b["plan"].get(k, 0)
        }
        print(
            f"{q:38s} {a['sec']:7.2f} {b['sec']:7.2f}   {factor:7.2f}  "
            f"{diff if diff else 'unchanged'}"
        )


if __name__ == "__main__":
    main()
