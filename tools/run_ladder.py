"""Spark-side scale-ladder runner (r12 verdict ask #7): run named catalog
queries at a given sf_dir, record min-of-N wall time, the plan-shape
signature, and the (small) result rows for invariant checks — the
oracle-free half of the documented spill-wall protocol (DuckDB anchors the
hash at the largest SF it survives, sf10 here; above that the Spark side
is the engine under test and must keep its verified plan shape).

Usage:
    python tools/run_ladder.py <sf_dir> <reps> <query> [query ...]
Prints one JSON line per query: {"query", "sf_dir", "sec", "plan",
"n_rows", "rows"? (when <= 200)}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_rehearsal import plan_signature  # noqa: E402


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    from kafka_sink_spark import get_spark
    from kafka_sink_spark.plans import QUERIES

    # SCALE.md shuffle-sizing discipline: at sf100 the default 32
    # partitions put ~1/32 of a multi-billion-row explode in each task and
    # GC-thrash the JVM; SPARK_GRAFT_LADDER_SHUFFLE sizes partitions to
    # the target SF (what spark.sql.shuffle.partitions does on a real
    # cluster).  Results are partitioning-invariant (the exact-integer
    # convention), so certifications hold.
    shuffle = os.environ.get("SPARK_GRAFT_LADDER_SHUFFLE")
    spark = get_spark(
        app_name="r-ladder",
        shuffle_partitions=int(shuffle) if shuffle else None,
    )
    # Scan-split sizing (r14): the replicated ladder corpora compress
    # absurdly (sf30 documents = 3.1 MB on disk for 1.5M rows), so the
    # default 128 MB maxPartitionBytes reads the WHOLE table as ONE input
    # split and the entire pre-shuffle stage (tokenize/explode/partial
    # agg) runs single-task — a local-harness artifact, not a plan
    # property.  A real 100 TB corpus scans as thousands of splits.
    # SPARK_GRAFT_LADDER_SPLIT_BYTES restores realistic scan parallelism
    # (e.g. 65536 → ~50 splits at sf30).  Results are split-invariant.
    split = os.environ.get("SPARK_GRAFT_LADDER_SPLIT_BYTES")
    if split:
        spark.conf.set("spark.sql.files.maxPartitionBytes", split)
        spark.conf.set("spark.sql.files.openCostInBytes", split)

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        sig = plan_signature(df)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            force(QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out = {
            "query": name,
            "sf_dir": sf_dir,
            "sec": round(best, 3),
            "plan": sig,
        }
        # The row-count/collect pass RE-EXECUTES the query (noop writes
        # leave nothing behind); at sf100 that doubles a 30-minute run,
        # so it is skippable.
        if not os.environ.get("SPARK_GRAFT_LADDER_NO_COUNT"):
            res = QUERIES[name](spark, sf_dir)
            n = res.count()
            out["n_rows"] = n
            if n <= 200:
                out["rows"] = [r.asDict() for r in res.collect()]
        print(json.dumps(out, default=str), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
