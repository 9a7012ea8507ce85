"""sf10 verification of parts_modularity via the replica-structure oracle
(r10 verdict ask #4: the DuckDB oracle hits its documented spill wall on
the sf1+ co-purchase self-join, so the graph family needs a non-DuckDB
oracle at sf10).

tools/gen_sf1.py builds sfN as K disjoint key-offset replicas of sf0.1
(part keys offset by k·(max_p_partkey+1)), so the sf10 co-purchase graph
is EXACTLY 100 disjoint isomorphic copies of the sf0.1 graph.  The
deterministic LP loop breaks ties by min label (= min part key), and key
offsets preserve within-replica order, so labels replicate 1:1 per copy.
The sf10 answer is therefore EXACTLY predictable from the certified sf0.1
output: each sf0.1 community (c, n, e, d) appears once per replica at
c + k·OFF with identical n/e/d, and every q_contrib_ppm is recomputed
against the 100× directed-edge total with the query's own truncating
integer convention.  This script runs the real Spark query at sf10 and
compares row-for-row against that prediction.

Usage:  python tools/verify_modularity_sf10.py [sf10_dir] [replicas]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main() -> None:
    import duckdb

    from kafka_sink_spark import get_spark
    from kafka_sink_spark.plans import QUERIES

    spark = get_spark(app_name="verify-modularity-sf10")

    t0 = time.perf_counter()
    base = QUERIES["parts_modularity"](spark, SF01).collect()
    t_base = round(time.perf_counter() - t0, 2)

    off = duckdb.sql(
        f"SELECT MAX(p_partkey) + 1 FROM '{SF01}/part.parquet'"
    ).fetchone()[0]

    # the query's ee = |directed co-purchase edges| (cross-community edges
    # included), which no output row carries — recompute it directly
    ee0 = duckdb.sql(
        f"""
        WITH li AS (SELECT l_orderkey ok, l_partkey pk
                    FROM '{SF01}/lineitem.parquet'),
        e AS (SELECT DISTINCT a.pk src, b.pk dst
              FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk)
        SELECT COUNT(*) FROM e
        """
    ).fetchone()[0]
    ee_big = ee0 * K

    predicted = {}
    pooled = [0, 0, 0, 0]
    for r in base:
        if r["community"] == -1:
            continue
        n, e, d = r["n_parts"], r["internal_edges"], r["degree_sum"]
        ppm = e * 1_000_000 // ee_big - d * d * 1_000_000 // (ee_big * ee_big)
        for k in range(K):
            predicted[r["community"] + k * off] = (n, e, d, ppm)
        pooled[0] += n * K
        pooled[1] += e * K
        pooled[2] += d * K
        pooled[3] += ppm * K

    t0 = time.perf_counter()
    big = QUERIES["parts_modularity"](spark, SF10).collect()
    t_big = round(time.perf_counter() - t0, 2)

    mismatches = 0
    got_pooled = None
    seen = set()
    for r in big:
        if r["community"] == -1:
            got_pooled = (
                r["n_parts"],
                r["internal_edges"],
                r["degree_sum"],
                r["q_contrib_ppm"],
            )
            continue
        seen.add(r["community"])
        want = predicted.get(r["community"])
        got = (
            r["n_parts"],
            r["internal_edges"],
            r["degree_sum"],
            r["q_contrib_ppm"],
        )
        if want != got:
            mismatches += 1
            if mismatches <= 5:
                print(f"MISMATCH community={r['community']}: "
                      f"want={want} got={got}")
    missing = len(predicted) - len(seen)
    pooled_ok = got_pooled == tuple(pooled)
    digest = hashlib.md5(
        "\n".join(
            f"{c},{v[0]},{v[1]},{v[2]},{v[3]}"
            for c, v in sorted(predicted.items())
        ).encode()
    ).hexdigest()
    print(
        json.dumps(
            {
                "sf01_communities": len(predicted) // K,
                "sf10_communities": len(seen),
                "mismatched_rows": mismatches,
                "missing_rows": missing,
                "pooled_row_match": pooled_ok,
                "predicted_hash_md5": digest,
                "wall_sf0.1_sec": t_base,
                "wall_sf10_sec": t_big,
                "x_factor": round(t_big / t_base, 2) if t_base else None,
                "verdict": "PASS"
                if mismatches == 0 and missing == 0 and pooled_ok
                else "FAIL",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
