"""Generate an sf1-scale copy of the driver testdata by deterministic 10x
replication of sf0.1 (TESTDATA.md's generator is driver-side; no network
for DuckDB's tpch extension), for the local scale rehearsal only.

Replica k (k=0..9) offsets every key by k * (max_key + 1) of its table, so
all FK joins (orders->customer, lineitem->orders/part/supplier) hold
exactly and the join/aggregate working sets scale 10x. region/nation stay
fixed (TPC-H keeps them constant across SF). Embedding vectors are
deterministically perturbed per replica so distance-based queries don't
see 10x exact duplicates; document text is left identical (10x exact
dupes IS the realistic dedup-at-scale shape).

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/sf1)
SPARK_GRAFT_GEN_REPLICAS overrides the 10x factor (e.g. 100 -> sf10).
SPARK_GRAFT_GEN_TABLES (comma list) restricts generation to a table
subset — the r13 sf30/sf100 excision/decontamination ladders only read
``documents``, so replicating lineitem there would waste gigabytes and
minutes for nothing.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SPARK_GRAFT_GEN_REPLICAS", "10"))

# table -> (key columns to offset by that table's own max+1,
#           {column: source table whose offset it follows})
PLAN = {
    "region": None,  # fixed-size: straight copy
    "nation": None,
    "customer": {"self": ["c_custkey"], "fk": {}},
    "supplier": {"self": ["s_suppkey"], "fk": {}},
    "part": {"self": ["p_partkey"], "fk": {}},
    "orders": {"self": ["o_orderkey"], "fk": {"o_custkey": "customer"}},
    "lineitem": {
        "self": [],
        "fk": {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    },
    "events": {"self": ["event_id"], "fk": {"user_id": "_events_user"}},
    "documents": {"self": ["doc_id"], "fk": {}},
    "embeddings": {"self": ["vec_id"], "fk": {}},
}

KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    spans: dict[str, int] = {}
    for t, key in KEY_OF.items():
        spans[t] = (
            con.execute(
                f"SELECT max({key}) + 1 FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
        )
    spans["_events_user"] = (
        con.execute(f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    )

    only = os.environ.get("SPARK_GRAFT_GEN_TABLES")
    tables = (
        {t.strip() for t in only.split(",")} if only else set(PLAN)
    )
    for table, plan in PLAN.items():
        if table not in tables:
            continue
        src = f"{SRC}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        if plan is None:
            shutil.copyfile(src, dst)
            print(f"{table}: copied (fixed-size)")
            continue
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        exprs = []
        for c in cols:
            if c in plan["self"]:
                off = spans[table]
                exprs.append(f"{c} + r.k * {off} AS {c}")
            elif c in plan["fk"]:
                off = spans[plan["fk"][c]]
                exprs.append(f"{c} + r.k * {off} AS {c}")
            elif table == "embeddings" and c == "embedding":
                # per-replica deterministic perturbation: scale by
                # (1 + k/1000) and shift each dim by a hash-derived
                # +/-5e-3 so no two replicas are identical vectors
                exprs.append(
                    "list_transform(embedding, x -> CAST(x * (1.0 + r.k / 1000.0)"
                    " + (((vec_id * 31 + r.k * 7) % 97) - 48) * 1e-4 AS FLOAT))"
                    " AS embedding"
                )
            else:
                exprs.append(c)
        sel = ", ".join(exprs)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}', range({REPLICAS}) r(k)) "
            f"TO '{dst}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
