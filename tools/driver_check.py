"""Local replica of the driver's pandas-based correctness gate.

The driver runs every ``queries()`` entry and its ``oracle_sql()`` twin at
sf0.01, pulls BOTH results into pandas, canonicalizes (columns sorted by
name, rows sorted by all columns, cells stringified), and hashes the values.
``tests/test_entry_oracle.py`` compares Python-native values (where DuckDB
returns ``Decimal`` for DECIMAL columns just like Spark), so it misses
pandas-rendering divergences — e.g. DuckDB DECIMAL(38,6) -> float64 while
Spark decimal(38,6) -> object(Decimal). This script goes through pandas like
the driver does, so those divergences fail HERE before they fail THERE.

Usage:
    python tools/driver_check.py [query_name ...]   # default: all with oracles
    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python tools/driver_check.py
"""

from __future__ import annotations

import decimal
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _cell(v) -> str:
    if v is None or v != v:
        return "\x00NULL"
    if isinstance(v, decimal.Decimal):
        # exact-decimal canonical form: plain notation, trailing zeros
        # trimmed, so Spark decimal(38,6) and DuckDB DECIMAL(38,2) of the
        # same exact value hash identically — and a decimal sum past
        # ~1e12 can never diverge by a double-rendering ulp (the q1
        # sf>=1 presentation divergence, VERDICT r9 #5).
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("-0", ""):
            s = "0"
        return s
    return str(v)


def canon(df: pd.DataFrame) -> tuple[list[str], pd.DataFrame]:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(_cell)
    out = out.sort_values(cols, kind="mergesort").reset_index(drop=True)
    return cols, out


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    from kafka_sink_spark import get_spark
    from kafka_sink_spark.plans import ORACLES, QUERIES

    names = sys.argv[1:] or sorted(ORACLES)
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    n_fail = 0
    for name in names:
        if name not in ORACLES:
            print(f"{name:35s} SKIP (no oracle)")
            continue
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, SF_DIR).toPandas()
            cur = con.execute(ORACLES[name])
            if any("DECIMAL" in str(t) for _, t, *_ in cur.description):
                # Arrow keeps DECIMAL exact (decimal.Decimal objects);
                # .df() would render it through float64 and can diverge
                # from Spark's exact Decimal by an ulp past ~1e12.
                ddf = cur.arrow().to_pandas(date_as_object=False)
            else:
                ddf = cur.df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:35s} ERR  {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        problems = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        elif len(sdf) != len(ddf):
            problems.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        else:
            s_dt = {c: sdf[c].dtype.kind for c in sdf.columns}
            d_dt = {c: ddf[c].dtype.kind for c in ddf.columns}
            kind_diff = {
                c: (s_dt[c], d_dt[c]) for c in s_dt if s_dt[c] != d_dt[c]
            }
            _, s_c = canon(sdf)
            _, d_c = canon(ddf)
            if value_hash(s_c) != value_hash(d_c):
                neq = (s_c != d_c).any(axis=1)
                ex = []
                for i in s_c.index[neq][:2]:
                    ex.append(f"row{i}: spark={tuple(s_c.loc[i])} duck={tuple(d_c.loc[i])}")
                problems.append(f"HASH dtypekinds={kind_diff} " + " | ".join(ex))
            elif kind_diff:
                # Values stringify identically but pandas dtypes differ —
                # may or may not matter to the driver; surface it.
                problems.append(f"WARN dtypekinds only: {kind_diff}")
        took = time.time() - t0
        if not problems:
            print(f"{name:35s} ok   ({took:4.1f}s, {len(sdf)} rows)")
        elif problems[0].startswith("WARN"):
            print(f"{name:35s} warn ({took:4.1f}s) {problems[0]}")
        else:
            n_fail += 1
            print(f"{name:35s} FAIL ({took:4.1f}s) {'; '.join(problems)[:400]}")
    print(f"\n{n_fail} failures / {len(names)} checked @ {SF_DIR}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
