"""Local reproduction of the driver's t2 correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` twin at a small SF, compare
row count + column names + values (order-insensitive, columns sorted by name).

Float columns are compared exactly — the catalog is engineered for
bit-identical cross-engine results (identical operation order + rounding);
any drift is a bug to fix in the query design, not in the test.
"""

import math
import os

import duckdb
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, colnames):
    """Sort columns by name, then rows; stringify for stable compare."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_cell(v):
        if v is None:
            return "\0NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [colnames[i] for i in order], out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    cols, s_norm = _normalize(spark_rows, spark_cols)
    _, d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; cols={cols}; "
        f"first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_free_query_runs(name, spark):
    """Rows-only check for non-SQL-expressible queries."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
