"""The mapping DSL's one generated-value function: ``now()`` → time-based
TIMEUUID (RFC-4122 v1).

Reference semantics (reference:
sink/src/it/java/com/datastax/oss/kafka/sink/ccm/NowFunctionCCMIT.java:43-80):
- a FRESH timeuuid per mapped column per row — two ``now()`` columns in the
  same row must differ (NowFunctionCCMIT.java:61-80);
- ignored when the row becomes a DELETE (NowFunctionCCMIT.java:107-130) —
  handled by the route splitter, which never binds generated columns on the
  delete path.

Spark has no v1-UUID builtin (``uuid()`` is v4 — wrong variant for a Cassandra
``timeuuid`` column), so this is an Arrow-batched pandas UDF. Each invocation
site gets its own UDF instance marked nondeterministic, so Catalyst neither
collapses two ``now()`` columns into one nor pushes the call through joins.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _gen_batch(s: pd.Series) -> pd.Series:
    return pd.Series([str(uuid.uuid1()) for _ in range(len(s))])


def now_timeuuid() -> Column:
    """A Column producing a fresh v1 timeuuid string per row.

    Built from a pandas UDF over a dummy input (the input values are ignored;
    Spark just needs a column to size the batches).
    """
    gen = F.pandas_udf(_gen_batch, StringType()).asNondeterministic()
    return gen(F.lit(0)).alias("now()")


def is_timeuuid(col: Column) -> Column:
    """Validation helper: RFC-4122 v1 check (version nibble == 1)."""
    return col.rlike(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-1[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
