"""Skew-resistant aggregation: the salted two-phase pattern.

At 100 TB a handful of hot keys (a viral user, an empty-document hash) can
make one reducer the whole job's critical path. AQE's skew-join splitting
covers joins; for AGGREGATIONS the standard fix is salting: phase 1 groups by
(key, salt) so a hot key's rows spread over ``n_salts`` reducers, phase 2
combines the ``n_salts`` partial rows per key — bounded by distinct-keys ×
n_salts, tiny relative to the input.

Note Spark's hash aggregate already does map-side partial combine, which
handles most skew; explicit salting matters when per-key STATE is large
(collect-type aggs) or when partial aggregation is disabled/ineffective
(high-cardinality composite state). The operator is provided for those cases
and as the building block pipelines reach for first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_fn, final_fn) per supported aggregate: phase-1 computes partial_fn
# over raw rows, phase-2 folds the partials with final_fn.
_AGG_FNS = {
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → (fn, input column) with fn in
    count/sum/min/max (the decomposable aggregates). The salt defaults to
    the task's partition id (cheap, well-spread); pass ``salt_expr`` (any
    integer column, e.g. ``col("event_id")``) when the phase-1 partial rows
    themselves must be reproducible. The final result is identical to a
    direct groupBy either way — pmod is applied here, callers pass the raw
    expression.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported salted aggregate {fn} for {name}")
    raw_salt = salt_expr if salt_expr is not None else F.spark_partition_id()
    salted = df.withColumn("_salt", F.pmod(raw_salt, F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _AGG_FNS[fn][0](col).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _AGG_FNS[fn][1](F.col(f"_p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
