"""Two-phase bucket-prefix running sums — the scalable replacement for a
global (unpartitioned) window.

A `Window.orderBy(x)` with no partition pulls EVERY input row through one
task; fine on a bounded grid, a scale hazard on anything that grows with
the data (a distinct-value ladder grows ~linearly until the value domain
saturates).  The catalog's standing idiom — already proven inline by
``customer_decile_lift`` and ``orders_abc_classification`` — splits the
cumulative into:

1. a *bucket* histogram over ``order_col div bucket_size`` (cardinality
   bounded by the VALUE DOMAIN, not the row count — it saturates as data
   grows),
2. one unpartitioned exclusive prefix over that bounded bucket table
   (the only global window left, O(domain/bucket_size) rows),
3. a bucket-local (PARTITIONED) window for the within-bucket remainder,
   joined back via a broadcast of the bucket offsets.

The result is exactly the global exclusive running sum — same values,
bit-identical — with parallelism that scales with buckets.  This module
hoists that idiom into one helper so every ladder-shaped query plans it
the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_exclusive_prefix(
    df: DataFrame,
    order_col: str,
    sums: dict[str, str],
    bucket_size: int,
    descending: bool = False,
) -> DataFrame:
    """Append exact EXCLUSIVE running sums over the global order of
    ``order_col`` (strictly-preceding rows only — the
    ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` frame).

    ``df`` must be unique in ``order_col`` (a ladder / grid table: one row
    per distinct value — the usual shape after a groupBy on the value).
    ``sums`` maps each output column to the source column it accumulates.
    ``bucket_size`` buckets ``order_col`` by exact floor division; pick it
    so the bucket count is bounded by the value domain (e.g. one currency
    unit for cent ladders).  ``descending=True`` accumulates over
    strictly-GREATER values instead.

    Exactness: integer/decimal sums are associative, so bucket-total +
    within-bucket decomposition reproduces the single-window result
    bit-identically.
    """
    # Exact floor division (DECIMAL path) — `div` truncates toward zero,
    # which would mis-bucket negative ladder values.
    bk = F.expr(
        f"CAST(FLOOR(CAST({order_col} AS DECIMAL(38,6)) / {bucket_size}) AS BIGINT)"
    ).alias("_bk")
    b = df.select("*", bk)
    bstats = b.groupBy("_bk").agg(
        *[F.sum(src).alias(f"_bt_{out}") for out, src in sums.items()]
    )
    order = F.col("_bk").desc() if descending else F.col("_bk").asc()
    # The one remaining unpartitioned window: runs over the BOUNDED bucket
    # grid (value-domain/bucket_size rows), never the ladder itself.
    grid_w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    bpre = bstats.select(
        "_bk",
        *[
            F.coalesce(F.sum(f"_bt_{out}").over(grid_w), F.lit(0)).alias(
                f"_off_{out}"
            )
            for out in sums
        ],
    )
    local_order = (
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    )
    local_w = (
        Window.partitionBy("_bk")
        .orderBy(local_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = b.join(F.broadcast(bpre), "_bk").select(
        *df.columns,
        *[
            (
                F.col(f"_off_{out}")
                + F.coalesce(F.sum(src).over(local_w), F.lit(0))
            ).alias(out)
            for out, src in sums.items()
        ],
    )
    return out


def ladder_with_below(
    values: DataFrame,
    value_col: str,
    bucket_size: int,
    count_col: str = "t",
    below_col: str = "below",
) -> DataFrame:
    """Distinct-value ladder with the exact count of rows at strictly
    smaller values: ``groupBy(value) → count`` then the two-phase
    exclusive prefix.  The canonical input of every nearest-rank
    quantile / rank-statistic query in the catalog."""
    lad = values.groupBy(value_col).agg(F.count("*").alias(count_col))
    return with_exclusive_prefix(
        lad, value_col, {below_col: count_col}, bucket_size
    )
