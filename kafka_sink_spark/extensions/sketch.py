"""Deterministic cardinality sketches: KMV (k minimum values).

Why not HyperLogLog? Spark's ``approx_count_distinct`` is HLL-based and
cheap, but its estimate depends on Spark's internal hash and register
layout — it cannot be cross-checked against an independent engine. KMV with
an explicit md5-derived hash is fully deterministic: both Spark and DuckDB
compute bit-identical 60-bit digests (``conv(substr(md5(x),1,15),16,10)``),
so the ESTIMATE itself is oracle-verifiable. That property matters for a
training-data pipeline where corpus statistics (vocabulary size, distinct
n-grams for contamination estimates) must be reproducible across runs and
engines.

Estimator: with h_(k) the k-th smallest distinct hash value mapped into
[0, 2^60), the distinct count is ≈ (k-1) * 2^60 / h_(k)  (the classic
KMV/bottom-k estimator; Bar-Yossef et al. 2002). Relative error ~ 1/sqrt(k).

Scale design (100 TB): the exact path here keeps a full distinct set per
group (2 shuffles: distinct, then window) to report estimate AND truth side
by side. The production path drops the truth column and filters ``rn <= k``
— Spark rewrites that rank-filter into WindowGroupLimit, so each map task
retains only its local k smallest hashes before the shuffle; state per group
is O(k), independent of data size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_sink_spark.extensions.text import md5_long

TWO_60 = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col,
    k: int = 256,
    with_exact: bool = True,
    items_are_hashes: bool = False,
) -> DataFrame:
    """Per-group distinct-count estimate via the KMV bottom-k sketch.

    ``item_col`` is a string Column (hashed with md5 internally), or an
    already-hashed bigint Column when ``items_are_hashes`` (the
    ``kmv_bottom_k_array`` pre-reduction path). Output: group cols +
    ``n_est`` (bigint) and, when ``with_exact``, ``n_exact``. Groups with
    fewer than k distinct items report their exact count (the sketch is then
    the full set).
    """
    group = list(group_cols)
    h = item_col if items_are_hashes else md5_long(item_col)
    d = df.select(*group, h.alias("__h")).distinct()
    w = Window.partitionBy(*group).orderBy(F.col("__h").asc())
    ranked = d.withColumn("__rn", F.row_number().over(w))
    if not with_exact:
        ranked = ranked.filter(F.col("__rn") <= k)  # -> WindowGroupLimit
    kth = F.max(F.when(F.col("__rn") == k, F.col("__h")))
    n_seen = F.max("__rn")  # exact distinct (or min(k, distinct) when capped)
    est = F.when(
        kth.isNotNull(),
        F.floor(F.lit(float(k - 1)) * F.lit(TWO_60) / kth.cast("double")).cast(
            "bigint"
        ),
    ).otherwise(n_seen.cast("bigint"))
    aggs = [est.alias("n_est")]
    if with_exact:
        aggs.append(n_seen.cast("bigint").alias("n_exact"))
    return ranked.groupBy(*group).agg(*aggs)


def kmv_bottom_k_array(items: "Column", k: int = 256) -> "Column":
    """Per-ROW bottom-k distinct md5 hashes of a string array, entirely
    inside codegen (transform → array_distinct → array_sort → slice).

    The scale lever for sketching exploded token/shingle streams: the global
    bottom-k of the UNION of per-row bottom-k sets equals the global bottom-k
    of all items (if a hash is outside some row's bottom-k, that row alone
    already holds k smaller distinct hashes, so it cannot be in the global
    bottom-k either; and any group with < k distinct items keeps every hash,
    so the exact-count fallback is preserved). A 50 KB document therefore
    explodes k rows instead of ~50 000 — the explode+distinct volume is
    capped at k per row BEFORE any shuffle.
    """
    hashed = F.transform(items, lambda x: md5_long(x))
    return F.slice(F.array_sort(F.array_distinct(hashed)), 1, k)
