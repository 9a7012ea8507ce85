"""Corpus-curation operators for training-data pipelines: deterministic
stratified sampling, token-budget sequence packing, and TF-style term
ranking. All pure ``pyspark.sql.functions`` — JVM-side, oracle-checkable.

Scale notes (100 TB):
- Sampling orders by an md5 hash, not rand(): reproducible across runs,
  engines, and partitionings — a hard requirement for auditable data
  curation. The rank filter compiles to WindowGroupLimit, so each map task
  keeps only its local top-``cap`` rows per stratum before the shuffle.
- Packing is a running sum per partition key — one shuffle, sort within
  groups. Shard ids are assigned within (lang) so shards never mix
  languages; a global order would serialize, a per-key order parallelizes.
- Term ranking avoids transcendentals (log-idf): libm implementations may
  differ across engines/platforms in the last ulp, which breaks bit-exact
  reproducibility. tf/df ordering is IEEE-exact division of small integers
  and ranks identically to tf·idf for fixed N.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    hash_col: Column,
    cap: int,
) -> DataFrame:
    """Deterministic per-stratum sample: the ``cap`` rows with the smallest
    md5(hash_col) per stratum. Adds ``sample_rank`` (1-based)."""
    strata = list(strata)
    key = F.md5(hash_col.cast("string"))
    w = Window.partitionBy(*strata).orderBy(key.asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= cap)  # -> WindowGroupLimit
    )


def pack_sequences(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    size_col: Column,
    budget: int,
) -> DataFrame:
    """Assign each row (in ``order_col`` order, per partition key) to a
    fixed-size-budget shard — concat-and-chunk packing (the standard LLM pretraining scheme):
    rows are concatenated in order and the stream is cut every ``budget``
    units; ``shard_id`` is the chunk in which the row STARTS (a row may
    straddle a cut, exactly as packed token streams do).

    shard_id = floor(running_sum_before_this_row / budget): deterministic,
    one window cumulative sum, no sequential recurrence.
    """
    part = list(part_cols)
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return df.withColumn("n_units", size_col).withColumn(
        "shard_id",
        F.floor((F.sum(size_col).over(w) - size_col) / F.lit(budget)).cast("int"),
    ).withColumn("cum_units", cum.cast("bigint"))
