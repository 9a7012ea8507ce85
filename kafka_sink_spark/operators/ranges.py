"""Range (interval/band) join via bucketing — the equi-join scale path for
``point BETWEEN lo AND hi`` predicates.

The reference connector has no joins (SURVEY §2.7); this is north-star
extension surface for pipelines joining measurements to bands / intervals.

Scale design (100 TB): Catalyst executes a pure inequality join as a
BroadcastNestedLoopJoin (fine only when one side is tiny) or a cartesian
product (never fine). Bucketing turns it into an equi-join: pick a bucket
width ``w``; each interval [lo, hi) is exploded to the bucket ids it spans
(``floor(lo/w) .. ceil(hi/w)-1``); each point computes its single bucket
``floor(p/w)``; join on bucket id (+ any extra equality keys), then filter
the exact predicate. Cost: one shuffle on the bucket key, output linear in
true matches plus the per-bucket false-positive rim — O(N + M·span) instead
of O(N·M). Choose ``w`` on the order of the median interval width so the
explosion factor stays small; for tiny interval sides, Catalyst's broadcast
of the exploded side makes this a map-side join with no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def explode_interval_buckets(
    intervals: DataFrame, lo_col: str, hi_col: str, bucket_width: float
) -> DataFrame:
    """One row per (interval, bucket id it overlaps); hi is exclusive."""
    lo_b = F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long")
    hi_b = (F.ceil(F.col(hi_col) / F.lit(bucket_width)) - 1).cast("long")
    return intervals.withColumn(_BUCKET, F.explode(F.sequence(lo_b, hi_b)))


def range_join_bucketed(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= point < hi`` (and equal ``extra_keys``), as a bucketed equi-join.

    Returns points-side columns plus interval-side columns (callers project).
    """
    iv = explode_interval_buckets(intervals, lo_col, hi_col, bucket_width)
    pt = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    cond = [pt[_BUCKET] == iv[_BUCKET]] + [pt[k] == iv[k] for k in extra_keys]
    joined = pt.join(iv, cond, "inner").filter(
        (pt[point_col] >= iv[lo_col]) & (pt[point_col] < iv[hi_col])
    )
    return joined.drop(pt[_BUCKET]).drop(iv[_BUCKET]).drop(
        *[iv[k] for k in extra_keys]
    )
