"""Temporal join operators Spark lacks as built-ins: the as-of join.

The reference connector has no joins at all (SURVEY §2.7 — none exist), so
this is north-star extension surface. The semantics implemented here are the
standard time-series as-of join (backward, inclusive): for every left row,
attach the payload of the latest right row with ``right.ts <= left.ts`` for
the same key, or nulls when no such row exists.

Scale design (100 TB): the textbook implementation is a range join, which
Catalyst can only execute as a broadcast-nested-loop or a sort-merge over an
inequality — both blow up when either side is large. Instead we UNION the two
sides with a marker column and take a running ``last(payload, ignorenulls)``
over ``(key ORDER BY ts)``. That is ONE shuffle on the key and a sort within
partitions — exactly the cost of a groupBy on the same key, independent of
how many right rows precede each left row. Skewed keys behave like any
skewed aggregation (AQE handles them); there is no join node in the plan
at all.

Payload columns ride in a single struct so that all attached columns come
from the SAME right row even when some payload values are null.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload: Mapping[str, str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with ``ts <= left.ts`` per key.

    Parameters
    ----------
    on       : equality key columns present on both sides.
    ts_col   : event-time column present on both sides (orderable type).
    payload  : right column -> output column name; attached to every left
               row (all from the same matched right row), null if no match.
    tiebreak : optional right-side column ordering ties when multiple right
               rows share the same ``ts`` for one key — the row with the
               greatest tiebreak value wins. Rows at ``ts == left.ts`` DO
               match (inclusive as-of).

    Returns the left DataFrame with the payload columns appended.
    """
    on = list(on)
    left_cols = [c for c in left.columns]
    order_tail = [F.col(tiebreak).asc_nulls_first()] if tiebreak else []

    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias(ts_col),
        F.struct(*[F.col(src).alias(dst) for src, dst in payload.items()]).alias(
            _PAYLOAD
        ),
        *( [F.col(tiebreak).alias(tiebreak)] if tiebreak and tiebreak not in set(on) | {ts_col} else [] ),
        F.lit(0).alias(_SIDE),
    )
    l = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_SIDE),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows (side 0) sort before left rows at equal ts => inclusive
    # semantics; running last(payload) carries the match forward.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc(), *order_tail)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = matched.filter(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"{_PAYLOAD}.{dst}").alias(dst) for dst in payload.values()],
    )
    return out
