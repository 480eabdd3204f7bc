"""Relational operators Spark lacks as built-ins, composed from
DataFrame primitives so Catalyst still owns the physical plan.

Currently: backward as-of join (the time-series "most recent prior
fact" join).  A naive formulation is a per-key inequality join --
quadratic per key and un-plannable as a hash join; the composition
here is the standard union + keyed-window trick: one shuffle on the
key, one per-key time sort, no range explosion.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``right_cols``
    from the latest right row of the same ``on`` key whose
    ``right_ts`` <= ``left_ts`` (inclusive); nulls when no such row.

    ``right`` must be unique per ``(on, right_ts)`` -- pre-aggregate
    ties (e.g. ``groupBy(key, ts).agg(max_by(...))``) so the match is
    deterministic; this operator does not pick a winner for you.
    ``right_cols`` must not collide with left column names (alias on
    the right side first).

    Shape: both sides are tagged and unioned, then a single window
    partitioned by ``on`` and ordered by ``(ts, side)`` carries each
    right attribute forward with ``last(ignorenulls)``.  Right rows
    sort before left rows at equal timestamps, which is what makes the
    match inclusive.  Cost is ONE shuffle on the key plus a per-key
    time sort -- the same plan class as sessionization, and unlike an
    inequality join it cannot degenerate to per-key O(n*m).  For a
    pathologically hot key, split the window two-level by coarse time
    bucket with a per-bucket carry-in (the densify_ids/pack_chunks
    two-level-scan pattern); at web scale keys are users/hosts and the
    single-level form is the right default.
    """
    on = list(on)
    right_cols = list(right_cols)
    left_only = [c for c in left.columns if c not in on]
    ts = "__asof_ts"
    side = "__asof_side"

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(side),
        *[F.col(c) for c in left_only],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_only],
        *[F.col(c) for c in right_cols],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(ts, side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged)
    for c in right_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.where(F.col(side) == 1).select(*on, *left_only, *right_cols)
