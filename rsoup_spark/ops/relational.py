"""Relational operators Spark lacks as built-ins, composed from
DataFrame primitives so Catalyst still owns the physical plan.

* backward as-of join (the time-series "most recent prior fact"
  join): a naive formulation is a per-key inequality join --
  quadratic per key and un-plannable as a hash join; the composition
  here is the standard union + keyed-window trick: one shuffle on the
  key, one per-key time sort, no range explosion.
* range (interval) join: point-in-interval matching rewritten as a
  binned EQUI-join so it hash-partitions and never plans as a
  nested-loop/Cartesian scan.
* hypertable rollup: multi-resolution time-bucketed continuous
  aggregates in one scan via grouping sets (the TimescaleDB-style
  rollup), partial-aggregated map-side like any other groupBy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    max_bins_per_interval: int = 256,
) -> DataFrame:
    """Inner join of every point row to every interval row with
    ``lo <= point < hi`` (half-open), returning the point columns
    followed by the interval columns.  Column names must not collide.

    Shape: a raw inequality join can only plan as a broadcast
    nested-loop -- O(|points| * |intervals|) and a non-starter when
    both sides are large.  Instead the numeric domain is cut into
    fixed ``bin_width`` bins: each interval row is exploded to the
    bins it covers, each point maps to exactly ONE bin (so no
    post-join dedup), and the join becomes a hash-partitionable
    EQUI-join on the bin id refined by the exact predicate.  Cost is
    one map-side explode bounded by ``max_bins_per_interval`` plus one
    shuffle on the bin key; skew is bounded by bin population, not by
    interval width.  Pick ``bin_width`` near the median interval span
    so the average fan-out is ~2 bins per interval.

    Intervals wider than ``max_bins_per_interval * bin_width`` raise
    at execution time (distributed check, no driver pass): a handful
    of huge intervals would otherwise silently replicate across the
    whole bin domain -- route such dimension rows through a broadcast
    join instead, they are by construction few or the binning premise
    is wrong.  Degenerate intervals (``hi <= lo``) match nothing and
    are dropped by the refinement predicate.
    """
    bin_ = "__rj_bin"
    lo_bin = f"CAST(floor({lo_col} / {bin_width!r}) AS BIGINT)"
    hi_bin = f"CAST(floor({hi_col} / {bin_width!r}) AS BIGINT)"
    err = (
        f"'range_join: an interval spans >= {int(max_bins_per_interval)} "
        f"bins of width {bin_width!r}; broadcast wide intervals separately'"
    )
    seq = (
        f"CASE WHEN {hi_bin} - {lo_bin} < {int(max_bins_per_interval)}"
        f" THEN sequence({lo_bin}, {hi_bin})"
        f" ELSE raise_error({err}) END"
    )
    binned_iv = intervals.select(
        "*", F.explode(F.expr(seq)).alias(bin_)
    )
    binned_pt = points.withColumn(
        bin_, F.floor(F.col(point_col) / F.lit(bin_width)).cast("bigint")
    )
    out = binned_pt.join(
        binned_iv,
        on=(
            (binned_pt[bin_] == binned_iv[bin_])
            & (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        ),
        how="inner",
    )
    return out.select(*points.columns, *intervals.columns)


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    aggs: Sequence[Column],
    resolutions: Sequence[str] = ("hour", "day", "week"),
) -> DataFrame:
    """Multi-resolution time-bucketed aggregate (the hypertable
    "continuous aggregate" rollup): one output row per
    ``(resolution, bucket_ts, *key_cols)`` with the given aggregate
    expressions, for every resolution in ``resolutions`` (any
    ``date_trunc`` unit: 'hour', 'day', 'week', 'month', ...).

    Shape: ONE scan.  The naive form is a UNION ALL of R groupBys --
    R full scans of a 100 TB fact table.  Here the truncations become
    R columns and a single grouping-sets aggregation covers all
    resolutions: Catalyst plans Expand (xR rows, map-side, before the
    exchange) + partial aggregation + one shuffle.  Rows expand
    R-fold but partial aggs collapse them to ~|buckets| per partition
    before anything moves, so the shuffle is output-sized, not
    input-sized.  ``grouping()`` flags -- not value inspection --
    identify each row's resolution, so NULL timestamps cannot
    masquerade as a different grouping set.
    """
    key_cols = list(key_cols)
    res_names = {r: f"__ht_{r}" for r in resolutions}
    base = df.withColumns(
        {c: F.date_trunc(r, F.col(ts_col)) for r, c in res_names.items()}
    )
    sets = [[F.col(c)] + [F.col(k) for k in key_cols]
            for c in res_names.values()]
    all_cols = [F.col(c) for c in res_names.values()] + [
        F.col(k) for k in key_cols
    ]
    flags = [
        F.grouping(F.col(c)).alias(f"__g_{r}") for r, c in res_names.items()
    ]
    g = base.groupingSets(sets, *all_cols).agg(*aggs, *flags)

    resolution = F.lit(None).cast("string")
    bucket = F.lit(None).cast(g.schema[next(iter(res_names.values()))].dataType)
    for r, c in res_names.items():
        hit = F.col(f"__g_{r}") == 0
        resolution = F.when(hit, F.lit(r)).otherwise(resolution)
        bucket = F.when(hit, F.col(c)).otherwise(bucket)
    internal = set(res_names.values()) | {f"__g_{r}" for r in res_names}
    agg_names = [
        c for c in g.columns if c not in internal and c not in key_cols
    ]
    return g.select(
        resolution.alias("resolution"),
        bucket.alias("bucket_ts"),
        *key_cols,
        *agg_names,
    )
