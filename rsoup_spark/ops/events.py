"""Event-sequence analytics: ordered funnel matching.

The classic product-analytics primitive (ClickHouse ``windowFunnel``
semantics): per user, how far through an ordered list of step types
did they get, where the whole sequence must complete within a time
window anchored at the FIRST step.

Shape: one shuffle on the user key.  Step events collapse to a
per-user sorted array (map-side partial ``collect_list``), and the
sequential state machine runs as a JVM higher-order ``aggregate``
fold over that array -- no per-row Python, no iterative self-joins
(a k-step funnel as k chained inequality joins is k shuffles and a
skew trap on hot users; this is one).  Per-user arrays are bounded by
that user's step-event count; a user hot enough to blow an executor's
array budget is a bot you should have capped upstream -- cap with a
``.limit``-style per-user sample before calling if that invariant
does not hold.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rsoup_spark.functions.timeutil import epoch_us_ntz


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth: ``(user_col, reached, t_first_us)``.

    ``reached`` is the number of consecutive ``steps`` completed in
    order, where step i+1 must occur at-or-after step i and the whole
    run must land within ``window_seconds`` of the user's FIRST
    occurrence of ``steps[0]``.  Events at equal timestamps resolve in
    step order (a step-2 event at exactly the step-1 timestamp
    counts).  ``t_first_us`` is the wall-clock microsecond epoch of
    that anchoring first step (-1 when the user never hit step 0).
    Users with no events of any step type do not appear.

    The fold is exact integer arithmetic over DST-proof wall-clock
    epochs, so results are session-timezone-independent and
    reproducible bit-for-bit by any engine (the DuckDB oracle replays
    it as chained per-step MIN CTEs -- equivalent because events are
    folded in (ts, step) order).
    """
    steps = list(steps)
    window_us = int(window_seconds) * 1_000_000
    n = len(steps)

    step_idx = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    ).cast("int") - 1
    base = (
        events.where(F.col(type_col).isin(steps))
        .select(
            F.col(user_col),
            F.struct(
                epoch_us_ntz(F.col(ts_col)).alias("t"),
                step_idx.alias("s"),
            ).alias("ev"),
        )
    )

    init = F.struct(
        F.lit(0).cast("int").alias("reached"),
        F.lit(-1).cast("long").alias("t0"),
    )

    def _step(acc, ev):
        advance = (ev["s"] == acc["reached"]) & (
            (acc["reached"] == 0)
            | (ev["t"] <= acc["t0"] + F.lit(window_us))
        ) & (acc["reached"] < F.lit(n))
        return F.struct(
            F.when(advance, acc["reached"] + 1)
            .otherwise(acc["reached"])
            .alias("reached"),
            F.when(advance & (acc["reached"] == 0), ev["t"])
            .otherwise(acc["t0"])
            .alias("t0"),
        )

    folded = (
        base.groupBy(user_col)
        .agg(F.sort_array(F.collect_list("ev")).alias("evs"))
        .select(
            user_col,
            F.aggregate("evs", init, _step).alias("st"),
        )
    )
    return folded.select(
        user_col,
        F.col("st.reached").alias("reached"),
        F.col("st.t0").alias("t_first_us"),
    )
