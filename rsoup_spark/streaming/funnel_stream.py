"""Stateful streaming funnel: the batch ``ops.events.funnel``
semantics carried across micro-batches with ``applyInPandasWithState``.

State per user is exactly the batch fold's accumulator --
``(reached, t0)`` -- so streaming over time-ordered micro-batches is
equivalent to the batch fold over the full history: the fold is a
left-to-right scan, and a scan checkpointed at batch boundaries is
the same scan.  That equivalence needs two ordering guarantees the
caller must provide (and the gate query constructs): micro-batches
arrive in event-time order (time-bucketed input files, one per
trigger), and equal timestamps never straddle a batch boundary
(bucket by timestamp, not by row hash).  Within a batch the operator
sorts by ``(t_us, s)`` itself, mirroring the batch fold's sort.

Everything entering the operator is already integer (wall-clock
microsecond epochs and step indices, computed JVM-side by the
caller), so state and output replay bit-for-bit against the batch
oracle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("reached", IntegerType(), False),
        StructField("t0", LongType(), False),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("reached", IntegerType(), False),
        StructField("t_first_us", LongType(), False),
    ]
)


def _make_update(n_steps: int, window_us: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        reached, t0 = state.get if state.exists else (0, -1)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["t_us", "s"], kind="stable")
        # sequential state machine; rows per (user, batch) are bounded
        # by that user's events in the batch's time bucket
        for t, s in zip(batch["t_us"].to_numpy(), batch["s"].to_numpy()):
            if reached < n_steps and s == reached and (
                reached == 0 or t <= t0 + window_us
            ):
                if reached == 0:
                    t0 = int(t)
                reached += 1
        state.update((reached, t0))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "reached": [reached],
                "t_first_us": [t0],
            }
        )

    return _update


def funnel_state(
    prepared: DataFrame, n_steps: int, window_seconds: int
) -> DataFrame:
    """``(user_id, t_us, s)`` stream -> per-batch funnel state rows.

    ``prepared`` must already carry integer microsecond epochs
    (``epoch_us_ntz``) and 0-based step indices -- do that projection
    JVM-side on the stream so only three narrow integer columns cross
    into Python.  The last emitted row per user is the final funnel
    state; ``reached`` is monotone non-decreasing and ``t_first_us``
    is set at most once, so downstream ``max()`` per user reads the
    final state without ordering assumptions.
    """
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_update(n_steps, int(window_seconds) * 1_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
