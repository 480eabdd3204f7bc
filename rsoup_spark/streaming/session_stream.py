"""Stateful streaming sessionization: the batch gap-split semantics
(``__spark_entry__.q_rel_sessionize``) carried across micro-batches
with ``applyInPandasWithState``.

State per user is exactly the batch scan's accumulator --
``(session_no, start_us, last_us, n_events)`` -- so streaming over
time-ordered micro-batches is equivalent to the batch window scan
over the full history: the gap rule only ever compares an event with
its immediate predecessor, and that predecessor is either earlier in
the same batch or the checkpointed ``last_us``.  The caller must
provide the same two ordering guarantees as the streaming funnel
(``funnel_stream.py``): micro-batches arrive in event-time order
(time-bucketed input files, one per trigger) and equal timestamps
never straddle a batch boundary (bucket by timestamp).  Within a
batch the operator sorts by ``(t_us, event_id)``, mirroring the
batch window's ``ORDER BY ts, event_id``.

Each batch emits the latest cumulative snapshot of every session the
batch touched, so a session spanning K micro-batches appears K times
in the append-mode sink and the final per-session row is the
column-wise MAX of its snapshots (``n_events`` and ``end_us`` are
monotone; ``start_us`` is constant after the session opens).  That
emission count is itself the statefulness evidence the gate checks:
``n_batches`` per session equals the number of distinct time buckets
the session has events in, which an oracle can compute from the
bucket cutoffs -- a state reset between batches would restart
session numbering and break both the counts and the session bounds.

Everything entering the operator is already integer (wall-clock
microsecond epochs computed JVM-side via ``epoch_us_ntz``), so state
and output replay bit-for-bit against the batch oracle.
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
        StructField("session_no", IntegerType(), False),
        StructField("start_us", LongType(), False),
        StructField("last_us", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_no", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("start_us", LongType(), False),
        StructField("end_us", LongType(), False),
    ]
)


def _make_update(gap_us: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sn, start, last, n = state.get
        else:
            # last_us = -1 sentinel: no prior event.  The batch
            # semantics give the first event new_session = 1 (lag
            # default 0 is always > gap before any real timestamp),
            # so numbering starts at 1 there too.
            sn, start, last, n = 0, -1, -1, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["t_us", "event_id"], kind="stable")
        touched: dict[int, tuple[int, int, int]] = {}
        # sequential gap fold; rows per (user, batch) are bounded by
        # that user's events in the batch's time bucket
        for t in batch["t_us"].to_numpy():
            t = int(t)
            if last < 0 or t - last > gap_us:
                sn += 1
                start = t
                n = 0
            n += 1
            last = t
            touched[sn] = (n, start, last)
        state.update((sn, start, last, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(touched),
                "session_no": list(touched),
                "n_events": [v[0] for v in touched.values()],
                "start_us": [v[1] for v in touched.values()],
                "end_us": [v[2] for v in touched.values()],
            }
        ).astype("int64")

    return _update


def sessionize_state(prepared: DataFrame, gap_seconds: int) -> DataFrame:
    """Streaming gap-sessionization over a prepared stream of
    ``(user_id: long, event_id: long, t_us: long)`` rows.

    Returns an append-mode stream of cumulative per-session
    snapshots; aggregate with ``groupBy(user_id, session_no).agg(max
    ...)`` after the run (see the module docstring for why MAX is
    exact).  ``gap_seconds`` matches the batch operator's >gap rule
    (strict inequality, microsecond integers -- no whole-second
    truncation divergence).
    """
    gap_us = int(gap_seconds) * 1_000_000
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_update(gap_us),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
