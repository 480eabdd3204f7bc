"""Timezone-proof timestamp arithmetic shared by the relational and
event-analytics operators."""

from __future__ import annotations

from pyspark.sql import functions as F


def epoch_us_ntz(col) -> F.Column:
    """Microsecond epoch of a timezone-naive timestamp, naive-as-UTC
    (DuckDB's ``epoch_us``), computed from pure wall-clock arithmetic.

    A timezone-NAIVE parquet timestamp cast to ``timestamp`` is
    interpreted in the *session* timezone, shifting the epoch by the
    tz offset -- and the ``from_utc_timestamp`` round-trip that undoes
    the shift is NOT invertible for wall times inside the session tz's
    DST spring-forward gap (02:30 on a US gap day came back one hour
    high).  This form never touches the session timezone at all, so it
    is exact for every representable timestamp under ANY session
    timezone (DST-gap regression pinned in
    tests/test_oracle_contract.py).
    """
    c = col.cast("timestamp_ntz")
    return (
        F.unix_date(c.cast("date")).cast("long") * 86_400_000_000
        + F.hour(c).cast("long") * 3_600_000_000
        + F.minute(c).cast("long") * 60_000_000
        + F.second(c).cast("long") * 1_000_000
        + F.date_format(c, "SSSSSS").cast("long")
    )
