"""Contract tests for the driver correctness gate.

Two driver-only red classes bit rounds 1-3, both invisible to a
``fetchall``-based local replica:

* session-config-dependent output (``rel_sessionize``: timezone-naive
  parquet timestamps cast through the *session* timezone shift the
  emitted epochs) -- covered by the tz-invariance test here plus
  ``tools/check_oracle.py --hostile``;
* DuckDB integer widening (``sum(BIGINT) -> HUGEINT``,
  ``sum(INT) OVER -> HUGEINT``): a pandas-mediated harness materializes
  HUGEINT as float64, so the driver hashes ``4287.000000`` against
  Spark's ``4287`` -- covered by the dtype audit here, which DESCRIBEs
  every oracle and rejects any column whose declared DuckDB type would
  round-trip through pandas as float or object.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_SMALL

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# DuckDB types that pandas cannot hold losslessly as int64/str/bool:
# HUGEINT/UHUGEINT -> float64, DECIMAL -> object(Decimal), UBIGINT ->
# float64 when values exceed int64.  Any of these in an oracle output
# column makes the driver's value hash diverge from Spark's integers.
FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


def test_no_pandas_hostile_dtypes_in_any_oracle(duck):
    bad = []
    for name, sql in entry.oracle_sql().items():
        for col, typ, *_ in duck.execute(f"DESCRIBE ({sql})").fetchall():
            if any(k in typ.upper() for k in FORBIDDEN):
                bad.append((name, col, typ))
    assert not bad, (
        "oracle columns with pandas-hostile DuckDB types (cast them, e.g. "
        f"CAST(sum(x) AS BIGINT)): {bad}"
    )


def test_sessionize_tz_invariant(spark):
    """rel_sessionize emits identical epoch integers under any session
    timezone (events.ts is timezone-naive parquet; the NTZ->LTZ cast is
    neutralized by from_utc_timestamp(_, current_timezone()))."""
    tz_key = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "UTC")
        utc = sorted(
            tuple(r)
            for r in entry.queries()["rel_sessionize"](
                spark, SF_SMALL
            ).collect()
        )
        spark.conf.set(tz_key, "America/New_York")
        ny = sorted(
            tuple(r)
            for r in entry.queries()["rel_sessionize"](
                spark, SF_SMALL
            ).collect()
        )
    finally:
        spark.conf.set(tz_key, orig)
    assert utc == ny
    # and the values are the naive-as-UTC epoch DuckDB's epoch_us gives
    con = duckdb.connect()
    for t in ("events",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    orows = sorted(
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["rel_sessionize"]
        ).fetchall()
    )
    spark_sorted_cols = entry.queries()["rel_sessionize"](
        spark, SF_SMALL
    ).columns
    ocols = [
        d[0]
        for d in con.execute(
            entry.oracle_sql()["rel_sessionize"]
        ).description
    ]
    con.close()
    # align column order before comparing tuples
    oidx = [ocols.index(c) for c in spark_sorted_cols]
    orows_aligned = sorted(tuple(r[i] for i in oidx) for r in orows)
    assert utc == orows_aligned


def test_epoch_us_ntz_exact_under_dst_gap(spark, tmp_path):
    """epoch_us_ntz must equal DuckDB's epoch_us for EVERY naive
    timestamp under a non-UTC session tz -- including wall times inside
    the DST spring-forward gap (where the previous
    from_utc_timestamp(cast(...)) round-trip came back an hour high)
    and the fall-back overlap."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from __spark_entry__ import epoch_us_ntz

    vals = [
        dt.datetime(2024, 3, 10, 2, 30, 0, 123456),   # NY spring gap
        dt.datetime(2024, 11, 3, 1, 30, 0, 5),        # NY fall overlap
        dt.datetime(2024, 1, 1, 5, 0, 4, 729045),
        dt.datetime(2024, 6, 15, 12, 0, 0),
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),  # pre-epoch
    ]
    p = str(tmp_path / "ts.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(vals, pa.timestamp("us"))}), p
    )
    import pyspark.sql.functions as F

    tz_key = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        got = dict(
            spark.read.parquet(p)
            .select(
                F.col("ts").cast("string").alias("s"),
                epoch_us_ntz(F.col("ts")).alias("e"),
            )
            .collect()
        )
    finally:
        spark.conf.set(tz_key, orig)
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT CAST(ts AS VARCHAR), epoch_us(ts) FROM '{p}'"
        ).fetchall()
    )
    con.close()
    assert got == want
