"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir and compares against
``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name,
values stringified).  Usage::

    python tools/check_oracle.py [--hostile] [sf_dir] [query ...]

``--hostile`` reproduces the driver's environment instead of ours:

* a vanilla SparkSession (NOT ``get_spark``) with a non-UTC session
  timezone, default shuffle partitions, and none of our Arrow tuning --
  any query whose output depends on session config (the class of bug
  behind three rounds of ``rel_sessionize`` driver-reds) goes red here
  before the driver finds it;
* pandas-mediated value hashing on both sides (``df.toPandas()`` /
  DuckDB ``.df()``), so dtype round-trip artifacts (DuckDB HUGEINT ->
  float64, the ``stream_host_state`` red) reproduce locally.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def pandas_rows(pdf) -> list[tuple]:
    """Rows as the driver sees them: through pandas dtypes.

    ``itertuples`` preserves the dtype-mediated scalar (numpy float64 for
    a HUGEINT sum, numpy int64 for BIGINT), so ``value_hash``'s float
    formatting exposes int-became-float artifacts exactly as the driver's
    pandas-mediated harness does.
    """
    return [
        tuple(v.item() if hasattr(v, "item") else v for v in r)
        for r in pdf.itertuples(index=False, name=None)
    ]


def hostile_spark():
    """The driver's session, adversarially approximated: non-UTC tz,
    default shuffle partitions, no Arrow tuning, no get_spark defaults."""
    import os

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return (
        SparkSession.builder.appName("oracle-check-hostile")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    argv = sys.argv[1:]
    hostile = "--hostile" in argv
    if hostile:
        argv = [a for a in argv if a != "--hostile"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e
    from rsoup_spark.session import get_spark

    spark = hostile_spark() if hostile else get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            if hostile:
                rows = pandas_rows(df.toPandas())
            else:
                rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s) [no oracle]")
            if not rows and name != "dedup_exact":
                print(f"      WARNING: empty result for rows-only query")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            if hostile:
                orows = pandas_rows(res.df())
            else:
                orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        ok_n = len(rows) == len(orows)
        ok_c = sorted(cols) == sorted(ocols)
        ok_h = ok_n and ok_c and value_hash(rows, cols) == value_hash(orows, ocols)
        status = "OK   " if (ok_n and ok_c and ok_h) else "FAIL "
        if not (ok_n and ok_c and ok_h):
            failures += 1
        print(
            f"{status} {name}: spark={len(rows)} duck={len(orows)} "
            f"cols={'ok' if ok_c else f'{cols} vs {ocols}'} "
            f"hash={'ok' if ok_h else 'MISMATCH'} ({dt:.1f}s)"
        )
        if not ok_h and ok_n and ok_c and rows:
            order = sorted(range(len(cols)), key=lambda i: cols[i])

            def key(r):
                return tuple(str(r[i]) for i in order)

            srows = sorted(rows, key=key)
            om = {tuple(sorted(ocols)).index if False else None}
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            orows_s = sorted(orows, key=lambda r: tuple(str(r[i]) for i in oorder))
            shown = 0
            for a, b in zip(srows, orows_s):
                av = tuple(a[i] for i in order)
                bv = tuple(b[i] for i in oorder)
                if tuple(map(str, av)) != tuple(map(str, bv)):
                    print(f"      spark: {av}\n      duck : {bv}")
                    shown += 1
                    if shown >= 3:
                        break

    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
