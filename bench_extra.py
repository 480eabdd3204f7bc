"""Round-6 optimization harness: per-query noop timing + plan capture.

``bench.py`` is frozen for driver measurement; this file exists so the
optimization round can (a) time individual queries in isolation with
the noop sink (guide §1.4), (b) dump ``explain("formatted")`` for the
plan evidence in ``plans/r06/``, and (c) repeat queries without paying
for the whole suite.

Usage::

    python bench_extra.py [--repeat N] [--explain DIR/suffix] [query ...]

With no query names, runs the full headline list from bench.py.
``--explain plans/r06/before`` writes ``plans/r06/<query>_before.txt``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None,
                    help="path prefix: writes <prefix hint> per query "
                    "as plans/r06/<query>_<suffix>.txt; pass e.g. "
                    "'plans/r06:before'")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from rsoup_spark.session import get_spark

    spark = get_spark("bench-extra")
    qs = entrymod.queries()

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x

    run_noop(spark.range(1000).select(_warm("id").alias("id")))

    names = args.queries or list(qs)
    exp_dir = exp_suffix = None
    if args.explain:
        exp_dir, exp_suffix = args.explain.split(":")
        os.makedirs(exp_dir, exist_ok=True)

    timings: dict[str, list[float]] = {}
    for name in names:
        if exp_dir is not None:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{exp_dir}/{name}_{exp_suffix}.txt", "w") as f:
                f.write(plan)
        samples = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            run_noop(qs[name](spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = samples
        print(f"{name}: {samples}", file=sys.stderr)

    print(json.dumps({"sf_dir": SF_DIR, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
