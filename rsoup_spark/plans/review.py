"""Physical-plan review: assert the plans we ship are the plans we want.

Checks (SURVEY.md §4 "what Catalyst gives us for free"):
* column pruning reaches the parquet scan (ReadSchema only carries the
  needed columns, e.g. the extraction stage reads url+html only);
* predicate pushdown reaches the scan (PushedFilters non-empty for
  filtered scans);
* small dimensions broadcast (BroadcastHashJoin, never SortMergeJoin
  for robots/nation/region);
* relational glue stays in WholeStageCodegen, Python appears only in
  ArrowEvalPython / MapInPandas / FlatMapCoGroupsInPandas stages.

Usage: ``python -m rsoup_spark.plans.review`` prints a table;
``tests/test_plans.py`` asserts the same properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_text(df)


def pushed_filters(df: DataFrame) -> list[str]:
    out = []
    for line in plan_text(df).splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    return [
        line.strip()
        for line in plan_text(df).splitlines()
        if "ReadSchema" in line
    ]


def python_stages(df: DataFrame) -> list[str]:
    hits = []
    for marker in (
        "ArrowEvalPython",
        "MapInPandas",
        "FlatMapGroupsInPandas",
        "FlatMapCoGroupsInPandas",
        "BatchEvalPython",
    ):
        if marker in plan_text(df):
            hits.append(marker)
    return hits


def main() -> None:
    import __spark_entry__ as e
    from rsoup_spark.session import get_spark

    spark = get_spark("plan-review")
    sf = "/root/testdata/sf0.01"
    for name, fn in e.queries().items():
        df = fn(spark, sf)
        text = plan_text(df)
        print(f"== {name}")
        print("   broadcast:", "BroadcastHashJoin" in text,
              "| sortmerge:", "SortMergeJoin" in text,
              "| python:", ",".join(python_stages(df)) or "-",
              "| rowudf:", "BatchEvalPython" in text)
        for line in pushed_filters(df)[:2]:
            print("  ", line[:120])
        for line in read_schemas(df)[:2]:
            print("  ", line[:120])
    spark.stop()


if __name__ == "__main__":
    main()
