"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is never trained on whole: pipelines down-sample by
stratum (language, source, quality band) with rates tuned per stratum.
Doing that with ``DataFrame.sample`` is non-reproducible across runs
and partitionings; the portable way is hash-bernoulli -- keep a row
iff a stable hash of its id falls under the stratum's threshold.  The
decision is a pure function of (id, stratum, rates): re-runs,
repartitions, and other engines (the DuckDB oracle) agree row-for-row,
and the filter is a JVM expression that pushes into the scan.

The hash is md5-derived (first 8 hex digits -> int -> bucket in
[0, granularity)), the same engine-portable construction the dedup /
winnowing ops use (``ops/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_bucket(id_col: Column, granularity: int = 10_000) -> Column:
    """Stable bucket in [0, granularity): md5 of the stringified id,
    first 8 hex digits, mod granularity.  Mirrors the SQL
    ``('0x' || substr(md5(id::VARCHAR), 1, 8))::UBIGINT % granularity``."""
    return F.pmod(
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(granularity),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    granularity: int = 10_000,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value -> keep rate in [0, 1]; unmatched
    strata use ``default_rate``.  Exact contract: a row survives iff
    ``bucket(id) < round(rate * granularity)`` -- integer thresholds,
    so the kept set is identical in any engine with md5 (no float
    comparison at the boundary).
    """
    thr: Column = F.lit(int(round(default_rate * granularity)))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(round(rate * granularity)))
        ).otherwise(thr)
    return df.where(sample_bucket(F.col(id_col), granularity) < thr)
