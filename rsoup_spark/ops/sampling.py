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


def mix_sources(
    docs: DataFrame,
    weights_ppm: dict[str, int],
    budget_tokens: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    granularity: int = 10_000,
) -> DataFrame:
    """Token-budget corpus mixing -- the data-mixture step between
    cleaning and packing: given target mixture weights per source (in
    ppm, the module's integer-exact currency) and a total token
    budget, down-sample each source so the kept corpus approximates
    the target mixture.  Per source s:

        desired_s = budget * weight_ppm(s) DIV 1e6
        thr_s     = min(granularity, desired_s * granularity DIV avail_s)

    and a doc survives iff ``bucket(id) < thr_s`` -- the same
    md5-bucket hash-bernoulli contract as ``stratified_sample``, so
    the kept set is reproducible across runs, partitionings, and
    engines.  A source whose available tokens fall short of its
    target keeps everything (thr caps at granularity -- mixtures are
    aspirations, not fabrications); unlisted sources weight 0 and
    drop.  Kept tokens approximate rate x avail with per-doc variance
    (hash-bernoulli samples documents, not tokens) -- the standard
    trade; token-exact mixing would need a global sort.

    Scale shape: one map-side-combined groupBy for per-source token
    totals (rows = |sources|, tiny), thresholds broadcast-join back,
    the keep filter is a pure JVM expression.  No collects.
    """
    toks = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
    ).cast("long")
    base = docs.withColumn("__n_tokens", toks)
    avail = base.groupBy(strata_col).agg(
        F.sum("__n_tokens").alias("__avail")
    )
    w: Column = F.lit(0)
    for value, ppm in sorted(weights_ppm.items()):
        w = F.when(F.col(strata_col) == value, F.lit(int(ppm))).otherwise(w)
    thr = F.when(
        F.col("__avail") > 0,
        F.least(
            F.lit(int(granularity)).cast("long"),
            F.expr(
                f"((CAST({int(budget_tokens)} AS BIGINT) * __w) "
                f"DIV 1000000) * {int(granularity)} DIV __avail"
            ),
        ),
    ).otherwise(F.lit(0)).cast("long")
    thresholds = avail.withColumn("__w", w.cast("long")).withColumn(
        "__thr", thr
    )
    return (
        base.join(F.broadcast(thresholds), strata_col)
        .where(sample_bucket(F.col(id_col), granularity) < F.col("__thr"))
        .select(
            F.col(id_col),
            F.col(strata_col),
            F.col("__n_tokens").alias("n_tokens"),
            F.col("__thr").alias("thr"),
        )
    )
