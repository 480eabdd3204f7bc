"""Frequency sketching: a portable count-min sketch.

The sketch hash family is md5-derived (``row | key`` -> top 15 hex
digits -> mod width), the same engine-portable construction as the
SimHash/LSH operators: md5 exists everywhere, so the ENTIRE sketch --
cell layout, counts, estimates -- is reproducible bit-for-bit by any
other engine, which is what lets the DuckDB oracle certify it and
what lets sketches built by different systems be merged.

Scale shape: building is one aggregation whose map-side partial
collapses every partition to <= depth*width cells before the
exchange, so the shuffle is SKETCH-sized (d*w rows), not data-sized
-- the whole point of sketching 100 TB.  Estimation broadcasts the
sketch (d*w cells, e.g. 4*65536 = 2^18 rows max by construction) and
is a map-only join.  Sketches over different partitions/days merge by
cell-wise SUM, so incremental maintenance is a union + re-aggregate
of sketch tables, never a re-scan of history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(row: F.Column, key: F.Column, width: int) -> F.Column:
    """Engine-portable hash cell: md5('<row>|<key>') top-60-bit int
    mod width (60 bits keeps the conv() result positive in a signed
    64-bit long on every engine)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(row.cast("string"), F.lit("|"), key)), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(int(width)))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` (optionally weighted):
    ``(row, cell, cnt)`` with one record per non-empty cell.

    Keys are hashed as strings (cast explicitly for cross-engine
    stability).  ``depth`` rows of ``width`` cells bound the
    overestimate: with total weight W, the estimate error is
    <= 2W/width with probability 1 - 2^-depth (Cormode & Muthukrishnan
    2005).  Empty cells are implicit zeros -- ``cms_estimate``
    coalesces them -- so the sketch table stays <= depth*width rows.
    """
    key = F.col(key_col).cast("string")
    w = F.lit(1).cast("bigint") if weight_col is None else F.col(
        weight_col
    ).cast("bigint")
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("row"),
        key.alias("__k"),
        w.alias("__w"),
    )
    return (
        rows.select(
            "row", _cell(F.col("row"), F.col("__k"), width).alias("cell"),
            "__w",
        )
        .groupBy("row", "cell")
        .agg(F.sum("__w").alias("cnt"))
    )


def hll_build(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """Distinct-count register sketch: ``(reg, max_rho)`` with
    ``2**p`` registers, HyperLogLog-shaped but with the rank taken
    from the TRAILING-zero count of the md5-derived hash suffix
    (Flajolet-Martin style).  For a uniform hash, trailing and
    leading zero counts are identically geometrically distributed, so
    the HLL estimator applies unchanged -- trailing zeros are chosen
    because ``bit_count((h & -h) - 1)`` is pure integer arithmetic
    that every engine reproduces bit-for-bit (no float log2), which
    keeps the whole register table oracle-checkable.

    Scale shape: same as :func:`cms_build` -- map-side partial MAX
    collapses each partition to <= 2**p registers before the
    exchange, so the shuffle is sketch-sized regardless of input
    size.  Sketches merge by elementwise register MAX (tested), so
    per-partition / per-day sketches compose without rescanning.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    suffix_bits = 60 - p
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    # integer DIV, never `/`: float division would round 60-bit
    # hashes through a 53-bit mantissa
    base = df.select(h.alias("__h")).select(
        F.pmod(F.col("__h"), F.lit(m)).alias("reg"),
        F.expr(f"__h DIV {m}L").alias("rest"),
    )
    rho = F.when(
        F.col("rest") == 0, F.lit(suffix_bits + 1)
    ).otherwise(
        F.bit_count(F.expr("(rest & -rest) - 1")) + F.lit(1)
    )
    return (
        base.select("reg", rho.cast("int").alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> float:
    """Cardinality estimate from a :func:`hll_build` register table
    (driver-side scalar; the register table is <= 2**p rows by
    construction).  Standard HLL harmonic mean with the small-range
    linear-counting correction; relative error ~= 1.04 / sqrt(2**p).
    Estimation is deliberately separate from the (bit-exact,
    oracle-checkable) register build."""
    m = 1 << p
    # bounded: <= 2**p rows by construction
    regs = {r["reg"]: r["max_rho"] for r in registers.collect()}
    zeros = m - len(regs)
    s = sum(2.0 ** -v for v in regs.values()) + zeros
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else (
        0.709 if m == 64 else 0.697 if m == 32 else 0.673
    )
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros:
        import math

        est = m * math.log(m / zeros)
    return est


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the key
    columns plus ``est`` = min over sketch rows of the hashed cell's
    count (the count-min estimator; >= true count, never under).
    Missing cells count as zero, so keys never seen estimate 0 unless
    every row collides with observed traffic.
    """
    key = F.col(key_col).cast("string")
    # transient per-row id so the depth-collapse groupBy preserves
    # duplicate probe rows (N identical keys in -> N rows out, not 1)
    probes = keys.withColumn(
        "__probe_id", F.monotonically_increasing_id()
    ).select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("row"),
    ).withColumn("cell", _cell(F.col("row"), key, width))
    joined = probes.join(F.broadcast(sketch), on=["row", "cell"], how="left")
    return (
        joined.groupBy("__probe_id", *keys.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .drop("__probe_id")
    )
