"""Partitioned Bloom-filter URL-seen set, sharded by host hash.

From-scratch design (north_rule; no reference implementation exists --
rsoup has no frontier):

* The universe is sharded by ``shard_id = pmod(xxhash64(host), n_shards)``
  so every URL of a host lands in one shard: membership tests and
  updates are partition-local after one ``repartition(n_shards,
  shard_id)`` -- no cross-partition state (SURVEY.md §2.3).
* Each shard is a bitarray stored as one ``binary`` row, small enough
  to travel through Arrow.  k probe positions derive from the URL's
  single 64-bit ``xxhash64`` column (computed JVM-side) via splitmix64
  re-mixing -- the only Python work is numpy bit arithmetic.
* Scale math: at 10^10 URLs with n_shards = 65536 and m = 2^27 bits
  (16 MiB) per shard, n/shard ~ 1.5e5 ... sized for FP < 1e-6; shards
  stay independent so they spread across executors.  In the sandbox we
  default to 2^20 bits / 64 shards.
* False negatives are impossible; false positives would silently skip
  URLs.  With ``CrawlConfig.exact_backstop`` on (default), the frontier
  anti-joins the FULL candidate set against the seen table, so fp-hit
  URLs are recovered and counted (``bloom_false_positives`` metric);
  with it off (production, bloom authoritative) the fp-rate loss is
  accepted and sized away via m_bits (FP < 1e-6 above).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SHARD_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("bloom", BinaryType(), False),
        StructField("n_items", LongType(), False),
    ]
)

_SPLITMIX_C1 = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x + _SPLITMIX_C1).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _SPLITMIX_C2
    x ^= x >> np.uint64(27)
    x *= _SPLITMIX_C3
    x ^= x >> np.uint64(31)
    return x


def probe_positions(url_hash: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n,) int64 url hashes -> (n, k) bit positions via double hashing
    h1 + i*h2 (Kirsch-Mitzenmacher construction)."""
    h = url_hash.astype(np.uint64)
    h1 = _mix(h)
    h2 = _mix(h1) | np.uint64(1)  # odd -> full-period stride
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _bit_test(blob: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """blob: (m/8,) uint8; pos: (n,k) -> (n,) bool all-k-bits-set."""
    byte_idx = pos >> 3
    bit = np.uint8(1) << (pos & 7).astype(np.uint8)
    return ((blob[byte_idx] & bit) == bit).all(axis=1)


def _bit_set(blob: np.ndarray, pos: np.ndarray) -> None:
    byte_idx = (pos >> 3).ravel()
    bit = (np.uint8(1) << (pos & 7).astype(np.uint8)).ravel()
    np.bitwise_or.at(blob, byte_idx, bit)


def with_shard_cols(df: DataFrame, url_col: str, host_col: str,
                    n_shards: int, salt: int = 4) -> DataFrame:
    """Adds url_hash (xxhash64, JVM-side) and shard_id columns.

    Sharding is by host-hash with ``salt`` sub-shards per host
    (north_rule: "host-hash salting handles hot-domain skew"): a hot
    host's URLs spread over ``salt`` Bloom shards instead of
    serializing one partition.  The mapping stays a pure function of
    the URL, so membership semantics are unchanged.
    """
    df = df.withColumn("url_hash", F.xxhash64(F.col(url_col)))
    return df.withColumn(
        "shard_id",
        F.pmod(
            F.xxhash64(F.col(host_col), F.pmod("url_hash", F.lit(salt))),
            F.lit(n_shards),
        ).cast("int"),
    )


def empty_shards(spark, n_shards: int, m_bits: int) -> DataFrame:
    blob = bytes(m_bits // 8)
    rows = [(i, blob, 0) for i in range(n_shards)]
    return spark.createDataFrame(rows, SHARD_SCHEMA)


def filter_and_update(
    candidates: DataFrame,
    shards: DataFrame,
    n_shards: int,
    m_bits: int,
    k: int = 5,
    persist: bool = True,
    dedup_key: str | None = None,
    dedup_agg: dict | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """One pass per shard: test candidates against the shard's Bloom,
    keep probably-unseen ones, and emit the updated shard blob.

    ``candidates`` must carry url_hash + shard_id (``with_shard_cols``).
    Returns (unseen_candidates, new_shards, cached) where ``cached`` is
    the persisted intermediate both outputs derive from (None when
    ``persist=False``) -- the caller must unpersist it once the outputs
    are materialized, or cached shard passes pile up round over round.
    Implemented as a cogrouped applyInPandas so each shard's state is
    touched exactly once per round, partition-locally.

    When ``dedup_key`` is set, within-batch deduplication happens
    *inside* the shard pass (pandas groupby per shard) -- valid because
    equal keys always land in the same shard -- saving the upstream
    ``groupBy(url)`` shuffle; ``dedup_agg`` maps column -> pandas agg
    ('min'/'max'/'first') for the surviving row.  Without it, callers
    must pre-deduplicate (duplicate keys in one batch would all read
    as unseen, since bits are set after the whole batch is tested).
    """
    out_schema = StructType(
        list(candidates.schema.fields)
        + [StructField("__unseen", IntegerType(), False)]
    )

    cand_cols = [f.name for f in candidates.schema.fields]

    def process(key, cand_iter: pd.DataFrame, shard_pdf: pd.DataFrame):
        # cogroup gives all candidate rows + the (single) shard row
        if len(cand_iter) == 0:
            return pd.DataFrame(columns=[*cand_cols, "__unseen", "__blob"])
        if dedup_key is not None and len(cand_iter):
            agg = dict(dedup_agg or {})
            for c in cand_cols:
                if c != dedup_key and c not in agg:
                    agg[c] = "first"
            cand_iter = (
                cand_iter.groupby(dedup_key, as_index=False, sort=True)
                .agg(agg)[cand_cols]
            )
        if len(shard_pdf):
            blob = np.frombuffer(
                shard_pdf.iloc[0]["bloom"], dtype=np.uint8
            ).copy()
        else:
            blob = np.zeros(m_bits // 8, dtype=np.uint8)
        hashes = cand_iter["url_hash"].to_numpy(dtype=np.int64)
        pos = probe_positions(hashes, k, m_bits)
        seen = _bit_test(blob, pos)
        _bit_set(blob, pos[~seen])
        out = cand_iter.copy()
        out["__unseen"] = (~seen).astype("int32")
        out["__blob"] = [blob.tobytes()] + [None] * (len(out) - 1)
        return out

    blob_schema = StructType(
        list(out_schema.fields) + [StructField("__blob", BinaryType(), True)]
    )

    grouped = candidates.groupBy("shard_id").cogroup(
        shards.withColumnRenamed("shard_id", "shard_id").groupBy("shard_id")
    )
    result = grouped.applyInPandas(
        lambda key, l, r: process(key, l, r), blob_schema
    )
    cached = None
    if persist:
        # both outputs derive from one pass over the shard state; cache
        # it so unseen + new_shards don't re-run the cogroup
        result = result.persist()
        cached = result

    unseen = result.where(F.col("__unseen") == 1).select(*cand_cols)
    # blob rides on the first row of each shard group; the added count
    # must aggregate over ALL of the shard's rows
    touched = (
        result.groupBy("shard_id")
        .agg(
            F.first("__blob", ignorenulls=True).alias("bloom"),
            F.sum("__unseen").cast("long").alias("added"),
        )
        .where(F.col("bloom").isNotNull())
    )
    new_shards = (
        shards.alias("old")
        .join(touched.alias("t"), "shard_id", "left")
        .select(
            "shard_id",
            F.coalesce(F.col("t.bloom"), F.col("old.bloom")).alias("bloom"),
            (F.col("old.n_items") + F.coalesce(F.col("t.added"), F.lit(0)))
            .cast("long")
            .alias("n_items"),
        )
    )
    return unseen, new_shards, cached
