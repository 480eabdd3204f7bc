"""Checkpoint state stores for the crawl engine.

north_rule calls for state "checkpointed to Iceberg with per-partition
lineage".  The store interface captures the contract the engine needs
-- per-round table snapshots, an append-only seen log, an atomic
manifest carrying snapshot metadata (schema version, row counts,
lineage pointers) -- with two implementations:

* ``ParquetStateStore`` -- plain parquet dirs + a JSON manifest.  The
  sandbox default (no Iceberg jars available) and the unit-test
  backend.  Its manifest carries the same snapshot metadata an Iceberg
  snapshot summary would.
* ``IcebergStateStore`` -- the production shape: each state table is an
  Iceberg table, each round an append snapshot (the seen log is an
  append commit, never a rewrite), resume reads the last committed
  snapshot.  Construction fails fast with a clear error when the
  Iceberg runtime is not on the classpath, and the test suite skips it
  there; the engine is exercised against the interface either way.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

# v2: manifest rows carry `horizon` (the crawl's current round cap).
# A v1 Iceberg manifest table needs `ALTER TABLE ... ADD COLUMN horizon
# INT` before v2 appends (Iceberg does not evolve schema on write);
# read_manifest tolerates rows written before the column existed.
SCHEMA_VERSION = 2


class ParquetStateStore:
    """Per-round parquet snapshots + atomic JSON manifest."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        coalesce: Optional[int] = 8,
    ) -> None:
        self.spark = spark
        self.root = root
        self.coalesce = coalesce
        os.makedirs(root, exist_ok=True)

    # -- tables ------------------------------------------------------------
    def path(self, round_no: int, name: str) -> str:
        return os.path.join(self.root, f"round={round_no}", name)

    def write(self, df: DataFrame, round_no: int, name: str,
              mode: str = "overwrite") -> None:
        if self.coalesce:
            df = df.coalesce(self.coalesce)
        df.write.mode(mode).parquet(self.path(round_no, name))

    def _readable_path(self, round_no: int, name: str) -> str:
        p = self.path(round_no, name)
        if not os.path.exists(p) and os.path.exists(p + ".old"):
            # crash recovery: `rewrite` died between its two renames
            # (old data moved aside, staging not yet promoted) --
            # restore the pre-rewrite table so the round stays readable
            os.rename(p + ".old", p)
        return p

    def read(self, round_no: int, name: str) -> DataFrame:
        return self.spark.read.parquet(self._readable_path(round_no, name))

    def exists(self, round_no: int, name: str) -> bool:
        p = self.path(round_no, name)
        return os.path.exists(p) or os.path.exists(p + ".old")

    def read_log(self, name: str, up_to_round: int) -> DataFrame:
        """Union of an append-only table's per-round appends (one
        multi-path scan; the Iceberg analogue reads one table)."""
        paths = [
            self._readable_path(i, name)
            for i in range(up_to_round + 1)
            if self.exists(i, name)
        ]
        return self.spark.read.parquet(*paths)

    def has_log(self, name: str, up_to_round: int) -> bool:
        return any(
            self.exists(i, name) for i in range(up_to_round + 1)
        )

    def read_log_with_round(self, name: str, up_to_round: int) -> DataFrame:
        """Like read_log but tagging each row with the round it was
        appended in (the Iceberg table carries the column natively;
        parquet recovers it from the directory layout)."""
        from functools import reduce

        import pyspark.sql.functions as F

        parts = [
            self.read(i, name).withColumn("round", F.lit(i))
            for i in range(up_to_round + 1)
            if self.exists(i, name)
        ]
        return reduce(lambda a, b: a.unionByName(b), parts)

    def rewrite(self, df: DataFrame, round_no: int, name: str) -> None:
        """Replace a round's table in place (expiry/maintenance only --
        normal rounds never rewrite).  Parquet cannot atomically
        overwrite a path that is also the read source, so this stages
        to a sibling dir and swaps; the Iceberg analogue is an atomic
        overwritePartitions snapshot."""
        import shutil

        # recover a crashed previous rewrite first -- otherwise the
        # rmtree below would delete the `.old` dir that is the only
        # surviving copy of the table
        target = self._readable_path(round_no, name)
        staging = target + ".staging"
        if self.coalesce:
            df = df.coalesce(self.coalesce)
        df.write.mode("overwrite").parquet(staging)
        old = target + ".old"
        shutil.rmtree(old, ignore_errors=True)
        # os.replace is NOT atomic for directories on POSIX (rename(2)
        # fails with ENOTEMPTY on a non-empty target), so a two-rename
        # swap is unavoidable -- but ordered so every crash window
        # leaves a readable table: move the OLD data aside only after
        # the staging dir is fully written, then immediately promote.
        # A crash between the renames leaves `.old` intact; `read`
        # falls back to it, so the round is never unreadable.
        os.rename(target, old)
        os.rename(staging, target)
        shutil.rmtree(old, ignore_errors=True)

    # -- manifest ------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def write_manifest(
        self,
        round_no: int,
        done: bool,
        snapshot: Optional[dict] = None,
        horizon: Optional[int] = None,
    ) -> None:
        """Atomic commit point for the round.  ``snapshot`` carries the
        per-round metadata an Iceberg snapshot summary would: schema
        version, per-table row counts, the lineage table pointer.
        ``horizon`` is the crawl's current round cap (extended past
        max_rounds by post-expiry resumes); resume reads it back so a
        mid-window restart keeps the same window."""
        doc = {
            "round": round_no,
            "done": done,
            "schema_version": SCHEMA_VERSION,
        }
        if horizon is not None:
            doc["horizon"] = int(horizon)
        if snapshot:
            doc["snapshot"] = snapshot
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._manifest_path())

    def read_manifest(self) -> dict:
        with open(self._manifest_path()) as f:
            return json.load(f)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergStateStore:
    """Iceberg-backed store implementing the same duck-typed interface
    as ParquetStateStore (deliberately NOT a subclass: the filesystem
    ``exists()``/JSON-manifest behaviors must never silently run
    against a catalog).  State tables are catalog tables partitioned by
    ``round``; each round is an append snapshot (the seen log is an
    append commit, never a rewrite); the manifest is an append-only
    ``manifest`` control table whose highest ``commit_seq`` row is the
    current commit -- the same latest-wins contract as the JSON file.

    Requires the iceberg-spark-runtime jar and a configured catalog at
    construction (``require_runtime=False`` lets tests drive the exact
    write/read/manifest logic against a stubbed V2 I/O boundary)."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: str = "spark_catalog",
        namespace: str = "crawl",
        require_runtime: bool = True,
    ) -> None:
        if require_runtime and not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use "
                "ParquetStateStore (add iceberg-spark-runtime + a "
                "catalog config to enable this store)"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}"
        )

    def _table(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _write_append(self, df: DataFrame, name: str, partition) -> None:
        full = self._table(name)
        writer = df.writeTo(full)
        if self.spark.catalog.tableExists(full):
            writer.append()
        else:
            if partition is not None:
                writer = writer.partitionedBy(partition)
            writer.create()

    # -- tables ------------------------------------------------------------
    def write(self, df: DataFrame, round_no: int, name: str,
              mode: str = "overwrite") -> None:
        import pyspark.sql.functions as F

        # append snapshot per round; readers time-travel by round
        # column.  ``mode`` is part of the duck-typed interface but
        # moot here: every write IS an append commit (per-round
        # "overwrite" and "append" coincide because rounds write once;
        # multi-write-per-round tables like `expired` just append).
        self._write_append(
            df.withColumn("round", F.lit(round_no)), name, F.col("round")
        )

    def read(self, round_no: int, name: str) -> DataFrame:
        import pyspark.sql.functions as F

        return (
            self.spark.read.table(self._table(name))
            .where(F.col("round") == round_no)
            .drop("round")
        )

    def exists(self, round_no: int, name: str) -> bool:
        import pyspark.sql.functions as F

        if not self.spark.catalog.tableExists(self._table(name)):
            return False
        return bool(
            self.spark.read.table(self._table(name))
            .where(F.col("round") == round_no)
            .take(1)
        )

    def read_log(self, name: str, up_to_round: int) -> DataFrame:
        import pyspark.sql.functions as F

        return (
            self.spark.read.table(self._table(name))
            .where(F.col("round") <= up_to_round)
            .drop("round")
        )

    def has_log(self, name: str, up_to_round: int) -> bool:
        import pyspark.sql.functions as F

        if not self.spark.catalog.tableExists(self._table(name)):
            return False
        return bool(
            self.spark.read.table(self._table(name))
            .where(F.col("round") <= up_to_round)
            .take(1)
        )

    def read_log_with_round(self, name: str, up_to_round: int) -> DataFrame:
        import pyspark.sql.functions as F

        return self.spark.read.table(self._table(name)).where(
            F.col("round") <= up_to_round
        )

    def rewrite(self, df: DataFrame, round_no: int, name: str) -> None:
        """Atomic replacement of one round partition (expiry
        maintenance): a single Iceberg overwritePartitions snapshot."""
        import pyspark.sql.functions as F

        df.withColumn("round", F.lit(round_no)).writeTo(
            self._table(name)
        ).overwritePartitions()

    # -- manifest ----------------------------------------------------------
    def write_manifest(
        self,
        round_no: int,
        done: bool,
        snapshot: Optional[dict] = None,
        horizon: Optional[int] = None,
    ) -> None:
        df = self.spark.createDataFrame(
            [(
                int(round_no),
                bool(done),
                SCHEMA_VERSION,
                json.dumps(snapshot or {}),
                int(horizon) if horizon is not None else None,
                # one commit per (round, done) transition, monotonic
                int(round_no) * 2 + int(bool(done)),
            )],
            "round INT, done BOOLEAN, schema_version INT, "
            "snapshot STRING, horizon INT, commit_seq LONG",
        )
        self._write_append(df, "manifest", None)

    def read_manifest(self) -> dict:
        import pyspark.sql.functions as F

        rows = (
            self.spark.read.table(self._table("manifest"))
            .orderBy(F.desc("commit_seq"))
            .take(1)
        )
        if not rows:
            raise FileNotFoundError("no manifest commit in the store")
        r = rows[0].asDict()
        doc = {
            "round": r["round"],
            "done": r["done"],
            "schema_version": r["schema_version"],
        }
        # rows committed before schema v2 have no horizon column
        if r.get("horizon") is not None:
            doc["horizon"] = r["horizon"]
        snap = json.loads(r["snapshot"])
        if snap:
            doc["snapshot"] = snap
        return doc
