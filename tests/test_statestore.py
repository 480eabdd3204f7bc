"""State-store contract: per-round snapshots, append-only log reads,
atomic manifest with snapshot metadata; the Iceberg implementation
fails fast without the runtime (and is exercised on clusters that have
it -- same interface either way)."""

import pytest

from rsoup_spark.crawl.statestore import (
    SCHEMA_VERSION,
    IcebergStateStore,
    ParquetStateStore,
    iceberg_available,
)


@pytest.mark.spark
def test_parquet_store_roundtrip(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "ckpt"), coalesce=2)
    df0 = spark.createDataFrame([("a",), ("b",)], "url STRING")
    df1 = spark.createDataFrame([("c",)], "url STRING")
    store.write(df0, 0, "seen")
    store.write(df1, 1, "seen")
    assert store.read(1, "seen").count() == 1
    assert store.read_log("seen", 1).count() == 3
    assert store.exists(0, "seen") and not store.exists(2, "seen")

    store.write_manifest(
        1,
        done=False,
        snapshot={"tables": {"seen": {"rows_appended": 1}},
                  "lineage": store.path(1, "lineage")},
    )
    m = store.read_manifest()
    assert m["round"] == 1 and m["done"] is False
    assert m["schema_version"] == SCHEMA_VERSION
    assert m["snapshot"]["tables"]["seen"]["rows_appended"] == 1


@pytest.mark.spark
def test_iceberg_store_gated(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present; gate test not applicable")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergStateStore(spark)


@pytest.mark.spark
def test_iceberg_store_against_real_catalog(spark, tmp_path):
    """End-to-end against an actual iceberg-spark-runtime catalog.

    SKIPPED when the jar is absent: this sandbox has no
    iceberg-spark-runtime jar anywhere on disk and no network to fetch
    one (verified: `find / -name 'iceberg-spark-runtime*'` is empty),
    so the store's write/read/manifest logic is instead executed
    through the stub catalog below.  On a real cluster, add
    `--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v>`
    and this test exercises the genuine CREATE NAMESPACE /
    writeTo().append() / overwritePartitions path.
    """
    if not iceberg_available(spark):
        pytest.skip(
            "no iceberg-spark-runtime jar in this environment (offline "
            "sandbox; real-catalog path unexercisable here -- the stub-"
            "catalog test below drives the same store logic)"
        )
    import uuid

    wh = str(tmp_path / "warehouse")
    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", wh)
    ns = f"crawl_{uuid.uuid4().hex[:8]}"
    store = IcebergStateStore(spark, catalog="it", namespace=ns)
    df = spark.createDataFrame([("a", 1), ("b", 2)], "url string, n int")
    store.write(df, 0, "frontier")
    got = sorted(tuple(r) for r in store.read(0, "frontier").collect())
    assert got == [("a", 1), ("b", 2)]
    store.write_manifest(0, done=False)
    assert store.read_manifest()["round"] == 0


@pytest.mark.spark
def test_iceberg_store_logic_via_stub_catalog(spark, tmp_path, monkeypatch):
    """Execute the Iceberg store's real write/read/read_log/exists/
    manifest logic with only the V2 I/O boundary stubbed (an in-memory
    table dict standing in for the catalog), and pin it behaviorally
    equal to ParquetStateStore through the shared interface."""
    tables: dict[str, tuple] = {}  # full name -> (rows, schema)

    class StubWriter:
        def __init__(self, df, full):
            self.df, self.full = df, full

        def using(self, fmt):
            return self

        def partitionedBy(self, col, *cols):
            return self

        def create(self):
            if self.full in tables:
                raise Exception(f"table {self.full} already exists")
            tables[self.full] = (self.df.collect(), self.df.schema)

        def append(self):
            rows, schema = tables[self.full]
            tables[self.full] = (rows + self.df.collect(), schema)

    ddl: list[str] = []
    probe = spark.createDataFrame([(1,)], "x INT")
    # patch the CONCRETE classes (Spark 4: pyspark.sql.classic.*)
    monkeypatch.setattr(
        type(spark), "sql", lambda self, q, *a, **k: ddl.append(q)
    )
    monkeypatch.setattr(
        type(probe), "writeTo", lambda self, full: StubWriter(self, full)
    )
    monkeypatch.setattr(
        type(spark.read),
        "table",
        lambda self, name: spark.createDataFrame(*tables[name]),
    )
    monkeypatch.setattr(
        type(spark.catalog),
        "tableExists",
        lambda self, name, dbName=None: name in tables,
    )

    ice = IcebergStateStore(
        spark, catalog="stub", namespace="crawl", require_runtime=False
    )
    assert ddl and "CREATE NAMESPACE IF NOT EXISTS stub.crawl" in ddl[0]
    pq = ParquetStateStore(spark, str(tmp_path / "ckpt"))

    df0 = spark.createDataFrame([("a",), ("b",)], "url STRING")
    df1 = spark.createDataFrame([("c",)], "url STRING")
    for store in (ice, pq):
        store.write(df0, 0, "seen")
        store.write(df1, 1, "seen")
        store.write_manifest(0, done=True,
                             snapshot={"tables": {"seen": {"rows": 2}}})
        store.write_manifest(1, done=False)

    def state(store):
        return (
            sorted(r["url"] for r in store.read(1, "seen").collect()),
            sorted(r["url"] for r in store.read_log("seen", 1).collect()),
            [store.exists(i, "seen") for i in (0, 1, 2)],
            store.read_manifest(),
        )

    assert state(ice) == state(pq)
    assert state(ice)[3] == {"round": 1, "done": False, "schema_version": SCHEMA_VERSION}
    # round-partitioned: the seen table is ONE table with a round column
    assert set(tables) == {"stub.crawl.seen", "stub.crawl.manifest"}
    seen_rows, seen_schema = tables["stub.crawl.seen"]
    assert "round" in seen_schema.names and len(seen_rows) == 3


@pytest.mark.spark
def test_engine_manifest_carries_snapshot(spark, tmp_path):
    """A real round's manifest records row counts + lineage pointer."""
    from rsoup_spark.crawl.fixtures import gen_pages, gen_robots, gen_seeds
    from rsoup_spark.crawl.frontier import CrawlConfig, CrawlEngine

    pages = gen_pages(spark, n_hosts=4, base_pages=6, hot_factor=2)
    engine = CrawlEngine(
        spark,
        pages,
        gen_robots(spark, 4),
        str(tmp_path / "ck"),
        CrawlConfig(batch_size=8, max_rounds=2, n_shards=8,
                    m_bits=1 << 14),
    )
    engine.run(seeds=gen_seeds(spark, 4))
    m = engine.store.read_manifest()
    snap = m["snapshot"]
    assert snap["tables"]["order"]["rows"] >= 0
    assert set(snap["tables"]) == {"order", "seen", "frontier", "shards"}
    assert snap["lineage"].endswith("lineage")
    assert engine.store.exists(m["round"], "lineage")


@pytest.mark.spark
def test_parquet_rewrite_crash_recovery(spark, tmp_path):
    """A rewrite that dies between its two renames (old data moved
    aside, staging not yet promoted) leaves the round readable: reads
    restore the .old directory, rewrite re-runs safely, and read_log
    sees the recovered table too."""
    import os

    store = ParquetStateStore(spark, str(tmp_path / "ckpt"), coalesce=1)
    df0 = spark.createDataFrame([("a",), ("b",)], "url STRING")
    store.write(df0, 0, "frontier")
    target = store.path(0, "frontier")

    # simulate the crash window: target moved to .old, no staging
    os.rename(target, target + ".old")
    assert not os.path.exists(target)
    assert store.exists(0, "frontier")  # .old counts as present
    got = sorted(r["url"] for r in store.read(0, "frontier").collect())
    assert got == ["a", "b"]            # recovered
    assert os.path.exists(target) and not os.path.exists(target + ".old")

    # crash again, then rewrite over the crashed state: must not lose
    # the only surviving copy
    os.rename(target, target + ".old")
    df1 = spark.createDataFrame([("c",)], "url STRING")
    store.rewrite(df1, 0, "frontier")
    got = [r["url"] for r in store.read(0, "frontier").collect()]
    assert got == ["c"]
    assert not os.path.exists(target + ".old")

    # read_log path also recovers
    store.write(df0, 1, "frontier")
    os.rename(store.path(1, "frontier"), store.path(1, "frontier") + ".old")
    assert store.read_log("frontier", 1).count() == 3
