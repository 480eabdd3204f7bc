"""State-store contract: per-round snapshots, append-only log reads,
atomic manifest with snapshot metadata; the Iceberg implementation
fails fast without the runtime (and is exercised on clusters that have
it -- same interface either way)."""

import pytest

from rsoup_spark.crawl.statestore import (
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
    assert m["schema_version"] == 1
    assert m["snapshot"]["tables"]["seen"]["rows_appended"] == 1


@pytest.mark.spark
def test_iceberg_store_gated(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present; gate test not applicable")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergStateStore(spark, str(tmp_path / "ice"))


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
