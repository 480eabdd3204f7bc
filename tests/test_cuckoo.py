"""Cuckoo-filter URL-seen shard: semantics, deletion, overflow, crawl
equality (north_rule names "bloom/cuckoo"; bloom twin is test_crawl)."""

import shutil
import tempfile

import numpy as np
import pytest

from rsoup_spark.crawl.cuckoo import (
    SLOTS,
    cuckoo_contains,
    cuckoo_delete,
    cuckoo_insert,
    cuckoo_new,
)


def _hashes(n, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(-(2**62), 2**62, size=n, dtype=np.int64)


def test_no_false_negatives_and_low_fp():
    table = cuckoo_new(1 << 12)  # 16384 slots
    ins = np.unique(_hashes(8000, 1))  # ~49% load
    ok = cuckoo_insert(table, ins)
    assert ok.all(), "all inserts must fit at half load"
    assert cuckoo_contains(table, ins).all()  # no false negatives
    other = _hashes(8000, 2)
    other = other[~np.isin(other, ins)]
    fp = cuckoo_contains(table, other).mean()
    # 16-bit fp, 4-way buckets: expect ~ 2*4/65536 * load ~ 6e-5
    assert fp < 0.005, fp


def test_bulk_place_matches_sequential_capacity():
    """The vectorized two-choice bulk pass + eviction tail must reach
    the textbook ~95% load factor before any insert fails."""
    table = cuckoo_new(1 << 8)  # 1024 slots
    ins = np.unique(_hashes(5000, 3))[: int(1024 * 0.90)]
    ok = cuckoo_insert(table, ins)
    assert ok.all(), f"failed {np.count_nonzero(~ok)} below 0.90 load"
    occupied = np.count_nonzero(table)
    assert occupied == len(ins)


def test_delete_removes_exactly_one_copy():
    table = cuckoo_new(1 << 10)
    ins = np.unique(_hashes(1000, 4))
    assert cuckoo_insert(table, ins).all()
    victims = ins[::3]
    assert cuckoo_delete(table, victims).all()
    assert not cuckoo_contains(table, victims).any()
    keep = np.setdiff1d(ins, victims)
    assert cuckoo_contains(table, keep).all()  # untouched keys intact
    # re-insert after delete works (the slot really freed)
    assert cuckoo_insert(table, victims).all()
    assert cuckoo_contains(table, victims).all()


def test_overflow_refuses_with_rollback():
    """A full filter must refuse inserts WITHOUT forgetting existing
    keys (eviction chain rolled back -> no false negatives ever)."""
    table = cuckoo_new(1 << 4)  # 64 slots
    ins = np.unique(_hashes(4000, 5))
    ok = cuckoo_insert(table, ins)
    assert not ok.all(), "64-slot filter over 4000 keys must overflow"
    assert ok.sum() >= int(64 * 0.75)
    placed = ins[ok]
    assert cuckoo_contains(table, placed).all(), \
        "rollback must preserve every successfully inserted key"


def test_insert_is_deterministic():
    """Same batch -> same table bytes (checkpoint resume replays)."""
    a, b = cuckoo_new(1 << 8), cuckoo_new(1 << 8)
    ins = _hashes(900, 6)
    cuckoo_insert(a, ins)
    cuckoo_insert(b, ins)
    assert a.tobytes() == b.tobytes()


@pytest.mark.spark
def test_shard_pass_roundtrip(spark):
    """filter_and_update_cuckoo: unseen mask + updated blobs + counts
    through the real cogroup path."""
    from pyspark.sql import functions as F

    from rsoup_spark.crawl.bloom import with_shard_cols
    from rsoup_spark.crawl.cuckoo import (
        empty_cuckoo_shards,
        filter_and_update_cuckoo,
    )

    urls = [
        (f"https://site{i % 4}.test/p/{i}", f"site{i % 4}.test")
        for i in range(300)
    ]
    df = spark.createDataFrame(urls, "url string, host string")
    cand = with_shard_cols(df, "url", "host", n_shards=8)
    shards = empty_cuckoo_shards(spark, 8, 1 << 10)

    unseen1, shards1, c1 = filter_and_update_cuckoo(cand, shards, 8, 1 << 10)
    assert unseen1.count() == 300  # all new
    rows = shards1.collect()
    assert sum(r["n_items"] for r in rows) == 300
    assert sum(r["n_failed"] for r in rows) == 0
    if c1 is not None:
        c1.unpersist()

    # second pass over the same urls: everything reads seen
    shards1p = shards1.persist()
    unseen2, shards2, c2 = filter_and_update_cuckoo(
        cand, shards1p, 8, 1 << 10
    )
    assert unseen2.count() == 0
    assert sum(r["n_items"] for r in shards2.collect()) == 300
    if c2 is not None:
        c2.unpersist()
    shards1p.unpersist()


@pytest.mark.spark
def test_crawl_matches_oracle_with_cuckoo(spark):
    """Full crawl with seen_filter='cuckoo' reproduces the oracle's
    crawl order + seen set exactly (same contract as the bloom path)."""
    from rsoup_spark.crawl.fixtures import (
        gen_pages,
        gen_robots,
        gen_seeds,
        robots_rows,
    )
    from rsoup_spark.crawl.frontier import CrawlConfig, CrawlEngine
    from rsoup_spark.crawl.oracle import simulate

    pages = gen_pages(
        spark, n_hosts=4, base_pages=6, hot_factor=4, links_per_page=4,
        seed=11,
    ).persist()
    pages.count()
    robots = gen_robots(spark, n_hosts=4)
    seeds = gen_seeds(spark, n_hosts=4)
    cfg = CrawlConfig(
        batch_size=16, round_seconds=10.0, max_rounds=10, n_shards=8,
        seen_filter="cuckoo", cuckoo_buckets=1 << 10,
    )
    tmp = tempfile.mkdtemp(prefix="crawl_ck_")
    try:
        eng = CrawlEngine(spark, pages, robots, tmp, cfg)
        history = eng.run(seeds=seeds)
        assert all(m["seen_filter"] == "cuckoo" for m in history)
        want_order, want_seen = simulate(
            {r["url"]: list(r["out_links"])
             for r in pages.select("url", "out_links").collect()},
            [(r["url"], r["score"], r["depth"]) for r in seeds.collect()],
            robots_rows(4),
            batch_size=cfg.batch_size,
            round_seconds=cfg.round_seconds,
            max_rounds=cfg.max_rounds,
        )
        assert eng.crawl_order() == want_order
        assert eng.seen_set() == want_seen
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        pages.unpersist()


def test_slot_layout_constant():
    # blob layout contract: uint16 little-endian, SLOTS per bucket --
    # a resume reads blobs written by a previous session
    t = cuckoo_new(4)
    assert t.shape == (4, SLOTS) and t.dtype == np.uint16
