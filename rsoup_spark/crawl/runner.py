"""CLI entry for the crawl engine: generate a synthetic web, crawl it,
report throughput.

    python -m rsoup_spark.crawl.runner --hosts 8 --pages 20 \
        --rounds 10 --batch 64 [--master local[8]] [--ckpt DIR] [--resume]

Prints one JSON line with round metrics and URLs/sec (the frontier
throughput number used by BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--pages", type=int, default=20)
    ap.add_argument("--hot-factor", type=int, default=10)
    ap.add_argument("--links", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--round-seconds", type=float, default=10.0)
    ap.add_argument("--master", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--check-oracle", action="store_true")
    args = ap.parse_args()

    from rsoup_spark.crawl.fixtures import (
        gen_pages,
        gen_robots,
        gen_seeds,
        robots_rows,
    )
    from rsoup_spark.crawl.frontier import CrawlConfig, CrawlEngine
    from rsoup_spark.session import get_spark

    spark = get_spark("crawl-runner", master=args.master)
    ckpt = args.ckpt or tempfile.mkdtemp(prefix="crawl_runner_")
    cleanup = args.ckpt is None

    try:
        pages = gen_pages(
            spark,
            n_hosts=args.hosts,
            base_pages=args.pages,
            hot_factor=args.hot_factor,
            links_per_page=args.links,
        ).persist()
        n_pages = pages.count()

        cfg = CrawlConfig(
            batch_size=args.batch,
            round_seconds=args.round_seconds,
            max_rounds=args.rounds,
        )
        eng = CrawlEngine(
            spark, pages, gen_robots(spark, args.hosts), ckpt, cfg
        )
        t0 = time.time()
        if args.resume:
            history = eng.run(resume=True)
        else:
            history = eng.run(seeds=gen_seeds(spark, args.hosts))
        wall = time.time() - t0

        scheduled = sum(m["n_scheduled"] for m in history)
        discovered = sum(m["n_discovered"] for m in history)
        result = {
            "pages_in_store": n_pages,
            "rounds": len(history),
            "urls_scheduled": scheduled,
            "urls_discovered_deduped": discovered,
            "seen_set_size": len(eng.seen_set()),
            "wall_sec": round(wall, 2),
            "urls_per_sec": round((scheduled + discovered) / wall, 1),
            "bloom_false_positives": sum(
                m["bloom_false_positives"] for m in history
            ),
        }
        if args.check_oracle:
            from rsoup_spark.crawl.oracle import simulate

            graph = {
                r["url"]: list(r["out_links"])
                for r in pages.select("url", "out_links").collect()  # test-only
            }
            seeds_rows = gen_seeds(spark, args.hosts).collect()  # test-only
            want_order, want_seen = simulate(
                graph,
                [(r["url"], r["score"], r["depth"]) for r in seeds_rows],
                robots_rows(args.hosts),
                batch_size=cfg.batch_size,
                round_seconds=cfg.round_seconds,
                max_rounds=cfg.max_rounds,
            )
            result["oracle_order_match"] = eng.crawl_order() == want_order
            result["oracle_seen_match"] = eng.seen_set() == want_seen
        print(json.dumps(result))
    finally:
        spark.stop()
        if cleanup:
            shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
