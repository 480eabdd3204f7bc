"""Alternating A/B scaling ladder for the noisy-VM protocol.

The sandbox VM's throughput drifts 2-3x on minute timescales, so a
single best-of-N per parallelism level can land the two configs in
different speed regimes and produce any "efficiency" from 0.6 to 1.0.
This harness alternates pinned local[8] and local[32] runs back to
back (same box window), computes the N->4N efficiency per adjacent
A/B pair, and reports per-pair values plus the median and the
best-of-all-samples ratio.  Usage::

    python tools/scaling_ladder.py --pairs 3 --pages 24000 --repeat 2
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def run_cfg(master: str, pin: str | None, pages: int, repeat: int,
            extract_only: bool) -> dict:
    cmd = []
    if pin:
        cmd += ["taskset", "-c", pin]
    cmd += [sys.executable, "bench_crawl.py", "--master", master,
            "--pages", str(pages), "--repeat", str(repeat)]
    if extract_only:
        cmd.append("--extract-only")
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {cmd}: {out.stdout[-500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--pages", type=int, default=24000)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--sleep", type=int, default=15)
    args = ap.parse_args()

    results = []
    for i in range(args.pairs):
        a = run_cfg("local[8]", "0-7", args.pages, args.repeat,
                    args.extract_only)
        time.sleep(args.sleep)
        b = run_cfg("local[32]", None, args.pages, args.repeat,
                    args.extract_only)
        time.sleep(args.sleep)
        pair = {
            "pair": i,
            "extract_eff": round(
                a["extract_sec"] / b["extract_sec"] / 4, 3),
            "a_extract": a["extract_sec"],
            "b_extract": b["extract_sec"],
        }
        if not args.extract_only:
            pair["frontier_eff"] = round(
                a["frontier_sec"] / b["frontier_sec"] / 4, 3)
            pair["a_frontier"] = a["frontier_sec"]
            pair["b_frontier"] = b["frontier_sec"]
        pair["a_raw"], pair["b_raw"] = a, b
        results.append(pair)
        print(json.dumps({k: v for k, v in pair.items()
                          if k not in ("a_raw", "b_raw")}), flush=True)

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    summary = {
        "pages": results[0]["a_raw"]["pages"],
        "pairs": args.pairs,
        "extract_eff_median": med([p["extract_eff"] for p in results]),
        "extract_eff_best_ratio": round(
            min(p["a_extract"] for p in results)
            / min(p["b_extract"] for p in results) / 4, 3),
    }
    if not args.extract_only:
        summary["frontier_eff_median"] = med(
            [p["frontier_eff"] for p in results])
        summary["frontier_eff_best_ratio"] = round(
            min(p["a_frontier"] for p in results)
            / min(p["b_frontier"] for p in results) / 4, 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
