"""Hardware-ceiling calibration for the scaling-efficiency target.

Pure-Python span extraction (no Spark) over the same synthetic pages,
run with ``multiprocessing`` at N and 4N processes::

    taskset -c 0-7 python tools/calibrate_mp.py 8
    python tools/calibrate_mp.py 32

The 8->32 throughput ratio / 4 is this VM's process-scaling ceiling
(memory-bandwidth droop + SMT-less core contention); Spark efficiency
above it is unreachable by construction.  Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, ".")


def render_chunk(args):
    lo, hi = args
    from rsoup_spark.crawl.fixtures import render_page

    return [
        render_page(0, j, 32, hi, 1, 8, 42)[2] for j in range(lo, hi)
    ]


def extract_chunk(htmls):
    from rsoup_spark.operators.extract import spans_from_html

    n = 0
    for h in htmls:
        n += len(spans_from_html("https://c.test/x", h))
    return n


def main() -> None:
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pages_per_proc = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    chunks_n = procs * 4  # same 4-tasks-per-core layout as the bench
    per_chunk = max(1, pages_per_proc * procs // chunks_n)
    bounds = [(i * per_chunk, (i + 1) * per_chunk) for i in range(chunks_n)]

    with mp.Pool(procs) as pool:
        htmls = pool.map(render_chunk, bounds)
        # warm
        pool.map(extract_chunk, htmls)
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            pool.map(extract_chunk, htmls)
            runs.append(time.time() - t0)
    total = sum(len(c) for c in htmls)
    best = min(runs)
    print(json.dumps({
        "procs": procs,
        "pages": total,
        "best_sec": round(best, 2),
        "runs": [round(r, 2) for r in runs],
        "docs_per_sec": round(total / best, 1),
    }))


if __name__ == "__main__":
    main()
