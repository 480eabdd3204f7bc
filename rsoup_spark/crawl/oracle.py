"""Single-process oracle crawler.

Implements the exact round semantics of ``frontier.CrawlEngine`` (the
numbered spec in its module docstring) over the ground-truth link graph,
in plain Python.  The engine's crawl order and final seen set must equal
this simulator's output under the same seeds, robots, and politeness
budget (BASELINE.json correctness clause).  rsoup itself has no crawler,
so this simulator *is* the reference behaviour we define and test
against (FIXTURES.md F6).
"""

from __future__ import annotations

import math
from urllib.parse import urlsplit

from .traps import template_of

DECAY = 0.85


def _pagerank_int(
    nodes: set[str], edges: set[tuple[str, str]], iters: int
) -> dict[str, int]:
    """Mirror of ops/graph.py:pagerank_int in plain Python: damping
    1/2, ranks scaled by 12**iters, floor division -- pure integer
    arithmetic, so engine and simulator agree exactly."""
    scale = 12 ** iters
    base = scale // 2
    outdeg: dict[str, int] = {}
    for s, _t in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: scale for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, t in edges:
            nxt[t] += ranks[s] // (2 * outdeg[s])
        ranks = nxt
    return ranks


def simulate(
    graph: dict[str, list[str]],
    seeds: list[tuple[str, float, int]],
    robots: list[tuple[str, list[str], float]],
    batch_size: int = 64,
    round_seconds: float = 10.0,
    max_rounds: int = 50,
    score_mode: str = "decay",
    pr_iters: int = 3,
    expire_events: list[list[str]] | None = None,
    template_budget: int | None = None,
) -> tuple[list[tuple[int, int, str]], set[str]]:
    """-> (crawl order [(round, rank, url)], final seen set).

    ``graph`` maps canonical url -> canonical out-links (missing key =
    fetch miss).  ``seeds`` are (url, score, depth).  ``score_mode``
    mirrors CrawlConfig: "pagerank" re-scores the whole frontier at the
    end of each round from integer PageRank over the edges discovered
    so far.

    ``template_budget`` mirrors CrawlConfig.template_budget: per
    (host, url-template) lifetime schedule caps (crawl/traps.py
    masking), exhausted templates dropping from the frontier for good
    and within-round admission rationed to the remaining budget in
    priority order.

    ``expire_events`` mirrors run-to-done -> ``engine.expire(victims)``
    -> ``engine.run(resume=True)`` cycles: each time the crawl drains,
    the next victim list is expired (dropped from seen, re-enqueued at
    depth 0 with the engine's default re-enqueue score) and the crawl
    continues, with the round horizon extended past ``max_rounds``
    exactly as the engine's resume does.
    """
    # rows are (host, disallow, delay) or (host, disallow, delay, allow)
    budgets = {
        row[0]: max(1, math.floor(round_seconds / row[2]))
        for row in robots
    }
    disallow = {row[0]: row[1] for row in robots}
    allow = {row[0]: (row[3] if len(row) > 3 else []) for row in robots}

    def host_of(url: str) -> str:
        return urlsplit(url).netloc.lower()

    def is_blocked(url: str) -> bool:
        # RFC 9309 longest-match-wins, allow winning ties (mirrors the
        # frontier's JVM gate expression)
        path = urlsplit(url).path or "/"
        host = host_of(url)
        dmax = max(
            (len(p) for p in disallow.get(host, []) if path.startswith(p)),
            default=-1,
        )
        amax = max(
            (len(p) for p in allow.get(host, []) if path.startswith(p)),
            default=-1,
        )
        return dmax > amax

    # per-(host, template) lifetime schedule counts (budget mode)
    tpl_counts: dict[tuple[str, str], int] = {}

    # frontier: url -> (depth, score)
    frontier = {u: (d, s) for u, s, d in seeds}
    seen = {u for u, _s, _d in seeds}
    order: list[tuple[int, int, str]] = []
    edges: set[tuple[str, str]] = set()
    pending_expiries = list(expire_events or [])
    reenqueue_score = (
        float(12 ** pr_iters) if score_mode == "pagerank" else 1.0
    )

    # expired_mode mirrors the engine's has_log('expired', r-1): once
    # any expiry happened, discovered urls best-priority-MERGE into the
    # carried frontier (a re-enqueued victim rediscovered by a link
    # must keep its depth-0 seed priority, not be overwritten)
    expired_mode = False

    def apply_expiry() -> None:
        nonlocal expired_mode
        victims = pending_expiries.pop(0)
        seen.difference_update(victims)
        for v in victims:
            d, s = frontier.get(v, (1 << 30, -1.0))
            frontier[v] = (min(d, 0), max(s, reenqueue_score))
        expired_mode = True

    end = max_rounds
    r = 0
    while True:
        if r >= end:
            if not pending_expiries:
                break
            # engine.expire(victims) at the round cap: resume extends
            # the horizon by another max_rounds window (frontier.run,
            # gated on the expired log) and continues with round r+1
            apply_expiry()
            end = r + max_rounds
        r += 1
        # 1. robots gate: blocked urls leave the frontier permanently
        allowed = {
            u: ds for u, ds in frontier.items() if not is_blocked(u)
        }

        # 1b. per-template trap rationing (engine step 1b): exhausted
        # templates leave the frontier for good; within a round only
        # the remaining budget's best-priority urls per template are
        # eligible, the rest stay queued (budget is consumed by actual
        # schedules below, which the batch limit may cut)
        if template_budget is not None:
            by_tpl: dict[tuple[str, str], list[str]] = {}
            for u in allowed:
                by_tpl.setdefault(template_of(u), []).append(u)
            admitted: set[str] = set()
            exhausted: set[str] = set()
            for key, urls in by_tpl.items():
                rem = template_budget - tpl_counts.get(key, 0)
                if rem <= 0:
                    exhausted.update(urls)
                    continue
                urls.sort(key=lambda u: (-allowed[u][1], allowed[u][0], u))
                admitted.update(urls[:rem])
            carry_allowed = {
                u: ds for u, ds in allowed.items() if u not in exhausted
            }
            sched_pool = {
                u: ds for u, ds in allowed.items() if u in admitted
            }
        else:
            carry_allowed = allowed
            sched_pool = allowed

        # 2. per-host budget, priority (score desc, depth asc, url asc)
        by_host: dict[str, list[str]] = {}
        for u in sched_pool:
            by_host.setdefault(host_of(u), []).append(u)
        eligible = []
        for host, urls in by_host.items():
            urls.sort(key=lambda u: (-allowed[u][1], allowed[u][0], u))
            eligible.extend(urls[: budgets.get(host, 1)])

        # 3. global deterministic batch
        eligible.sort(key=lambda u: (-allowed[u][1], allowed[u][0], u))
        scheduled = eligible[:batch_size]
        if not scheduled:
            if not pending_expiries:
                break
            # engine.expire(victims) at the drained round r, then
            # engine.run(resume=True): seen forgets the victims, they
            # re-enter the frontier at depth 0 with the default
            # re-enqueue score (merged best-priority against anything
            # already queued), and resume gets a fresh round window
            # when the crawl drained at the cap.
            apply_expiry()
            if r >= end:
                end = r + max_rounds
            continue
        for rank, u in enumerate(scheduled, start=1):
            order.append((r, rank, u))
        if template_budget is not None:
            # budget is consumed by actual schedules only (engine's
            # tpl_counts append)
            for u in scheduled:
                k = template_of(u)
                tpl_counts[k] = tpl_counts.get(k, 0) + 1
        # recrawl path: a re-enqueued victim is scheduled while absent
        # from seen; crawling re-seens it (no-op for a plain crawl,
        # where scheduled is always a subset of seen)
        seen.update(scheduled)

        # 4.-5. fetch + harvest (ground-truth out-links)
        discovered: dict[str, tuple[int, float]] = {}
        for u in scheduled:
            pd_, ps = allowed[u]
            for target in graph.get(u, []):
                d, s = discovered.get(target, (1 << 30, -1.0))
                discovered[target] = (
                    min(d, pd_ + 1),
                    max(s, round(ps * DECAY, 9)),
                )

        # 6. dedup against seen
        new_urls = {
            u: ds for u, ds in discovered.items() if u not in seen
        }

        # 7. next state
        sched = set(scheduled)
        frontier = {
            u: ds for u, ds in carry_allowed.items() if u not in sched
        }
        if expired_mode:
            # mirror the engine's post-expiry groupBy(min depth,
            # max score) over the union of carried + discovered
            for u, (d, s) in new_urls.items():
                if u in frontier:
                    d0, s0 = frontier[u]
                    frontier[u] = (min(d0, d), max(s0, s))
                else:
                    frontier[u] = (d, s)
        else:
            frontier.update(new_urls)
        seen.update(new_urls)

        if score_mode == "pagerank":
            for u in scheduled:
                for target in graph.get(u, []):
                    edges.add((u, target))
            nodes = {s for s, _t in edges} | {t for _s, t in edges}
            nodes |= set(frontier)
            pr = _pagerank_int(nodes, edges, pr_iters)
            base = 12 ** pr_iters // 2
            frontier = {
                u: (d, float(pr.get(u, base)))
                for u, (d, _s) in frontier.items()
            }

    return order, seen
