"""Regenerate ATTESTATION.md and print the stalest-first queries() order.

The driver gate (CORRECTNESS_r{N}.json) attests only the first ~50 keys
of __spark_entry__.queries() each round; with 112 contract queries, full
coverage takes 3 rounds — but ONLY if the key order rotates. This tool
implements the rotation discipline recorded in ATTESTATION.md:

1. last driver-green round per query, from every CORRECTNESS_r{N}.json
   (err == null counts as green);
2. stalest group first, cheapest-first within a group (BENCH_DETAIL
   sf0.1 medians, 0.5 s default for unmeasured queries);
3. never-attested (new) queries lead — UNLESS the stale backlog exceeds
   the budget (pass --defer-new), in which case they queue just behind
   the stale block so the gate lands entirely on stale evidence;
4. rewrite the per-query table in ATTESTATION.md.

Usage: python tools/attestation.py [--budget 50] [--defer-new]
Prints the recommended key order; the queries() dict in
__spark_entry__.py is then reordered by hand (it carries per-group
comments the tool should not clobber).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history() -> tuple[dict[str, int], dict[str, list[int]]]:
    last_green: dict[str, int] = {}
    greens: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        n = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for q, v in json.load(open(path)).items():
            if v.get("err") is None:
                last_green[q] = max(last_green.get(q, 0), n)
                greens.setdefault(q, []).append(n)
    return last_green, greens


def bench_cost() -> dict[str, float]:
    try:
        detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
        return dict(detail.get("queries", {}))
    except OSError:
        return {}


def recommended_order(budget: int, defer_new: bool) -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    keys = list(entry_mod.queries())
    last_green, _ = load_history()
    cost = bench_cost()

    def group(k: str) -> int:
        return last_green.get(k, 0)  # 0 = never attested

    new = sorted(
        (k for k in keys if group(k) == 0), key=lambda k: (cost.get(k, 0.5), k)
    )
    old = sorted(
        (k for k in keys if group(k) > 0),
        key=lambda k: (group(k), cost.get(k, 0.5), k),
    )
    if not defer_new or not old:
        return new + old
    # Stale backlog mode: everything staler than the freshest group goes
    # first, then the new queries, then the freshest group.
    freshest = max(group(k) for k in old)
    stale = [k for k in old if group(k) < freshest]
    fresh = [k for k in old if group(k) == freshest]
    return stale + new + fresh


def rewrite_table(order: list[str]) -> None:
    last_green, greens = load_history()
    path = os.path.join(REPO, "ATTESTATION.md")
    text = open(path).read()
    head = text.split("## Per-query last-green table", 1)[0]
    lines = [
        "## Per-query last-green table (queries() order)",
        "",
        "| # | query | last driver-green | attested rounds |",
        "|---|---|---|---|",
    ]
    for i, q in enumerate(order, 1):
        lg = f"r{last_green[q]}" if q in last_green else "never"
        rounds = ", ".join(f"r{g}" for g in greens.get(q, [])) or "—"
        lines.append(f"| {i} | `{q}` | {lg} | {rounds} |")
    open(path, "w").write(head + "\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--defer-new", action="store_true")
    ap.add_argument(
        "--current-order",
        action="store_true",
        help="regenerate the table for queries()'s CURRENT order instead "
        "of printing a recommendation",
    )
    args = ap.parse_args()
    if args.current_order:
        sys.path.insert(0, REPO)
        import __spark_entry__ as entry_mod

        order = list(entry_mod.queries())
    else:
        order = recommended_order(args.budget, args.defer_new)
    rewrite_table(order)
    last_green, _ = load_history()
    in_budget = order[: args.budget]
    stale_hit = sum(
        1
        for k in in_budget
        if last_green.get(k, 0) < max(last_green.values(), default=0)
    )
    try:
        print(
            f"# first {args.budget} keys cover {stale_hit} stale/new queries"
        )
        for k in order:
            print(k)
    except BrokenPipeError:  # e.g. piped through head
        pass


if __name__ == "__main__":
    main()
