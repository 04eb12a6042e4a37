"""Compute the next driver-window ``_PRIORITY`` list from evidence history.

The driver's correctness gate checks the FIRST 50 registration-order
entries of ``__spark_entry__.queries()``. Rotating that window by hand
caused the round-6 freshness overclaim (VERDICT r6 "What's wrong" item
1), so this tool derives it mechanically:

1. every name passed via ``--new`` (queries added or semantically
   changed this round — they need a fresh driver row no matter what);
2. registered queries with NO driver row in any CORRECTNESS_r*.json;
3. remaining slots filled oldest-latest-evidence first (ascending
   round, alphabetical within a round) so staleness monotonically
   retires.

Usage:
    python tools/rotate_window.py [--new q1,q2,...] [--slots 50]

Prints the Python list literal to paste into ``__spark_entry__.py``
plus a freshness histogram for the round notes.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_evidence() -> dict[str, int]:
    """Map query name -> latest round with a driver row (green or red)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    from data_table_spark.queries import QUERIES

    return list(QUERIES)


def next_window(new: list[str], slots: int) -> tuple[list[str], dict[str, int]]:
    latest = latest_evidence()
    names = registry_names()
    window: list[str] = []
    for q in new:
        if q not in names:
            raise SystemExit(f"--new query {q!r} is not in the registry")
        if q not in window:
            window.append(q)
    never = sorted(q for q in names if q not in latest and q not in window)
    window.extend(never)
    backlog = sorted(
        (q for q in names if q in latest and q not in window),
        key=lambda q: (latest[q], q),
    )
    window.extend(backlog[: max(0, slots - len(window))])
    return window[:slots], latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", default="", help="comma-separated new/changed queries")
    ap.add_argument("--slots", type=int, default=50)
    args = ap.parse_args()
    new = [q for q in args.new.split(",") if q]
    window, latest = next_window(new, args.slots)

    hist: dict[int, int] = {}
    for q in registry_names():
        hist[latest.get(q, 0)] = hist.get(latest.get(q, 0), 0) + 1
    print("# latest-evidence histogram (0 = never driver-checked):")
    for rnd in sorted(hist):
        print(f"#   r{rnd}: {hist[rnd]}")
    after = {q: latest.get(q, 0) for q in registry_names() if q not in window}
    floor = min(after.values()) if after else None
    print(f"# window covers {len(window)} slots; oldest row left outside: r{floor}")
    # POST-window histogram: what the freshness state will be AFTER the
    # driver runs this window (window rows become r<next>). Paste THIS
    # into notes — never hand-compute the tail (r6 and r8 both got the
    # hand-computed number wrong).
    next_rnd = max(latest.values(), default=0) + 1
    post: dict[int, int] = {}
    for q in registry_names():
        rnd = next_rnd if q in window else latest.get(q, 0)
        post[rnd] = post.get(rnd, 0) + 1
    print(f"# POST-window histogram (window rows counted as r{next_rnd}):")
    for rnd in sorted(post):
        print(f"#   r{rnd}: {post[rnd]}")
    print("_PRIORITY = [")
    for q in window:
        tag = "new" if q in new else ("never" if latest.get(q) is None else f"r{latest[q]}")
        print(f'    "{q}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
