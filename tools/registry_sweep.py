"""Full-registry wall-clock sweep: time EVERY declared query once (or
--reps N times, median) at one SF with bench.py's exact timed action
(count + xxhash64 full-width reduction), sorted slowest-first.

This is the round-14 "find the next target" instrument: the headline-20
bench covers one query per family, but the slowest queries in the
registry (cogroup_udtf, the streaming screens, pq/ivfpq) were NOT in
the headline set — a full sweep is the only way to rank the real tail.

Usage: python tools/registry_sweep.py [sf_dir] [--reps N] [q1 q2 ...]
Output: one line per query `<sec>\t<name>` slowest-first, plus a JSON
line for machine diffing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force_count, _release_persisted  # same timed action as the bench
from data_table_spark import get_spark
from data_table_spark.queries import QUERIES


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        if i + 1 >= len(args):
            sys.exit("usage: registry_sweep.py [sf_dir] [--reps N] [q1 q2 ...]")
        reps = int(args[i + 1])
        del args[i : i + 2]
    # a path-looking first arg that is NOT a directory is a typo, not a
    # query name — fail loudly instead of sweeping a query called "/rooot/…"
    if args and ("/" in args[0] or args[0].startswith(".")) and not os.path.isdir(args[0]):
        sys.exit(f"not a directory: {args[0]}")
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    names = names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"# UNKNOWN (skipped): {' '.join(unknown)}", flush=True)
        names = [n for n in names if n in QUERIES]

    spark = get_spark("registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    force_count(QUERIES["gforce_q1"](spark, sf_dir))  # warm-up, untimed

    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"sweep: {name}")
            t0 = time.perf_counter()
            try:
                force_count(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 — record and move on
                print(f"# FAILED {name}: {e}", flush=True)
                samples = []
                break
            finally:
                spark.sparkContext.setJobDescription(None)
        # same between-entries checkpoint-block hygiene as bench.py
        # (r15): without it a long one-session sweep contaminates later
        # entries up to 5x (OPTIMIZATION_r14.md re-opened session)
        _release_persisted(spark)
        if samples:
            samples.sort()
            med = samples[len(samples) // 2]
            out[name] = round(med, 3)
            print(f"# {name}: {out[name]}s", flush=True)

    for name, sec in sorted(out.items(), key=lambda kv: -kv[1]):
        print(f"{sec:8.3f}\t{name}")
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out}))


if __name__ == "__main__":
    main()
