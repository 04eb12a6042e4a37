"""Scaling probe: time representative queries at sf0.001/0.01/0.1 and
print the per-SF curve. Scan-bound operators should scale near-linearly
with input size once past fixed Spark overhead (~0.2-0.5s/query at
local[32]); super-linear growth flags a pair-explosion or a
single-reducer choke.

Usage: python tools/scaling_probe.py [q1 q2 ...]
Env:   SPARK_GRAFT_SFS  comma-separated SF dirs (default the three
       driver SFs; add e.g. /root/repo/.tmp/sf1 from
       tools/make_scale_data.py for a dynamic point above sf0.1)
       SPARK_GRAFT_PROBE_REPS  reps per (query, sf); median reported
       (default 1 for backward compatibility).

Timing action (fixed round 8, same find as bench.py): a bare count()
lets Catalyst PRUNE Window operators — row count is window-invariant —
so window-shaped queries probed as flat scan time at every SF. The
action is now count + sum(xxhash64(all columns) % p), forcing every
output column. Curves recorded before round 8 under-measure the
window-shaped rows; join/agg rows are unaffected.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

DEFAULT = [
    "gforce_q1", "join_inner", "shift_lag_lead", "asof_roll_backward",
    "ngram_jaccard_pairs", "minhash_lsh_pairs", "ann_cosine_topk",
    "text_quality",
]

SFS = os.environ.get(
    "SPARK_GRAFT_SFS",
    "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1",
).split(",")


def main():
    from data_table_spark import get_spark
    from data_table_spark.queries import QUERIES

    names = sys.argv[1:] or DEFAULT
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "1"))
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SFS[0]}/nation.parquet").count()  # warm-up

    labels = [os.path.basename(s.rstrip("/")) for s in SFS]
    print("| query | " + " | ".join(labels) + " | last/prev ratio |")
    print("|---|" + "---|" * (len(SFS) + 1))
    for name in names:
        fn = QUERIES[name]
        ts = []
        for sf in SFS:
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, sf)
                sdf = df.df if hasattr(df, "df") else df
                from pyspark.sql import functions as F

                cols = [  # xxhash64 rejects MapType; to_json maps
                    F.to_json(F.col(c)) if t.startswith("map<") else F.col(c)
                    for c, t in sdf.dtypes
                ]
                sdf.select(
                    F.count(F.lit(1)),
                    F.sum(F.pmod(F.xxhash64(*cols), F.lit(1000003))),
                ).collect()
                samples.append(time.perf_counter() - t0)
            ts.append(sorted(samples)[len(samples) // 2])
        ratio = (
            ts[-1] / ts[-2] if len(ts) >= 2 and ts[-2] > 0 else float("nan")
        )
        cells = " | ".join(f"{t:.2f}s" for t in ts)
        print(f"| {name} | {cells} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
