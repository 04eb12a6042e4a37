"""Scaling probe: time representative queries at sf0.001/0.01/0.1 and
print the per-SF curve. Scan-bound operators should scale near-linearly
with input size once past fixed Spark overhead (~0.2-0.5s/query at
local[32]); super-linear growth flags a pair-explosion or a
single-reducer choke.

Usage: python tools/scaling_probe.py [q1 q2 ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

DEFAULT = [
    "gforce_q1", "join_inner", "shift_lag_lead", "asof_roll_backward",
    "ngram_jaccard_pairs", "minhash_lsh_pairs", "ann_cosine_topk",
    "text_quality",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]


def main():
    from data_table_spark import get_spark
    from data_table_spark.queries import QUERIES

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SFS[0]}/nation.parquet").count()  # warm-up

    print(f"| query | sf0.001 | sf0.01 | sf0.1 | 0.1/0.01 ratio |")
    print("|---|---|---|---|---|")
    for name in names:
        fn = QUERIES[name]
        ts = []
        for sf in SFS:
            t0 = time.perf_counter()
            df = fn(spark, sf)
            (df.df if hasattr(df, "df") else df).count()
            ts.append(time.perf_counter() - t0)
        ratio = ts[2] / ts[1] if ts[1] > 0 else float("nan")
        print(
            f"| {name} | {ts[0]:.2f}s | {ts[1]:.2f}s | {ts[2]:.2f}s "
            f"| {ratio:.1f}x |"
        )


if __name__ == "__main__":
    main()
