"""Skewed-key evidence for ORDERED operators (VERDICT r6 item 4).

Grouped aggregates shrug off key skew (partial agg + AQE skew split),
but ordered operators — as-of join, rolling windows, shift — compile to
``Window.partitionBy(key).orderBy(time)``: one key's rows MUST meet in
one task to be ordered, so a hot key serializes through one thread and
AQE cannot split it (splitting would break the frame).

This probe measures that cliff instead of guessing: it rewrites the sf1
events table so ONE user owns ~10% of all rows (hot-key remap; all
other columns untouched), then times the events-only ordered queries on
the uniform vs the skewed table, medians of N in one warm session.

Usage: python tools/skew_probe.py [sf_dir] [out_dir]
       (defaults /root/repo/.tmp/sf1  /root/repo/.tmp/sf1_skew)
Env:   SPARK_GRAFT_PROBE_REPS (default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_table_spark import get_spark
from data_table_spark.queries import QUERIES

PROBES = ["asof_roll_backward", "froll_mean_sum", "shift_lag_lead"]


def make_skewed(spark, src: str, dst: str) -> None:
    """~10% of rows get user_id = 1; the rest keep theirs. Deterministic
    (md5 of event_id), no sampling."""
    ev = spark.read.parquet(f"{src}/events.parquet")
    hot = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
    skewed = ev.withColumn(
        "user_id",
        F.when(hot.cast("long") % 10 == 0, F.lit(1).cast("long"))
        .otherwise(F.col("user_id").cast("long")),
    )
    skewed.write.mode("overwrite").parquet(f"{dst}/events.parquet")


def median_time(spark, name: str, sf_dir: str, reps: int) -> tuple[float, int]:
    fn = QUERIES[name]
    samples, n = [], 0
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        sdf = df.df if hasattr(df, "df") else df
        # NOT count(): a count() prunes the window expressions (row
        # count is window-invariant), which is exactly the work the
        # skew question is about. A full-width hash reduction forces
        # every output column to be computed.
        cols = [  # xxhash64 rejects MapType; to_json maps
            F.to_json(F.col(c)) if t.startswith("map<") else F.col(c)
            for c, t in sdf.dtypes
        ]
        row = sdf.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64(*cols), F.lit(1000003))).alias("h"),
        ).collect()[0]
        n = row["n"]
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2], n


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.tmp/sf1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp/sf1_skew"
    reps = max(1, int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3")))
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{dst}/events.parquet"):
        make_skewed(spark, src, dst)
    ev = spark.read.parquet(f"{dst}/events.parquet")
    total = ev.count()
    hot = ev.filter(F.col("user_id") == 1).count()
    print(f"# skewed events: {total} rows, hot user owns {hot} "
          f"({100.0 * hot / total:.1f}%)")

    for name in PROBES:
        tu, nu = median_time(spark, name, src, reps)
        ts_, ns = median_time(spark, name, dst, reps)
        print(f"{name}: uniform {tu:.2f}s ({nu} rows) | "
              f"skewed {ts_:.2f}s ({ns} rows) | ratio {ts_ / tu:.2f}x")


if __name__ == "__main__":
    main()
