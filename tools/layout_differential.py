"""Input-layout differential: prove every declared query computes the
SAME result from the scan-parallel copy (bench.scan_parallel_copy —
each table split into contiguous row-range part files) as from the
original single-file testdata layout.

For each query the full-width value fingerprint (row count + sum of
pmod(xxhash64(all columns), p) — the driver-bench reduction, order-
insensitive) plus the dtypes are computed on BOTH layouts and
compared. This is the verification gate for the r15 bench layout
change: file boundaries are not allowed to change what any query
computes.

Usage: python tools/layout_differential.py [sf_dir] [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import scan_parallel_copy, _hashable_cols, _release_persisted
from data_table_spark import get_spark
from data_table_spark.queries import QUERIES


def fingerprint(sdf):
    from pyspark.sql import functions as F

    row = sdf.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*_hashable_cols(sdf)), F.lit(1000003))).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"], tuple(sdf.dtypes))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    names = [n for n in (names or list(QUERIES)) if n in QUERIES]

    split_dir, info = scan_parallel_copy(sf_dir)
    print(f"# split copy at {split_dir}: {info['n_parts']}", flush=True)
    spark = get_spark("layout-differential")
    spark.sparkContext.setLogLevel("ERROR")

    n_pass = n_fail = n_err = 0
    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            a = fingerprint(fn(spark, sf_dir))
            b = fingerprint(fn(spark, split_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}", flush=True)
            n_err += 1
            _release_persisted(spark)
            continue
        _release_persisted(spark)
        dt = time.perf_counter() - t0
        if a == b:
            n_pass += 1
            print(f"PASS {name}: n={a[0]} ({dt:.1f}s)", flush=True)
        else:
            n_fail += 1
            print(f"FAIL {name}: original={a[:2]} split={b[:2]}", flush=True)
    print(json.dumps({"pass": n_pass, "fail": n_fail, "err": n_err,
                      "sf_dir": sf_dir}))
    import shutil

    shutil.rmtree(split_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
