"""Hot-key chunk-stitch evidence (round-9 verdict item 3).

The skew probe (tools/skew_probe.py) showed a hot key's ordered window
is LINEAR in one task; this probe measures the single-task CEILING that
linearity hits — every row in ONE key, so the whole window serializes
through one thread — and the n_chunks= chunk-stitch breaking it
(n_chunks-way parallel per key, exact output; see operators/window.py
`_ordered_chunk_stitch` and operators/asof.py `n_chunks`).

Usage: python tools/chunk_probe.py [sf_dir] (default /root/repo/.tmp/sf1)
Env:   SPARK_GRAFT_PROBE_REPS (default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_table_spark import get_spark
from data_table_spark.core import DT
from data_table_spark.operators.asof import asof_join
from data_table_spark.operators.window import froll


def force(sdf) -> tuple[int, int]:
    cols = [
        F.to_json(F.col(c)) if t.startswith("map<") else F.col(c)
        for c, t in sdf.dtypes
    ]
    r = sdf.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(1000003))).alias("h"),
    ).collect()[0]
    return r["n"], r["h"]


def med(fn, reps: int) -> tuple[float, tuple[int, int]]:
    samples, out = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = force(fn())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2], out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.tmp/sf1"
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))
    spark = get_spark("chunk-probe")
    spark.sparkContext.setLogLevel("ERROR")

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.lit(1).alias("u"),  # EVERY row in one key: the wall case
            F.col("event_id").cast("long").alias("eid"),
            F.col("value").cast("double").alias("value"),
        )
    )
    n_rows = ev.count()
    print(f"# {n_rows} rows, ALL in one window partition", flush=True)

    dt = DT(ev, order_by=["eid"])
    for nc in (None, 32):
        t, out = med(
            lambda nc=nc: froll(
                dt, "mean", "value", 100, by=["u"], order=["eid"],
                n_chunks=nc,
            ).df,
            reps,
        )
        print(f"froll_mean n=100 n_chunks={nc}: {t:.2f}s {out}", flush=True)

    x = ev.filter(F.col("eid") % 10 == 0).withColumnRenamed("value", "xv")
    i = ev.filter(F.col("eid") % 10 != 0)
    xdt, idt = DT(x, order_by=["eid"]), DT(i, order_by=["eid"])
    for nc in (None, 32):
        t, out = med(
            lambda nc=nc: asof_join(
                xdt, idt, on=["u"], time_x="eid", time_i="eid",
                roll="nearest", n_chunks=nc,
            ).df,
            reps,
        )
        print(f"asof nearest n_chunks={nc}: {t:.2f}s {out}", flush=True)

    # r9-continuation family members: ranking and run numbering
    from data_table_spark.operators.window import frank, rleid

    # duplicate-heavy rank column (ties exercise the offset arithmetic)
    rdt = DT(
        ev.withColumn("rv", F.pmod(F.xxhash64("eid"), F.lit(100000)).cast("double")),
        order_by=["eid"],
    )
    for nc in (None, 32):
        t, out = med(
            lambda nc=nc: frank(
                rdt, "rv", ties="average", by=["u"], n_chunks=nc
            ).df,
            reps,
        )
        print(f"frank average n_chunks={nc}: {t:.2f}s {out}", flush=True)

    # ~1000-row runs (boundary-straddling at any chunking)
    ldt = DT(
        ev.withColumn(
            "runv", (F.col("eid") / 1000).cast("long").cast("string")
        ),
        order_by=["eid"],
    )
    for nc in (None, 32):
        t, out = med(
            lambda nc=nc: rleid(
                ldt, "runv", by=["u"], order=["eid"], n_chunks=nc
            ).df,
            reps,
        )
        print(f"rleid runs n_chunks={nc}: {t:.2f}s {out}", flush=True)

    # r10 family members: adaptive rolling (running-triple carry for
    # sum, halo sparse-table stitch for extrema) and arbitrary-fn
    # frollapply (halo stitch + the Arrow UDF parallelizing with the
    # chunks — the UDF is the wall here, so the win is pure Python
    # parallelism)
    from data_table_spark.operators.window import frolladaptive, frollapply

    adt = DT(
        ev.withColumn("nw", (F.pmod(F.col("eid"), F.lit(50)) + 1).cast("int")),
        order_by=["eid"],
    )
    for fun in ("sum", "max"):
        for nc in (None, 32):
            t, out = med(
                lambda nc=nc, fun=fun: frolladaptive(
                    adt, "value", "nw", by=["u"], order=["eid"], fun=fun,
                    n_chunks=nc,
                ).df,
                reps,
            )
            print(
                f"frolladaptive {fun} n<=50 n_chunks={nc}: {t:.2f}s {out}",
                flush=True,
            )

    for nc in (None, 32):
        t, out = med(
            lambda nc=nc: frollapply(
                dt, "value", 25, lambda a: float(max(a)), by=["u"],
                order=["eid"], n_chunks=nc,
            ).df,
            reps,
        )
        print(f"frollapply max n=25 n_chunks={nc}: {t:.2f}s {out}", flush=True)


if __name__ == "__main__":
    main()
