"""Dump `.explain("formatted")` for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] [query ...]
       (no query args = the bench HEADLINE set)

The judge-facing evidence files for optimization rounds: capture a
_before and _after per touched query (OPTIMIZATION_r*.md protocol).
"""

from __future__ import annotations

import io
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        from bench import HEADLINE
        names = list(HEADLINE)

    from data_table_spark import get_spark
    from data_table_spark.queries import QUERIES

    out_dir = f"plans/{tag}"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    executed = os.environ.get("SPARK_GRAFT_PLANS_EXECUTED", "") == "1"
    for name in names:
        df = QUERIES[name](spark, sf)
        sdf = df.df if hasattr(df, "df") else df
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            sdf.explain("formatted")
        path = f"{out_dir}/{name}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
            if executed:
                # AQE applies exchange/stage REUSE at runtime — it is
                # invisible in the static formatted plan. Execute the
                # query's own QueryExecution (collect, not a separate
                # noop-write QE) and append the final adaptive plan so
                # ReusedExchange claims are checkable from this file.
                sdf.collect()
                final = (
                    sdf._jdf.queryExecution().executedPlan().toString()
                    .split("== Initial Plan ==")[0]
                )
                fh.write("\n\n== Executed (final adaptive) plan ==\n")
                fh.write(final)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
