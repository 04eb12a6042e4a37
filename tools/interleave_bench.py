"""Interleaved A/B benchmark: alternate two trees' implementations of the
same queries INSIDE ONE Spark session, so ambient load hits both sides
equally (the only method that produces trustworthy tree-vs-tree ratios
on a noisy box — NOTES_r2 §10, NOTES_r4).

Usage: python tools/interleave_bench.py <tree_a> <tree_b> [sf_dir] [reps]

Loads each tree's `data_table_spark.queries.QUERIES` under its own
import root (sys.path swap + module cache purge per load), times the
COMMON headline queries rep-interleaved (A,B,A,B,...), and prints a
markdown table of per-query medians and the B/A ratio.
"""

from __future__ import annotations

import importlib
import sys
import time

HEADLINE = [
    "gforce_q1", "join_inner", "merge_full", "uniqueN_by",
    "shift_lag_lead", "froll_mean_sum", "asof_roll_backward",
    "foverlaps_any", "dcast_pivot", "ghead_per_group", "dedup_exact",
    "minhash_lsh_pairs", "ann_cosine_topk", "text_quality",
]

# focused A/B: a comma-separated SPARK_GRAFT_INTERLEAVE_QUERIES
# overrides the default list (r14 — the optimization-round queries are
# not all in the legacy-14 set)
import os as _os

if _os.environ.get("SPARK_GRAFT_INTERLEAVE_QUERIES"):
    HEADLINE = [
        q.strip()
        for q in _os.environ["SPARK_GRAFT_INTERLEAVE_QUERIES"].split(",")
        if q.strip()
    ]


def _purge():
    for mod in list(sys.modules):
        if mod.startswith("data_table_spark"):
            del sys.modules[mod]


def load_tree(tree: str):
    """Import a tree's registry and SNAPSHOT its module graph. Query
    functions lazy-import relatively at call time; installing the
    snapshot into sys.modules around each timed call guarantees those
    imports resolve inside the SAME tree (a bare cache purge would let
    tree A's lazy imports re-import tree B's modules via sys.path)."""
    _purge()
    sys.path.insert(0, tree)
    try:
        q = dict(importlib.import_module("data_table_spark.queries").QUERIES)
        snap = {
            n: m for n, m in sys.modules.items()
            if n.startswith("data_table_spark")
        }
        return q, snap
    finally:
        sys.path.remove(tree)


def _install(snap, tree):
    _purge()
    sys.modules.update(snap)
    if sys.path[0] != tree:
        sys.path.insert(0, tree)


def _uninstall(tree):
    if sys.path and sys.path[0] == tree:
        sys.path.pop(0)


def main():
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    qa, snap_a = load_tree(tree_a)
    qb, snap_b = load_tree(tree_b)
    common = [n for n in HEADLINE if n in qa and n in qb]

    _install(snap_b, tree_b)
    from data_table_spark import get_spark

    spark = get_spark("interleave-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    _uninstall(tree_b)

    results: dict[str, tuple[float, float]] = {}
    for name in common:
        ta, tb = [], []
        broken = False
        for _ in range(reps):
            for fn, acc, snap, tree in (
                (qa[name], ta, snap_a, tree_a),
                (qb[name], tb, snap_b, tree_b),
            ):
                _install(snap, tree)
                try:
                    t0 = time.perf_counter()
                    df = fn(spark, sf_dir)
                    # forcing action (round 8): bare count() lets
                    # Catalyst prune Window operators — see bench.py
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
                    acc.append(time.perf_counter() - t0)
                except Exception as e:
                    # one broken query (e.g. an older tree missing a
                    # column) must not discard every other measurement
                    print(f"# {name}: FAILED in {tree}: {e}",
                          file=sys.stderr)
                    broken = True
                    break
                finally:
                    _uninstall(tree)
                    # same between-reps checkpoint-block hygiene as
                    # bench.py (r15): at sf1 a single jaccard rep
                    # leaves ~2.6M rows of lazy-localCheckpoint blocks
                    # behind; 10 interleaved reps without release made
                    # LATER reps 3-6x slower than an isolated warm run,
                    # poisoning both sides' medians (outside the timed
                    # region, applied identically to A and B)
                    df = sdf = None
                    jmap = spark.sparkContext._jsc.getPersistentRDDs()
                    for rid in list(jmap.keySet().toArray()):
                        rdd = jmap.get(rid)
                        if rdd is not None:
                            rdd.unpersist(False)
            if broken:
                break
        if broken or not ta or not tb:
            continue
        med = lambda xs: sorted(xs)[len(xs) // 2]
        results[name] = (med(ta), med(tb))
        print(
            f"# {name}: A {results[name][0]:.2f}s B {results[name][1]:.2f}s",
            file=sys.stderr, flush=True,
        )

    print("| query | A med | B med | B/A |")
    print("|---|---|---|---|")
    tot_a = tot_b = 0.0
    for name, (ma, mb) in results.items():
        tot_a += ma
        tot_b += mb
        print(f"| {name} | {ma:.2f}s | {mb:.2f}s | {mb / ma:.2f}x |")
    print(
        f"| **common total** | **{tot_a:.2f}** | **{tot_b:.2f}** "
        f"| **{tot_b / tot_a:.2f}x** |"
    )


if __name__ == "__main__":
    main()
