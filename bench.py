"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "total_headline_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is measured REPS (3) times and the per-query MEDIAN is
reported: one-shot numbers on this box carry +/-50% ambient noise
(NOTES_r2 §10 / NOTES_r4 measured a 20% total delta on byte-identical
code), and a median-of-3 in one session is the cheapest robust
estimator. Reps run back-to-back per query (plan compile amortizes into
rep 1; the median discards it when warm reps are faster, which is the
steady-state number a user sees). No per-query caching — every rep
re-scans parquet, so the real scan cost stays in.

Timing action — RE-BASELINED in round 8. Through BENCH_r07 the action
was ``df.count()``; Catalyst prunes Window operators under a bare
count (row count is window-invariant), so the window-shaped queries
(froll_mean_sum, shift_lag_lead, the window half of asof) were timing
a scan-only plan. The action is now a full-width reduction —
``count(*) + sum(xxhash64(all columns) % p)`` — which forces every
output column to be computed while still collecting one row. r8 window
-query numbers are therefore HIGHER than r7's for the honest reason;
cross-round continuity for the unaffected queries is unchanged and the
legacy-14 subtotal is emitted for the diff.

Input layout — CHANGED in round 15 (measurement fix, declared in
OPTIMIZATION_r15.md): the queries read a per-invocation scan-parallel
copy of the SF dir (each table split into contiguous row-range part
files) instead of the driver's single-file/single-row-group layout, so
scans parallelize the way any 100 TB input's thousands of splits
would, and the low-core scaling dimension becomes measurable. Same
rows, same schema, same results (full-registry layout differential);
rebuilt from the parquet inputs on every invocation, nothing persisted
across runs. SPARK_GRAFT_BENCH_LAYOUT=original restores the pre-r15
layout for continuity comparisons.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_table_spark import get_spark
from data_table_spark.queries import QUERIES

# Headline set: one per operator family, heaviest-shuffle variants chosen
# so the benchmark tracks the plans that matter at 100 TB.
HEADLINE = [
    "gforce_q1",          # full-scan group-agg (TPC-H Q1 shape)
    "join_inner",         # big-big equi join
    "merge_full",         # two-agg full outer merge
    "uniqueN_by",         # distinct-count per group
    "shift_lag_lead",     # ordered window over events
    "froll_mean_sum",     # rolling window
    "asof_roll_backward", # as-of (roll) join
    "foverlaps_any",      # interval overlap join
    "dcast_pivot",        # pivot
    "ghead_per_group",    # per-group head (top-k shape)
    "dedup_exact",        # exact dedup over documents
    "minhash_lsh_pairs",  # MinHash+LSH near-dup candidate pairs
    "ann_cosine_topk",    # brute-force cosine top-k
    "text_quality",       # text quality scoring
    # r8 additions (VERDICT r6 item 8) — newest operator families:
    "let_by_group",       # grouped := (fused window, single exchange)
    "transpose_medium",   # distributed transpose
    "stream_tumbling_agg",  # streaming micro-batch (tumbling window agg)
    "dup_ngram_spans",    # duplicated-span profile (substring-dedup family)
    "kmeans_clusters",    # deterministic Lloyd's k-means (iterative clustering)
    # r9 continuation addition:
    "line_dedup_boilerplate",  # line-level boilerplate removal (CCNet family)
]

# The headline set was 14 queries through BENCH_r07; the legacy subtotal
# is reported alongside so cross-round continuity stays one subtraction.
LEGACY14 = HEADLINE[:14]


def scan_parallel_copy(sf_dir: str, target_bytes: int = 512 << 10,
                       max_files: int = 32) -> tuple[str, dict]:
    """Per-invocation scan-parallel copy of the SF dir (round-15
    measurement fix, guide §1/§6 + VERDICT r14 item 2).

    Every driver-testdata parquet is ONE file with ONE row group, so a
    scan is ONE task no matter how many cores the driver grants —
    which (a) serializes the scan-side compute the way no 100 TB input
    ever would (thousands of splits there) and (b) blinds the driver's
    low-core scaling probe: overhead-bound sub-second queries read the
    same at 8 and 32 cores (`suspect_cpus_ignored` false positive,
    adjudicated in VERDICT r14). This rewrites each table as a
    directory of contiguous ROW-RANGE part files (~target_bytes each,
    capped at max_files; one row group per part), the layout the same
    data would have coming out of any real distributed writer. Rows,
    schema, and physical types are byte-identical (asserted below);
    only the file boundaries change, so every query computes the same
    result (verified by the r15 full-registry layout differential —
    OPTIMIZATION_r15.md).

    The copy is rebuilt from the parquet inputs on EVERY invocation
    into a fresh temp dir and deleted at exit: nothing is persisted or
    reused across runs, and no query work is precomputed — this is an
    input-layout fix, not caching. Set SPARK_GRAFT_BENCH_LAYOUT=original
    to bench the single-file layout instead (the pre-r15 series)."""
    import glob as _glob
    import math
    import tempfile

    import pyarrow.parquet as pq

    out_root = tempfile.mkdtemp(prefix="bench_scan_parallel_")
    n_parts: dict[str, int] = {}
    for path in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(path)
        if not os.path.isfile(path):  # already a directory table
            raise ValueError(f"not a single-file table: {path}")
        size = os.path.getsize(path)
        k = max(1, min(max_files, math.ceil(size / target_bytes)))
        t = pq.read_table(path)
        outdir = os.path.join(out_root, name)
        os.makedirs(outdir)
        step = max(1, math.ceil(t.num_rows / k)) if t.num_rows else 1
        i = 0
        off = 0
        while off == 0 or off < t.num_rows:
            piece = t.slice(off, step)
            pq.write_table(
                piece,
                os.path.join(outdir, f"part-{i:05d}.parquet"),
                row_group_size=max(piece.num_rows, 1),
                version="2.6",
                compression="snappy",
            )
            i += 1
            off += step
        n_parts[name] = i
        # physical-type safety: the rewrite must round-trip the exact
        # arrow schema (events.ts is TIMESTAMP(NANOS); decimals must
        # stay decimals) or the copy is not the same input
        got = pq.read_schema(os.path.join(outdir, "part-00000.parquet"))
        if got != t.schema:
            raise ValueError(f"schema drift rewriting {name}: {got} != {t.schema}")
    return out_root, {"mode": "scan_parallel", "n_parts": n_parts}


def _release_persisted(spark) -> int:
    """Unpersist every block-manager-resident RDD (bench-session
    hygiene, VERDICT r14 item 5): lazy localCheckpoints inside query
    paths leave their materialized blocks behind until ContextCleaner
    runs after a JVM GC, and accumulated blocks were measured to
    inflate LATER entries of a long one-session run (up to 5x in
    full-registry sweeps). Between bench entries nothing may
    legitimately stay persisted — every rep rebuilds its DataFrames —
    so an explicit, deterministic release beats waiting for GC.
    Returns the number of RDDs released (additive diagnostics)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    ids = list(jmap.keySet().toArray())
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)
    return len(ids)


def _hashable_cols(sdf):
    """xxhash64 rejects MapType; feed maps through to_json so a query
    emitting a map column is forced (and timed), not dropped as FAILED."""
    from pyspark.sql import functions as F

    return [
        F.to_json(F.col(c)) if t.startswith("map<") else F.col(c)
        for c, t in sdf.dtypes
    ]


def force_count(sdf) -> int:
    """Row count via a reduction that forces EVERY output column (see
    module docstring: a bare count() lets Catalyst prune Window
    operators). pmod bounds the per-row term so the 64-bit sum cannot
    overflow under ANSI mode."""
    from pyspark.sql import functions as F

    row = sdf.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*_hashable_cols(sdf)), F.lit(1000003))).alias("h"),
    ).collect()[0]
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # scan-parallel input layout (see scan_parallel_copy): default on;
    # SPARK_GRAFT_BENCH_LAYOUT=original restores the single-file series.
    # Any failure building the copy falls back to the original dir —
    # the bench line must come out either way.
    layout_mode = os.environ.get("SPARK_GRAFT_BENCH_LAYOUT", "split")
    data_dir, layout_info = sf_dir, {"mode": "original"}
    if layout_mode != "original":
        try:
            data_dir, layout_info = scan_parallel_copy(sf_dir)
        except Exception as e:  # pragma: no cover — defensive fallback
            print(f"# scan_parallel_copy failed ({e}); using {sf_dir}",
                  file=sys.stderr)
            data_dir, layout_info = sf_dir, {"mode": "original", "error": str(e)}
    spark = get_spark("data-table-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # session warm-up (JVM + codegen paths), excluded from timings. The
    # nation count alone was NOT enough: the first real aggregate query
    # still paid ~3s of codegen/scan warm-up, which made probe_start
    # read ~3-4x probe_end on an IDLE box (r8/r9 both) — i.e. the start
    # probe measured cold-start, not ambient load, defeating the
    # probe-pair's purpose. Run the probe query once untimed so both
    # probes measure the warm steady state.
    spark.read.parquet(f"{data_dir}/nation.parquet").count()
    force_count(QUERIES["gforce_q1"](spark, data_dir))

    # Ambient probes (VERDICT r6 item 2): the same fixed query timed once
    # at session start and once at session end, plus the session conf that
    # could move timings. BENCH_r06 read 1.54x r5 on byte-identical code;
    # with these in the artifact, a driver-side ambient shift is
    # measurable from the JSON itself (probe_end/probe_start far from 1
    # == the box moved under us mid-run).
    def probe() -> float:
        t0 = time.perf_counter()
        force_count(QUERIES["gforce_q1"](spark, data_dir))
        return round(time.perf_counter() - t0, 4)

    conf_keys = [
        "spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled",
        "spark.driver.memory", "spark.driver.maxResultSize",
        "spark.sql.files.maxPartitionBytes", "spark.master",
    ]
    conf = {k: spark.conf.get(k, None) for k in conf_keys}

    # Ambient NORMALIZATION (VERDICT r9 "Next round" #2): three rounds of
    # legacy14 drift (9.78 -> 11.70 -> 14.91 s) were each adjudicated as
    # host noise only via out-of-band quiet-box reruns. Make the artifact
    # self-normalizing instead: interleave the fixed probe query BETWEEN
    # every headline block and report each headline as a RATIO to the
    # mean of its two adjacent probes. The ratio is unitless and
    # host-speed-invariant — a slow box inflates numerator and
    # denominator together — so cross-round regression reads straight
    # off queries_norm / total_*_norm without a quiet-box appeal. Raw
    # seconds stay in `queries` for continuity with BENCH_r01-r09.
    probes: list[float] = [probe()]
    probe_start = probes[0]

    names = [n for n in HEADLINE if n in QUERIES]
    # max(1, ·): reps<=0 would silently skip every query and emit a fake
    # all-zero benchmark line
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # fall back: if a headline name is missing, still produce a line
    timings: dict[str, float] = {}
    probe_pair: dict[str, tuple[float, float]] = {}
    released: dict[str, int] = {}
    for name in names:
        fn = QUERIES[name]
        samples: list[float] = []
        n = 0
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                df = fn(spark, data_dir)
                sdf = df.df if hasattr(df, "df") else df
                n = force_count(sdf)
            except Exception as e:  # one broken query must not kill the line
                print(f"# {name}: FAILED {e}", file=sys.stderr)
                samples = []
                break
            samples.append(time.perf_counter() - t0)
        # checkpoint-block hygiene BETWEEN entries (r15, additive): the
        # finished block's lazy localCheckpoints otherwise pile up in
        # the block manager and contaminate later entries
        df = sdf = None
        rel = _release_persisted(spark)
        if rel:
            released[name] = rel
        if not samples:
            # still close the probe bracket so the series stays an
            # honest record of the whole run
            probes.append(probe())
            continue
        timings[name] = round(sorted(samples)[len(samples) // 2], 4)
        probes.append(probe())
        probe_pair[name] = (probes[-2], probes[-1])
        detail = "/".join(f"{s:.2f}" for s in sorted(samples))
        print(
            f"# {name}: median {timings[name]:.3f}s of [{detail}] "
            f"({n} rows; local probe {probes[-2]:.2f}/{probes[-1]:.2f})",
            file=sys.stderr,
        )

    probe_end = probes[-1]
    # per-query ambient-normalized ratio: median seconds over the mean of
    # the two probes bracketing that query's reps (NOT the global probe
    # median — ambient load moves WITHIN a run; the r9 builder measured a
    # 13.8-18.6s spread on same-code back-to-back runs)
    norm = {
        name: round(t / ((probe_pair[name][0] + probe_pair[name][1]) / 2), 4)
        for name, t in timings.items()
        if name in probe_pair and sum(probe_pair[name]) > 0
    }
    total = round(sum(timings.values()), 4)
    legacy14 = round(sum(timings.get(n, 0.0) for n in LEGACY14), 4)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    print(json.dumps({
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # continuity + ambient diagnostics (extra keys; driver ignores)
        "total_legacy14_sec": legacy14,
        # continuity key per headline-set size (VERDICT r8 item 8): when
        # the set grows, the old series stays one subtraction away —
        # headline19 is the r8/r9 set
        "total_headline19_sec": round(
            sum(timings.get(n, 0.0) for n in HEADLINE[:19]), 4
        ),
        # headline20 adds line_dedup_boilerplate (r9 continuation)
        "total_headline20_sec": round(
            sum(timings.get(n, 0.0) for n in HEADLINE[:20]), 4
        ),
        "ambient_probe": {"start": probe_start, "end": probe_end},
        # ambient-normalized series (VERDICT r9 #2): each headline as a
        # ratio to the mean of its two bracketing probe runs. Unitless;
        # compare THESE across rounds — host slowdown cancels. The full
        # probe series is included so the noise profile of the run is
        # reconstructible from the artifact alone.
        "queries_norm": norm,
        "total_legacy14_norm": round(
            sum(norm.get(n, 0.0) for n in LEGACY14), 4
        ),
        "total_headline_norm": round(sum(norm.values()), 4),
        # coverage of the normalized series (ADVICE r10): a headline
        # that errored or whose probe bracket summed to <=0 is absent
        # from queries_norm, which would make total_*_norm quietly
        # incomparable across rounds — name the gaps explicitly
        "norm_covered": len(norm),
        "norm_missing": sorted(set(names) - set(norm)),
        "probe_series": [round(p, 4) for p in probes],
        "conf": conf,
        # r15 additive diagnostics: input layout of this run (see
        # scan_parallel_copy) and the per-entry count of persisted RDDs
        # released by the between-entries hygiene pass
        "input_layout": layout_info,
        "released_rdds": released,
    }))
    if data_dir != sf_dir:
        shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
