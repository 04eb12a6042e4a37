"""Driver contract for the spark-graft builder (PySpark target).

Each entry in ``queries()`` exercises one operator family from SURVEY.md §2
through the data_table_spark API; ``oracle_sql()`` holds the DuckDB-
runnable ANSI-SQL equivalent. Aggregates over doubles are cast to
DECIMAL(18,4) before summation in BOTH engines: decimal addition is
order-independent and exact, so the value-hash comparison is immune to
float summation-order differences between Spark partial aggregation and
DuckDB, then cast back to DOUBLE for a common output schema.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from data_table_spark.queries import QUERIES, ORACLE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped GForce aggregate) on sf0.001."""
    return QUERIES["gforce_q1"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 registration-order
# entries. The window is DERIVED, not hand-picked — run
#   python tools/rotate_window.py --new <added-or-changed-queries>
# and paste its output VERBATIM (including both histograms; the r6 and
# r8 rounds each got a hand-computed freshness number wrong, so the
# tool now prints the post-window histogram too and prose quotes only
# tool output).
#
# Round-10 window = rotate_window.py output for --new = the queries
# added or plan-changed this round: minhash_lsh_shuffle (new: the
# onepass verifier's pinned non-broadcast membership join,
# broadcast="never", same oracle as minhash_lsh_pairs — the r9 verdict
# "What's wrong" #1 size-cliff fix) + minhash_lsh_pairs (its DEFAULT
# membership join changed from a hard F.broadcast hint to AQE-decided)
# + line_dedup_boilerplate / web_curation_pipeline (line_dedup's
# boilerplate join got the same broadcast="auto" gate — default plan
# changed) + frank_ties / frank_random / frank_chunked (frank gained
# reference na.last=TRUE-by-default semantics, ties="last", NaN-as-NA
# masking, and na_last=True under n_chunks). The n_chunks="auto"
# resolution added to the ordered operators is a pure pass-through for
# the integer/None arguments every registry query uses (covered by the
# stitch-family pytest run + the config-differential sweep), so those
# queries do NOT re-enter. Then the 8 r4-latest rows and the oldest r5
# rows fill the remaining slots.
# froll_auto_chunks is the new driver twin for the n_chunks="auto"
# resolution (same oracle as froll_mean_sum verbatim); frollapply /
# frollapply_multi were restructured around the stitch-compatible
# exprs closure (default plan identical), so frollapply_corr re-enters
# (frollapply_median is already in the r5 tail); frolladaptive's
# family was restructured around the chunk-stitches (running-triple
# carry for sum/mean, halo stitch for extrema, chunked-rank position
# for median; default plans identical), so froll_adaptive_sum /
# froll_adaptive_minmax / froll_adaptive_median re-enter too, as does
# rowid_counter (rowid gained the chunked-rank option; default plan
# identical). froll_adaptive_chunked / frollapply_chunked are the new
# stitched-path driver twins (same oracles as froll_adaptive_sum /
# frollapply_median verbatim); froll_chunked / asof_chunked re-enter
# because their executed stitch code changed (the NaN/NULL chunk
# routing fixes).
# Tool output:
#
# # latest-evidence histogram (0 = never driver-checked):
# #   r0: 4
# #   r4: 8
# #   r5: 43
# #   r7: 46
# #   r8: 41
# #   r9: 50
# # window covers 50 slots; oldest row left outside: r5
# # POST-window histogram (window rows counted as r10):
# #   r5: 18
# #   r7: 44
# #   r8: 40
# #   r9: 40
# #   r10: 50
_PRIORITY = [
    "minhash_lsh_shuffle",  # new
    "minhash_lsh_pairs",  # new
    "line_dedup_boilerplate",  # new
    "web_curation_pipeline",  # new
    "frank_ties",  # new
    "frank_random",  # new
    "frank_chunked",  # new
    "froll_auto_chunks",  # new
    "frollapply_corr",  # new
    "froll_adaptive_sum",  # new
    "froll_adaptive_minmax",  # new
    "froll_adaptive_median",  # new
    "rowid_counter",  # new
    "froll_adaptive_chunked",  # new
    "frollapply_chunked",  # new
    "froll_chunked",  # new
    "asof_chunked",  # new
    "stream_sliding_agg",  # r4
    "stream_stream_join",  # r4
    "stream_tumbling_agg",  # r4
    "time_parts",  # r4
    "transpose_small",  # r4
    "tstrsplit_cols",  # r4
    "vecseq_expand",  # r4
    "vocab_topk",  # r4
    "bigram_lm_score",  # r5
    "bm25_topk",  # r5
    "chgroup_first_appearance",  # r5
    "chmatch_rank",  # r5
    "chunk_dedup_pairs",  # r5
    "dedup_cluster_sizes",  # r5
    "dedup_exact_ids",  # r5
    "dogroups_arrow_udtf",  # r5
    "eachi_join_agg",  # r5
    "embedding_centroids",  # r5
    "fdistinct_last",  # r5
    "foverlaps_end",  # r5
    "foverlaps_equal",  # r5
    "frollapply_median",  # r5
    "fsetequal_check",  # r5
    "funnel_stages",  # r5
    "gforce_q1",  # r5
    "ghead_per_group",  # r5
    "ivf_ann_topk",  # r5
    "join_inner",  # r5
    "jsonl_roundtrip",  # r5
    "lookup_join",  # r5
    "melt_narm",  # r5
    "merge_full",  # r5
    "mergelist_fold",  # r5
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
