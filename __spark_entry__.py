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
# #   r0: 1
# #   r5: 18
# #   r7: 44
# #   r8: 40
# #   r9: 40
# #   r10: 50
# # window covers 50 slots; oldest row left outside: r7
# # POST-window histogram (window rows counted as r11):
# #   r7: 26
# #   r8: 39
# #   r9: 38
# #   r10: 40
# #   r11: 50
_PRIORITY = [
    "mergelist_mixed",  # new
    "mergelist_fold",  # new
    "fdistinct_last",  # new
    "cbindlist_zip",  # new
    "froll_auto_chunks",  # new
    "froll_chunked",  # new
    "asof_chunked",  # new
    "frank_chunked",  # new
    "rleid_chunked",  # new
    "froll_adaptive_chunked",  # new
    "frollapply_chunked",  # new
    "rowid_counter",  # new
    "froll_narm",  # new
    "filter_between",  # new
    "tstrsplit_cols",  # new
    "uniqueN_by",  # new
    "mult_first",  # r5
    "na_omit_cols",  # r5
    "orc_roundtrip",  # r5
    "pii_scrub",  # r5
    "setindex_bucketed",  # r5
    "sketch_quantiles",  # r5
    "split_leakfree",  # r5
    "sq8_ann_topk",  # r5
    "stream_neardup_screen",  # r5
    "stream_session_agg",  # r5
    "stream_session_dynamic",  # r5
    "stream_stream_full_join",  # r5
    "stream_stream_left_join",  # r5
    "stream_stream_right_join",  # r5
    "tfidf_keywords",  # r5
    "udtf_chunk_lateral",  # r5
    "which_rows",  # r5
    "winnow_dup_pairs",  # r5
    "anti_join",  # r7
    "cj_cross",  # r7
    "cube_agg",  # r7
    "date_parts",  # r7
    "dcast_drop_false",  # r7
    "dcast_multi_agg",  # r7
    "dcast_pivot",  # r7
    "dedup_exact",  # r7
    "duplicated_flag",  # r7
    "epoch_upsample",  # r7
    "fifelse_fcase",  # r7
    "filter_chin",  # r7
    "filter_like",  # r7
    "filter_notin",  # r7
    "filter_scan",  # r7
    "foverlaps_any",  # r7
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
