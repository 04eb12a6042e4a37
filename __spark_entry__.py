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
# Round-12 window = rotate_window.py output for --new = the queries
# added or code/plan-changed this round: join_coerce_int (NEW — bmerge
# join-type coercion, tests.Rraw 2044.60 fitsInInt32 path) +
# sdcols_patterns (NEW — .SDcols mini-language lapply_sd) +
# frank_ties / frank_random / frank_chunked (frank's NaN-vs-NA
# two-level missing key, tests.Rraw 1988.1-.4 — ordering expressions
# changed for double rank columns) + setorder_topk (setorder/fsort now
# share the _forder_exprs NA-then-NaN block key, 1988.5-.8) +
# uniqueN_by (na_rm conditional-distinct rewrite + non-nullable fast
# path) + froll_narm (froll exprs loop restructured around the
# int→double identity cast) + lookup_join / join_inner / anti_join /
# mult_first / mult_last / merge_full / join_coerce_int (lookup and
# merge now route join keys through _bmerge_coerce; anti_join's
# notjoin path gained an explicit x-column projection) +
# mergelist_fold / mergelist_mixed (mergepair keyless-baseline key
# metadata fix). Fill = the 26 r7-latest rows + the oldest-r8 rows,
# exactly the r11 verdict's prescription.
# Tool output:
#
# # latest-evidence histogram (0 = never driver-checked):
# #   r0: 2
# #   r7: 26
# #   r8: 39
# #   r9: 38
# #   r10: 40
# #   r11: 50
# # window covers 50 slots; oldest row left outside: r8
# # POST-window histogram (window rows counted as r12):
# #   r8: 30
# #   r9: 37
# #   r10: 35
# #   r11: 43
# #   r12: 50
_PRIORITY = [
    "join_coerce_int",  # new
    "sdcols_patterns",  # new
    "frank_ties",  # new
    "frank_random",  # new
    "frank_chunked",  # new
    "setorder_topk",  # new
    "uniqueN_by",  # new
    "froll_narm",  # new
    "lookup_join",  # new
    "join_inner",  # new
    "anti_join",  # new
    "mult_first",  # new
    "mult_last",  # new
    "merge_full",  # new
    "mergelist_fold",  # new
    "mergelist_mixed",  # new
    "foverlaps_start",  # r7
    "foverlaps_within",  # r7
    "frollapply_adaptive",  # r7
    "funion_all",  # r7
    "gforce_minmax_firstlast",  # r7
    "gforce_var_sd",  # r7
    "groupingsets_agg",  # r7
    "inrange_semi",  # r7
    "let_by_group",  # r7
    "melt_multi_measure",  # r7
    "melt_unpivot",  # r7
    "mixture_sample",  # r7
    "nonequi_join",  # r7
    "pq_ann_topk",  # r7
    "retention_cohorts",  # r7
    "rollup_agg",  # r7
    "select_compute",  # r7
    "semi_join",  # r7
    "shuffle_shards",  # r7
    "stream_asof_enrich",  # r7
    "text_quality",  # r7
    "transpose_medium",  # r7
    "unique_first",  # r7
    "update_on_join",  # r7
    "weighted_mean",  # r7
    "ann_cosine_topk",  # r8
    "cogroup_udtf",  # r8
    "composite_pipeline",  # r8
    "curation_pipeline",  # r8
    "date_round",  # r8
    "dcast_margins",  # r8
    "decontaminate_bloom",  # r8
    "decontaminate_ngrams",  # r8
    "dedup_keep_best",  # r8
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
