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
# Round-13 window = rotate_window.py output for --new = the queries
# added or code-changed this round: fcase_list (NEW — fcase LIST
# outputs, tests.Rraw 2127.06/.14/.57) + frank_multi (NEW — frankv
# multi-column cols=/order=, 2386.05) + fifelse_fcase (fcase 2127
# literal type contract + lazy short-circuit) + fread_fwrite_roundtrip
# (fwrite scipen/dec/forceDecimal rendering, ISO sub-second rule 2281;
# fread dec auto-detection 2256) + join_coerce_int / lookup_join /
# join_inner / merge_full / anti_join / semi_join / mergelist_fold /
# mergelist_mixed (_bmerge_coerce empty-vs-all-NA, ADVICE r12) +
# sdcols_patterns / sdcols_agg (sd_cols invert= by-exclusion, ADVICE
# r12) + rbindlist_fill (float+int -> double, ADVICE r12) + frank_ties
# / frank_random / frank_chunked (frank body gained the order= /
# multi-col dispatch) + setorder_topk (setorder order= mapping, 2385)
# + tstrsplit_cols (tstrsplit rev=, 2380). Plan-fingerprint diffs at
# every step: 0 real changes (setindex_bucketed appId-path known-diff
# only; fcase_list/frank_multi new). Fill = the 30 r8-latest rows,
# exactly the r12 verdict's prescription.
# Tool output:
#
# # latest-evidence histogram (0 = never driver-checked):
# #   r0: 2
# #   r8: 30
# #   r9: 37
# #   r10: 35
# #   r11: 43
# #   r12: 50
# # window covers 50 slots; oldest row left outside: r9
# # POST-window histogram (window rows counted as r13):
# #   r9: 34
# #   r10: 35
# #   r11: 41
# #   r12: 37
# #   r13: 50
_PRIORITY = [
    "fcase_list",  # new
    "fifelse_fcase",  # new
    "fread_fwrite_roundtrip",  # new
    "join_coerce_int",  # new
    "lookup_join",  # new
    "join_inner",  # new
    "merge_full",  # new
    "anti_join",  # new
    "semi_join",  # new
    "mergelist_fold",  # new
    "mergelist_mixed",  # new
    "sdcols_patterns",  # new
    "sdcols_agg",  # new
    "rbindlist_fill",  # new
    "frank_multi",  # new
    "frank_ties",  # new
    "frank_random",  # new
    "frank_chunked",  # new
    "setorder_topk",  # new
    "tstrsplit_cols",  # new
    "doc_chunking",  # r8
    "doc_fingerprint",  # r8
    "dogroups_udtf",  # r8
    "dsir_select",  # r8
    "dup_ngram_spans",  # r8
    "dup_span_removal",  # r8
    "dup_span_removal_keepfirst",  # r8
    "embedding_cosine_pairs",  # r8
    "embedding_dup_clusters",  # r8
    "foverlaps_bucketed",  # r8
    "hash_sample",  # r8
    "heavy_hitters_cm",  # r8
    "inrange_bucketed",  # r8
    "ivfpq_ann_topk",  # r8
    "jaccard_prefix_pairs",  # r8
    "kmeans_clusters",  # r8
    "lang_id",  # r8
    "length_batches",  # r8
    "multimodal_features",  # r8
    "ngram_jaccard_pairs",  # r8
    "pack_sequences",  # r8
    "quality_quantile_filter",  # r8
    "salted_skew_agg",  # r8
    "sample_n_per_source",  # r8
    "simhash_pairs",  # r8
    "stream_span_screen",  # r8
    "stream_stateful_stats",  # r8
    "stream_static_join",  # r8
    "token_counts",  # r8
    "token_mixture_sample",  # r8
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
