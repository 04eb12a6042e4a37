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
# Round-9 window = rotate_window.py output for --new = the 28 queries
# added or physically changed this round: semdedup_prune_capped /
# dedup_clusters_star / froll_chunked / asof_chunked are new (hot-key
# scale mitigations with driver contracts); semdedup_prune and
# dedup_clusters gained opt-in strategies with restructured shared
# code; fread_fwrite_roundtrip covers the fread changes (sep sampler,
# fill widening, nrows, blank lines, and the continuation session's
# skip='auto'/skip-string, whitespace-run sep, CR line endings, BOM
# sniff, header-width reconciliation); the asof family, froll_mean_sum,
# froll_narm, nafill_locf_nocb, cumsum_running, and shift_lag_lead
# cover the n_chunks chunk-stitch restructurings plus the NaN-as-NA
# masking and the na.rm empty-aggregate identity (froll_narm's oracle
# changed with it); gopher_quality / line_dedup_boilerplate /
# web_curation_pipeline are new pipeline operators (Rae et al. 2021
# quality rules; CCNet/RefinedWeb line-level boilerplate removal; the
# composed FineWeb-order pipeline); the froll_adaptive family gained
# na_rm/nan_is_na; frank gained na_last and the n_chunks rank
# chunk-stitch, rleid the n_chunks run chunk-stitch (frank_chunked /
# rleid_chunked run the stitched plans against frank_ties' /
# rleid_runs' oracles verbatim). Then the r4-latest tail (oldest
# evidence first, alphabetical; the spill to the r10 window grows
# accordingly — see the POST histogram below). Tool output:
#
# # latest-evidence histogram (0 = never driver-checked):
# #   r0: 9
# #   r4: 33
# #   r5: 46
# #   r7: 50
# #   r8: 50
# # window covers 50 slots; oldest row left outside: r4
# # POST-window histogram (window rows counted as r9):
# #   r4: 8
# #   r5: 43
# #   r7: 46
# #   r8: 41
# #   r9: 50
_PRIORITY = [
    "semdedup_prune_capped",  # new
    "dedup_clusters_star",  # new
    "froll_chunked",  # new
    "asof_chunked",  # new
    "semdedup_prune",  # new
    "dedup_clusters",  # new
    "fread_fwrite_roundtrip",  # new
    "asof_roll_backward",  # new
    "asof_roll_forward",  # new
    "asof_roll_limit",  # new
    "asof_roll_nearest",  # new
    "asof_roll_rollends",  # new
    "froll_mean_sum",  # new
    "froll_narm",  # new
    "nafill_locf_nocb",  # new
    "cumsum_running",  # new
    "shift_lag_lead",  # new
    "gopher_quality",  # new
    "line_dedup_boilerplate",  # new
    "web_curation_pipeline",  # new
    "froll_adaptive_sum",  # new
    "froll_adaptive_minmax",  # new
    "froll_adaptive_median",  # new
    "frank_ties",  # new
    "frank_random",  # new
    "frank_chunked",  # new
    "rleid_runs",  # new
    "rleid_chunked",  # new
    "embedding_lsh_pairs",  # r4
    "fcoalesce_nafill",  # r4
    "fintersect_all",  # r4
    "frame_sample_counts",  # r4
    "fsetdiff_all",  # r4
    "gtail_per_group",  # r4
    "json_extract_props",  # r4
    "lsh_ann_topk",  # r4
    "mutation_let",  # r4
    "quantiles_by",  # r4
    "rbindlist_fill",  # r4
    "repetition_metrics",  # r4
    "rollup_label",  # r4
    "rowwise_literal",  # r4
    "sdcols_agg",  # r4
    "sequence_packing",  # r4
    "sessionize_batch",  # r4
    "setorder_topk",  # r4
    "sketch_distinct_tokens",  # r4
    "stratified_sample",  # r4
    "stream_decontaminate",  # r4
    "stream_dedup",  # r4
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
