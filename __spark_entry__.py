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
# entries. Round-6 window (VERDICT r5 item 1: finish the r1-green
# refresh — after this window every registered query has a driver row
# dated r5-or-later):
# (a) queries ADDED or semantically CHANGED this round: let_by_group
#     (grouped :=), epoch_upsample (fractional replication),
#     stream_asof_enrich (streaming LOCF roll join), transpose_medium
#     (new distributed transpose), frollapply_adaptive, froll_narm (new,
#     nullable-input froll semantics), froll_mean_sum (oracle gained the
#     NULL-poisoning mask per ADVICE r5), shuffle_shards (48-bit shard
#     hash), retention_cohorts (floor-division cohorts), mixture_sample
#     (explicit source enumeration), pq_ann_topk (LUT now distributed);
# (b) ALL 32 queries whose latest driver row is round 1 — the complete
#     staleness list computed from CORRECTNESS_r01..r05 (VERDICT r5
#     "What's wrong" item 3);
# (c) remaining slots: oldest r3-latest rows, most load-bearing first.
# Everything else is driver-green r4/r5 and locally re-verified by
# tools/check_correctness.py + pytest every session.
_PRIORITY = [
    # (a) new or changed this round
    "let_by_group", "epoch_upsample", "stream_asof_enrich",
    "transpose_medium", "frollapply_adaptive", "froll_narm",
    "froll_mean_sum", "shuffle_shards", "retention_cohorts",
    "mixture_sample", "pq_ann_topk",
    # (b) the complete r1-stale list (32)
    "anti_join", "cj_cross", "cube_agg", "dcast_drop_false",
    "dcast_multi_agg", "dcast_pivot", "duplicated_flag",
    "fifelse_fcase", "filter_between", "filter_chin", "filter_like",
    "filter_notin", "filter_scan", "foverlaps_any", "foverlaps_start",
    "foverlaps_within", "frank_ties", "gforce_minmax_firstlast",
    "groupingsets_agg", "inrange_semi", "melt_multi_measure",
    "melt_unpivot", "mult_last", "nonequi_join", "rollup_agg",
    "rowid_counter", "select_compute", "semi_join", "uniqueN_by",
    "unique_first", "update_on_join", "weighted_mean",
    # (c) oldest r3-latest refresh
    "gforce_var_sd", "funion_all", "dedup_exact", "minhash_lsh_pairs",
    "text_quality", "date_parts", "fread_fwrite_roundtrip",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
