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
# entries. The window is now DERIVED, not hand-picked — run
#   python tools/rotate_window.py --new <added-or-changed-queries>
# and paste its output (the round-6 hand rotation produced a false
# freshness claim; see VERDICT r6 "What's wrong" item 1).
#
# Honest freshness state entering round 8 (latest driver row per query,
# computed from CORRECTNESS_r01..r07): 50 queries r7, 46 r5, 46 r4,
# 20 r3, and the round-8 additions never driver-checked. No query's
# latest driver row is red. This window is rotate_window.py's output
# for --new = the 22 queries added or physically changed this round:
# the span-dedup family (dup_ngram_spans + removal/keepfirst +
# stream_span_screen), pack_sequences, token_mixture_sample, the
# bucketed big-big interval joins (foverlaps_bucketed,
# inrange_bucketed), the asof family + nafill_locf_nocb (backward
# fills re-expressed as reversed running frames, fixing an
# O(rows^2)-per-key unbounded-following frame), and the late-round
# additions quality_quantile_filter / sample_n_per_source /
# heavy_hitters_cm / decontaminate_bloom / dsir_select /
# kmeans_clusters / semdedup_prune / length_batches (per-source
# quality-quantile filter, fixed-count per-group sample, Count-Min
# heavy hitters, Bloom-prescreened decontamination, DSIR importance
# selection, deterministic Lloyd's k-means, SemDeDup semantic dedup,
# and length-bucketed loader batches). Then ivfpq_ann_topk (never
# checked), all 20 r3-latest, and the oldest r4-latest alphabetical.
# After this window the oldest remaining evidence is r4 (39 queries);
# round 9 takes those plus the r5 tail.
_PRIORITY = [
    # new or changed this round (rotate_window.py --new)
    "quality_quantile_filter", "sample_n_per_source",
    "heavy_hitters_cm", "decontaminate_bloom", "dsir_select",
    "kmeans_clusters", "semdedup_prune", "length_batches",
    "dup_ngram_spans", "dup_span_removal", "dup_span_removal_keepfirst",
    "pack_sequences", "stream_span_screen", "token_mixture_sample",
    "foverlaps_bucketed", "inrange_bucketed", "asof_roll_backward",
    "asof_roll_forward", "asof_roll_limit", "asof_roll_nearest",
    "asof_roll_rollends", "nafill_locf_nocb",
    # never driver-checked
    "ivfpq_ann_topk",
    # the complete r3-latest list (20)
    "ann_cosine_topk", "cogroup_udtf", "composite_pipeline",
    "dcast_margins", "dedup_clusters", "doc_fingerprint",
    "dogroups_udtf", "embedding_cosine_pairs", "embedding_dup_clusters",
    "frollapply_corr", "hash_sample", "jaccard_prefix_pairs", "lang_id",
    "multimodal_features", "ngram_jaccard_pairs", "salted_skew_agg",
    "simhash_pairs", "stream_stateful_stats", "stream_static_join",
    "token_counts",
    # oldest r4-latest refresh (alphabetical)
    "cbindlist_zip", "cumsum_running", "curation_pipeline",
    "date_round", "decontaminate_ngrams", "dedup_keep_best",
    "doc_chunking",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
