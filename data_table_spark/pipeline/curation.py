"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, keep-best canonicalization of duplicate clusters,
document chunking, and repetition metrics.

These extend the reference's dedup surface (R/duplicated.R) with the
steps an LLM training-data pipeline runs after near-dup detection.
Portability rules as elsewhere in pipeline/: exact integer counts with
one final division, so the DuckDB oracle matches bit-for-bit.

Scale posture (100 TB):
- decontaminate: the benchmark side is tiny by construction (eval
  suites are MBs, the corpus is TBs) — its distinct n-gram set is
  broadcast, so the corpus streams through a broadcast-hash semi-join
  with NO shuffle of corpus n-grams.
- keep_best: composes dedup_clusters (blocked pair join + min-label
  propagation) with a per-cluster window rank — one extra shuffle on
  cluster_id, which is the minimum any per-cluster selection needs.
- chunk_documents: narrow (explode of per-doc start offsets), no
  shuffle; output rows ~ tokens/stride per doc.
- repetition_metrics: one shuffle on doc_id shared by both aggregates
  (token counts, bigram distincts); everything whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dedup_clusters, shingle_rows, spread
from .text import tokens_col

__all__ = [
    "decontaminate",
    "keep_best",
    "chunk_documents",
    "repetition_metrics",
]


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """Benchmark decontamination: find corpus documents sharing any word
    n-gram with a benchmark/eval set (the n-gram-overlap rule used by
    public LLM data pipelines; n=13 is the common production choice —
    lower here only because the synthetic corpus is short).

    Returns (doc_id, n_shared_grams): contaminated corpus docs with the
    count of DISTINCT benchmark n-grams they contain. Anti-joining the
    result against the corpus yields the clean split.

    Shape: corpus n-grams stream map-side against the BROADCAST distinct
    benchmark n-gram set — no corpus-side shuffle for the probe; the
    only shuffle is the per-doc count aggregation on doc_id.
    """
    cg = shingle_rows(corpus, n)
    bg = shingle_rows(benchmark, n).select("s").distinct()
    return (
        cg.join(F.broadcast(bg), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )


def keep_best(
    docs: DataFrame, threshold: float = 0.8, n: int = 3
) -> DataFrame:
    """Canonical-document selection: one keeper per near-duplicate
    cluster, chosen by quality (longest token count, doc_id as the
    deterministic tiebreak) rather than min-id.

    This is the curation step after clustering: `dedup_clusters` labels
    every doc with its component, `keep_best` picks which row survives.
    Returns (cluster_id, doc_id, n_tokens) — one row per cluster.
    """
    clusters = dedup_clusters(docs, threshold, n)
    quality = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return (
        clusters.join(quality, "doc_id")
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("cluster_id", "doc_id", "n_tokens")
    )


def chunk_documents(
    docs: DataFrame, size: int = 32, overlap: int = 8
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    context-window packing step of a training pipeline). Chunk k of a
    doc starts at token 1 + k*stride (stride = size - overlap) and takes
    up to `size` tokens; the tail chunk may be shorter.

    Narrow: per-row explode of start offsets, no shuffle. Output is
    (doc_id, chunk_id, chunk_text, n_tokens).
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    toks = tokens_col("text")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(stride)
    )
    ex = (
        spread(docs)
        .select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.posexplode(starts).alias("chunk_id", "start"),
        )
    )
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(F.slice("toks", F.col("start"), size), " ").alias(
            "chunk_text"
        ),
        F.least(
            F.lit(size), F.size("toks") - F.col("start") + 1
        ).cast("long").alias("n_tokens"),
    )


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document:
    - top_token_ratio: occurrences of the most frequent token / tokens
    - dup_2gram_ratio: fraction of bigram occurrences that are repeats
      of an earlier bigram, (total - distinct) / total

    Both are exact integer counts with one final division (portable).
    Documents with fewer than 2 tokens have no bigrams and are dropped
    (both engines agree). One shuffle on doc_id feeds both aggregates.
    """
    tok = spread(docs).select(
        "doc_id", F.posexplode(tokens_col("text")).alias("pos", "tok")
    )
    tc = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (
                F.max("c").cast("double") / F.sum("c")
            ).alias("top_token_ratio")
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = tok.select(
        "doc_id",
        F.concat_ws(" ", "tok", F.lead("tok", 1).over(w)).alias("bg"),
        F.lead("tok", 1).over(w).alias("__f__"),
    ).filter(F.col("__f__").isNotNull())
    bs = bg.groupBy("doc_id").agg(
        (
            (F.count(F.lit(1)) - F.count_distinct(F.col("bg")))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("dup_2gram_ratio")
    )
    return tc.join(bs, "doc_id")
