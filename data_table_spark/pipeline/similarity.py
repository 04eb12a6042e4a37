"""Similarity search over embedding columns (`array<float>`).

- `cosine_topk`: brute-force cosine top-k of a (small, broadcast) query
  set against the full corpus. The corpus side streams — no shuffle at
  all until the per-query top-k window; at 1000 executors this is a map
  + a k-row-per-query shuffle.
- `cosine_pairs`: all-pairs >= threshold (the embedding near-dup). The
  pair join is the scale hazard; at real scale use `lsh_ann_topk`'s
  bucketing. Kept because the oracle needs the exact answer.
- `lsh_ann_topk`: random-hyperplane LSH — bucket by the sign-bit sketch,
  search only within the bucket. Approximate (rows-only check): recall
  depends on data, plan is the 100 TB shape (bucket equi-join instead of
  cross join).

Dot products fold left-to-right in index order via
aggregate(zip_with(...)) — pure JVM, no UDF. Scores are rounded to 4
decimals in BOTH engines so summation-order drift (<1e-12) cannot flip
the value-hash.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_TABLES = 4   # independent LSH hash tables (union of candidates)
N_PLANES = 6   # sign bits per table => 2^6 buckets per table


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Index-ordered fold of the elementwise product (deterministic
    summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _corpus(emb: DataFrame) -> DataFrame:
    from .dedup import spread

    v = _as_double(F.col("embedding"))
    return spread(emb).select(
        "vec_id", v.alias("v")
    ).withColumn("nrm", norm(F.col("v")))


def cosine_topk(
    emb: DataFrame, query_ids_below: int = 8, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k. Queries (vec_id < query_ids_below) are
    broadcast; corpus scans once; rank by cosine desc with vec_id
    tie-break. Output: (query_id, neighbor_id, rank, cos)."""
    from pyspark.sql import Window

    c = _corpus(emb)
    q = c.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    j = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = j.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cos.alias("cos_full"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_full"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_full", 4).alias("cos"),
        )
    )


def cosine_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Embedding near-dup: all pairs with cosine >= threshold.
    Output: (vec_a, vec_b, cos), vec_a < vec_b."""
    c = _corpus(emb)
    a = c.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = c.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_full", cos)
        .filter(F.col("cos_full") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_full", 4).alias("cos"))
    )


def _hyperplanes(
    dim: int, n_tables: int = N_TABLES, n_planes: int = N_PLANES
) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplanes (seed 42), shipped as plan
    literals — no state, no broadcast variable needed. One plane set per
    hash table."""
    rng = random.Random(42)
    return [
        [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit sketch for one table: bit p set iff dot(vec, plane_p) > 0."""
    out = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        out = out + F.when(
            dot(vec, lit_plane) > 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def lsh_ann_topk(
    emb: DataFrame, dim: int = 64, query_ids_below: int = 8, k: int = 5
) -> DataFrame:
    """LSH-bucketed approximate top-k: N_TABLES independent sign-bit
    tables; a vector is a candidate if it shares ANY table's bucket with
    the query (standard multi-table LSH recall boost). Exact cosine
    re-rank within candidates. Pair generation is an equi-join on
    (table, bucket) — the 100 TB shape. Approximate recall => rows-only
    correctness check; exact baseline is `cosine_topk`."""
    from pyspark.sql import Window

    tables = _hyperplanes(dim)
    c = _corpus(emb).select(
        "vec_id", "v", "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col("v"), planes).alias("bucket"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "v", "nrm", "tb.tbl", "tb.bucket")
    q = c.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("tbl").alias("qtbl"),
        F.col("bucket").alias("qb"),
    )
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("tbl") == F.col("qtbl"))
            & (F.col("bucket") == F.col("qb"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qv", "qn", "v", "nrm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_full"), F.asc("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cos_full"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_full", 4).alias("cos"),
        )
    )


def ivf_ann_topk(
    emb: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 2,
    query_ids_below: int = 8,
    k: int = 5,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus with KMeans
    (pyspark.ml, seeded), then search only the query's n_probe nearest
    centroid cells. The classic big-corpus trade: index assignment is
    one narrow pass; each query touches ~n_probe/n_centroids of the
    data via a (cell-id) equi-join. Approximate => rows-only check
    (exact baseline: cosine_topk). Centroids fit on the driver by
    construction (n_centroids << corpus)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    c = _corpus(emb)
    feat = c.withColumn("fv", array_to_vector(F.col("v")))
    km = KMeans(k=n_centroids, seed=42, featuresCol="fv",
                predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select("vec_id", "v", "nrm", "cell")

    centers = [list(map(float, ctr)) for ctr in model.clusterCenters()]

    def center_dists(vec):
        return [
            (ci, dot(vec, F.array(*[F.lit(x) for x in ctr])))
            for ci, ctr in enumerate(centers)
        ]

    q = assigned.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    # probe cells = n_probe highest-dot centroids per query, computed as
    # plan expressions (array_sort on structs orders by field position;
    # negdot first => ascending = best dot first). n_centroids is tiny
    # by construction, so the struct array is cheap.
    cells = F.array(
        *[
            F.struct(
                (-dot(F.col("qv"), F.array(*[F.lit(x) for x in ctr])))
                .alias("negdot"),
                F.lit(ci).alias("cell"),
            )
            for ci, ctr in enumerate(centers)
        ]
    )
    probes = q.select(
        "query_id", "qv", "qn",
        F.explode(F.slice(F.array_sort(cells), 1, n_probe)).alias("pr"),
    ).select("query_id", "qv", "qn", F.col("pr.cell").alias("qcell"))
    cand = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("qcell"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    cos = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_full"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_full"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_full", 4).alias("cos"),
        )
    )
