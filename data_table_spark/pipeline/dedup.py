"""Deduplication operators: exact, n-gram Jaccard set-similarity join,
MinHash+LSH, SimHash.

Scale design (the point of these over naive all-pairs):
- `ngram_jaccard_pairs` blocks on SHARED SHINGLES (explode + equi-join,
  shuffle key = shingle) — the classic set-similarity join. Cost is
  sum over shingles of (docs sharing it)^2, not |docs|^2. At 100 TB you
  would add prefix filtering (sort shingles by global frequency, keep the
  first |s|-ceil(t*|s|)+1 as join keys); noted, not needed at test SF.
- `minhash_lsh_pairs` blocks on (band, band-hash) of a 128-perm MinHash
  signature (b=32 bands x r=4 rows). Candidate pairs are then verified
  with EXACT Jaccard, so output equals the exact join with probability
  1 - (1 - t^r)^b per true pair (≈1-1e-35 at t=0.9) — which is why the
  DuckDB oracle for it can be the exact all-pairs answer.
- `simhash_pairs` bands the 48-bit SimHash into (k+1)=4 pieces: by
  pigeonhole, any pair with hamming distance <= 3 agrees on >= 1 band,
  so band-blocking is EXACT for hd<=3 (no recall loss).

Reference parity: data.table's only dedup surface is exact
(`duplicated`/`unique`, /root/reference/R/duplicated.R:1-60); the rest is
the north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col, word_shingles

# MinHash parameters. b*r = 128 permutations; threshold curve midpoint
# (1/b)^(1/r) ≈ 0.42, far below the 0.8 verification threshold => recall
# at t>=0.8 is 1 - (1 - t^4)^32 > 1 - 2e-8.
MINHASH_PERMS = 128
LSH_BANDS = 32
LSH_ROWS = 4

SIMHASH_BITS = 48
SIMHASH_BANDS = 4  # exact for hamming <= SIMHASH_BANDS - 1


def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id row per distinct value of `cols`.
    Hash-shuffle on the content columns; map-side partial aggregation
    makes this one narrow pass + one shuffle of distinct values only."""
    return df.groupBy(*cols).agg(F.min(id_col).alias(id_col))


def _shingle_table(docs: DataFrame, n: int = 3) -> DataFrame:
    toks = tokens_col("text")
    return docs.select(
        "doc_id", word_shingles(toks, n).alias("shingles")
    ).withColumn("sz", F.size("shingles"))


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, n: int = 3
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity join via shared-shingle
    blocking (no cross join). Output: (doc_a, doc_b, jaccard) with
    doc_a < doc_b and jaccard >= threshold.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) — exact ints, one division,
    bit-identical to the oracle."""
    sh = _shingle_table(docs, n)
    ex = sh.select("doc_id", "sz", F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sa"),
            F.col("b.sz").alias("sb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("inter")
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature(shingles: Column) -> Column:
    """128-permutation MinHash signature as an array<long>.

    Permutation i re-hashes the per-shingle xxhash64 with i as a second
    hashed word: sig[i] = min over shingles of xxhash64(xxhash64(s), i).
    Pure JVM built-ins — no UDF, no shuffle."""
    hs = F.transform(shingles, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(F.transform(hs, lambda h: F.xxhash64(h, F.lit(i))))
            for i in range(MINHASH_PERMS)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.8, n: int = 3
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard-verified.

    signature -> 32 bands of 4 rows -> explode (band_idx, band_hash) ->
    self-equi-join on the band key (the ONLY shuffle over pairs) ->
    distinct candidates -> exact Jaccard verification >= threshold.
    Output schema matches `ngram_jaccard_pairs` (it computes the same
    answer with near-certain probability, at LSH cost)."""
    sh = _shingle_table(docs, n).filter(F.col("sz") > 0)
    sig = sh.select(
        "doc_id", "sz", "shingles",
        minhash_signature(F.col("shingles")).alias("sig"),
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", j * LSH_ROWS + r + 1)
                                for r in range(LSH_ROWS)
                            ]
                        ).alias("bh"),
                    )
                    for j in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("sz").alias("sa"),
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("sz").alias("sb"),
    )
    ver = cand.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.col("sa") + F.col("sb") - inter)
    return (
        ver.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_col(shingles: Column) -> Column:
    """48-bit SimHash over a shingle array, md5-based so the oracle can
    reproduce it: feature hash = int(md5(s)[:12], 16); bit i of the
    SimHash is set iff 2*(count of features with bit i set) > n_features.

    Built-in-only: md5 -> conv(hex,16,10) -> bit votes via filter/size.
    48 bits keeps every intermediate exactly representable everywhere."""
    hs = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long"),
    )
    n = F.size(hs)
    bits = [
        F.when(
            F.size(
                F.filter(hs, lambda h: F.shiftright(h, i).bitwiseAND(1) == 1)
            )
            * 2
            > n,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(SIMHASH_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, n: int = 3
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming,
    found EXACTLY via (max_hamming+1)-band blocking (pigeonhole: a pair
    within hd<=3 agrees on at least one of 4 disjoint 12-bit bands).
    Output: (doc_a, doc_b, hamming)."""
    assert max_hamming == SIMHASH_BANDS - 1, "bands fixed for hd<=3"
    sh = _shingle_table(docs, n).filter(F.col("sz") > 0)
    sim = sh.select(
        "doc_id", simhash_col(F.col("shingles")).alias("simhash")
    )
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    bands = sim.select(
        "doc_id", "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright("simhash", j * width)
                        .bitwiseAND(mask)
                        .alias("bv"),
                    )
                    for j in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bv")
    a, b = bands.alias("a"), bands.alias("b")
    hd = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hd.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
