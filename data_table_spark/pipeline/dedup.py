"""Deduplication operators: exact, n-gram Jaccard set-similarity join,
MinHash+LSH, SimHash.

Scale design (the point of these over naive all-pairs):
- `ngram_jaccard_pairs` blocks on SHARED SHINGLES (explode + equi-join,
  shuffle key = shingle) — the classic set-similarity join. Cost is
  sum over shingles of (docs sharing it)^2, not |docs|^2.
- `jaccard_prefix_pairs` adds PPJoin-style prefix filtering on top:
  only the |s|-ceil(t*|s|)+1 globally-rarest shingles of each doc
  join (lossless at jaccard >= t). The frequency-ranking pass costs
  two extra small shuffles, so it only wins once shingle buckets get
  hot — i.e., at real corpus scale, which is exactly when the plain
  shingle join melts down. Both produce identical output (shared
  oracle).
- `minhash_lsh_pairs` blocks on (band, band-hash) of a 126-perm MinHash
  signature (b=21 bands x r=6 rows). Candidate pairs are then verified
  with EXACT Jaccard, so output equals the exact join with probability
  1 - (1 - t^r)^b per true pair (≈1-1e-7 at t=0.9) — which is why the
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

# MinHash parameters. b*r = 126 permutations; threshold curve midpoint
# (1/b)^(1/r) ≈ 0.60. r=6 keeps band-collision odds for UNRELATED pairs
# tiny (j=0.2 -> j^6*21 ≈ 0.13% candidate rate vs ~5% at r=4 — candidate
# verification cost drops ~30x) while recall at j>=0.8 stays
# 1-(1-0.8^6)^21 ≈ 0.9982 and at the corpus's real near-dups (j>=0.9)
# 1-(1-0.9^6)^21 ≈ 1-1e-7.
MINHASH_PERMS = 126
LSH_BANDS = 21
LSH_ROWS = 6

SIMHASH_BITS = 48
SIMHASH_BANDS = 4  # exact for hamming <= SIMHASH_BANDS - 1


def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id row per distinct value of `cols`.
    Hash-shuffle on the content columns; map-side partial aggregation
    makes this one narrow pass + one shuffle of distinct values only.
    Returns the content columns — when only the surviving ids are
    needed (the usual keep-list at corpus scale), `dedup_exact_ids`
    shuffles a 128-bit digest instead of the content bytes."""
    return df.groupBy(*cols).agg(F.min(id_col).alias(id_col))


def dedup_exact_ids(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep-list form of exact dedup: the surviving id per distinct
    content value, grouped on a 128-bit md5 of the content columns so
    the shuffle carries (16-byte digest, id) PER ROW instead of the
    content itself — at 100 TB that is the difference between shuffling
    ~tens of bytes per document and re-shuffling the corpus. Collision
    odds are the md5 birthday bound: ~1e-15 at 10^12 documents, far
    below any hardware error rate, so the result is exact for every
    real corpus. Columns are joined with an \\x1f separator so
    ("ab","c") and ("a","bc") hash differently, and each value is
    length-prefixed so NULL (encoded as a bare "n") can never collide
    with any real string (concat_ws would otherwise silently DROP
    nulls, merging ("a",NULL,"b") with ("a","b"))."""
    enc = [
        F.coalesce(
            F.concat(
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            ),
            F.lit("n"),
        )
        for c in cols
    ]
    # unhex -> BinaryType so the grouping key really is 16 bytes on the
    # wire, not md5's 32-char hex string
    key = F.unhex(F.md5(F.concat_ws("\x1f", *enc)))
    return (
        df.groupBy(key.alias("__h__"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def spread(df: DataFrame) -> DataFrame:
    """Ensure enough input partitions to parallelize expression-heavy
    narrow stages. Single-file scans arrive as 1 partition, which
    serializes everything until the first shuffle; one cheap round-robin
    repartition fixes that. No-op when the scan already has parallelism
    (the 100 TB case: thousands of file splits), so no extra shuffle at
    scale."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)


def _shingle_table(docs: DataFrame, n: int = 3) -> DataFrame:
    toks = tokens_col("text")
    return spread(docs).select(
        "doc_id", word_shingles(toks, n).alias("shingles")
    ).withColumn("sz", F.size("shingles"))


def positional_ngrams(docs: DataFrame, n: int = 3) -> DataFrame:
    """POSITIONAL word-n-gram rows (doc_id, pos, g): one row per
    starting token position (0-based), NOT distinct — positions matter
    to span-level consumers (`dup_span_profile`). Built relationally:
    posexplode tokens -> window lead() to assemble n-grams.

    This is the hot-path encoding on purpose: the array-column form
    (`word_shingles`) uses higher-order functions which Spark evaluates
    INTERPRETED and re-evaluates per reference after projection
    collapse — measured ~50x slower at sf0.1. Everything here is
    whole-stage codegen; the one shuffle (doc_id) is shared by every
    downstream per-doc aggregate."""
    tok = spread(docs).select(
        "doc_id",
        F.posexplode(tokens_col("text")).alias("pos", "tok"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", k).over(w) for k in range(1, n)
    ]
    tri = tok.select(
        "doc_id",
        "pos",
        F.concat_ws(" ", *parts).alias("g"),
        F.lead("tok", n - 1).over(w).alias("_full"),
    )
    return tri.filter(F.col("_full").isNotNull()).select(
        "doc_id", "pos", "g"
    )


def shingle_rows(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct (doc_id, shingle) ROWS — the set-semantics view of
    `positional_ngrams` (see there for the codegen rationale)."""
    return (
        positional_ngrams(docs, n)
        .select("doc_id", F.col("g").alias("s"))
        .distinct()
    )


def shingle_sizes(sr: DataFrame) -> DataFrame:
    return sr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, n: int = 3
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity join via shared-shingle
    blocking (no cross join). Output: (doc_a, doc_b, jaccard) with
    doc_a < doc_b and jaccard >= threshold.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) — exact ints, one division,
    bit-identical to the oracle."""
    # NOTE: no persist() here — caching pins the static shuffle
    # partitioning and disables AQE coalescing above it, which measured
    # slower than recomputing this cheap codegen pipeline. Instead
    # (r14) the distinct shingle rows are materialized ONCE per run by
    # a lazy localCheckpoint and every consumer branch (sizes, size
    # join, both self-join sides — 4x recomputed before) reads the
    # same blocks. A repartition("doc_id") anchor is a silent no-op
    # here — the distinct's output is already hash(doc_id)-partitioned,
    # so the optimizer removes it and the duplication returns; the
    # checkpoint vs anchor A/B read 0.88x (OPTIMIZATION_r14.md).
    sr = shingle_rows(docs, n).localCheckpoint(eager=False)
    # count("s") not count(1): s (concat_ws output) is never null so the
    # counts are identical, but consuming s keeps the size branch's
    # column set equal to the join probe's below the anchor — the
    # column-pruning symmetry exchange reuse needs (see _dup_gram_set)
    sz = sr.groupBy("doc_id").agg(F.count("s").alias("sz"))
    ex = sr.join(sz, "doc_id").select("doc_id", "sz", "s")
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


def dup_span_profile(
    docs: DataFrame, n: int = 5, min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Per-document duplicated-SPAN profile — the bounded-width n-gram
    form of exact substring deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", which
    uses suffix arrays; fixed-width grams trade unbounded match length
    for a plan that is two hash shuffles and one window sweep).

    A token position is "duplicated" when it is covered by ANY word
    n-gram that also occurs in >= min_df distinct documents. Output:
    (doc_id, n_tokens, dup_tokens, dup_frac) for every document —
    dup_frac is the fraction of the document lying inside cross-corpus
    duplicated spans, the signal used to drop or trim boilerplate-heavy
    documents before training.

    Plan (scale notes): positional grams are codegen'd lead() windows
    on the doc_id partitioning; the duplicated-gram set is a hash
    aggregate SHUFFLED ON THE GRAM (map-side combining, never a pair
    join) — for min_df=2 it is a single min/max-doc_id aggregate
    (df>=2 ⟺ min!=max, no distinct pre-shuffle), the general min_df
    pays one extra distinct; matched start positions come back via one
    equi-join on the gram; coverage is an interval-union sweep — a RUNNING
    max(pos+n) frame (unbounded PRECEDING, incremental — never the
    O(rows^2) unbounded-following form) so overlapping matches are not
    double-counted. No collects, no cross joins, no arrays on a
    shuffle. Reference has no such operator (nearest: R/duplicated.R
    whole-row semantics); this is the north-star pipeline extension."""
    toks = spread(docs).select(
        "doc_id", F.size(tokens_col("text")).alias("n_tokens")
    )
    # r14 optimization: anchor the positional-gram pipeline below ONE
    # keyed Exchange on the gram so its two consumers (the duplicated-
    # gram aggregate and the hits probe) share a single materialization
    # (AQE stage reuse of canonically-identical exchanges) instead of
    # each re-running posexplode + the lead() gram window. The gram
    # rows were ALREADY being shuffled on `g` inside the aggregate
    # branch, so this adds no shuffle bytes at any scale — it removes
    # one full gram-assembly pass and one doc_id shuffle of all token
    # rows. The aggregate and the equi-join both consume the hash(g)
    # clustering directly (no further exchange on g).
    #
    # The explicit doc_id IS NOT NULL filter exists to keep the two
    # branches CANONICALLY IDENTICAL: the final left join infers
    # isnotnull(doc_id) into the probe branch only, and one asymmetric
    # filter below the anchor defeats exchange reuse (measured: the
    # gram window ran twice without it, once with it). It is output-
    # invariant: a null-doc_id row can never reach the output through
    # the hits path (cov joins back on doc_id), and min/max/distinct-df
    # aggregates all skip nulls, so no gram's duplicated-status changes.
    pg = positional_ngrams(
        docs.filter(F.col("doc_id").isNotNull()), n
    ).repartition("g")
    hits = pg.join(_dup_gram_set(pg, min_df, max_df), "g").select(
        "doc_id", "pos"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_e = F.max(F.col("pos") + n).over(w)
    contrib = F.greatest(
        F.lit(0),
        (F.col("pos") + F.lit(n))
        - F.greatest(F.col("pos"), F.coalesce(prev_e, F.col("pos"))),
    )
    cov = (
        hits.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("dup_tokens"))
    )
    return (
        toks.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.col("dup_tokens").cast("double") / F.col("n_tokens"),
        )
    )


def _dup_gram_set(
    pg: DataFrame, min_df: int, max_df: int | None = None
) -> DataFrame:
    """Grams occurring in >= min_df DISTINCT documents (and <= max_df
    when given — the over-common cap: a gram in half the corpus is
    stopword boilerplate, not a dedupable span, and capping it also
    removes the one skewable key from the downstream hits join; same
    rationale as winnowing's max_df). min_df=2 with no cap (the
    default everywhere) is a single min/max-doc_id aggregate (df >= 2
    ⟺ min != max — one map-side-combining shuffle on the gram); a cap
    or a higher min_df needs the df COUNT, paying an extra distinct
    pre-shuffle — that is the cap's honest price."""
    if min_df == 2 and max_df is None:
        # min/max over struct(doc_id, pos), not bare doc_id: the struct
        # min's lexicographic order still yields the min/max doc_id in
        # its first field (identical filter result), and the aggregate
        # then CONSUMES pos — which keeps this branch's column set
        # identical to the hits-probe branch below the callers' shared
        # hash(g) anchor exchange. Asymmetric column pruning was the
        # last thing defeating exchange reuse (r14, measured: gram
        # window 2x with bare min/max, 1x with the struct form).
        return (
            pg.groupBy("g")
            .agg(
                F.min(F.struct("doc_id", "pos")).alias("lo"),
                F.max(F.struct("doc_id", "pos")).alias("hi"),
            )
            .filter(F.col("lo.doc_id") != F.col("hi.doc_id"))
            .select("g")
        )
    out = (
        pg.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        # count("doc_id"), not count(1): df counts distinct DOCUMENTS,
        # and a null doc_id is not a document — this also makes the
        # callers' doc_id-notnull pre-filter provably output-invariant
        # (r14; previously a (g, NULL) pair counted toward df)
        .agg(F.count("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out.select("g")


def dedup_spans_remove(
    docs: DataFrame, n: int = 5, min_df: int = 2,
    keep_first: bool = False, max_df: int | None = None,
) -> DataFrame:
    """Remove cross-corpus duplicated SPANS from each document — the
    action to `dup_span_profile`'s measurement (same bounded-width
    reading of Lee et al. 2021 substring dedup). Every token position
    covered by a word n-gram occurring in >= min_df distinct documents
    is dropped. ``keep_first=True`` is the Lee-et-al-faithful keep-one
    form: the gram's canonical holder (its MIN doc_id — a global,
    deterministic tie-break the min/max aggregate already computes)
    KEEPS the span and only the other documents lose it; the default
    drops all occurrences (the symmetric variant). keep_first requires
    min_df=2 (the canonical holder comes from the min/max encoding).
    Output: (doc_id, n_tokens, kept_tokens,
    text_clean) for every document; text_clean is '' when the whole
    document is duplicated spans.

    Plan: matched starts explode into n covered positions, and tokens
    ANTI-join them on (doc_id, pos) — an anti join absorbs duplicate
    covered positions with no distinct pass. Reassembly is one
    per-doc sort_array(collect_list(struct(pos,tok))) on the doc_id
    partitioning the token explode already established. Document size
    bounds the collect_list, not corpus size."""
    tok = spread(docs).select(
        "doc_id",
        F.posexplode(tokens_col("text")).alias("pos", "tok"),
    )
    # r14 optimization: same shared-exchange anchoring (and the same
    # output-invariant doc_id-notnull symmetry filter) as
    # dup_span_profile — the holder/dup-gram aggregate and the hits
    # probe read one materialized hash(g) shuffle of the gram rows
    # instead of re-running the gram assembly per branch. Null-doc_id
    # hits could never survive the (doc_id, pos) anti-join anyway.
    pg = positional_ngrams(
        docs.filter(F.col("doc_id").isNotNull()), n
    ).repartition("g")
    if keep_first:
        if min_df != 2:
            raise ValueError("keep_first requires min_df=2")
        # struct min/max for the same column-set symmetry as
        # _dup_gram_set (see there): lo.doc_id IS the min doc_id
        holders = (
            pg.groupBy("g")
            .agg(
                F.min(F.struct("doc_id", "pos")).alias("lo_s"),
                F.max(F.struct("doc_id", "pos")).alias("hi_s"),
            )
            .filter(F.col("lo_s.doc_id") != F.col("hi_s.doc_id"))
            .select("g", F.col("lo_s.doc_id").alias("lo"))
        )
        hits = (
            pg.join(holders, "g")
            .filter(F.col("doc_id") != F.col("lo"))
            .select("doc_id", "pos")
        )
    else:
        hits = pg.join(_dup_gram_set(pg, min_df, max_df), "g").select(
            "doc_id", "pos"
        )
    cover = hits.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (n - 1))
        ).alias("pos"),
    )
    kept = tok.join(cover, ["doc_id", "pos"], "left_anti")
    asm = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_clean"),
    )
    sizes = spread(docs).select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    return sizes.join(asm, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("kept_tokens"), F.lit(0))
        .cast("long")
        .alias("kept_tokens"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )


import random as _random

_rng = _random.Random(42)
# Universal multiply-add-mod family over the 31-bit-masked base hash:
# h' = xxhash64(s) & (2^31-1); perm_i(h') = (a_i*h' + b_i) mod p with the
# Mersenne prime p = 2^31-1. a,b < 2^31 keeps products < 2^62 — no int64
# overflow under ANSI mode. 31-bit shingle space is ample for minhash
# (only the per-permutation relative order matters).
_P31 = (1 << 31) - 1
_PERM_A = [(_rng.randrange(1, 1 << 30) * 2 + 1) for _ in range(MINHASH_PERMS)]
_PERM_B = [_rng.randrange(0, _P31) for _ in range(MINHASH_PERMS)]


def _perm_min_aggs() -> list[Column]:
    """One MIN aggregate per permutation over the exploded shingle-hash
    column `h`. Flat relational encoding on purpose: Spark's array
    higher-order functions (aggregate/zip_with/transform) run as
    INTERPRETED expressions outside whole-stage codegen, which made an
    array-fold signature ~50x slower; a projection + hash-aggregate of
    126 mins stays fully codegen'd and partial-aggregates map-side."""
    # Built as parsed SQL strings: one py4j round-trip per permutation
    # instead of ~8 for the equivalent Column-builder calls — measured
    # ~1.9s -> ~0.1s of driver-side plan construction at 126 perms.
    return [
        F.expr(f"min(pmod({a}L * h + {b}L, {_P31}L)) as sig{i}")
        for i, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    ]


def minhash_signature(shingles: Column) -> Column:
    """126-permutation MinHash signature as an array<long> (array-column
    form for API parity; `minhash_lsh_pairs` uses the faster relational
    encoding of the same permutations — see _perm_min_aggs)."""
    hs = F.transform(
        shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(_P31))
    )
    return F.array(
        *[
            F.array_min(
                F.transform(
                    hs, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_P31))
                )
            )
            for a, b in zip(_PERM_A, _PERM_B)
        ]
    )


def lsh_band_index(
    docs: DataFrame, n: int = 3, with_shingles: bool = False,
    sr: DataFrame | None = None,
) -> DataFrame:
    """LSH band index over a corpus: (doc_id, band, bh) rows, one per
    (document, band), where bh = xxhash64 of the band's LSH_ROWS
    minhash-signature slots. This is the shared candidate-generation
    substrate of `minhash_lsh_pairs` (self-join on (band, bh)) and the
    streaming near-dup screen (stream-static join on (band, bh)).

    Signature computation is the relational encoding: codegen'd
    projection of MINHASH_PERMS permutations -> map-side-combining hash
    aggregate of mins (see _perm_min_aggs; the array-HOF form runs
    interpreted, measured ~50x slower). Documents with fewer than n
    tokens have no shingles and no index rows (they cannot near-dup).

    ``with_shingles`` additionally attaches the per-doc distinct
    shingle SET (collect_set over the shingle rows) as an array column
    `sh` — the join-time verification payload for the streaming screen,
    where Spark's single-streaming-aggregation limit rules out the
    batch onepass roll-up. Batch callers should leave it off: arrays
    riding a candidate shuffle was the r2 OOM lesson.

    ``sr`` (r14 optimization) lets a caller that ALSO consumes the
    shingle rows pass its own (typically exchange-anchored) shingle
    table so the expensive gram assembly is shared instead of
    recomputed per consumer; None keeps the self-contained behavior."""
    if sr is None:
        sr = shingle_rows(docs, n)
    ex = sr.select(
        "doc_id", F.xxhash64("s").bitwiseAND(F.lit(_P31)).alias("h")
    )
    sig = ex.groupBy("doc_id").agg(*_perm_min_aggs())
    band_structs = ", ".join(
        "struct({j} as band, xxhash64({cols}) as bh)".format(
            j=j,
            cols=", ".join(
                f"sig{j * LSH_ROWS + r}" for r in range(LSH_ROWS)
            ),
        )
        for j in range(LSH_BANDS)
    )
    bands = sig.select(
        "doc_id", F.expr(f"explode(array({band_structs})) as bb")
    ).select("doc_id", "bb.band", "bb.bh")
    if with_shingles:
        sh = sr.groupBy("doc_id").agg(F.collect_set("s").alias("sh"))
        bands = bands.join(sh, "doc_id")
    return bands


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.8, n: int = 3,
    verify: str = "onepass", broadcast: str = "auto",
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard-verified.

    signature -> 21 bands of 6 rows -> explode (band_idx, band_hash) ->
    self-equi-join on the band key (the ONLY shuffle over pairs) ->
    distinct candidates -> exact Jaccard verification >= threshold.
    Output schema matches `ngram_jaccard_pairs` (it computes the same
    answer with near-certain probability, at LSH cost).

    ``verify`` picks the exact-verification strategy (identical output,
    measured at sf0.1/local[32], interleaved 3-rep medians):
    - "onepass" (default): explode candidates into (pair, doc, side)
      memberships, broadcast-join the shingle rows ONCE, roll up side
      flags. Minimum total work (2 shingle scans, no full-partition
      size windows) — the saturated-cluster / 100 TB choice, and the
      measured local winner too (median 4.4s warm / 5.1s cold vs
      parallel's 5.2s / 8.9s; an earlier round measured the opposite
      cold ordering — ambient noise on this box is ±50%, so the
      scale-principled choice wins the tie).
    - "parallel": per-side joins against the shingle rows. Recomputes
      the shingle subtree per branch (3 scans total), but the branches
      are independent stages Spark runs CONCURRENTLY with the signature
      branch — worth trying on a cluster with idle slots.
    (A persisted-shingles variant loses badly at this SF — persist()
    disables AQE above the cache and pins 32-partition shuffles.
    NEGATIVE RESULT, r15 session 2: porting jaccard_prefix_pairs' r15
    row-local array_intersect verify here measured ~1.0x at sf1
    (interleaved decomposition, quietest rep 8.2s onepass vs 8.6s
    local; candidates-only 4.8s). LSH blocking already prunes to ~2.5k
    candidates at sf1 — vs jaccard_prefix's 2.29M — so the pair-side
    explode the local form removes is negligible here, and BOTH forms
    pay the same second corpus-scale pass over the shingle rows
    (membership join vs per-doc set aggregate). Do not re-try.)

    ``broadcast`` governs how the onepass membership frame joins the
    shingle rows. The candidate count scales with near-dup DENSITY,
    not a constant — a dup-heavy 100 TB crawl can emit billions of
    candidate pairs, which no driver broadcast holds — so the default
    is "auto": no hint, AQE's runtime stats convert the join to
    broadcast only when the membership side is actually under
    spark.sql.adaptive.autoBroadcastJoinThreshold, and keep a shuffle
    equi-join on doc_id otherwise (identical semantics, one extra
    exchange, no size cliff). "force" restores the unconditional
    F.broadcast hint (small corpora where even the first shuffle of
    mem is not worth it); "never" pins the shuffle merge join (the
    posture the `minhash_lsh_shuffle` driver twin runs against the
    same oracle).

    r14 optimization (plan-shape, identical output): the r13 plan ran
    the shingle pipeline (posexplode + lead-window gram assembly +
    distinct) THREE times — once per band-self-join side and once for
    verification — and the 126-permutation signature aggregate TWICE
    (once per join side), because the expensive compute sat above the
    highest shared exchange where Spark's reuse machinery cannot see
    it. Two materialization points fix both:
    - the distinct shingle rows are lazily localCheckpoint'ed — one
      computation for the signature aggregate and the verification
      join (an explicit repartition("doc_id") anchor is a silent
      no-op: the distinct's output is already hash(doc_id)-partitioned
      so the optimizer removes it, and the checkpoint also beat it for
      the shuffle twin, 0.86x);
    - `bands.repartition("band","bh")` anchors the band index; both
      sides of the candidate self-join read the one materialized
      shuffle (which the join needs on exactly that key anyway).
    Net at any scale: one gram-assembly pass instead of three, one
    signature computation instead of two, and no new shuffle bytes —
    the band join and the signature input were already shuffling on
    these keys inside the duplicated branches.

    The doc_id-notnull pre-filter keeps every consumer branch
    canonically identical (the verification join infers
    isnotnull(doc_id) into only one branch otherwise, which defeats
    exchange reuse — measured). Output-invariant: every emitted pair
    satisfies doc_a < doc_b, which a null doc_id can never do."""
    sr = shingle_rows(
        docs.filter(F.col("doc_id").isNotNull()), n
    ).localCheckpoint(eager=False)
    bands = lsh_band_index(docs, n, sr=sr).repartition("band", "bh")
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
    if verify == "onepass":
        # ONE pass over the shingle rows: explode candidates into
        # (pair, doc, side) memberships (tiny — broadcast), join sr
        # once, roll side flags up to |A|, |B|, intersection. sr is
        # distinct per doc, so each (pair, s) sees at most one row per
        # side: na/nb are 0/1 flags and na*nb marks an intersection.
        mem = cand.select(
            "doc_a",
            "doc_b",
            F.expr(
                "explode(array(struct(doc_a as doc_id, 1 as a_side),"
                " struct(doc_b as doc_id, 0 as a_side))) as m"
            ),
        ).select("doc_a", "doc_b", "m.doc_id", "m.a_side")
        if broadcast == "force":
            mem = F.broadcast(mem)
        elif broadcast == "never":
            mem = mem.hint("SHUFFLE_MERGE")
        elif broadcast != "auto":
            raise ValueError(f"bad broadcast: {broadcast}")
        j = sr.join(mem, "doc_id")
        per_s = j.groupBy("doc_a", "doc_b", "s").agg(
            F.sum("a_side").alias("na"),
            F.sum(1 - F.col("a_side")).alias("nb"),
        )
        ver = per_s.groupBy("doc_a", "doc_b").agg(
            F.sum("na").alias("sa"),
            F.sum("nb").alias("sb"),
            F.sum(F.col("na") * F.col("nb")).alias("inter"),
        )
    else:
        # per-side joins: expand candidates by A's shingle rows
        # (carrying |A| via a per-doc count window), match against B's
        # rows (carrying |B|), count matches per pair. The sr branches
        # are independent and overlap the signature computation.
        from pyspark.sql import Window as _W

        szw = F.count(F.lit(1)).over(_W.partitionBy("doc_id"))
        srz = sr.withColumn("sz", szw)
        pa = srz.select(
            F.col("doc_id").alias("doc_a"), "s", F.col("sz").alias("sa")
        )
        pb = srz.select(
            F.col("doc_id").alias("doc_b"), "s", F.col("sz").alias("sb")
        )
        ver = (
            cand.join(pa, "doc_a")
            .join(pb, ["doc_b", "s"])
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("inter"),
                F.first("sa").alias("sa"),
                F.first("sb").alias("sb"),
            )
        )
    jac = F.col("inter").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("inter")
    )
    return (
        ver.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_col(shingles: Column) -> Column:
    """48-bit SimHash over a shingle array, md5-based so the oracle can
    reproduce it: feature hash = int(md5(s)[:12], 16); bit i of the
    SimHash is set iff 2*(count of features with bit i set) > n_features.
    (Array-column form; `simhash_table` computes the same hash
    relationally for speed — array higher-order fns are interpreted.)"""
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


def simhash_table(sr: DataFrame) -> DataFrame:
    """(doc_id, simhash) from shingle ROWS via the codegen-friendly
    relational encoding: md5/conv projection -> 48 conditional-sum
    aggregates (bit votes) -> bit assembly. Whole-stage codegen
    throughout; map-side partial aggregation."""
    ex = sr.select(
        "doc_id",
        F.conv(F.substring(F.md5("s"), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    )
    votes = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright("h", i).bitwiseAND(1)).alias(f"ones{i}")
            for i in range(SIMHASH_BITS)
        ],
    )
    bit_sum = None
    for i in range(SIMHASH_BITS):
        b = F.when(
            2 * F.col(f"ones{i}") > F.col("n"), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        bit_sum = b if bit_sum is None else bit_sum + b
    return votes.select("doc_id", bit_sum.alias("simhash"))


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, n: int = 3
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming,
    found EXACTLY via (max_hamming+1)-band blocking (pigeonhole: a pair
    within hd<=3 agrees on at least one of 4 disjoint 12-bit bands).
    Output: (doc_a, doc_b, hamming)."""
    assert max_hamming == SIMHASH_BANDS - 1, "bands fixed for hd<=3"
    sim = simhash_table(shingle_rows(docs, n))
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
    # r14 optimization: anchor the band rows below the (band, bv)
    # Exchange the self-join needs anyway, so both join sides read ONE
    # materialization of the 48-bit-vote simhash aggregate instead of
    # re-running it per side (the a.doc_id < b.doc_id condition infers
    # isnotnull(doc_id) into both sides symmetrically, and both sides
    # consume identical columns, so the exchanges canonicalize equal)
    bands = bands.repartition("band", "bv")
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


def jaccard_prefix_pairs(
    docs: DataFrame, threshold: float = 0.8, n: int = 3
) -> DataFrame:
    """Exact Jaccard similarity join with PREFIX FILTERING (PPJoin-style)
    — the 100 TB form of `ngram_jaccard_pairs`.

    Order each doc's shingles by global document frequency (rarest
    first, shingle string as tie-break); only the first
    |s| - ceil(t*|s|) + 1 ("prefix") shingles join. Theory: two sets
    with jaccard >= t overlap in >= ceil(t*|s|) elements, so under ANY
    consistent global order their prefixes must intersect — candidate
    generation is lossless while the join input shrinks ~t-fold and,
    more importantly, hot (frequent) shingles mostly fall OUT of
    prefixes, collapsing the quadratic bucket blowup on common
    shingles. Verification is the same relational exact-Jaccard count
    as the LSH path.

    LOSSLESSNESS UNDER FLOAT: every ceil'd bound here subtracts _EPS
    first. t*|s| and t/(1+t)*(|A|+|B|) are float products whose last
    bit can land ABOVE the exact rational value (0.8*35 =
    28.000000000000004 -> ceil 29, wrongly excluding a pair at jaccard
    exactly 0.8). ceil(x - eps) relaxes each bound by at most one unit
    in those boundary cases — a few extra CANDIDATES, which exact
    verification then filters, so the output stays bit-identical to
    the exact oracle while the pruning claim stays honest."""
    from pyspark.sql import Window as _W

    _EPS = 1e-6  # >> float64 rounding error at any realistic t*|s|

    def _fceil(x):
        return F.ceil(x - F.lit(_EPS))

    # r14 optimization: ONE materialized shingle table for the FIVE
    # consumer branches (df ranking, the ranked join probe, both
    # verification sides, and the prefix self-join) via a lazy
    # localCheckpoint — the checkpoint-vs-recompute A/B read 0.74x
    # (OPTIMIZATION_r14.md; a repartition("doc_id") anchor is a silent
    # no-op on the already-doc_id-partitioned distinct). The
    # doc_id-notnull filter is output-invariant (pairs require
    # doc_a < doc_b) and count("doc_id") == count(1) under it.
    sr = shingle_rows(
        docs.filter(F.col("doc_id").isNotNull()), n
    ).localCheckpoint(eager=False)
    df_freq = sr.groupBy("s").agg(F.count("doc_id").alias("df"))
    ranked = (
        sr.join(df_freq, "s")
        .withColumn(
            "rk",
            F.row_number().over(
                _W.partitionBy("doc_id").orderBy("df", "s")
            ),
        )
        .withColumn("sz", F.count(F.lit(1)).over(_W.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rk") <= F.col("sz") - _fceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("doc_id", "s", "sz", "rk")
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin in-join filters (both codegen'd, applied BEFORE the
    # distinct, which is what keeps the candidate set bounded when the
    # shingle space saturates — measured on the synthetic corpus, whose
    # ~30k distinct shingles over 2.6M rows make prefixes alone prune
    # poorly):
    # - length filter: jaccard >= t forces t*|B| <= |A| (and symm.)
    # - position filter: a match at prefix ranks (rka, rkb) caps the
    #   achievable overlap at min(|A|-rka, |B|-rkb)+1, which must reach
    #   alpha = ceil(t/(1+t) * (|A|+|B|)) (PPJoin's Allen et al. bound)
    alpha = _fceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("a.sz") + F.col("b.sz"))
    )
    max_overlap = (
        F.least(
            F.col("a.sz") - F.col("a.rk"), F.col("b.sz") - F.col("b.rk")
        )
        + 1
    )
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.sz") >= _fceil(F.lit(threshold) * F.col("b.sz")))
            & (F.col("b.sz") >= _fceil(F.lit(threshold) * F.col("a.sz")))
            & (max_overlap >= alpha),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # r15 optimization (guide §2.3 — VERDICT r14 item 3): verification
    # was the measured bottleneck, NOT the prefix self-join. sf1
    # decomposition: candidate join 1.4s -> 2.29M candidates, but the
    # relational verify (cand x |A| explode through two joins + a
    # 119M-row hash aggregate) took 26.5s of the 27.4s query. Verify
    # row-LOCALLY instead: each doc's distinct shingle set is collected
    # into one sorted array (a bounded row — documents are
    # length-bounded, so |A| is too) and |A ∩ B| is computed per
    # candidate pair with array_intersect — same exact integer, same
    # sa/sb, hence the identical jaccard double and identical output
    # (layout/oracle gates re-proved). The pair table shuffles each
    # candidate twice carrying one array instead of exploding it into
    # |A| rows, and no pair-grouped aggregate remains.
    sets = sr.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("s")).alias("ss"),
        F.count("s").alias("szv"),
    )
    ver = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("ss").alias("ssa"),
                F.col("szv").alias("sa"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("ss").alias("ssb"),
                F.col("szv").alias("sb"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ssa", "ssb")).alias("inter"),
            "sa",
            "sb",
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("inter")
    )
    return (
        ver.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _cc_checkpointer(df_like: DataFrame, mode: str, checkpoint_dir):
    """Return the per-round lineage-cut function for iterative CC.

    "local" (default): ``localCheckpoint()`` — executor-local blocks,
    no HDFS round-trip, the right cost model on local[32] and on any
    cluster where re-running a failed job beats paying a distributed
    write per round. NOT fault-tolerant: losing an executor
    mid-iteration loses its blocks and kills the job.

    "reliable": ``checkpoint()`` against the session checkpoint dir —
    every round's edge/label table is written to the (replicated)
    checkpoint filesystem, so executor loss only recomputes from the
    last round, never from round 1. The 100 TB posture (round-9
    verdict "What's wrong" #2): a multi-hour CC over a trillion-edge
    graph cannot afford restart-from-scratch semantics.
    ``checkpoint_dir`` (or a previously configured
    ``setCheckpointDir``) is required."""
    if mode == "local":
        return lambda df: df.localCheckpoint()
    if mode != "reliable":
        raise ValueError(f"bad checkpoint_mode: {mode!r}")
    sc = df_like.sparkSession.sparkContext
    if checkpoint_dir is not None:
        sc.setCheckpointDir(checkpoint_dir)
    elif sc.getCheckpointDir() is None:
        raise ValueError(
            "checkpoint_mode='reliable' needs a checkpoint dir: pass "
            "checkpoint_dir= or call spark.sparkContext.setCheckpointDir"
        )
    return lambda df: df.checkpoint()


def cc_star_labels(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_mode: str = "local",
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, int]:
    """Connected components by large-star/small-star alternation
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — O(log^2 n) rounds regardless of component DIAMETER,
    vs min-label propagation's O(diameter). The strategy for
    skew-diameter graphs (chains of pairwise near-dups), where
    propagation would need one round per hop.

    large-star: every node's strictly-larger neighbors reattach to the
    minimum of its closed neighborhood; small-star: direct each edge
    high->low, then every node and its smaller neighbors reattach to
    the neighborhood minimum. The alternation contracts every
    component into a star centered at its minimum node; labels are
    then one groupBy away. Each round is two join+agg passes over the
    edge list — the same building blocks as propagation, checkpointed
    the same way (truncated lineage per round). Convergence = the
    canonical (high,low) edge set's (count, order-free hash-sum) pair
    is stable; rounds are returned for the skew-diameter evidence
    (test_cc_star_chain).

    Input: (doc_a, doc_b) pairs, any orientation, no self-loops
    required. Output: (doc_id, cluster_id) for every node THAT HAS AN
    EDGE (callers add singletons), plus the round count.

    ``checkpoint_mode``/``checkpoint_dir``: see ``_cc_checkpointer`` —
    "local" (default, executor-local, not fault-tolerant) or
    "reliable" (distributed checkpoint dir, survives executor loss;
    the 100 TB posture). Labels are identical either way — the mode
    only changes where the per-round lineage cut is materialized.

    Round shape (r15 optimization, guide §2.4 — VERDICT r14 item 6,
    "reduce per-round driver synchronization / fuse the star steps"):
    each star step computes its neighborhood minimum with a WINDOW
    aggregate over the edge partition key instead of groupBy+join —
    one hash exchange per step instead of an exchange for the
    aggregate plus the join's — and only the END of the round
    deduplicates (the star-output sets are provably identical with or
    without the two intermediate ``distinct``s: min() is
    duplicate-insensitive and the final ``distinct`` collapses both
    halves). In "local" mode the per-round lineage cut is LAZY, so the
    convergence-signature aggregate doubles as the materializing
    action: one Spark job per round instead of checkpoint-job +
    signature-job. Same edge sets, same signature, same labels, same
    round count — pinned by test_cc_star_round_shape_equivalence."""
    ckpt = _cc_checkpointer(edges, checkpoint_mode, checkpoint_dir)
    if checkpoint_mode == "local":
        # lazy cut: the signature aggregate right below materializes it
        _cut = lambda df: df.localCheckpoint(eager=False)
    else:
        _cut = ckpt
    from pyspark.sql import Window as _W

    e = _cut(
        edges.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetrized list: every strictly-larger
        # neighbor reattaches to the closed-neighborhood minimum
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m_ls = F.least(F.min("v").over(_W.partitionBy("u")), F.col("u"))
        e = (
            sym.withColumn("m", m_ls)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star on the high->low directed form: each row emits its
        # neighbor edge (v, m) and its node edge (u, m); duplicates from
        # both halves collapse in the single end-of-round distinct
        d = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m_ss = F.min("v").over(_W.partitionBy("u"))
        e = _cut(
            d.withColumn("m", m_ss)
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("v").alias("u"), F.col("m").alias("v")
                        ),
                        F.struct(
                            F.col("u").alias("u"), F.col("m").alias("v")
                        ),
                    )
                ).alias("uv")
            )
            .select("uv.u", "uv.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1000003))).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev:
            break
        prev = sig
    labels = e.groupBy("u").agg(F.min("v").alias("cluster_id")).select(
        F.col("u").alias("doc_id"), "cluster_id"
    )
    return labels, rounds


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    max_iter: int = 25,
    pairs: DataFrame | None = None,
    strategy: str = "star",
    checkpoint_mode: str = "local",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Duplicate CLUSTERS: connected components of the near-dup pair
    graph, labeled by the minimum reachable doc_id. This is the step a
    real dedup pipeline needs after pair generation — transitive
    closure ("A~B, B~C => one group") plus a canonical representative
    (the cluster_id IS the keeper's doc_id). Reference has no analog
    (its dedup surface is exact `duplicated`; R/duplicated.R:1-60).

    Algorithm: iterative min-label propagation over the symmetrized
    edge list — labels[v] <- min(labels[v], min labels of neighbors) —
    a fixpoint in O(component diameter) rounds. Near-dup graphs are
    low-diameter (stars/cliques of rewrites), so this converges in a
    handful of rounds; a billion-node skew-diameter graph would swap
    in the large-star/small-star alternation (Kiveris et al., "CC in
    MapReduce"), same join-agg building blocks. Scale mechanics:
    - edges and labels are localCheckpoint()ed each round: truncated
      lineage keeps round k from re-running rounds 1..k-1 (and keeps
      the plan from growing), at the cost of materializing one
      (node,label) table per round — the standard iterative-on-Spark
      posture.
    - convergence is detected by the label SUM (exact DECIMAL(38,0));
      labels only ever decrease, so an unchanged sum == fixpoint. One
      cheap agg per round on the checkpointed table, no self-join.
    - singleton docs keep cluster_id = doc_id (left join + coalesce).

    ``pairs``: pre-computed (doc_a, doc_b) pair table; defaults to the
    exact `ngram_jaccard_pairs` at `threshold` (deterministic, so the
    DuckDB recursive-CTE oracle can replay it).

    ``strategy``: "star" (default — Kiveris large-star/small-star
    alternation via `cc_star_labels`, O(log^2 n) rounds independent of
    component diameter; measured FASTER at every probed scale: 4.7s vs
    13.4s at sf0.01, 113s vs 445s at sf1, 10 vs ~399 rounds on a
    400-node chain — and robust to skew-diameter graphs where
    propagation silently stops at max_iter) or "label" (min-label
    propagation — one join+agg per round; kept for comparison and as
    the recursive-CTE oracle's direct analog). Identical output either
    way (same components, same min-id labels).

    ``checkpoint_mode``/``checkpoint_dir``: "local" (default) or
    "reliable" — see ``_cc_checkpointer``. Same labels either way;
    reliable mode survives executor loss mid-iteration at the cost of
    a distributed write per round."""
    if strategy not in ("label", "star"):
        raise ValueError(f"bad strategy: {strategy!r}")
    if pairs is None:
        pairs = ngram_jaccard_pairs(docs, threshold, n)
    if strategy == "star":
        lbl, _ = cc_star_labels(
            pairs.select("doc_a", "doc_b"),
            max_iter=max_iter,
            checkpoint_mode=checkpoint_mode,
            checkpoint_dir=checkpoint_dir,
        )
        return docs.select("doc_id").join(lbl, "doc_id", "left").select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    ckpt = _cc_checkpointer(docs, checkpoint_mode, checkpoint_dir)
    p = pairs.select("doc_a", "doc_b")
    edges = ckpt(p.union(
        p.select(F.col("doc_b"), F.col("doc_a")).toDF("doc_a", "doc_b")
    ))
    labels = ckpt(docs.select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    ))
    prev = None
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["doc_a"] == labels["doc_id"])
            .select(F.col("doc_b").alias("doc_id"), "cluster_id")
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        labels = ckpt(
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("nbr_min", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        s = labels.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if s == prev:
            break
        prev = s
    return labels


def winnow_fingerprints(
    df: DataFrame,
    k: int = 12,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every character k-gram, slide a w-hash window,
    keep each window's minimum — a position-robust fingerprint set
    whose density is ~2/(w+1) regardless of document length, with a
    guarantee the classic global-min fingerprint lacks: any shared
    substring of length >= k + w - 1 yields at least one shared
    selected hash.

    Plan shape: per-doc gram array (narrow codegen), posexplode, ONE
    per-doc window min (partitioned — no global window), distinct.
    md5 hashes are bit-identical across engines and string MIN is
    plain lexicographic in both, so the DuckDB oracle matches exactly.
    """
    from pyspark.sql import Window

    c = F.col(text_col)
    # gram hashes via posexplode of the POSITION sequence + row-level
    # substr/md5 — whole-stage codegen. The F.transform(array, md5)
    # form computes the same thing 13x slower (array higher-order
    # functions run interpreted — the dedup.py:84 finding again,
    # measured 1.86s -> 0.14s at sf0.1 for this exact expression).
    # The when-guard matters: sequence(1, len-(k-1)) with len < k
    # would generate a DESCENDING sequence, not an empty one.
    pos_arr = F.when(
        F.length(c) >= k, F.sequence(F.lit(1), F.length(c) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col), F.col(text_col),
        F.posexplode(pos_arr).alias("pos0", "pos"),
    ).select(
        id_col, "pos",
        F.md5(F.col(text_col).substr(F.col("pos"), F.lit(k))).alias("h"),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(w - 1), 0)
    )
    # fingerprints = the DISTINCT window-minimum VALUES over all full
    # windows. (Selecting rows where the current gram equals its window
    # min instead is subtly wrong: a window whose minimum sits at an
    # earlier position contributes nothing at that row, and a document
    # of near-identical grams can end up with ZERO fingerprints —
    # found by the hypothesis coverage-guarantee test.)
    return (
        exploded.withColumn("wmin", F.min("h").over(win))
        .filter(F.col("pos") >= w)
        .select(id_col, F.col("wmin").alias("h"))
        .distinct()
    )


def winnow_dup_pairs(
    df: DataFrame,
    k: int = 12,
    w: int = 8,
    min_shared: int = 5,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowing fingerprints —
    substring-level near-dup detection (robust to reordering of large
    blocks, the case token-set MinHash underweights).

    The join is fingerprint-blocked: only (doc_id, hash) pairs ride the
    shuffle and the cost is sum(df_h^2) over fingerprint buckets, never
    all-pairs. ``max_df`` drops fingerprints appearing in more than
    that many documents BEFORE the join — MOSS's own over-common-
    fingerprint rule: a hash shared by thousands of documents carries
    no dup signal but costs df^2 join rows, and on a saturated corpus
    (this synthetic 31-word vocabulary; boilerplate at 100 TB) the
    uncapped join degenerates quadratically. The cap bounds the join
    at sum(min(df, max_df)^2) — the same hot-bucket discipline as the
    LSH band joins."""
    # r14 optimization: anchor the fingerprint rows below one hash(h)
    # Exchange — the max_df cap aggregate and both self-join sides
    # consumed three separate re-runs of the winnowing pipeline
    # (char-gram md5 + rolling-window min). Same symmetry recipe as
    # the other pair generators: id-notnull pre-filter (output-
    # invariant — pairs require doc_a < doc_b, and a null id is not a
    # document for df_h either) and count(id_col) so the cap branch
    # consumes the same columns as the join branches.
    fp = winnow_fingerprints(
        df.filter(F.col(id_col).isNotNull()), k=k, w=w,
        text_col=text_col, id_col=id_col,
    ).repartition("h")
    if max_df is not None:
        keep = (
            fp.groupBy("h")
            .agg(F.count(id_col).alias("df_h"))
            .filter(F.col("df_h") <= max_df)
            .select("h")
        )
        fp = fp.join(keep, "h")
    a = fp.select(F.col(id_col).alias("doc_a"), "h")
    b = fp.select(F.col(id_col).alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def line_dedup(
    lines: DataFrame,
    max_df: int = 2,
    doc_col: str = "doc_id",
    order_col: str = "line_no",
    line_col: str = "line",
    line_sep: str = "\n",
    broadcast: str = "auto",
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet / RefinedWeb pass:
    Wenzek et al. 2019 §3.1 drop lines duplicated across documents;
    Penedo et al. 2023 line-wise filtering): drop every line whose
    exact content appears in >= ``max_df`` DISTINCT documents —
    navigation bars, cookie banners, and license footers repeat across
    a crawl while body text does not — then reassemble each document
    from its surviving lines in order.

    Input is line-structured: one row per (doc_col, order_col,
    line_col). Output: (doc_id, text_clean, kept_lines, dropped_lines)
    for every input document, text_clean '' when everything was
    boilerplate.

    Scale posture (100 TB): lines shuffle ONCE by a 128-bit md5 line
    digest to count distinct holding docs; on a typical crawl the
    boilerplate set (lines with df >= max_df) is small — unique body
    lines vastly outnumber repeated chrome — but it is NOT a constant:
    with the default max_df=2 the build side is every line appearing
    in >= 2 documents, and a crawl heavy in exact-duplicate documents
    makes that a large fraction of the corpus. So ``broadcast``
    defaults to "auto": no hint, AQE's RUNTIME size statistics convert
    the join to broadcast only when the boilerplate side actually fits
    under spark.sql.adaptive.autoBroadcastJoinThreshold, and keep a
    shuffle hash join on line_h otherwise (identical output, one more
    exchange, no driver-OOM cliff). "force" restores the unconditional
    broadcast hint; "never" pins the shuffle join (the posture for a
    dup-heavy corpus with a small max_df). Reassembly is a per-doc
    sort_array(collect_list(...)) bounded by DOCUMENT size, the same
    bound dedup_spans_remove rides.
    """
    # r14 optimization: materialize the line rows ONCE per run (lazy
    # localCheckpoint) — the boilerplate aggregate and the join probe
    # previously each re-ran the upstream line synthesis (lineify's
    # posexplode over every document) from scratch. The checkpoint
    # measured 0.82x vs recompute and a further 0.92x vs the
    # exchange-anchor form, while needing none of the anchor's
    # canonicalization scaffolding (OPTIMIZATION_r14.md).
    h = F.md5(F.col(line_col)).alias("line_h")
    keyed = lines.select(
        F.col(doc_col).alias("doc_id"),
        F.col(order_col).alias("line_no"),
        F.col(line_col).alias("line"),
        h,
    ).localCheckpoint(eager=False)
    boiler = (
        keyed.groupBy("line_h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= max_df)
        .select("line_h")
        .withColumn("__boiler__", F.lit(True))
    )
    if broadcast == "force":
        boiler = F.broadcast(boiler)
    elif broadcast == "never":
        boiler = boiler.hint("SHUFFLE_MERGE")
    elif broadcast != "auto":
        raise ValueError(f"bad broadcast: {broadcast}")
    flagged = keyed.join(boiler, "line_h", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.filter(
                        F.sort_array(
                            F.collect_list(
                                F.struct("line_no", "__boiler__", "line")
                            )
                        ),
                        lambda s: s["__boiler__"].isNull(),
                    ),
                    lambda s: s["line"],
                ),
                line_sep,
            ).alias("text_clean"),
            F.sum(
                F.when(F.col("__boiler__").isNull(), 1).otherwise(0)
            ).cast("long").alias("kept_lines"),
            F.sum(
                F.when(F.col("__boiler__").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("dropped_lines"),
        )
    )


def lineify(
    docs: DataFrame, tokens_per_line: int = 8, text_col: str = "text"
) -> DataFrame:
    """Deterministic line synthesis for an unstructured corpus: split
    the token stream into fixed runs of ``tokens_per_line`` and emit
    one (doc_id, line_no, line) row per run. Real crawl corpora carry
    newlines; the synthetic test tables do not, so the line-shaped
    operators (line_dedup) get their line structure from this exact,
    order-preserving chunking — the same rule is expressible in ANSI
    SQL for the oracle. Narrow (explode only), no shuffle."""
    toks = tokens_col(text_col)
    n_lines = F.ceil(F.size(toks) / F.lit(tokens_per_line)).cast("int")
    runs = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(toks, i * tokens_per_line + 1, tokens_per_line), " "
        ),
    )
    return spread(docs).select(
        "doc_id",
        F.posexplode(
            F.when(F.size(toks) > 0, runs).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("line_no", "line"),
    )
