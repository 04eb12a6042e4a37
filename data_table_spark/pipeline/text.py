"""Text-analysis operators: tokenization, shingling, language-ID, quality
scoring, token counting, document fingerprinting.

All formulas are engine-portable (exact integer counts + one final
division; md5 for hashing) so the DuckDB oracle reproduces results
bit-for-bit. Everything is built-in-function only — no Python UDFs —
so the whole pipeline stays inside whole-stage codegen and scales by
partition count alone (narrow, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small multi-language stopword profiles for the n-gram/stopword scoring
# heuristic. Deterministic and portable; quality of prediction depends on
# real text (the synthetic corpus is monolingual so most rows score 'en').
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "des"],
    "es": ["el", "la", "los", "que", "es", "una", "por"],
}

STOPWORDS = LANG_PROFILES["en"]


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokens of trimmed text (portable: regexp split on ' +')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), " +")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces; empty array when the
    document has fewer than n tokens (guards Spark's descending
    `sequence`)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + k) for k in range(n)]
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def char_shingles(text: Column, k: int = 8) -> Column:
    """Distinct character k-grams (document fingerprinting unit,
    winnowing-style)."""
    idx = F.sequence(F.lit(1), F.length(text) - (k - 1))
    return F.when(
        F.length(text) >= k,
        F.array_distinct(F.transform(idx, lambda i: F.substring(text, i, k))),
    ).otherwise(F.array().cast("array<string>"))


def _profile_score(toks: Column, words: list[str]) -> Column:
    """Fraction of tokens that appear in a language's stopword profile.
    Exact int count / int count — single division, portable."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID by stopword-profile scoring + non-ASCII charset cues.

    Heuristic order (first match wins, deterministic):
    1. CJK codepoints -> zh
    2. highest stopword-profile score among {de, fr, es} if > en score
    3. en
    """
    toks = tokens_col(text_col)
    scores = {k: _profile_score(toks, v) for k, v in LANG_PROFILES.items()}
    best_non_en = F.greatest(scores["de"], scores["fr"], scores["es"])
    pred = (
        F.when(F.col(text_col).rlike("[\\x{4e00}-\\x{9fff}]"), F.lit("zh"))
        .when(
            (best_non_en > scores["en"]) & (scores["de"] == best_non_en),
            F.lit("de"),
        )
        .when(
            (best_non_en > scores["en"]) & (scores["fr"] == best_non_en),
            F.lit("fr"),
        )
        .when(
            (best_non_en > scores["en"]) & (scores["es"] == best_non_en),
            F.lit("es"),
        )
        .otherwise(F.lit("en"))
    )
    return df.withColumn("lang_pred", pred)


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals: token count, type-token ratio, stopword ratio,
    mean token length, alpha ratio. All ratios are one exact division."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alpha_chars = F.length(
        F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")
    )
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    distinct_tok = F.size(F.array_distinct(toks))
    denom = F.greatest(n_tok, F.lit(1))
    return df.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        (distinct_tok.cast("double") / denom).alias("type_token_ratio"),
        (stop_hits.cast("double") / denom).alias("stopword_ratio"),
        ((n_chars - (n_tok - 1)).cast("double") / denom).alias("mean_token_len"),
        (alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1))).alias(
            "alpha_ratio"
        ),
    )


# BPE-ish pre-tokenizer regex: letter runs, digit runs, single other
# non-space. ASCII classes only so Java regex (Spark) and RE2 (DuckDB)
# agree.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n]"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    toks = tokens_col(text_col)
    bpe = F.expr(f"regexp_extract_all({text_col}, '{BPE_PATTERN}', 0)")
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_ws_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over character k-grams (the
    1-permutation MinHash of the k-gram set) + the distinct k-gram count.
    md5 is bit-identical across engines, so the oracle matches exactly.

    Relational form: posexplode_outer of the position sequence +
    row-level substr/md5 + one partial-agg'd groupBy — the array-HOF
    form (transform + array_min) runs interpreted and loses by 25% at
    sf0.1, growing with gram count (same finding as winnowing / the
    dedup.py:84 re-encodings). min over the gram MULTISET equals min
    over the set; posexplode_outer keeps sub-k-length documents as a
    (null fingerprint, 0 count) row like the array form did."""
    from .dedup import spread

    c = F.col(text_col)
    pos_arr = F.when(
        F.length(c) >= k, F.sequence(F.lit(1), F.length(c) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    e = spread(df).select(
        "doc_id", c.alias("_t"),
        F.posexplode_outer(pos_arr).alias("_x", "pos"),
    ).select(
        "doc_id",
        F.when(
            F.col("pos").isNotNull(),
            F.col("_t").substr(F.col("pos"), F.lit(k)),
        ).alias("g"),
    )
    return e.groupBy("doc_id").agg(
        F.min(F.md5("g")).alias("fingerprint"),
        F.count_distinct("g").cast("long").alias("n_kgrams"),
    )


# PII scrubbing patterns: ASCII-only classes so Java regex (Spark) and
# RE2 (DuckDB) agree byte-for-byte. Ordered scrub: emails first, then
# IPs, then phone-shaped digit runs (so an already-masked [IP] cannot
# re-match as a phone number).
PII_PATTERNS = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    ("phone", "\\+[0-9]{7,15}\\b", "[PHONE]"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII scrub: mask emails / IPv4s / +international
    phone runs and count each kind (counted on the pre-scrub text;
    masking is sequential so earlier masks can't re-match). Pure
    regexp_replace/regexp_extract_all column expressions — no UDF, the
    scan stays in whole-stage codegen at any corpus size."""
    out = df
    scrubbed = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))
            .cast("long"),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return out.withColumn("text_scrubbed", scrubbed).withColumn(
        "n_pii",
        (F.col("n_email") + F.col("n_ip") + F.col("n_phone")).cast("long"),
    )


def tfidf_topterms(
    df: DataFrame,
    topk_per_doc: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: top-k terms by tf-idf.

    Plan shape: posexplode-free narrow explode of whitespace tokens →
    partial-combined groupBy (doc, term) for tf → term-level document
    frequency (distinct doc per term, partial-agg'd) joined back on
    term. The df side is vocabulary-sized: tiny here (broadcast), and
    at a 100 TB corpus it is still orders smaller than the tf table —
    AQE picks broadcast vs shuffle join on measured size, both shapes
    shuffle only IDs and counts, never text. Top-k per doc is one
    row_number window partitioned by doc.

    Engine-portable: tf/df/N exact integers; idf = ln((1+N)/(1+df))+1
    (smoothed, always > 0) rounded to 6 dp before the tf multiply;
    score ties break on the term string.
    """
    toks = tokens_col(text_col)
    exploded = df.select(F.col(id_col), F.explode(toks).alias("term"))
    # r14: lazy-checkpointing tf (consumed by the doc-freq rollup and
    # the scoring probe) measured flat at sf0.1 and 2.15x WORSE at sf1
    # in the interleaved A/B — the (doc, term) table grows with the
    # corpus, so the materialization barrier costs more than re-running
    # the map-side-combined aggregate. Left as-is.
    tf = exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    doc_freq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.round(
                F.log((1 + F.col("n")) / (1 + F.col("df")).cast("double")) + 1.0,
                6,
            ),
        )
        .select("term", "idf")
    )
    scored = tf.join(doc_freq, "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.col("idf"), 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= topk_per_doc)
        .select(id_col, "term_rank", "term", "tfidf")
    )


def _eq_lit(t: str):
    """One-arg lambda factory for F.filter (a two-parameter lambda would
    be called as (element, index) by the higher-order-function binding,
    so a `t=t` default capture is NOT safe here)."""
    return lambda x: x == F.lit(t)


def bm25_rank(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 20,
) -> DataFrame:
    """BM25 ranked retrieval of the corpus against a bag of query terms.

    Scale shape (the part that matters at 100 TB): per-doc term
    frequencies and document length are ONE narrow codegen pass (array
    filter/size per query term — no explode, no per-term shuffle); the
    corpus statistics (N, Σdl, per-term document frequency) are a single
    tiny global aggregate broadcast back with a crossJoin; top-k is
    TakeOrderedAndProject. Total cost: one scan + one 1-row exchange.

    Engine-portable numerics: tf/dl/df/N are exact integers; idf =
    ln((N-df+0.5)/(df+0.5)+1) (the BM25+ form, always >= 0) is rounded
    to 6 dp before use so a last-ulp libm difference between the JVM and
    DuckDB cannot propagate; every other operation is IEEE-deterministic
    double arithmetic in a fixed association order mirrored exactly by
    the oracle SQL.
    """
    if not terms:
        raise ValueError("bm25_rank needs at least one query term")
    toks = tokens_col(text_col)
    d = df.select(F.col(id_col), toks.alias("_toks")).select(
        id_col,
        F.size("_toks").alias("dl"),
        *[
            F.size(F.filter(F.col("_toks"), _eq_lit(t))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    g = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    joined = d.crossJoin(F.broadcast(g))
    avgdl = F.col("sumdl").cast("double") / F.col("n")
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    score = None
    for i in range(len(terms)):
        idf = F.round(
            F.log((F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1.0),
            6,
        )
        tf = F.col(f"tf{i}").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(one_minus_b) + F.lit(b) * F.col("dl").cast("double") / avgdl
        )
        term = idf * (tf * F.lit(k1p1)) / denom
        score = term if score is None else score + term
    out = (
        joined.select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
    )
    return out.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(topk)


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram language-model quality score per document
    (the CCNet-style LM filter: rank documents by how surprising they
    are under a model trained on the corpus itself — gibberish and
    boilerplate land in the tails).

    Model: add-one-smoothed bigram LM. For each bigram occurrence
    (w1, w2): logprob = ln((C(w1,w2) + 1) / (C(w1·) + V)) where C(w1·)
    counts w1 as a bigram head and V is the unigram vocabulary size.
    Per doc: n_bigrams and avg_lp (mean logprob in nats; higher = more
    typical of the corpus).

    Scale shape (100 TB): bigram assembly is posexplode + window-lead
    (whole-stage codegen, one doc_id shuffle — same encoding as
    shingle_rows; the array-HOF form runs interpreted, measured ~50x
    slower). Counts are two key-partitioned aggregates on (w1,w2) / w1
    — map-side combined, so the shuffle carries the bigram TYPE
    distribution, not occurrences. Scoring joins the per-doc bigram
    COUNT table (not occurrences) to the logprob table on bigram keys
    — equi-joins all the way down, no driver state, V is a 1-row
    aggregate broadcast back.

    Engine-portable numerics: counts are exact integers; the only
    transcendental, ln(exact-int-double / exact-int-double), is scaled
    to integer MICRO-nats in one rounding (round(ln(x)*1e6) as bigint)
    so every downstream sum/product is exact bigint arithmetic; avg_lp
    divides two bit-identical doubles in a fixed order — no decimal
    midpoint traps anywhere (the embedding_centroids lesson).

    Reference anchor: no data.table analog (its text surface stops at
    grep-style helpers); this extends the pipeline family like bm25.
    """
    from .dedup import spread

    tok = spread(df).select(
        F.col(id_col), F.posexplode(tokens_col(text_col)).alias("pos", "w")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    big = (
        tok.select(
            id_col,
            F.col("w").alias("w1"),
            F.lead("w").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    # per-doc bigram counts: the scoring join carries bigram TYPES per
    # doc, not occurrences — and the CORPUS counts roll up from this
    # table (c2 = sum k over docs, c1 = sum c2 over w2), so occurrence
    # rows are shuffled exactly once; the two corpus aggregates run on
    # type-level rows
    # r14: a lazy-checkpoint of this table (consumed by the corpus-count
    # rollup and the scoring probe) measured 1.13x WORSE in the
    # interleaved A/B — the duplicated branches are map-side-combined
    # aggregates over type-level rows, cheaper to recompute than to
    # materialize. Left as-is (anchor precondition 3 also fails here).
    db = big.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    c2 = db.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = tok.agg(F.countDistinct("w").alias("v"))
    lp = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        db.join(lp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("lp_micro")).alias("_sum_lp"),
        )
        .select(
            id_col,
            "n_bigrams",
            (
                F.col("_sum_lp").cast("double")
                / (F.col("n_bigrams").cast("double") * F.lit(1e6))
            ).alias("avg_lp"),
        )
    )


def heavy_hitters_cm(
    df: DataFrame,
    phi_permille: int = 5,
    d: int = 3,
    w: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Heavy hitters (tokens with frequency >= phi·N) via a Count-Min
    prescreen + exact verify — the mergeable-sketch route to frequent
    items when the token TYPE space is too large to shuffle whole
    (vocab_topk's exact groupBy shuffles every distinct token; web-
    scale token/n-gram spaces run to billions of types). Output:
    (token, n) — EXACT, so the oracle is the plain HAVING query.

    Two passes, both with bounded shuffles:
    1. sketch: each occurrence maps to d md5-derived buckets; ONE
       map-side-combined aggregation builds the d×w counter table
       (≤ d·w rows shuffle regardless of corpus size), packed into a
       single broadcast array row exactly like decontaminate_bloom's
       bitmap. N rides the same 1-row-stats idiom.
    2. probe + verify: occurrences re-scan, the CM estimate
       (min over d counters — array indexing, pure codegen) filters
       MAP-SIDE; only candidate occurrences reach the exact groupBy,
       and a final HAVING drops CM false positives. CM never
       underestimates, so no true heavy hitter is lost — the same
       admits-only-false-positives contract as the Bloom prescreen.

    The threshold is exact integer arithmetic: thr = ceil(phi·N) =
    (N·phi_permille + 999) DIV 1000 — no float reaches a comparison.
    At the default d=3, w=1024 the sketch state is 24 KB; errors obey
    est ≤ true + e·N/w per row with probability 1−e^−d (Cormode &
    Muthukrishnan 2005)."""
    if not (1 <= phi_permille <= 1000):
        raise ValueError("phi_permille must be in [1, 1000]")
    if d < 1 or w < 1:
        raise ValueError("d and w must be >= 1")
    from .dedup import spread

    tok = spread(df).select(
        F.explode(tokens_col(text_col)).alias("w_")
    )

    def slot_sql(j: int) -> str:
        # flat index into the packed d×w counter array
        return (
            f"{j} * {int(w)} + CAST(conv(substring(md5(concat('{j}:', w_)),"
            f" 1, 12), 16, 10) AS BIGINT) % {int(w)}"
        )

    slots = tok.select(
        F.explode(
            F.array(*[F.expr(slot_sql(j)) for j in range(d)])
        ).alias("slot")
    )
    counters = slots.groupBy("slot").agg(F.count(F.lit(1)).alias("c"))
    sseq = df.sparkSession.range(d * w).select(
        F.col("id").cast("long").alias("slot")
    )
    packed = (
        sseq.join(counters, "slot", "left")
        .select("slot", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("slot", "c"))),
                lambda s: s["c"],
            ).alias("cm")
        )
    )
    n_tot = tok.agg(F.count(F.lit(1)).alias("n_tot"))
    thr = F.expr(f"(n_tot * {int(phi_permille)} + 999) DIV 1000")

    ests = [
        F.expr(f"element_at(cm, CAST(({slot_sql(j)}) AS INT) + 1)")
        for j in range(d)
    ]
    # least() needs two args; d=1 is a single-counter estimate
    est = F.least(*ests) if d > 1 else ests[0]
    candidates = (
        tok.crossJoin(F.broadcast(packed))
        .crossJoin(F.broadcast(n_tot))
        .filter(est >= thr)
        .select(F.col("w_").alias("token"))
    )
    return (
        candidates.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(n_tot))
        .filter(
            F.col("n")
            >= F.expr(f"(n_tot * {int(phi_permille)} + 999) DIV 1000")
        )
        .select("token", "n")
    )
