"""Focused pins for the round-14 optimization restructures.

Each optimization kept the operator's OUTPUT identical while changing
how Spark materializes shared subtrees (exchange anchors / lazy
localCheckpoints — see OPTIMIZATION_r14.md). These tests pin the edge
semantics the equivalence arguments relied on, so a future refactor
cannot silently change them:

- null doc_id rows can never produce pairs / duplicated spans, so the
  pre-anchor isnotnull filters are output-invariant;
- `_dup_gram_set`'s general (min_df > 2) path counts DOCUMENTS (a null
  id is not a document);
- line_dedup keeps null lines and never flags them boilerplate;
- the struct-min encoding in `_dup_gram_set` equals the bare min/max
  encoding it replaced.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_span_profile_null_docid_rows_pass_through(spark):
    """A null-doc_id document still appears in the output (via the toks
    left side) with dup_tokens 0, and does not affect other documents'
    duplicated spans — the invariance the pre-anchor filter rests on."""
    from data_table_spark.pipeline.dedup import dup_span_profile

    base = "a b c d e f g h"
    rows = [(1, base), (2, base), (None, base)]
    out = {
        r["doc_id"]: r
        for r in dup_span_profile(_docs(spark, rows), n=5, min_df=2).collect()
    }
    assert set(out) == {1, 2, None}
    # docs 1 and 2 share every 5-gram: fully duplicated
    assert out[1]["dup_tokens"] == 8 and out[2]["dup_tokens"] == 8
    # the null-id doc is reported but never enters the hits path
    assert out[None]["dup_tokens"] == 0 and out[None]["n_tokens"] == 8


def test_dup_gram_set_general_path_counts_documents(spark):
    """min_df=3: a gram held by 2 real docs + 1 null-id doc is NOT
    duplicated — df counts distinct DOCUMENTS (count('doc_id') skips
    null), the semantics that make the notnull pre-filter exact."""
    from data_table_spark.pipeline.dedup import (
        _dup_gram_set,
        positional_ngrams,
    )

    base = "a b c d e"
    rows = [(1, base), (2, base), (None, base)]
    pg = positional_ngrams(_docs(spark, rows), n=5)
    assert _dup_gram_set(pg, min_df=3, max_df=None).count() == 0
    # and with three real holders it IS duplicated
    pg3 = positional_ngrams(_docs(spark, [(1, base), (2, base), (3, base)]), 5)
    assert _dup_gram_set(pg3, min_df=3, max_df=None).count() == 1


def test_dup_gram_set_structmin_equals_bare_minmax(spark):
    """The struct-min encoding (column-consumption symmetry device)
    selects exactly the grams the bare min!=max encoding did."""
    from data_table_spark.pipeline.dedup import (
        _dup_gram_set,
        positional_ngrams,
    )

    rows = [
        (10, "x y z w v u"),
        (11, "x y z w v q"),
        (12, "lone words here only once seen"),
    ]
    pg = positional_ngrams(_docs(spark, rows), n=5)
    got = {r["g"] for r in _dup_gram_set(pg, 2, None).collect()}
    bare = {
        r["g"]
        for r in pg.groupBy("g")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .collect()
    }
    assert got == bare == {"x y z w v"}


def test_line_dedup_null_lines_kept_and_never_boilerplate(spark):
    """Null lines ride through line_dedup exactly as before the
    checkpoint restructure: counted kept, never flagged, skipped by
    array_join in the reassembled text."""
    from data_table_spark.pipeline.dedup import line_dedup

    rows = [
        (1, 0, "chrome line"), (1, 1, None), (1, 2, "body one"),
        (2, 0, "chrome line"), (2, 1, None),
        (3, 0, "chrome line"),
    ]
    lines = spark.createDataFrame(
        rows, "doc_id long, line_no int, line string"
    )
    out = {r["doc_id"]: r for r in line_dedup(lines, max_df=2).collect()}
    # "chrome line" appears in 3 docs -> boilerplate; nulls kept
    assert out[1]["dropped_lines"] == 1 and out[1]["kept_lines"] == 2
    assert out[1]["text_clean"] == "body one"
    assert out[2]["dropped_lines"] == 1 and out[2]["kept_lines"] == 1
    assert out[2]["text_clean"] == ""


def test_minhash_null_docid_invariance(spark):
    """Adding a null-doc_id document changes no emitted pair — the
    invariance the shingle-table pre-filter rests on."""
    from data_table_spark.pipeline.dedup import minhash_lsh_pairs

    text_a = " ".join(f"w{i}" for i in range(40))
    text_b = " ".join(f"w{i}" for i in range(39)) + " zz"
    clean = [(1, text_a), (2, text_b), (3, "other words entirely here now")]
    with_null = clean + [(None, text_a)]
    p1 = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(_docs(spark, clean), 0.8).collect()
    }
    p2 = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(_docs(spark, with_null), 0.8).collect()
    }
    assert p1 == p2 == {(1, 2)}
