"""Expression-grouping / .BY / grouped-subset vectors ported from the
reference's tests.Rraw grouping sections (round-12 mining, VERDICT r11
item 6). Each case cites its Rraw test number; exact inputs and
expected outputs are reproduced.

Adaptations (documented):
- ``by=`` expressions port to ``query(by={"name": Column})``; the
  reference's ``.BY``/group-value-in-j idiom ports to ``F.first()`` of
  the by-expression inside the aggregate (the by columns are constant
  within a group — FAQ 2.10's ".BY is a single row").
- grouped vector-subset j (``DT[, C[C - min(C) < 3], by=...]``, test
  174) ports to a grouped window + filter — the Spark-first spelling
  of "keep the group rows passing a group-relative predicate".
- result ROW order is compared as a sorted multiset (SURVEY §1.1);
  sum() over int widens to bigint (SQL), so values are compared, not
  dtypes.

inst/tests/other.Rraw is NOT ported: its 1,100 lines test interop with
other R packages (ggplot2, bit64 printing, plot/hist dispatch, memory
reporting) — R-ecosystem surfaces with no Spark analog.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_table_spark.core import DT


def _rows(dt, *cols):
    return sorted(
        tuple(r[c] for c in cols) for r in dt.df.collect()
    )


def test_273_278_by_expression_and_group_value_in_j(spark):
    """273-278: by= expressions (named: bcalc=b+1) with the group value
    used inside j; columns consumed by the by expression still usable
    in j (sum(a*b), 278)."""
    d = DT(spark.createDataFrame(
        [(i, 1 if i % 2 else 2) for i in range(1, 7)], "a int, b int"
    ))
    # 273/274: DT[, sum(a)*b, by=b] → b=1: (1+3+5)*1=9; b=2: (2+4+6)*2=24
    out = d.query(j={"V1": F.sum("a") * F.first("b")}, by=["b"])
    assert _rows(out, "b", "V1") == [(1, 9), (2, 24)]
    # 275/277: by=list(bcalc=b+1L) → sum(a)*bcalc = 18 / 36
    out = d.query(
        j={"V1": F.sum("a") * (F.first("b") + 1)},
        by={"bcalc": F.col("b") + 1},
    )
    assert _rows(out, "bcalc", "V1") == [(2, 18), (3, 36)]
    # 278: sum(a*b) by bcalc → 9 / 24 (b usable in j despite by-expr)
    out = d.query(
        j={"V1": F.sum(F.col("a") * F.col("b"))},
        by={"bcalc": F.col("b") + 1},
    )
    assert _rows(out, "bcalc", "V1") == [(2, 9), (3, 24)]


def test_174_175_grouped_subset_by_group_relative_predicate(spark):
    """174/175 (Harish, datatable-help 2011-07-11): keep each group's
    rows whose C is within a margin of the group min — grouped window
    + filter, compared as the reference's V1 multiset."""
    rows = list(zip(
        ["a", "a", "b", "b", "d", "c", "a", "d"],
        ["x1", "x2", "x2", "x1", "x2", "x1", "x1", "x2"],
        [5.0, 2.0, 3.0, 4.0, 9.0, 5.0, 1.0, 9.0],
    ))
    d = DT(spark.createDataFrame(rows, "A string, B string, C double"))
    w = Window.partitionBy("A", "B")

    def keep(margin):
        out = d.df.withColumn("__m__", F.min("C").over(w)).filter(
            F.col("C") - F.col("__m__") < margin
        )
        return sorted(r["C"] for r in out.collect())

    assert keep(3) == sorted([1, 2, 3, 4, 9, 9, 5])      # 174
    assert keep(5) == sorted([5, 1, 2, 3, 4, 9, 9, 5])   # 175


def test_458_460_by_modulo_and_null_group(spark):
    """458: by=a%%2L groups a keyed table by an expression; 459/460: a
    by expression yielding NA forms its own (retained) group."""
    d = DT(spark.createDataFrame(
        [(a, v) for a, v in zip([1, 2, 3, 1, 2, 3], [4, 5, 6, 7, 8, 9])],
        "a int, v int",
    ), key=["a"])
    out = d.query(j={"V1": F.sum("v")}, by={"a": F.col("a") % 2})
    assert _rows(out, "a", "V1") == [(0, 13), (1, 26)]
    # 459: ifelse(a==2, NA, 1L) → groups 1 and NULL
    out = d.query(
        j={"V1": F.sum("v")},
        by={"g": F.when(F.col("a") == 2, F.lit(None)).otherwise(F.lit(1))},
    )
    got = {r["g"]: r["V1"] for r in out.df.collect()}
    assert got == {1: 26, None: 13}


def test_581_582_empty_filter_grouped(spark):
    """581/582: i returning no rows with by= gives an EMPTY result
    with the group/agg columns (not an error, not a NULL-group row)."""
    d = DT(spark.createDataFrame(
        [(a, v) for a, v in zip([1, 2, 3, 1, 2, 3], [1, 2, 3, 4, 5, 6])],
        "a int, v int",
    ))
    out = d.query(i=F.col("a") < 1, j={"V1": F.sum("v")}, by=["a"])
    assert out.columns == ["a", "V1"]
    assert out.df.count() == 0


def test_691_693_i_filter_with_expression_by(spark):
    """691-693 (#2118): the i filter applies BEFORE grouping; by= may
    be an expression over the filtered rows. Seeded sample ported as
    literal vectors (set.seed(1) draw reproduced by value)."""
    # the reference uses sample(); port the shape with a fixed vector
    a = [3, 4, 1, 5, 2, 5, 3, 1, 4, 2, 5, 3, 2, 4, 1, 3, 5, 2, 4, 1]
    d = DT(spark.createDataFrame(
        [(a[i], i % 4 + 1, i % 10 + 1) for i in range(20)],
        "a int, b int, c int",
    ))
    # 691 shape: filtered-then-grouped equals group-of-filtered
    lhs = d.query(i=F.col("a") > 2, j={"V1": F.sum("c")}, by=["b"])
    rhs = DT(d.df.filter(F.col("a") > 2)).query(
        j={"V1": F.sum("c")}, by=["b"]
    )
    assert _rows(lhs, "b", "V1") == _rows(rhs, "b", "V1")
    # 692 shape: expression by over the filtered rows
    lhs = d.query(
        i=F.col("a") > 2, j={"V1": F.sum("c")}, by={"b": F.col("b") % 2}
    )
    rhs2 = DT(d.df.filter(F.col("a") > 2)).query(
        j={"V1": F.sum("c")}, by={"b": F.col("b") % 2}
    )
    assert _rows(lhs, "b", "V1") == _rows(rhs2, "b", "V1")
    assert len(_rows(lhs, "b")) == 2


def test_283_293_by_pair_with_group_values_and_N(spark):
    """283/284 (.BY sum), 292/293 (.N with group arithmetic in j)."""
    d = DT(spark.createDataFrame(
        list(zip([0, 0, 1, 0, 1, 1], [1, 1, 0, 1, 1, 1], [1, 2, 3, 4, 5, 6])),
        "x int, y int, z int",
    ))
    out = d.query(
        j={"V1": F.first("x") + F.first("y"), "V2": F.sum("z")},
        by=["x", "y"],
    )
    assert _rows(out, "x", "y", "V1", "V2") == [
        (0, 1, 1, 7), (1, 0, 1, 3), (1, 1, 2, 11)]
    d2 = DT(spark.createDataFrame(
        list(zip([1, 1, 1, 1, 2, 2, 2], [3, 3, 3, 4, 4, 4, 4])),
        "a int, b int",
    ))
    out = d2.query(by=["a", "b"])  # bare by → .N
    assert _rows(out, "a", "b", "N") == [(1, 3, 3), (1, 4, 1), (2, 4, 3)]
    out = d2.query(
        j={"V1": F.first("a") + F.first("b"), "N": F.count(F.lit(1))},
        by=["a", "b"],
    )
    assert _rows(out, "a", "b", "V1", "N") == [
        (1, 3, 4, 3), (1, 4, 5, 1), (2, 4, 6, 3)]


def test_sdcols_minilanguage_1137_1971_2128(spark):
    """.SDcols mini-language vectors (tests.Rraw 1137.01-.12 negative
    positions/names, 1498.2/.4 logical masks, 1971.1-.3 patterns with
    intersection and inversion, 2128.1-.5 type-predicate callables —
    the callable receives the SPARK DTYPE string, the documented
    distributed adaptation of the reference's per-vector predicate)."""
    import pytest as _pytest

    from data_table_spark.operators.grouping import (
        lapply_sd, patterns, sd_cols,
    )

    d = DT(spark.createDataFrame(
        [(i, i + 5, i + 10) for i in range(1, 6)], "x int, y int, z int"
    ))
    assert sd_cols(d, -1) == ["y", "z"]                      # 1137.01
    assert sd_cols(d, [-1, -2]) == ["z"]                     # 1137.02
    assert sd_cols(d, "-y") == ["x", "z"]                    # 1137.03
    assert sd_cols(d, ["-y", "-x"]) == ["z"]                 # 1137.04
    assert sd_cols(d, [-1, -2, -3]) == []                    # 1137.05
    with _pytest.raises(ValueError, match="both"):           # 1137.06
        sd_cols(d, [1, -2])
    with _pytest.raises(ValueError, match="unary"):          # 1137.07
        sd_cols(d, ["x", "-y"])
    # 1498.2/.4: logical mask must match ncol; negation via invert
    with _pytest.raises(ValueError, match="length 2 but"):
        sd_cols(d, [True, False])
    assert sd_cols(d, [True, False, True], invert=True) == ["y"]
    # range form
    assert sd_cols(d, "x:y") == ["x", "y"]
    # 1971: patterns / intersection / inversion on a V1..V10 table
    cols = ["i", "c"] + [f"V{k}" for k in range(1, 11)]
    dv = DT(spark.createDataFrame(
        [tuple([1, "a"] + [float(k) for k in range(10)])],
        ", ".join(
            [f"{c} int" if c == "i" else f"{c} string" if c == "c"
             else f"{c} double" for c in cols]
        ),
    ))
    assert sd_cols(dv, patterns("^V")) == [f"V{k}" for k in range(1, 11)]
    assert sd_cols(dv, patterns("^V[02468]", "^V[48]")) == ["V4", "V8"]
    assert sd_cols(dv, patterns("^c|i"), invert=True) == [
        f"V{k}" for k in range(1, 11)]
    # 2128: dtype-predicate callable
    dm = DT(spark.createDataFrame(
        [(1, 2.0, "a")], "a int, b double, c string"
    ))
    num = lambda t: t in ("int", "bigint", "double", "float")  # noqa: E731
    assert sd_cols(dm, num) == ["a", "b"]                     # 2128.1
    assert sd_cols(dm, num, invert=True) == ["c"]             # 2128.2
    with _pytest.raises(ValueError, match="conditions were not met"):
        sd_cols(dm, lambda t: 2)                              # 2128.4
    # lapply_sd: grouped sum over .SDcols=-"y" == .SDcols="z" (1137.12)
    dg = DT(spark.createDataFrame(
        [("A", 1, 0.5), ("A", 2, 1.5), ("C", 3, 2.5), ("C", 4, 3.5)],
        "x string, y int, z double",
    ))
    lhs = lapply_sd(dg, "sum", ["-y", "-x"], by=["x"])
    rhs = lapply_sd(dg, "sum", ["z"], by=["x"])
    assert _rows(lhs, "x", "z") == _rows(rhs, "x", "z")
    assert _rows(lhs, "x", "z") == [("A", 2.0), ("C", 6.0)]


def test_dcast_default_length_on_duplicates(spark):
    """dcast fun.aggregate=NULL contract (reference R/fcast.R:181):
    duplicate row/column combinations WARN and default to length()
    with empty cells filled 0 (= length(empty)); unique combinations
    keep the value itself."""
    import warnings

    from data_table_spark.operators.reshape import dcast

    dup = DT(spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 3.0),
         ("b", "x", 4.0)],
        "r string, c string, v double",
    ))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dcast(dup, ["r"], "c", "v")
        assert any("defaulting to length" in str(x.message) for x in w)
    got = {r["r"]: (r["x"], r["y"]) for r in out.df.collect()}
    assert got == {"a": (2, 1), "b": (1, 0)}  # counts; empty cell -> 0

    uniq = DT(spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 3.0), ("b", "x", 4.0)],
        "r string, c string, v double",
    ))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dcast(uniq, ["r"], "c", "v")
        assert not any("defaulting" in str(x.message) for x in w)
    got = {r["r"]: (r["x"], r["y"]) for r in out.df.collect()}
    assert got == {"a": (1.0, 3.0), "b": (4.0, None)}


def test_2344_key_retention_through_select(spark):
    """tests.Rraw 2344.04: a j column-select keeps the longest key
    PREFIX whose columns survive untouched — across reorders and new
    columns; a computed column reusing a key name, or a missing key
    column, cuts the prefix there. Filters keep key and order."""
    d = DT(spark.createDataFrame(
        [(1, 3, 5), (2, 4, 6)], "V1 int, V2 int, V3 int"
    ), key=["V1", "V2", "V3"], order_by=["V1"])
    # reorder + new columns, V3 dropped → key = (V1, V2)
    out = d.query(j=["V2", "V1"])
    assert list(out.key) == ["V1", "V2"]
    # middle key column missing → prefix stops at V1
    out = d.query(j=["V1", "V3"])
    assert list(out.key) == ["V1"]
    # computed column under a key name → key dropped (not passthrough)
    out = d.query(j={"V1": F.col("V1") + 1, "V3": F.col("V3")})
    assert not out.key
    # plain filter keeps key AND declared order
    out = d.query(i=F.col("V3") > 5)
    assert list(out.key) == ["V1", "V2", "V3"]
    assert list(out.order_by) == ["V1"]


def test_1102_dcast_multi_rhs(spark):
    """tests.Rraw 1102.188-shape: dcast with a multi-column RHS
    (year ~ continent + country) spreads the observed combinations as
    composite sep-joined column names."""
    from data_table_spark.operators.reshape import dcast

    rows = [
        (1986, "Europe", "Sweden", 1.0), (1986, "Europe", "Germany", 2.0),
        (1987, "Asia", "India", 3.0), (1987, "Europe", "France", 4.0),
        (1988, "Asia", "Japan", 5.0),
    ]
    d = DT(spark.createDataFrame(
        rows, "year int, continent string, country string, v double"
    ))
    out = dcast(d, ["year"], ["continent", "country"], "v",
                fun_agg={"s": F.sum("v")})
    assert sorted(out.columns) == sorted([
        "year", "Europe_Sweden", "Europe_Germany", "Asia_India",
        "Europe_France", "Asia_Japan"])
    got = {r["year"]: r for r in out.df.collect()}
    assert got[1986]["Europe_Sweden"] == 1.0
    assert got[1986]["Asia_India"] is None
    assert got[1987]["Europe_France"] == 4.0
    # NA level prints "NA" in the composite label
    d2 = DT(spark.createDataFrame(
        [(1, None, "x", 9.0)],
        "year int, continent string, country string, v double",
    ))
    out2 = dcast(d2, ["year"], ["continent", "country"], "v",
                 fun_agg={"s": F.sum("v")})
    assert "NA_x" in out2.columns


def test_2195_empty_by_means_all_columns(spark):
    """tests.Rraw 2195 (#4594): by=[] and by=None both mean ALL
    columns for uniqueN/unique/duplicated/anyDuplicated."""
    from data_table_spark.operators.grouping import (
        any_duplicated, duplicated, unique, uniqueN,
    )

    d = DT(spark.createDataFrame(
        [(1, "val"), (2, "val"), (1, "val"), (3, "val")],
        "idx int, value string",
    ), order_by=["idx"])
    for by in ([], None):
        assert uniqueN(d, cols=by or None).df.collect()[0]["uniqueN"] == 3
        u = unique(d, by=by, order=["idx"])
        assert sorted(r["idx"] for r in u.df.collect()) == [1, 2, 3]
        assert any_duplicated(d, by=by) is True
    dup = duplicated(d, by=[], order=["idx"])
    # one of the two (1,"val") rows flags duplicate
    assert sorted(r["dup"] for r in dup.df.collect()) == [
        False, False, False, True]


def test_2250_delete_columns_via_sdcols(spark):
    """tests.Rraw 2250.08 idiom: delete the columns .SDcols selects
    (dt[, names(.SD) := NULL, .SDcols=!keep]) — expressed as let(None)
    over sd_cols(invert=True)."""
    from data_table_spark.operators.grouping import sd_cols

    d = DT(spark.createDataFrame(
        [(1, 5, 9.0, "x")], "a int, b int, c double, s string"
    ))
    keep = ["a", "b"]
    out = d.let(**{c: None for c in sd_cols(d, keep, invert=True)})
    assert out.columns == ["a", "b"]


def test_order_method_na_last(spark):
    """DT.order() = DT[order(...)] with na.last=TRUE (base-R
    consistent), vs setorder's NA-first default — both with the
    NA-outermost/NaN-adjacent block rule."""
    import math

    d = DT(spark.createDataFrame(
        [(0, 2.0), (1, None), (2, math.nan), (3, 1.0)], "i int, x double"
    ))
    assert [r["i"] for r in d.order("x").df.collect()] == [3, 0, 2, 1]
    assert [r["i"] for r in d.setorder("x").df.collect()] == [1, 2, 3, 0]


def test_2362_gforce_arithmetic_in_j(spark):
    """tests.Rraw 2362.31-.39 (GForce arithmetic over aggregates in
    j): composite aggregate expressions per group — (max-min)/(max+min),
    sum/.N, mean*2+sum, mod/intdiv/negation. In this engine the same
    shapes are single grouped aggregates Catalyst partial-aggregates
    (the distributed GForce); values pinned to the reference vectors
    (dt = a=1:4, b=1:2 → groups b=1:{1,3}, b=2:{2,4})."""
    d = DT(spark.createDataFrame(
        [(1, 1), (2, 2), (3, 1), (4, 2)], "a int, b int"
    ))

    def agg(expr):
        out = d.query(j={"V1": expr}, by=["b"])
        return {r["b"]: r["V1"] for r in out.df.collect()}

    assert agg(F.max("a") - F.min("a")) == {1: 2, 2: 2}          # .31
    got = agg((F.max("a") - F.min("a")) / (F.max("a") + F.min("a")))
    assert got[1] == 0.5 and abs(got[2] - 1 / 3) < 1e-12         # .32
    assert agg(F.sum("a") / F.count(F.lit(1))) == {1: 2.0, 2: 3.0}  # .33
    assert agg(F.avg("a") * 2 + F.sum("a")) == {1: 8.0, 2: 12.0}    # .34
    assert agg(F.sum("a") % 2) == {1: 0, 2: 0}                   # .37
    assert agg(F.floor(F.sum("a") / 2)) == {1: 2, 2: 3}          # .38
    assert agg(-F.sum("a")) == {1: -4, 2: -6}                    # .39
    # .35: multi-name composite
    out = d.query(
        j={"range": F.max("a") - F.min("a"), "avg": F.avg("a")},
        by=["b"],
    )
    got = {r["b"]: (r["range"], r["avg"]) for r in out.df.collect()}
    assert got == {1: (2, 2.0), 2: (2, 3.0)}


def test_rbindlist_type_promotion(spark):
    """rbindlist type promotion (reference src/rbindlist.c
    coerceColumns ladder; tests.Rraw 984/985 factor+character → one
    string column): int+double → double, logical+int → int, int+string
    → string (Spark's positional ANSI union would instead cast the
    string side to BIGINT and throw at runtime on non-numeric
    strings), date+timestamp → timestamp; incompatible (array vs int)
    raises."""
    import datetime

    from data_table_spark.operators.reshape import rbindlist

    def bind(*frames):
        return rbindlist([DT(f) for f in frames])

    out = bind(
        spark.createDataFrame([(1,)], "x int"),
        spark.createDataFrame([(2.5,)], "x double"),
    )
    assert dict(out.df.dtypes)["x"] == "double"
    assert sorted(r["x"] for r in out.df.collect()) == [1.0, 2.5]

    out = bind(
        spark.createDataFrame([(True,)], "x boolean"),
        spark.createDataFrame([(2,)], "x int"),
    )
    assert dict(out.df.dtypes)["x"] == "int"
    assert sorted(r["x"] for r in out.df.collect()) == [1, 2]

    out = bind(
        spark.createDataFrame([(1,)], "x int"),
        spark.createDataFrame([("s",)], "x string"),
    )
    assert dict(out.df.dtypes)["x"] == "string"
    assert sorted(r["x"] for r in out.df.collect()) == ["1", "s"]

    out = bind(
        spark.createDataFrame([(datetime.date(2020, 1, 1),)], "x date"),
        spark.createDataFrame(
            [(datetime.datetime(2020, 1, 2, 3),)], "x timestamp"),
    )
    assert dict(out.df.dtypes)["x"] == "timestamp"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="cannot be bound"):
        bind(
            spark.createDataFrame([([1],)], "x array<int>"),
            spark.createDataFrame([(1,)], "x int"),
        )
    # positional mode promotes by position and checks column counts
    from data_table_spark.operators.reshape import rbindlist as rb
    out = rb([
        DT(spark.createDataFrame([(1, "a")], "p int, q string")),
        DT(spark.createDataFrame([(2.5, "b")], "r double, s string")),
    ], use_names=False)
    assert [t for _, t in out.df.dtypes] == ["double", "string"]
    with _pytest.raises(ValueError, match="column count"):
        rb([
            DT(spark.createDataFrame([(1,)], "p int")),
            DT(spark.createDataFrame([(1, 2)], "p int, q int")),
        ], use_names=False)


def test_split_table_full_contract(spark):
    """split.data.table contracts (reference R/data.table.R:2684-2770,
    round-12 completion): values auto-derived; sorted= orders the dict;
    keep.by=FALSE drops the split columns; multi-column by flattens to
    sep-joined keys ("a.1") or nests with flatten=False."""
    from data_table_spark.operators.reshape import split_table

    d = DT(spark.createDataFrame(
        [("b", 2, 20), ("a", 1, 10), ("a", 2, 11), ("b", 1, 21)],
        "g string, h int, v int",
    ))
    parts = split_table(d, ["g"], sorted_=True)
    assert list(parts.keys()) == ["a", "b"]
    assert sorted(r["v"] for r in parts["a"].df.collect()) == [10, 11]
    # keep_by=False drops g
    parts = split_table(d, ["g"], keep_by=False)
    assert "g" not in parts["a"].columns
    # flatten: sep-joined composite keys
    parts = split_table(d, ["g", "h"], sorted_=True)
    assert list(parts.keys()) == ["a.1", "a.2", "b.1", "b.2"]
    assert [r["v"] for r in parts["b.2"].df.collect()] == [20]
    # nested
    nested = split_table(d, ["g", "h"], sorted_=True, flatten=False)
    assert sorted(nested.keys()) == ["a", "b"]
    assert sorted(nested["a"].keys()) == [1, 2]
    assert [r["v"] for r in nested["a"][1].df.collect()] == [10]
    # nested + keep_by=False drops EVERY split column at the leaves
    nested = split_table(d, ["g", "h"], flatten=False, keep_by=False)
    leaf = nested["a"][1]
    assert leaf.columns == ["v"]


def test_rbindlist_float_int_promotes_double(spark):
    """ADVICE r12 (medium): float32's 24-bit mantissa cannot hold
    int32/int64 exactly, so binding an integral column with a FLOAT
    column must promote to DOUBLE (the reference ladder has no float32
    tier — integer/integer64 vs any floating type → double), not stay
    float and silently round values above 2^24."""
    from data_table_spark.operators.reshape import rbindlist

    big = 16_777_217  # 2^24 + 1: not representable in float32
    out = rbindlist([
        DT(spark.createDataFrame([(big,)], "x bigint")),
        DT(spark.createDataFrame([(0.5,)], "x float")),
    ])
    assert dict(out.df.dtypes)["x"] == "double"
    assert sorted(r["x"] for r in out.df.collect()) == [0.5, float(big)]
    # float+double (no integral input) still takes the double tier
    out = rbindlist([
        DT(spark.createDataFrame([(0.5,)], "x float")),
        DT(spark.createDataFrame([(2.5,)], "x double")),
    ])
    assert dict(out.df.dtypes)["x"] == "double"


def test_sdcols_invert_never_readmits_by(spark):
    """ADVICE r12 (low): sd_cols(invert=True) for the spec forms that
    exclude by (None / Patterns / callable) must complement WITHOUT
    re-admitting the by columns — 'by columns never enter .SD'.
    Explicit name/position lists keep the old complement (they may
    name by columns on purpose)."""
    from data_table_spark.operators.grouping import patterns, sd_cols

    d = DT(spark.createDataFrame(
        [(1, 2.0, "s", 3)], "g int, a double, b string, c int"))
    # callable: numeric columns, inverted, by=g → b only (not g)
    num = lambda t: t in ("int", "bigint", "double", "float")
    assert sd_cols(d, num, by=["g"], invert=True) == ["b"]
    # Patterns: ^a matched, inverted, by=g → b, c (not g)
    assert sd_cols(d, patterns("^a"), by=["g"], invert=True) == ["b", "c"]
    # default spec inverted = nothing (the default already takes all
    # non-by columns; its complement inside .SD-eligible space is empty)
    assert sd_cols(d, None, by=["g"], invert=True) == []
    # explicit list complement is unchanged: may re-include by
    assert sd_cols(d, ["a", "b"], by=["g"], invert=True) == ["g", "c"]


def test_split_nested_keep_by_false_prunes_order(spark):
    """ADVICE r12 (low): nested split with keep_by=False must prune a
    declared order_by that references any split column — the leaves
    dropped those columns and a later ordered op would fail to
    resolve them."""
    from data_table_spark.operators.reshape import split_table

    d = DT(spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 11), ("b", 1, 20)],
        "g string, h int, v int",
    ), order_by=["g", "v"])
    nested = split_table(d, ["g", "h"], flatten=False, keep_by=False)
    leaf = nested["a"][1]
    assert leaf.columns == ["v"]
    assert not leaf.order_by
    # an order that references NO split column survives to the leaves
    d2 = DT(d.df, order_by=["v"])
    nested = split_table(d2, ["g", "h"], flatten=False, keep_by=False)
    assert nested["a"][1].order_by == ["v"]
