"""Join-column type-coercion contracts ported from the reference's
tests.Rraw 2044 section (#2592 — R/bmerge.R:19 coerce_col, :60-160),
round-12 mining (VERDICT r11 item 6).

Semantics under test (X[Y] = lookup(x, y)):
- same merge type → no coercion (incl. int-as-double joining a
  fractional double: both are "double", no probe);
- character/logical vs anything → "Incompatible join types" unless the
  mismatched column is ALL-NA (coerces to the other side);
- int vs int64 → exact widening; double vs int64 → only if the double
  side has an integer64 representation (no fractions), else error;
- i-double joining x-int: fitsInInt32 (no fractions) coerces i to int
  AND the result returns int (the reference's forgotten-L-postfix
  convenience); fractional i keeps double and x widens — crucially the
  fractional values must NOT truncate-match (2044.61 regression:
  v1.12.2 joined 1.5 to 1);
- unsupported column types (raw → binary here) raise "not supported".

Adaptations (documented): factor has no Spark analog (factor cases land
on the character paths); the reference default join matches NA to NA,
which is opt-in ``na_matches=True`` here (SURVEY §2.3), so the all-NA
vectors pass it explicitly where the match matters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_table_spark.core import DT
from data_table_spark.operators.joins import lookup


def _tables(spark):
    # dt1 mirror (tests.Rraw:14830): 10 rows
    x = spark.createDataFrame(
        [
            (
                i,
                float(i),
                i * 0.5,
                i == 10,
                "abcdefghij"[i - 1],
                1 if i == 1 else (30_000_000_000 if i == 10 else i),
            )
            for i in range(1, 11)
        ],
        "int int, doubleInt double, realDouble double, bool boolean, "
        "char string, int64 long",
    )
    # dt2 mirror: 5 rows, int64 = 1:4, 3e9
    y = spark.createDataFrame(
        [
            (
                i,
                float(i),
                i * 0.5,
                True,
                "abcde"[i - 1],
                3_000_000_000 if i == 5 else i,
            )
            for i in range(1, 6)
        ],
        "iint int, idoubleInt double, irealDouble double, ibool boolean, "
        "ichar string, iint64 long",
    )
    return DT(x, key=["int"]), DT(y)


def test_2044_01_09_no_coercion(spark):
    """2044.01-.09: matching merge types join untouched — including
    int-as-double vs fractional double (both 'double', .05/.06)."""
    x, y = _tables(spark)
    for on in (
        {"bool": "ibool"},
        {"int": "iint"},
        {"doubleInt": "idoubleInt"},
        {"realDouble": "irealDouble"},
        {"doubleInt": "irealDouble"},
        {"realDouble": "idoubleInt"},
        {"char": "ichar"},
        {"int64": "iint64"},
    ):
        out = lookup(x, y, on=on)
        assert out.df.count() == 5, on


def test_2044_10_unsupported_type(spark):
    """2044.10/.11: a non-orderable column type in the join raises
    'not supported' (raw in R; binary here)."""
    x, y = _tables(spark)
    xb = DT(x.df.withColumn("rawc", F.col("char").cast("binary")))
    yb = DT(y.df.withColumn("irawc", F.col("ichar").cast("binary")))
    with pytest.raises(ValueError, match="not supported"):
        lookup(x, yb, on={"int": "irawc"})
    with pytest.raises(ValueError, match="not supported"):
        lookup(xb, y, on={"rawc": "iint"})


@pytest.mark.parametrize(
    "xcol,ycol",
    [
        ("bool", "iint"),          # 2044.20
        ("bool", "idoubleInt"),    # .21
        ("bool", "irealDouble"),   # .22
        ("bool", "ichar"),         # .23
        ("int", "ibool"),          # .25
        ("int", "ichar"),          # .26
        ("doubleInt", "ibool"),    # .28
        ("doubleInt", "ichar"),    # .29
        ("realDouble", "ibool"),   # .31
        ("realDouble", "ichar"),   # .32
        ("char", "ibool"),         # .34
        ("char", "iint"),          # .35
        ("char", "idoubleInt"),    # .36
        ("char", "irealDouble"),   # .37
        ("bool", "iint64"),        # .42
        ("char", "iint64"),        # .43
        ("int64", "ibool"),        # .45
        ("int64", "ichar"),        # .46
    ],
)
def test_2044_20_47_incompatible(spark, xcol, ycol):
    """2044.20-.47: char/logical never coerce to numeric (and vice
    versa) when real values are present."""
    x, y = _tables(spark)
    with pytest.raises(ValueError, match="Incompatible join types"):
        lookup(x, y, on={xcol: ycol})


def test_2044_60_int_as_double_i_coerces_and_returns_int(spark):
    """2044.60: i.doubleInt (no fractions) joining x.int coerces i to
    integer and the RESULT column is integer."""
    x, y = _tables(spark)
    out = lookup(x, y, on={"int": "idoubleInt"})
    assert out.df.count() == 5
    assert dict(out.df.dtypes)["idoubleInt"] == "int"
    assert sorted(
        r["idoubleInt"] for r in out.df.collect()
    ) == [1, 2, 3, 4, 5]


def test_2044_61_fractional_i_widens_x_no_truncation(spark):
    """2044.61: i.realDouble has fractions → x.int widens to double
    instead; 1.5 must NOT truncate-match 1 (v1.12.2 regression). With
    nomatch=NA the unmatched i rows keep NULL x payload."""
    x, y = _tables(spark)
    out = lookup(x, y, on={"int": "irealDouble"})
    rows = {r["irealDouble"]: r["char"] for r in out.df.collect()}
    # i values 0.5,1,1.5,2,2.5 — only 1.0 and 2.0 match x.int
    assert rows[1.0] == "a" and rows[2.0] == "b"
    assert rows[0.5] is None and rows[1.5] is None and rows[2.5] is None


def test_2044_62_63_i_int_vs_x_double_exact(spark):
    """2044.62/.63: i.int joining x.doubleInt/x.realDouble widens i
    for the join (implicit exact int==double comparison); fractional x
    values match only true integers — x.realDouble==i.int matches the
    x rows 2,4,6,8,10."""
    x, y = _tables(spark)
    out = lookup(x, y, on={"doubleInt": "iint"})
    assert out.df.count() == 5
    assert dict(out.df.dtypes)["iint"] == "int"  # i keeps its type
    out = lookup(x, y, on={"realDouble": "iint"}).query(
        j=["iint", "int"]
    )
    got = {r["iint"]: r["int"] for r in out.df.collect()}
    assert got == {1: 2, 2: 4, 3: 6, 4: 8, 5: 10}


def test_2044_66_71_integer64(spark):
    """2044.66/.67: int and fraction-free double join int64 exactly
    (nomatch=0 keeps the 4 in-range matches; 3e9/3e10 do not collide);
    2044.68/.71: a FRACTIONAL double cannot coerce to integer64."""
    x, y = _tables(spark)
    out = lookup(x, y, on={"int": "iint64"}, nomatch=None)
    assert sorted(r["iint64"] for r in out.df.collect()) == [1, 2, 3, 4]
    out = lookup(x, y, on={"doubleInt": "iint64"}, nomatch=None)
    assert sorted(r["iint64"] for r in out.df.collect()) == [1, 2, 3, 4]
    # int64 in x (2044.69/.70): x.int64 holds 1..9 (and 3e10), so all
    # five i rows match
    out = lookup(x, y, on={"int64": "iint"}, nomatch=None)
    assert sorted(r["iint"] for r in out.df.collect()) == [1, 2, 3, 4, 5]
    out = lookup(x, y, on={"int64": "idoubleInt"}, nomatch=None)
    assert sorted(r["idoubleInt"] for r in out.df.collect()) == [
        1.0, 2.0, 3.0, 4.0, 5.0]
    # join-only cast: the double column keeps its dtype in the output
    assert dict(out.df.dtypes)["idoubleInt"] == "double"
    with pytest.raises(ValueError, match="cannot be coerced to integer64"):
        lookup(x, y, on={"realDouble": "iint64"})
    with pytest.raises(ValueError, match="cannot be coerced to integer64"):
        lookup(x, y, on={"int64": "irealDouble"})


def test_2044_80_85_all_na_coercion(spark):
    """2044.80-.85: an all-NA column coerces to the other side's type
    instead of erroring; with the reference's NA-matches-NA rule
    (na_matches=True here) an all-NA char x column still matches the
    coerced all-NA i column (2044.83 keeps the row under nomatch=0)."""
    x = DT(spark.createDataFrame(
        [(1.0, None)], "a double, b string"
    ))
    y = DT(spark.createDataFrame(
        [(2, None)], "ia int, ib boolean"
    ))
    # 2044.80: i.ib (all-NA logical) coerces to double; no match → NA
    out = lookup(x, y, on={"a": "ib"})
    assert out.df.count() == 1
    assert out.df.collect()[0]["b"] is None
    # 2044.81: nomatch=0 drops it
    assert lookup(x, y, on={"a": "ib"}, nomatch=None).df.count() == 0
    # 2044.82/.83: x.b all-NA char vs i.ib all-NA logical — coerces,
    # and NA matches NA under the reference rule
    out = lookup(x, y, on={"b": "ib"}, nomatch=None, na_matches=True)
    assert out.df.count() == 1
    # 2044.84/.85: all-NA x.b coerces to i.ia's integer; no match
    out = lookup(x, y, on={"b": "ia"})
    assert out.df.count() == 1
    assert lookup(x, y, on={"b": "ia"}, nomatch=None).df.count() == 0


def test_merge_routes_through_coercion(spark):
    """merge() funnels through the same bmerge contract (reference
    R/merge.R → bmerge): fraction-free y double key joining an x int
    key coerces and matches exactly; an incompatible char/int merge
    raises instead of silently null-joining."""
    from data_table_spark.operators.joins import merge

    x = DT(spark.createDataFrame(
        [(i, i * 10) for i in range(1, 6)], "k int, vx int"
    ))
    y = DT(spark.createDataFrame(
        [(float(i), i * 100) for i in (2, 3, 9)], "ky double, vy int"
    ))
    out = merge(x, y, by_x=["k"], by_y=["ky"])
    assert sorted((r["k"], r["vx"], r["vy"]) for r in out.df.collect()) == [
        (2, 20, 200), (3, 30, 300)]
    ybad = DT(spark.createDataFrame([("2", 1)], "ky string, vy int"))
    with pytest.raises(ValueError, match="Incompatible join types"):
        merge(x, ybad, by_x=["k"], by_y=["ky"])


def test_1489_value_join_coercion(spark):
    """tests.Rraw 1489: DT[.(TRUE)] on an integer key errors with the
    incompatible-types contract; DT[.(1L)] and DT[.(1)] (int-as-double
    ad hoc value) both return row 1 — the fitsInInt32 convenience
    applies to J()-style value joins through the same lookup path."""
    from data_table_spark.operators.joins import J, lookup

    x = DT(spark.createDataFrame(
        [(i, i + 5) for i in range(1, 6)], "x int, y int"
    ), key=["x"])
    with pytest.raises(ValueError, match="Incompatible join types"):
        lookup(x, J(spark, x=True), nomatch=None)
    got = lookup(x, J(spark, x=1), nomatch=None)        # 1489.2
    assert [(r["x"], r["y"]) for r in got.df.collect()] == [(1, 6)]
    got = lookup(x, J(spark, x=1.0), nomatch=None)      # 1489.3
    assert [(r["x"], r["y"]) for r in got.df.collect()] == [(1, 6)]
    assert dict(got.df.dtypes)["x"] == "int"            # callersi rule


def test_1744_join_which(spark):
    """tests.Rraw 1744 (#1904, fractional-double join keys): equi join
    with which=TRUE returns each i row's matched x ROW NUMBER (NA on
    no match); the roll form is the as-of join carrying a precomputed
    row-number payload — both on the exact 1744 vectors."""
    from pyspark.sql import Window

    from data_table_spark.operators.asof import asof_join
    from data_table_spark.operators.joins import lookup

    a_vals = [1999.917, 2000.417, 2000.917, 2001.417, 2001.917]
    x = DT(spark.createDataFrame([(v,) for v in a_vals], "A double"),
           key=["A"])
    iq = [2000.167, 2000.417, 2000.667, 2000.917, 2001.167]
    y = DT(spark.createDataFrame(
        [(j, v) for j, v in enumerate(iq)], "j int, A double"
    ), order_by=["j"])
    # 1744.1: roll=FALSE, which=TRUE → NA,2,NA,3,NA
    out = lookup(x, y, on=["A"], which=True)
    got = [r["which"] for r in out.df.orderBy("j").collect()]
    assert got == [None, 2, None, 3, None]
    # 1744.2: roll=TRUE (LOCF), which via a row-number payload
    xr = DT(
        x.df.withColumn(
            "xrow",
            F.row_number().over(Window.orderBy("A")),
        ),
        key=["A"],
    )
    out = asof_join(xr, y, on=[], time_x="A", time_i="A", roll=True)
    got = [r["xrow"] for r in out.df.orderBy("j").collect()]
    assert got == [1, 2, 2, 3, 3]


def test_2101_zero_row_i_type_mismatch_ok(spark):
    """tests.Rraw 2101 (#3581): a 0-row i with a mismatched join type
    coerces fine (the all-NA/empty branch — count probe sees 0
    non-null values) and returns the empty result with x's columns."""
    from data_table_spark.operators.joins import lookup

    x = DT(spark.createDataFrame(
        [(i, i + 3) for i in (1, 2, 3)], "id int, v int"
    ), key=["id"])
    y = DT(spark.createDataFrame([], "id boolean"))
    out = lookup(x, y, on=["id"])
    assert out.df.count() == 0
    assert set(out.columns) == {"id", "v"}


def test_zero_row_x_type_mismatch_raises(spark):
    """ADVICE r12 (low): a ZERO-ROW x side is NOT all-NA (the reference
    coerces only when anyNA && allNA, false on empty) — joining a
    populated, genuinely mismatched i against an empty x must raise
    Incompatible join types, not silently coerce. The 0-row i fast
    path (tests.Rraw 2101) keeps working."""
    import pytest

    from data_table_spark.operators.joins import lookup

    x = DT(spark.createDataFrame([], "id string, v int"), key=["id"])
    y = DT(spark.createDataFrame([(1,)], "id int"))
    with pytest.raises(ValueError, match="Incompatible join types"):
        lookup(x, y, on=["id"])
    # all-NA x (rows present, every value NULL) still coerces
    x2 = DT(spark.createDataFrame(
        [(None, 7)], "id string, v int"), key=["id"])
    out = lookup(x2, y, on=["id"])  # default nomatch=NA keeps the i row
    row = out.df.collect()[0]
    assert row["id"] == 1 and row["v"] is None
