"""Parity vectors ported from the reference's inst/tests/mergelist.Rraw
(1,322 lines — the densest edge-case corpus for mergepair/mergelist/
fdistinct/cbindlist; round-10 verdict item 2). Each case cites its Rraw
test number. Exact input vectors and expected outputs are reproduced;
row ORDER is compared as a sorted multiset (Spark frames are unordered,
SURVEY §1.1 — the reference's row-order guarantees are deliberately not
reproduced), column order and NULL placement exactly.

Address/copy-ness assertions (`copied`/`notcopied`, tests *.x check-
copied rows) test R memory semantics and have no Spark analog —
DataFrames are immutable — so only the content expectation of each
vector is ported.

inst/tests/types.Rraw is NOT ported: its 39 lines exercise the
reference's internal C message-raising harness (testMsg/testRaiseMsg,
src/types.c), machinery this engine does not have or need.
"""

from __future__ import annotations

import pytest

from data_table_spark.core import DT
from data_table_spark.operators.grouping import fdistinct
from data_table_spark.operators.joins import mergelist, mergepair, setmergelist
from data_table_spark.operators.reshape import cbindlist, setcbindlist

HOWS = ("inner", "left", "right", "full")
MULTS = ("all", "first", "last", "error")
ERR = "error-expected"


def _dt(spark, schema, rows, key=None):
    return DT(spark.createDataFrame(rows, schema), key=key)


def _sorted(rows):
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))


def _got(dt):
    return _sorted([tuple(r) for r in dt.df.collect()])


def _check(dt, cols, rows, ctx):
    assert dt.columns == cols, ctx
    assert _got(dt) == _sorted(rows), ctx


def _matrix(spark, ref, lhs, rhs, expected, cols=("id1", "v1", "v2")):
    """Run the Rraw how×mult matrix pattern: ``expected[how]`` is either
    a row list (all mult values agree — unique-key groups 21-29) or a
    dict mult→rows/ERR (duplicate-key groups 221-227)."""
    L = _dt(spark, "id1 int, v1 int", lhs)
    R = _dt(spark, "id1 int, v2 int", rhs)
    for how in HOWS:
        exp = expected[how]
        if not isinstance(exp, dict):
            exp = {m: exp for m in MULTS}
        for mult, want in exp.items():
            ctx = f"{ref} how={how} mult={mult}"
            if want == ERR:
                with pytest.raises(ValueError, match="multiple matches"):
                    mergepair(L, R, on="id1", how=how, mult=mult)
            else:
                _check(
                    mergepair(L, R, on="id1", how=how, mult=mult),
                    list(cols), want, ctx,
                )


# ---------------------------------------------------------------- mergepair
# groups 21-29: unique keys per side, every mult value agrees


def test_mergepair_21_equal_sides(spark):
    """mergelist.Rraw 21.*: LHS equal to RHS."""
    both = [(1, 1, 1), (2, 2, 2)]
    _matrix(spark, "21", [(1, 1), (2, 2)], [(1, 1), (2, 2)],
            {"inner": both, "left": both, "right": both, "full": both})


def test_mergepair_22_rhs_includes_lhs(spark):
    """mergelist.Rraw 22.*."""
    _matrix(spark, "22", [(1, 1), (2, 2)], [(1, 1), (2, 2), (3, 3)], {
        "inner": [(1, 1, 1), (2, 2, 2)],
        "left": [(1, 1, 1), (2, 2, 2)],
        "right": [(1, 1, 1), (2, 2, 2), (3, None, 3)],
        "full": [(1, 1, 1), (2, 2, 2), (3, None, 3)],
    })


def test_mergepair_23_lhs_includes_rhs(spark):
    """mergelist.Rraw 23.*."""
    _matrix(spark, "23", [(1, 1), (2, 2), (3, 3)], [(1, 1), (2, 2)], {
        "inner": [(1, 1, 1), (2, 2, 2)],
        "left": [(1, 1, 1), (2, 2, 2), (3, 3, None)],
        "right": [(1, 1, 1), (2, 2, 2)],
        "full": [(1, 1, 1), (2, 2, 2), (3, 3, None)],
    })


def test_mergepair_24_single_nonmatch_each_side(spark):
    """mergelist.Rraw 24.*."""
    _matrix(spark, "24", [(3, 1), (2, 2), (1, 3)], [(4, 1), (2, 2), (1, 3)], {
        "inner": [(2, 2, 2), (1, 3, 3)],
        "left": [(3, 1, None), (2, 2, 2), (1, 3, 3)],
        "right": [(4, None, 1), (2, 2, 2), (1, 3, 3)],
        "full": [(3, 1, None), (2, 2, 2), (1, 3, 3), (4, None, 1)],
    })


def test_mergepair_25_zero_match(spark):
    """mergelist.Rraw 25.*."""
    _matrix(spark, "25", [(2, 1), (1, 2)], [(3, 1), (4, 2)], {
        "inner": [],
        "left": [(2, 1, None), (1, 2, None)],
        "right": [(3, None, 1), (4, None, 2)],
        "full": [(2, 1, None), (1, 2, None), (3, None, 1), (4, None, 2)],
    })


def test_mergepair_26_27_28_zero_rows(spark):
    """mergelist.Rraw 26.* / 27.* / 28.*: empty sides."""
    _matrix(spark, "26", [], [],
            {"inner": [], "left": [], "right": [], "full": []})
    _matrix(spark, "27", [], [(2, 1), (1, 2)], {
        "inner": [], "left": [],
        "right": [(2, None, 1), (1, None, 2)],
        "full": [(2, None, 1), (1, None, 2)],
    })
    _matrix(spark, "28", [(2, 1), (1, 2)], [], {
        "inner": [], "right": [],
        "left": [(2, 1, None), (1, 2, None)],
        "full": [(2, 1, None), (1, 2, None)],
    })


def test_mergepair_29_same_different_order(spark):
    """mergelist.Rraw 29.*."""
    both = [(1, 1, 1), (2, 2, 2)]
    _matrix(spark, "29", [(1, 1), (2, 2)], [(2, 2), (1, 1)],
            {"inner": both, "left": both, "right": both, "full": both})


def test_mergepair_121_4x_5x_containment(spark):
    """mergelist.Rraw 121.41-121.56 (mult="all" containment shapes)."""
    _matrix(spark, "121.4x", [(1, 1), (2, 2), (3, 3), (4, 4)],
            [(3, 1), (2, 2)], {
        "inner": {"all": [(2, 2, 2), (3, 3, 1)]},
        "left": {"all": [(1, 1, None), (2, 2, 2), (3, 3, 1), (4, 4, None)]},
        "right": {"all": [(3, 3, 1), (2, 2, 2)]},
        "full": {"all": [(1, 1, None), (2, 2, 2), (3, 3, 1), (4, 4, None)]},
    })
    _matrix(spark, "121.5x", [(3, 1), (2, 2)],
            [(1, 1), (2, 2), (3, 3), (4, 4)], {
        "inner": {"all": [(3, 1, 3), (2, 2, 2)]},
        "left": {"all": [(3, 1, 3), (2, 2, 2)]},
        "right": {"all": [(1, None, 1), (2, 2, 2), (3, 1, 3), (4, None, 4)]},
        "full": {"all": [(1, None, 1), (2, 2, 2), (3, 1, 3), (4, None, 4)]},
    })


# groups 221-227: duplicate keys — the full how×mult expectation grids


def test_mergepair_221_dups_both_sides_matched(spark):
    """mergelist.Rraw 221.*: duplicates in RHS and LHS matched in both."""
    _matrix(spark, "221", [(1, 1), (2, 2), (3, 3), (3, 4)],
            [(1, 1), (1, 2), (3, 3), (4, 4)], {
        "inner": {
            "all": [(1, 1, 1), (1, 1, 2), (3, 3, 3), (3, 4, 3)],
            "first": [(1, 1, 1), (3, 3, 3)],
            "last": [(1, 1, 2), (3, 4, 3)],
            "error": ERR,
        },
        "left": {
            "all": [(1, 1, 1), (1, 1, 2), (2, 2, None), (3, 3, 3), (3, 4, 3)],
            "first": [(1, 1, 1), (2, 2, None), (3, 3, 3), (3, 4, 3)],
            "last": [(1, 1, 2), (2, 2, None), (3, 3, 3), (3, 4, 3)],
            "error": ERR,
        },
        "right": {
            "all": [(1, 1, 1), (1, 1, 2), (3, 3, 3), (3, 4, 3), (4, None, 4)],
            "first": [(1, 1, 1), (1, 1, 2), (3, 3, 3), (4, None, 4)],
            "last": [(1, 1, 1), (1, 1, 2), (3, 4, 3), (4, None, 4)],
            "error": ERR,
        },
        "full": {
            "all": [(1, 1, 1), (1, 1, 2), (2, 2, None), (3, 3, 3), (3, 4, 3),
                    (4, None, 4)],
            "first": [(1, 1, 1), (2, 2, None), (3, 3, 3), (4, None, 4)],
            "last": [(1, 1, 2), (2, 2, None), (3, 4, 3), (4, None, 4)],
            "error": ERR,
        },
    })


def test_mergepair_222_dups_in_rhs(spark):
    """mergelist.Rraw 222.*: duplicates in RHS only — note how="right"
    never errors (mult reduces the LHS side there)."""
    r_all = [(2, 2, 1), (2, 2, 2), (3, None, 3)]
    _matrix(spark, "222", [(1, 1), (2, 2)], [(2, 1), (2, 2), (3, 3)], {
        "inner": {
            "all": [(2, 2, 1), (2, 2, 2)],
            "first": [(2, 2, 1)],
            "last": [(2, 2, 2)],
            "error": ERR,
        },
        "left": {
            "all": [(1, 1, None), (2, 2, 1), (2, 2, 2)],
            "first": [(1, 1, None), (2, 2, 1)],
            "last": [(1, 1, None), (2, 2, 2)],
            "error": ERR,
        },
        "right": {"all": r_all, "first": r_all, "last": r_all, "error": r_all},
        "full": {
            "all": [(1, 1, None), (2, 2, 1), (2, 2, 2), (3, None, 3)],
            "first": [(1, 1, None), (2, 2, 1), (3, None, 3)],
            "last": [(1, 1, None), (2, 2, 2), (3, None, 3)],
            "error": ERR,
        },
    })


def test_mergepair_223_dups_in_lhs(spark):
    """mergelist.Rraw 223.*: duplicates in LHS only — how="left" never
    errors (mult reduces the RHS side there)."""
    l_all = [(1, 1, None), (2, 2, 1), (2, 3, 1)]
    _matrix(spark, "223", [(1, 1), (2, 2), (2, 3)], [(2, 1), (3, 2)], {
        "inner": {
            "all": [(2, 2, 1), (2, 3, 1)],
            "first": [(2, 2, 1)],
            "last": [(2, 3, 1)],
            "error": ERR,
        },
        "left": {"all": l_all, "first": l_all, "last": l_all, "error": l_all},
        "right": {
            "all": [(2, 2, 1), (2, 3, 1), (3, None, 2)],
            "first": [(2, 2, 1), (3, None, 2)],
            "last": [(2, 3, 1), (3, None, 2)],
            "error": ERR,
        },
        "full": {
            "all": [(1, 1, None), (2, 2, 1), (2, 3, 1), (3, None, 2)],
            "first": [(1, 1, None), (2, 2, 1), (3, None, 2)],
            "last": [(1, 1, None), (2, 3, 1), (3, None, 2)],
            "error": ERR,
        },
    })


def test_mergepair_224_unmatched_rhs_dups(spark):
    """mergelist.Rraw 224.*: RHS dup key 4 has no LHS match — for
    full/first|last it still reduces per key in the outer rows."""
    _matrix(spark, "224", [(1, 1), (2, 2), (3, 3), (3, 4)],
            [(1, 1), (1, 2), (3, 3), (4, 4), (4, 5)], {
        "inner": {
            "all": [(1, 1, 1), (1, 1, 2), (3, 3, 3), (3, 4, 3)],
            "first": [(1, 1, 1), (3, 3, 3)],
            "last": [(1, 1, 2), (3, 4, 3)],
            "error": ERR,
        },
        "left": {
            "all": [(1, 1, 1), (1, 1, 2), (2, 2, None), (3, 3, 3), (3, 4, 3)],
            "first": [(1, 1, 1), (2, 2, None), (3, 3, 3), (3, 4, 3)],
            "last": [(1, 1, 2), (2, 2, None), (3, 3, 3), (3, 4, 3)],
            "error": ERR,
        },
        "right": {
            "all": [(1, 1, 1), (1, 1, 2), (3, 3, 3), (3, 4, 3),
                    (4, None, 4), (4, None, 5)],
            "first": [(1, 1, 1), (1, 1, 2), (3, 3, 3), (4, None, 4),
                      (4, None, 5)],
            "last": [(1, 1, 1), (1, 1, 2), (3, 4, 3), (4, None, 4),
                     (4, None, 5)],
            "error": ERR,
        },
        "full": {
            "all": [(1, 1, 1), (1, 1, 2), (2, 2, None), (3, 3, 3), (3, 4, 3),
                    (4, None, 4), (4, None, 5)],
            "first": [(1, 1, 1), (2, 2, None), (3, 3, 3), (4, None, 4)],
            "last": [(1, 1, 2), (2, 2, None), (3, 4, 3), (4, None, 5)],
            "error": ERR,
        },
    })


def test_mergepair_225_unmatched_lhs_dups(spark):
    """mergelist.Rraw 225.*: LHS dup key 4 has no RHS match."""
    _matrix(spark, "225", [(1, 1), (1, 2), (3, 3), (4, 4), (4, 5)],
            [(1, 1), (2, 2), (3, 3), (3, 4)], {
        "inner": {
            "all": [(1, 1, 1), (1, 2, 1), (3, 3, 3), (3, 3, 4)],
            "first": [(1, 1, 1), (3, 3, 3)],
            "last": [(1, 2, 1), (3, 3, 4)],
            "error": ERR,
        },
        "left": {
            "all": [(1, 1, 1), (1, 2, 1), (3, 3, 3), (3, 3, 4),
                    (4, 4, None), (4, 5, None)],
            "first": [(1, 1, 1), (1, 2, 1), (3, 3, 3), (4, 4, None),
                      (4, 5, None)],
            "last": [(1, 1, 1), (1, 2, 1), (3, 3, 4), (4, 4, None),
                     (4, 5, None)],
            "error": ERR,
        },
        "right": {
            "all": [(1, 1, 1), (1, 2, 1), (2, None, 2), (3, 3, 3),
                    (3, 3, 4)],
            "first": [(1, 1, 1), (2, None, 2), (3, 3, 3), (3, 3, 4)],
            "last": [(1, 2, 1), (2, None, 2), (3, 3, 3), (3, 3, 4)],
            "error": ERR,
        },
        "full": {
            "all": [(1, 1, 1), (1, 2, 1), (3, 3, 3), (3, 3, 4),
                    (4, 4, None), (4, 5, None), (2, None, 2)],
            "first": [(1, 1, 1), (3, 3, 3), (4, 4, None), (2, None, 2)],
            "last": [(1, 2, 1), (3, 3, 4), (4, 5, None), (2, None, 2)],
            "error": ERR,
        },
    })


def test_mergepair_226_cartesian_match(spark):
    """mergelist.Rraw 226.*: dups on both sides of one matching key."""
    _matrix(spark, "226", [(1, 1), (1, 2), (2, 3)], [(1, 1), (1, 2), (3, 3)], {
        "inner": {
            "all": [(1, 1, 1), (1, 1, 2), (1, 2, 1), (1, 2, 2)],
            "first": [(1, 1, 1)],
            "last": [(1, 2, 2)],
            "error": ERR,
        },
        "left": {
            "all": [(1, 1, 1), (1, 1, 2), (1, 2, 1), (1, 2, 2), (2, 3, None)],
            "first": [(1, 1, 1), (1, 2, 1), (2, 3, None)],
            "last": [(1, 1, 2), (1, 2, 2), (2, 3, None)],
            "error": ERR,
        },
        "right": {
            "all": [(1, 1, 1), (1, 2, 1), (1, 1, 2), (1, 2, 2), (3, None, 3)],
            "first": [(1, 1, 1), (1, 1, 2), (3, None, 3)],
            "last": [(1, 2, 1), (1, 2, 2), (3, None, 3)],
            "error": ERR,
        },
        "full": {
            "all": [(1, 1, 1), (1, 1, 2), (1, 2, 1), (1, 2, 2), (2, 3, None),
                    (3, None, 3)],
            "first": [(1, 1, 1), (2, 3, None), (3, None, 3)],
            "last": [(1, 2, 2), (2, 3, None), (3, None, 3)],
            "error": ERR,
        },
    })


def test_mergepair_227_cross_join_duplicates(spark):
    """mergelist.Rraw 227.*: both sides are the same duplicated key."""
    four = [(1, 1, 1), (1, 1, 2), (1, 2, 1), (1, 2, 2)]
    _matrix(spark, "227", [(1, 1), (1, 2)], [(1, 1), (1, 2)], {
        "inner": {"all": four, "first": [(1, 1, 1)], "last": [(1, 2, 2)],
                  "error": ERR},
        "left": {"all": four, "first": [(1, 1, 1), (1, 2, 1)],
                 "last": [(1, 1, 2), (1, 2, 2)], "error": ERR},
        "right": {"all": four, "first": [(1, 1, 1), (1, 1, 2)],
                  "last": [(1, 2, 1), (1, 2, 2)], "error": ERR},
        "full": {"all": four, "first": [(1, 1, 1)], "last": [(1, 2, 2)],
                 "error": ERR},
    })


def test_mergepair_251_na_join_keys(spark):
    """mergelist.Rraw 251.*: NA join keys match NA (bmerge semantics,
    src/bmerge.c:9-13) — NOT SQL's null-never-matches."""
    # 251.01-04: identical sides including an NA key
    both = [(1, 1, 1), (2, 2, 2), (None, 3, 3)]
    _matrix(spark, "251.0x", [(1, 1), (2, 2), (None, 3)],
            [(1, 1), (2, 2), (None, 3)],
            {"inner": {"all": both}, "left": {"all": both},
             "right": {"all": both}, "full": {"all": both}})
    # 251.11-14: NA key on RHS only
    _matrix(spark, "251.1x", [(1, 1), (2, 2)], [(1, 1), (None, 2), (3, 3)], {
        "inner": {"all": [(1, 1, 1)]},
        "left": {"all": [(1, 1, 1), (2, 2, None)]},
        "right": {"all": [(1, 1, 1), (None, None, 2), (3, None, 3)]},
        "full": {"all": [(1, 1, 1), (2, 2, None), (None, None, 2),
                         (3, None, 3)]},
    })


# ------------------------------------------------------- mergelist contract


def test_mergelist_101_validation(spark):
    """mergelist.Rraw 101.01-101.43: argument validation contracts."""
    d1 = _dt(spark, "x int", [(1,)])
    with pytest.raises(ValueError, match="must be a list"):        # 101.01
        mergelist(d1, on="x")
    with pytest.raises(ValueError, match="cross join must be"):    # 101.02
        mergelist([d1, _dt(spark, "x int", [(1,)])], how="cross", on="y")
    with pytest.raises(ValueError, match="must be data.table"):    # 101.03
        mergelist([d1, {"x": [1, 2]}], on="x")

    l2 = [_dt(spark, "x int", [(1,), (2,)]), _dt(spark, "x int", [(2,), (3,)])]
    with pytest.raises(ValueError, match="non-zero length"):       # 101.09
        mergelist(l2, on=[])
    with pytest.raises(ValueError, match="not present in LHS"):    # 101.11
        mergelist(l2, on="xx")

    # 101.13: duplicated RHS keys with mult="all" pass straight through
    out = mergelist(
        [_dt(spark, "a int", [(1,)]), _dt(spark, "a int", [(1,), (1,)])],
        on="a", mult="all",
    )
    _check(out, ["a"], [(1,), (1,)], "101.13")

    assert mergelist([]).df.count() == 0                           # 101.14
    got = mergelist([d1])                                          # 101.04
    _check(got, ["x"], [(1,)], "101.04")

    import pyspark.sql.functions as F

    empty = DT(spark.range(0).select())
    with pytest.raises(ValueError, match="must all have columns"):  # 101.15
        mergelist([empty])
    with pytest.raises(ValueError, match="must all have columns"):  # 101.16
        mergelist([empty, empty])

    # 101.17: zero-row tables merge to zero rows
    z = _dt(spark, "a int", [])
    _check(mergelist([z, z], on="a"), ["a"], [], "101.17")

    # 101.18: duplicate names inside one table
    dup_inner = DT(spark.range(1).select(
        F.lit(1).alias("a"), F.lit(1).alias("b"), F.lit(1).alias("b")
    ))
    with pytest.raises(ValueError, match="must be unique"):
        mergelist([_dt(spark, "a int", [(1,)]), dup_inner], on="a")

    ab1 = _dt(spark, "a int, b int", [(1, 1)])
    ab2 = _dt(spark, "a int, b int", [(1, 2)])
    with pytest.raises(ValueError, match="duplicated column names"):  # 101.19
        mergelist([ab1, ab2], on="a")
    # 101.20: empty cols vector drops the clash
    _check(mergelist([ab1, ab2], on="a", cols=[None, []]),
           ["a", "b"], [(1, 1)], "101.20")

    ad = _dt(spark, "a int, d int", [(1, 1)])
    with pytest.raises(ValueError, match="cols"):                  # 101.21
        mergelist([ad, ab2], on="a", cols=[None, ["a", None]])
    with pytest.raises(ValueError, match="cols"):                  # 101.22
        mergelist([ad, ab2], on="a", cols=[None, ["a", "a"]])
    with pytest.raises(ValueError, match="same length"):           # 101.23
        mergelist([ad, ab2], on="a", cols=[None])
    with pytest.raises(ValueError, match="join.many"):             # 101.24
        mergelist([ad, ab2], on="a", join_many=[True, True])
    with pytest.raises(ValueError, match="join.many"):             # 101.25
        mergelist([ad, ab2], on="a", join_many=[None])
    with pytest.raises(ValueError, match="'on' must be"):          # 101.26
        mergelist([ad, ab2], on=["a", "a"])
    three = [ad, ab2, _dt(spark, "a int", [(1,)])]
    with pytest.raises(ValueError, match="'on' must be"):          # 101.28
        mergelist(three, on=[["a"], ["a", None]])
    with pytest.raises(ValueError, match="'on' must be"):          # 101.30
        mergelist(three, on=[["a"], ["a", "a"]])

    xy = [_dt(spark, "x int", [(1,)]), _dt(spark, "y int", [(1,)])]
    with pytest.raises(ValueError, match="cross join must be"):    # 101.32
        mergelist(xy, how="cross", mult="first")
    with pytest.raises(ValueError, match="cross join must be"):    # 101.33
        mergelist(xy, how="cross", join_many=False)
    xx = [_dt(spark, "x int", [(1,)]), _dt(spark, "x int", [(1,)])]
    with pytest.raises(ValueError, match="mult!='all'"):           # 101.34
        mergelist(xx, how="semi", on="x", mult="all")
    with pytest.raises(ValueError, match="mult!='all'"):           # 101.35
        mergelist(xx, how="anti", on="x", mult="all")

    # 101.36-38: mult="error" raises on matched duplicates (full join
    # checks both sides via the second anti-merge)
    with pytest.raises(ValueError, match="multiple matches"):      # 101.36
        mergelist([_dt(spark, "id1 int, v1 int", [(3, 1), (2, 2), (2, 3)]),
                   _dt(spark, "id1 int, v2 int", [(2, 1), (2, 2), (1, 3)])],
                  how="full", on="id1", mult="error")
    with pytest.raises(ValueError, match="multiple matches"):      # 101.37
        mergelist([_dt(spark, "id1 int, v1 int", [(3, 1), (2, 2)]),
                   _dt(spark, "id1 int, v2 int", [(2, 1), (2, 2), (1, 3)])],
                  how="full", on="id1", mult="error")
    with pytest.raises(ValueError, match="multiple matches"):      # 101.38
        mergelist([_dt(spark, "id1 int, v1 int", [(3, 1), (2, 2), (2, 3)]),
                   _dt(spark, "id1 int, v2 int", [(2, 2), (1, 3)])],
                  how="full", on="id1", mult="error")
    with pytest.raises(ValueError, match="must be one of"):        # 101.39
        mergelist(xx, on="x", mult="bad")

    # 101.40/41: default how is left
    lx = [_dt(spark, "x int", [(1,), (2,)]),
          _dt(spark, "x int, v2 int", [(1, 1)])]
    _check(mergelist(lx, on="x"), ["x", "v2"], [(1, 1), (2, None)], "101.40")
    _check(mergelist(lx, on="x", how=None), ["x", "v2"],
           [(1, 1), (2, None)], "101.41")
    with pytest.raises(ValueError, match="'how' must be"):         # 101.42
        mergelist(xx, on="x", how="bad")
    with pytest.raises(ValueError, match="'how' must be"):         # 101.43
        mergelist(xx, on="x", how=["bad"])


def test_mergelist_102_on_from_keys(spark):
    """mergelist.Rraw 102.01-102.54: missing ``on`` derives from keys
    per how (left→key(rhs), right→key(lhs), inner/full→aligned key
    intersection)."""
    # 102.01-04: neither keyed
    l = [_dt(spark, "x int", [(1,), (2,)]), _dt(spark, "x int", [(2,), (3,)])]
    for how in HOWS:
        with pytest.raises(ValueError, match="necessary key"):
            mergelist(l, how=how, mult="all")
    # 102.11-14: left keyed
    l = [_dt(spark, "x int", [(1,), (2,)], key=["x"]),
         _dt(spark, "x int", [(2,), (3,)])]
    _check(mergelist(l, how="inner", mult="all"), ["x"], [(2,)], "102.11")
    with pytest.raises(ValueError, match="necessary key"):
        mergelist(l, how="left", mult="all")                       # 102.12
    _check(mergelist(l, how="right", mult="all"), ["x"],
           [(2,), (3,)], "102.13")
    _check(mergelist(l, how="full", mult="all"), ["x"],
           [(1,), (2,), (3,)], "102.14")
    # 102.21-24: right keyed
    l = [_dt(spark, "x int", [(1,), (2,)]),
         _dt(spark, "x int", [(2,), (3,)], key=["x"])]
    _check(mergelist(l, how="inner", mult="all"), ["x"], [(2,)], "102.21")
    _check(mergelist(l, how="left", mult="all"), ["x"], [(1,), (2,)], "102.22")
    with pytest.raises(ValueError, match="necessary key"):
        mergelist(l, how="right", mult="all")                      # 102.23
    _check(mergelist(l, how="full", mult="all"), ["x"],
           [(1,), (2,), (3,)], "102.24")
    # 102.41-44: both keyed, len(key(LHS)) > len(key(RHS)) — intersect
    # aligned to the shorter key
    l = [_dt(spark, "x int, y int, z int, zz int",
             [(1, 1, 1, 1), (2, 2, 2, 2)], key=["y", "x", "z", "zz"]),
         _dt(spark, "a int, b int, x int, y int",
             [(2, 2, 2, 2), (3, 3, 3, 3)], key=["x", "y", "a"])]
    _check(mergelist(l, how="inner", mult="all"),
           ["x", "y", "z", "zz", "a", "b"], [(2, 2, 2, 2, 2, 2)], "102.41")
    with pytest.raises(ValueError, match="not present in LHS"):
        mergelist(l, how="left", mult="all")                       # 102.42
    with pytest.raises(ValueError, match="not present in RHS"):
        mergelist(l, how="right", mult="all")                      # 102.43
    _check(mergelist(l, how="full", mult="all"),
           ["x", "y", "z", "zz", "a", "b"],
           [(1, 1, 1, 1, None, None), (2, 2, 2, 2, 2, 2),
            (3, 3, None, None, 3, 3)], "102.44")
    # 102.51-54: len(key(RHS)) > len(key(LHS))
    l = [_dt(spark, "a int, x int", [(1, 1), (2, 2)], key=["x", "a"]),
         _dt(spark, "x int, y int, z int",
             [(2, 2, 2), (3, 3, 3)], key=["y", "x", "z"])]
    _check(mergelist(l, how="inner", mult="all"), ["x", "a", "y", "z"],
           [(2, 2, 2, 2)], "102.51")
    with pytest.raises(ValueError, match="not present in LHS"):
        mergelist(l, how="left", mult="all")                       # 102.52
    with pytest.raises(ValueError, match="not present in RHS"):
        mergelist(l, how="right", mult="all")                      # 102.53
    _check(mergelist(l, how="full", mult="all"), ["x", "a", "y", "z"],
           [(1, 1, None, None), (2, 2, 2, 2), (3, None, 3, 3)], "102.54")


def _star_schema(spark, division_rows, region_rows):
    return [
        _dt(spark, "id int, state_id int, population double",
            [(i, ((i - 1) % 8) + 1, 1.0) for i in range(1, 17)], key=["id"]),
        _dt(spark, "state_id int, division_id int",
            [(s, ((s - 1) % 4) + 1) for s in range(1, 9)], key=["state_id"]),
        _dt(spark, "division_id int, region_id int", division_rows,
            key=["division_id"]),
        _dt(spark, "region_id int", region_rows, key=["region_id"]),
    ]


def test_mergelist_102_6x_star_schema_chain(spark):
    """mergelist.Rraw 102.611-102.636: default-on chains walk a star
    schema via retained keys; duplicated dimension keys raise under the
    default mult."""
    div = [(d, ((d - 1) % 2) + 1) for d in range(1, 5)]
    l = _star_schema(spark, div, [(1,), (2,)])
    expected = [
        (((i - 1) % 8 % 4 % 2) + 1, ((i - 1) % 8 % 4) + 1,
         ((i - 1) % 8) + 1, i, 1.0)
        for i in range(1, 17)
    ]
    ans1 = mergelist(l, how="left")
    assert ans1.columns == [
        "region_id", "division_id", "state_id", "id", "population"
    ]  # 102.612 (modulo row order)
    assert _got(ans1) == _sorted(expected)
    # 102.611: the reverse right-fold is value-identical MODULO column
    # order (reference asserts with ignore.col.order=TRUE — its own
    # right fold also emits [state_id, division_id, region_id, ...])
    ans2 = mergelist(list(reversed(l)), how="right")
    assert sorted(ans2.columns) == sorted(ans1.columns)
    realigned = ans2.df.select(*ans1.columns)
    assert _sorted([tuple(r) for r in realigned.collect()]) == _sorted(expected)
    # setmergelist alias, default args                             # 102.627
    assert _got(setmergelist(l, how="left")) == _got(ans1)

    # 102.631-636: duplicates in division_id
    div_dup = [(1, 1), (2, 2), (3, 1), (4, 2), (1, 1), (2, 2)]
    l = _star_schema(spark, div_dup, [(2,), (1,)])
    with pytest.raises(ValueError, match="multiple matches"):      # 102.631
        mergelist(l)
    assert mergelist(l, mult="all").df.count() == 24               # 102.632
    with pytest.raises(ValueError, match="not present in RHS"):    # 102.633
        mergelist(l, how="right")
    with pytest.raises(ValueError, match="multiple matches"):      # 102.634
        mergelist(list(reversed(l)), how="right")
    assert mergelist(
        list(reversed(l)), how="right", mult="all"
    ).df.count() == 24                                             # 102.635


def test_mergelist_102_7x_on_list(spark):
    """mergelist.Rraw 102.71-102.73: per-step ``on`` lists."""
    out = mergelist(
        [_dt(spark, "x int, y int", [(1, 2)]),
         _dt(spark, "a int, y int", [(1, 2)]),
         _dt(spark, "a int, z int", [(1, 2)])],
        on=[["y"], ["a"]], mult="all",
    )
    # expected data.table(a=1L, y=2L, x=1L, z=2L): step 2's on ("a")
    # leads, then the accumulated payload (y, x), then z
    _check(out, ["a", "y", "x", "z"], [(1, 2, 1, 2)], "102.71")
    out = mergelist(
        [_dt(spark, "x int, y int", [(1, 2)]),
         _dt(spark, "a int, y int, b int", [(1, 2, 3)]),
         _dt(spark, "a int, b int, z int", [(1, 3, 2)])],
        on=[["y"], ["a", "b"]], mult="all",
    )
    _check(out, ["a", "b", "y", "x", "z"], [(1, 3, 2, 1, 2)], "102.72")
    with pytest.raises(ValueError, match="not present in RHS"):    # 102.73
        mergelist(
            [_dt(spark, "x int, y int", [(1, 2)]),
             _dt(spark, "a int, y int, b int", [(1, 2, 3)]),
             _dt(spark, "a int, b int, z int", [(1, 3, 2)])],
            on=[["y"], ["a", "x"]], mult="all",
        )


def test_mergelist_103_cols(spark):
    """mergelist.Rraw 103.01-103.72: per-table ``cols`` payload
    selection (on= columns always survive; selecting only on= yields a
    key-only result)."""
    def l():
        return [
            _dt(spark, "id1 int, v1 int, v2 int", [(1, 1, 2), (2, 2, 1)],
                key=["id1"]),
            _dt(spark, "id1 int, v3 int, v4 int", [(2, 1, 2), (3, 2, 1)],
                key=["id1"]),
        ]

    base = {
        "inner": [(2, 2, 1, 1, 2)],
        "left": [(1, 1, 2, None, None), (2, 2, 1, 1, 2)],
        "right": [(2, 2, 1, 1, 2), (3, None, None, 2, 1)],
        "full": [(1, 1, 2, None, None), (2, 2, 1, 1, 2),
                 (3, None, None, 2, 1)],
    }
    for how in HOWS:  # 103.01-04 (on from keys) and 103.33-36 (cols NULLs)
        _check(mergelist(l(), how=how, mult="all"),
               ["id1", "v1", "v2", "v3", "v4"], base[how], f"103.0x {how}")
        _check(mergelist(l(), how=how, mult="all", cols=[None, None]),
               ["id1", "v1", "v2", "v3", "v4"], base[how], f"103.3x {how}")

    with pytest.raises(ValueError, match="must be a list"):        # 103.11
        mergelist(l(), how="inner", cols="v2")
    with pytest.raises(ValueError, match="same length"):           # 103.12
        mergelist(l(), how="inner", cols=[["v2"]])
    with pytest.raises(ValueError, match="cols"):                  # 103.13
        mergelist(l(), how="inner", cols=[["v2"], 2])
    with pytest.raises(ValueError, match="not present"):           # 103.14
        mergelist(l(), how="inner", cols=[["v2"], ["v5"]])

    def drop(rows, idx):
        return [tuple(v for i, v in enumerate(r) if i not in idx)
                for r in rows]

    for cols, gone in [
        ([["v1", "v2"], ["v3", "v4"]], set()),          # 103.21-24
        ([None, ["v3", "v4"]], set()),                  # 103.25-28
        ([["v2"], None], {1}),                          # 103.41-44
        ([None, ["v4"]], {3}),                          # 103.45-48
        ([["v2"], ["v4"]], {1, 3}),                     # 103.49-52
        ([["id1", "v2"], ["id1", "v4"]], {1, 3}),       # 103.61-64
        ([["id1"], ["id1", "v4"]], {1, 2, 3}),          # 103.65-68
        ([["id1"], ["id1"]], {1, 2, 3, 4}),             # 103.69-72
    ]:
        names = [c for i, c in enumerate(["id1", "v1", "v2", "v3", "v4"])
                 if i not in gone]
        for how in HOWS:
            _check(mergelist(l(), how=how, mult="all", cols=cols),
                   names, drop(base[how], gone), f"103 cols={cols} {how}")


def test_mergelist_104_join_many(spark):
    """mergelist.Rraw 104.01-104.34: the join.many many-to-many guard
    (#4383) and the default-mult multiple-match error."""
    def ones(n, col="x"):
        return _dt(spark, f"{col} int", [(1,)] * n)

    # 104.01-06: defaults (join_many=True, mult=None→error)
    assert mergelist([ones(1), ones(1)], on="x").df.count() == 1
    assert mergelist([ones(2), ones(1)], on="x").df.count() == 2   # 104.02
    assert mergelist(
        [ones(2), ones(1)], on="x", mult="error"
    ).df.count() == 2                                              # 104.03
    assert mergelist(
        [ones(1), ones(2)], on="x", mult="all"
    ).df.count() == 2                                              # 104.04
    with pytest.raises(ValueError, match="multiple matches"):      # 104.05
        mergelist([ones(1), ones(2)], on="x")

    # 104.07-15: join_many=False
    assert mergelist(
        [ones(1), ones(2)], on="x", mult="all", join_many=False
    ).df.count() == 2                                              # 104.07
    for fm, to in [(2, 2), (3, 2), (2, 3), (3, 3)]:                # 104.08-15
        with pytest.raises(ValueError, match="many-to-many"):
            mergelist([ones(fm), ones(to)], on="x", mult="all",
                      join_many=False)

    # 104.16-26: join_many=True row explosions
    for fm, to, n in [(2, 2, 4), (3, 1, 3), (1, 3, 3), (3, 2, 6),
                      (2, 3, 6), (3, 3, 9)]:
        assert mergelist(
            [ones(fm), ones(to)], on="x", mult="all"
        ).df.count() == n, (fm, to)
    with pytest.raises(ValueError, match="multiple matches"):      # 104.19
        mergelist([ones(1), ones(3)], on="x")

    # 104.31-34: per-step join_many lists
    l3 = [
        _dt(spark, "id1 int, v1 int", [(1, 1), (1, 2)]),
        _dt(spark, "id1 int, v2 int", [(1, 1), (1, 2)]),
        _dt(spark, "id1 int, v3 int", [(1, 1)]),
    ]
    exp = [(1, 1, 1, 1), (1, 1, 2, 1), (1, 2, 1, 1), (1, 2, 2, 1)]
    _check(mergelist(l3, on="id1", mult="all", join_many=[True, False]),
           ["id1", "v1", "v2", "v3"], exp, "104.31")
    _check(mergelist(l3, on="id1", mult="all", join_many=[True, True]),
           ["id1", "v1", "v2", "v3"], exp, "104.32")
    with pytest.raises(ValueError, match="many-to-many"):          # 104.33
        mergelist(l3, on="id1", mult="all", join_many=[False, True])
    with pytest.raises(ValueError, match="join.many"):             # 104.34
        mergelist(l3, on="id1", mult="all", join_many=[True, None])


def test_mergelist_105_how_list(spark):
    """mergelist.Rraw 105.01-105.12: per-step ``how`` lists."""
    def l3():
        return [
            _dt(spark, "a int, b int", [(1, 1), (2, 2), (3, 3)]),
            _dt(spark, "a int, d int", [(2, 1)]),
            _dt(spark, "a int, f int", [(1, 1), (2, 2), (4, 3)]),
        ]

    _check(mergelist(l3(), on="a", how=["left", "full"]),
           ["a", "b", "d", "f"],
           [(1, 1, None, 1), (2, 2, 1, 2), (3, 3, None, None),
            (4, None, None, 3)], "105.01")
    _check(mergelist(l3(), on="a", how=["left", "inner"]),
           ["a", "b", "d", "f"],
           [(1, 1, None, 1), (2, 2, 1, 2)], "105.02")

    # 105.12: Persons/Pets/PetAccessories right-outer use case
    pets = _dt(spark, "PetName string, PersonName string",
               [("Rover", "Alice"), ("Lassie", "Alice"), ("Fifi", "Charles")])
    acc = _dt(spark, "AccessoryName string, PetName string",
              [("Ball", "Rover"), ("Bone", "Rover"), ("Mouse", "Fifi")])
    persons = _dt(spark, "PersonName string", [("Alice",), ("Bob",),
                                               ("Charles",)])
    out = mergelist([pets, acc, persons], how=["inner", "right"],
                    on=[["PetName"], ["PersonName"]], mult="all")
    _check(out, ["PersonName", "PetName", "AccessoryName"],
           [("Alice", "Rover", "Ball"), ("Alice", "Rover", "Bone"),
            ("Bob", None, None), ("Charles", "Fifi", "Mouse")], "105.12")


def test_mergelist_106_mult_list_and_cross(spark):
    """mergelist.Rraw 106.01-106.82: per-step ``mult`` lists; cross
    defaults; cross-then-anti composition."""
    def l3():
        return [
            _dt(spark, "a int, b int", [(1, 1), (2, 2)]),
            _dt(spark, "a int, d int", [(1, 1), (1, 2)]),
            _dt(spark, "a int, f int", [(1, 1), (1, 2)]),
        ]

    _check(mergelist(l3(), on="a", how="left", mult=["last", "first"]),
           ["a", "b", "d", "f"],
           [(1, 1, 2, 1), (2, 2, None, None)], "106.01")
    with pytest.raises(ValueError, match="multiple matches"):      # 106.02
        mergelist(l3(), on="a", how="left", mult=["last", "error"])

    ab = [_dt(spark, "a int", [(1,), (2,)]), _dt(spark, "b int", [(1,), (2,)])]
    _check(mergelist(ab, how="cross"), ["a", "b"],
           [(1, 1), (1, 2), (2, 1), (2, 2)], "106.81")
    # 106.82: cross then anti ("cool, isn't it?")
    l = ab + [_dt(spark, "a int, b int", [(1, 1), (2, 2)])]
    _check(mergelist(l, how=["cross", "anti"], on=[[], ["a", "b"]]),
           ["a", "b"], [(1, 2), (2, 1)], "106.82")
    # 107.81: cross then semi (mult default per step)
    _check(mergelist(l, how=["cross", "semi"], on=[[], ["a", "b"]]),
           ["a", "b"], [(1, 1), (2, 2)], "107.81")


def test_mergelist_107_semi_join(spark):
    """mergelist.Rraw 107.01-107.12: semi join keeps (possibly
    duplicated) LHS rows with a match, LHS column order untouched."""
    out = mergelist(
        [_dt(spark, "x int, y string",
             [(1, "a"), (1, "a"), (1, "a"), (2, "b")]),
         _dt(spark, "x int, z int", [(1, 10), (1, 11)])],
        how="semi", on="x", mult="first",
    )
    _check(out, ["x", "y"], [(1, "a"), (1, "a"), (1, "a")], "107.01")
    out = mergelist(
        [_dt(spark, "x int, y string",
             [(1, "a"), (3, "c"), (1, "a"), (2, "b"), (2, "b")]),
         _dt(spark, "x int, z int", [(3, 10), (2, 11)])],
        how="semi", on="x", mult="first",
    )
    _check(out, ["x", "y"], [(3, "c"), (2, "b"), (2, "b")], "107.02")
    # 107.03: column order of LHS, not RHS; on= not moved to front
    out = mergelist(
        [_dt(spark, "id1 int, id2 int, v1 int",
             [(1, 4, 1), (2, 3, 1), (3, 2, 1), (4, 1, 1)]),
         _dt(spark, "id2 int, v2 int", [(3, 2), (4, 2), (5, 2)])],
        on="id2", how="semi",
    )
    _check(out, ["id1", "id2", "v1"], [(1, 4, 1), (2, 3, 1)], "107.03")
    # 107.11-12: multi-column on with duplicated RHS
    out = mergelist(
        [_dt(spark, "id int, g string, v int",
             [(3, "A", 10), (1, "A", 20), (2, "B", 30), (1, "B", 40),
              (1, "A", 50)]),
         _dt(spark, "id int, g string",
             [(1, "A"), (1, "A"), (2, "A"), (3, "A")])],
        how="semi", on=["id", "g"], mult="first",
    )
    _check(out, ["id", "g", "v"],
           [(3, "A", 10), (1, "A", 20), (1, "A", 50)], "107.12")


def test_mergelist_108_anti_join(spark):
    """mergelist.Rraw 108.01-108.03: anti join keeps LHS rows without a
    match, LHS row multiplicity and column order untouched."""
    out = mergelist(
        [_dt(spark, "x int, y string",
             [(1, "a"), (1, "a"), (2, "b"), (2, "b")]),
         _dt(spark, "x int, z int", [(1, 10), (1, 11)])],
        how="anti", on="x", mult="first",
    )
    _check(out, ["x", "y"], [(2, "b"), (2, "b")], "108.01")
    out = mergelist(
        [_dt(spark, "x int, y string",
             [(1, "a"), (3, "c"), (1, "a"), (2, "b"), (2, "b")]),
         _dt(spark, "x int, z int", [(4, 10), (1, 11)])],
        how="anti", on="x", mult="first",
    )
    _check(out, ["x", "y"], [(3, "c"), (2, "b"), (2, "b")], "108.02")
    out = mergelist(
        [_dt(spark, "id1 int, id2 int, v1 int",
             [(1, 4, 1), (2, 3, 1), (3, 2, 1), (4, 1, 1)]),
         _dt(spark, "id2 int, v2 int", [(3, 2), (4, 2), (5, 2)])],
        on="id2", how="anti",
    )
    _check(out, ["id1", "id2", "v1"], [(3, 2, 1), (4, 1, 1)], "108.03")


def test_mergelist_109_cross_join(spark):
    """mergelist.Rraw 109.01-109.05: cross join content and zero-row
    short circuits."""
    lhs_rows = [(1, 1), (2, 2), (1, 3), (2, 4)]
    rhs_rows = [(1, 1), (2, 2), (3, 3), (1, 4), (2, 5), (3, 6)]
    out = mergelist(
        [_dt(spark, "v1 int, v2 int", lhs_rows),
         _dt(spark, "v3 int, v4 int", rhs_rows)],
        how="cross", mult="all",
    )
    assert out.columns == ["v1", "v2", "v3", "v4"]
    want = [a + b for a in lhs_rows for b in rhs_rows]
    assert _got(out) == _sorted(want)                              # 109.01
    for l_rows, r_rows in [(lhs_rows, []), ([], rhs_rows), ([], [])]:
        out = mergelist(
            [_dt(spark, "v1 int, v2 int", l_rows),
             _dt(spark, "v3 int, v4 int", r_rows)],
            how="cross", mult="all",
        )
        _check(out, ["v1", "v2", "v3", "v4"], [], "109.03-05")


# ------------------------------------------------------------- fdistinct


def test_fdistinct_2x_validation_and_semantics(spark):
    """mergelist.Rraw 2.01-2.11: fdistinct contracts."""
    with pytest.raises(ValueError, match="must be data.table"):    # 2.01
        fdistinct({"x": [1, 1, 2]}, on="x", mult="last")
    d = _dt(spark, "x int", [(1,), (1,), (2,)])
    with pytest.raises(ValueError, match="column names"):          # 2.02
        fdistinct(d, on="z", mult="last")
    with pytest.raises(ValueError, match="cols"):                  # 2.03
        fdistinct(d, on="x", mult="last", cols=[])

    d = _dt(spark, "x int, y int", [(1, 1), (2, 2)])
    _check(fdistinct(d, on="x", mult="last"), ["x", "y"],
           [(1, 1), (2, 2)], "2.05")                               # unique
    d = _dt(spark, "x int, y int", [(2, 1), (1, 2), (2, 3)])
    _check(fdistinct(d, on="x", mult="first"), ["x", "y"],
           [(2, 1), (1, 2)], "2.09")
    _check(fdistinct(d, on="x", mult="last"), ["x", "y"],
           [(1, 2), (2, 3)], "2.10")


def test_fdistinct_301_large_vector(spark):
    """mergelist.Rraw 301.01-301.02: fdistinct == unique(by=on) on the
    reference's 250-value integer vector."""
    xs = [74, 103, 158, 250, 56, 248, 260, 182, 174, 17, 57, 49, 189, 106,
          212, 137, 198, 273, 105, 214, 258, 59, 180, 35, 74, 107, 4, 106,
          240, 94, 133, 165, 136, 52, 228, 184, 219, 30, 200, 114, 226, 178,
          216, 153, 146, 218, 7, 132, 202, 191, 132, 237, 121, 68, 20, 28,
          87, 143, 183, 112, 252, 81, 127, 92, 179, 71, 132, 211, 24, 241,
          94, 231, 96, 92, 131, 246, 238, 108, 214, 265, 120, 196, 110, 90,
          209, 56, 196, 34, 68, 40, 66, 17, 177, 241, 215, 220, 126, 113,
          223, 167, 181, 98, 75, 273, 175, 59, 36, 132, 255, 165, 269, 202,
          99, 119, 41, 4, 197, 29, 123, 177, 273, 137, 134, 48, 208, 125,
          141, 58, 63, 164, 159, 22, 10, 177, 256, 165, 155, 145, 271, 140,
          188, 166, 66, 71, 201, 125, 49, 206, 29, 238, 170, 154, 91, 125,
          138, 50, 146, 21, 77, 59, 79, 247, 123, 215, 243, 114, 18, 93,
          200, 93, 174, 232, 236, 108, 105, 247, 178, 204, 167, 249, 81, 53,
          244, 139, 242, 53, 209, 200, 260, 151, 196, 107, 28, 256, 78, 163,
          31, 232, 88, 216, 74, 61, 143, 74, 50, 143, 155, 36, 71, 198, 265,
          28, 210, 261, 226, 85, 179, 263, 263, 94, 73, 46, 89, 141, 255,
          141, 71, 13, 115, 235, 96, 37, 103, 174, 108, 190, 190, 153, 119,
          125, 85, 160, 251, 40, 115, 59, 118, 37, 127, 260, 210, 257, 130,
          166, 134, 30, 69, 138, 103, 258, 145, 88, 77, 217, 194, 46, 18,
          208, 171, 47, 18, 30, 105, 47, 83]
    d = _dt(spark, "x int", [(x,) for x in xs])
    got = sorted(r.x for r in fdistinct(d, on="x").df.collect())
    assert got == sorted(set(xs))


# ------------------------------------------------------------- cbindlist


def test_cbindlist_11_positional(spark):
    """mergelist.Rraw 11.01/11.05: positional column bind; zero-column
    tables are skipped."""
    out = cbindlist([
        _dt(spark, "x int, v1 int", [(1, 1), (2, 1), (3, 1)]),
        _dt(spark, "y int, v2 int", [(3, 2), (2, 2), (1, 2)]),
        _dt(spark, "z int, v3 int", [(2, 3), (3, 3), (4, 3)]),
    ])
    _check(out, ["x", "v1", "y", "v2", "z", "v3"],
           [(1, 1, 3, 2, 2, 3), (2, 1, 2, 2, 3, 3), (3, 1, 1, 2, 4, 3)],
           "11.01")
    from pyspark.sql.types import StructType

    empty = DT(spark.createDataFrame([], StructType([])))
    out = cbindlist([
        _dt(spark, "a int", [(1,)]), empty,
        _dt(spark, "d int", [(2,)]), _dt(spark, "f int", [(3,)]),
    ])
    _check(out, ["a", "d", "f"], [(1, 2, 3)], "11.05")
    # setcbindlist alias (302.1 is about invisible return — N/A)
    assert _got(setcbindlist([_dt(spark, "a int", [(1,)]),
                              _dt(spark, "b int", [(2,)])])) == [(1, 2)]


def test_cbindlist_12_contracts(spark):
    """mergelist.Rraw 12.01-12.16: validation, zero-row binds, duplicate
    names, recycling unimplemented."""
    d = _dt(spark, "a int", [(1,)])
    with pytest.raises(ValueError, match="must be a list"):        # 12.01
        cbindlist(d.df)
    with pytest.raises(ValueError, match="must be a list"):        # 12.02
        cbindlist(True)
    with pytest.raises(ValueError, match="not a data.table"):      # 12.03
        cbindlist([d, 1])
    out = cbindlist([_dt(spark, "a int", [(1,), (2,)]),
                     _dt(spark, "b int", [(1,), (2,)])])           # 12.04
    _check(out, ["a", "b"], [(1, 1), (2, 2)], "12.04")
    # 12.07: zero-row tables bind to zero rows
    out = cbindlist([_dt(spark, "a int", []), _dt(spark, "b int", [])])
    _check(out, ["a", "b"], [], "12.07")
    # 12.08: duplicated names are allowed (and wipe key/index)
    out = cbindlist([_dt(spark, "a int, b int", [(1, 2)]),
                     _dt(spark, "b int, d int", [(3, 4)])])
    assert out.columns == ["a", "b", "b", "d"]
    assert _got(out) == [(1, 2, 3, 4)]
    assert out.key == [] and out.index_names == []                 # 12.09-10
    # 12.13-16: recycling not implemented
    with pytest.raises(ValueError, match="[Rr]ecycling|same number"):
        cbindlist([_dt(spark, "a int", []), _dt(spark, "b int", [(1,), (2,)])])
    with pytest.raises(ValueError, match="[Rr]ecycling|same number"):
        cbindlist([_dt(spark, "a int", [(1,)]),
                   _dt(spark, "b int", [(1,), (2,)])])


def test_cbindlist_13_key_retention(spark):
    """mergelist.Rraw 13.4: the first surviving key is retained when
    output names stay unique."""
    out = cbindlist([
        _dt(spark, "a int", [(1,), (2,)]),
        _dt(spark, "b int", [(3,), (4,)], key=["b"]),
    ])
    assert out.key == ["b"]
    _check(out, ["a", "b"], [(1, 3), (2, 4)], "13.4")


def test_mergepair_keyless_baseline_drops_key(spark):
    """Round-12 ADVICE fix: a KEYLESS baseline yields a keyless result
    (the reference drops the key after join subsetting), so a chained
    default-on merge raises "'on' is missing" instead of silently
    reusing the previous join columns; a KEYED baseline still carries
    its key through left/right/inner (mergelist.Rraw 102.611-635)."""
    keyless = _dt(spark, "id1 int, v1 int", [(1, 10), (2, 20)])
    keyed_r = _dt(spark, "id1 int, v2 int", [(1, 100), (2, 200)],
                  key=["id1"])
    out = mergepair(keyless, keyed_r, on=["id1"], how="left", mult="all")
    assert not out.key
    # how="right" derives on from the LHS key — a keyless prior result
    # must raise, not silently reuse the previous join columns
    nxt = _dt(spark, "id1 int, v3 int", [(1, 7)], key=["id1"])
    with pytest.raises(ValueError, match="necessary key is not present"):
        mergepair(out, nxt, how="right", mult="all")
    # keyed baseline: key walks through
    keyed_l = _dt(spark, "id1 int, v1 int", [(1, 10), (2, 20)],
                  key=["id1"])
    out2 = mergepair(keyed_l, keyed_r, on=["id1"], how="left", mult="all")
    assert list(out2.key) == ["id1"]


def test_cbindlist_13_key_index_retention(spark):
    """mergelist.Rraw 13.1-13.4 (round-14 pin): the positional bind
    keeps the FIRST surviving key and concatenates index names; 13.3's
    originals-untouched check is immutability here. (13.5 — combining
    keys from several tables — is the reference's own TODO #7116.)"""
    a = DT(spark.createDataFrame(
        [(i, 6 - i, i, i) for i in range(1, 6)],
        "id1 int, id2 int, id3 int, v1 int",
    )).setkey("id1")
    a = a.setindex("id1").setindex("id2").setindex("id3") \
         .setindex("id1", "id2", "id3")
    b = DT(spark.createDataFrame(
        [(6 - i, i, i) for i in range(1, 6)],
        "id4 int, id5 int, v2 int",
    ), order_by=["id5"])
    c = DT(spark.createDataFrame(
        [(6 - i, i, i) for i in range(1, 6)],
        "id6 int, id7 int, v3 int",
    ), order_by=["id7"]).setindex("id6").setindex("id7")
    d = DT(spark.createDataFrame(
        [(6 - i, 6 - i, i) for i in range(1, 6)],
        "id8 int, id9 int, v4 int",
    ), order_by=["v4"]).setindex("id9")
    out = cbindlist([a, b, c, d])
    assert out.key == ["id1"]  # 13.1
    assert out.indices() == [  # 13.2
        "__id1", "__id2", "__id3", "__id1__id2__id3", "__id6", "__id7",
        "__id9",
    ]
    # 13.4: first table unkeyed -> the first KEYED table's key survives
    p = DT(spark.createDataFrame([(1,), (2,)], "a int"),
           order_by=["a"])
    q = DT(spark.createDataFrame([(3,), (4,)], "b int")).setkey("b")
    out2 = cbindlist([p, q])
    assert out2.key == ["b"]
    assert {tuple(r) for r in out2.collect()} == {(1, 3), (2, 4)}
