"""Semantic parity cases ported from the reference's DEDICATED test
suites (inst/tests/nafill.Rraw, froll.Rraw) — exact input vectors and
expected outputs, cited per case. The headline rule under test: R's
`is.na(NaN)` is TRUE, so NaN participates as NA in fills and rolling
windows (nan_is_na=True default), while Inf/-Inf are ordinary values
that carry.
"""

from __future__ import annotations

import math

import pytest

from data_table_spark.core import DT
from data_table_spark.operators.window import froll, nafill


def _mk(spark, vals, typ="double"):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, f"i int, x {typ}")
    return DT(df, order_by=["i"])


def _col(dt, name="x"):
    return [r[name] for r in dt.df.orderBy("i").collect()]


X_INT = [None, None, 3, 4, None, None, 7, 8, None, None]
# z of nafill.Rraw 1.21/.22: NA, Inf, 1.5, 2, NaN, NA, 3.5, 4, -Inf, NA
Z = [None, math.inf, 1.5, 2.0, math.nan, None, 3.5, 4.0, -math.inf, None]


def test_nafill_locf_nocb_int(spark):
    """nafill.Rraw 1.01/1.02/1.03: integer locf/nocb/const."""
    dt = _mk(spark, X_INT, "bigint")
    assert _col(nafill(dt, "x", type="locf")) == [
        None, None, 3, 4, 4, 4, 7, 8, 8, 8]
    assert _col(nafill(dt, "x", type="nocb")) == [
        3, 3, 3, 4, 7, 7, 7, 8, None, None]
    assert _col(nafill(dt, "x", type="const", fill=0)) == [
        0, 0, 3, 4, 0, 0, 7, 8, 0, 0]


def test_nafill_nan_inf_semantics(spark):
    """nafill.Rraw 1.21/1.22: NaN is filled OVER (is.na(NaN) TRUE);
    Inf/-Inf are carried like any value."""
    dt = _mk(spark, Z)
    assert _col(nafill(dt, "x", type="locf")) == [
        None, math.inf, 1.5, 2.0, 2.0, 2.0, 3.5, 4.0, -math.inf, -math.inf]
    assert _col(nafill(dt, "x", type="nocb")) == [
        math.inf, math.inf, 1.5, 2.0, 3.5, 3.5, 3.5, 4.0, -math.inf, None]
    # 1.19-shape: const fill replaces NaN too
    filled = _col(nafill(dt, "x", type="const", fill=9.0))
    assert filled == [
        9.0, math.inf, 1.5, 2.0, 9.0, 9.0, 3.5, 4.0, -math.inf, 9.0]


def test_nafill_chunked_nan_equivalence(spark):
    """The n_chunks carry stitch gives identical output on the
    NaN/Inf vector (same _nan_na rule on both paths)."""
    dt = _mk(spark, Z)
    for typ in ("locf", "nocb"):
        plain = _col(nafill(dt, "x", type=typ))
        chunked = _col(nafill(dt, "x", type=typ, n_chunks=3))
        assert plain == chunked, typ


def test_froll_nan_is_na(spark):
    """froll.Rraw hasNA semantics: NaN poisons its windows under the
    na.rm=FALSE default (result NA, not NaN); na.rm=TRUE skips it."""
    dt = _mk(spark, [1.0, math.nan, 3.0, 4.0])
    got = _col(froll(dt, "sum", "x", 2, give_names=False))
    assert got[0] is None          # partial window
    assert got[1] is None and got[2] is None  # NaN poisons both
    assert got[3] == 7.0
    got_rm = _col(froll(dt, "sum", "x", 2, na_rm=True, give_names=False))
    assert got_rm[1:] == [1.0, 3.0, 7.0]
    # mean: the NaN window must be NULL, not NaN arithmetic
    got_m = _col(froll(dt, "mean", "x", 2, give_names=False))
    assert got_m[1] is None and not (
        got_m[1] is not None and math.isnan(got_m[1])
    )


def test_froll_nan_opt_out(spark):
    """nan_is_na=False restores Spark-native NaN propagation for users
    who store signaling NaNs."""
    dt = _mk(spark, [1.0, math.nan, 3.0])
    got = _col(
        froll(dt, "sum", "x", 2, na_rm=True, nan_is_na=False,
              give_names=False)
    )
    assert math.isnan(got[1]) and math.isnan(got[2])


def test_froll_narm_empty_window_identity(spark):
    """froll.Rraw 6000.066: na.rm=TRUE over a FULL window of only NAs
    yields R's empty-aggregate identity — mean -> NaN, sum -> 0 — while
    incomplete leading windows stay NA. Exact V2 vector from the
    reference: (0.75, 1, 1.25, NA, NA, NA)."""
    v2 = [0.75, 1.0, 1.25, None, None, None]
    dt = _mk(spark, v2)
    m2 = _col(froll(dt, "mean", "x", 2, na_rm=True, give_names=False))
    assert m2[0] is None
    assert m2[1:4] == [0.875, 1.125, 1.25]
    assert math.isnan(m2[4]) and math.isnan(m2[5])
    m3 = _col(froll(dt, "mean", "x", 3, na_rm=True, give_names=False))
    assert m3[:2] == [None, None]
    assert m3[2:5] == [1.0, 1.125, 1.25]
    assert math.isnan(m3[5])
    s2 = _col(froll(dt, "sum", "x", 2, na_rm=True, give_names=False))
    assert s2[4] == 0.0 and s2[5] == 0.0


def _ama(xs, ns, na_rm=False):
    """Reference froll.Rraw's `ama` twin: adaptive rolling mean in
    plain Python (NaN treated as NA, like R is.na)."""
    out = []
    for i in range(len(xs)):
        n = ns[i]
        if i + 1 < n:
            out.append(None)
            continue
        w = xs[i - n + 1: i + 1]
        vals = [v for v in w if v is not None and not (
            isinstance(v, float) and math.isnan(v))]
        if na_rm:
            out.append(sum(vals) / len(vals) if vals else math.nan)
        else:
            out.append(sum(vals) / n if len(vals) == n else None)
    return out


def test_frolladaptive_na_rm(spark):
    """froll.Rraw 6000.141-.144 (adaptive na.rm): exact x/n vectors;
    default poisons NA windows, na.rm=TRUE skips (empty -> NaN)."""
    from data_table_spark.operators.window import frolladaptive

    xs = [1.0, 2.0, 3.0, 4.0, None, 2.0, 3.0, 4.0, 5.0, None, 4.0, 5.0, 6.0, None, 5.0]
    ns = [2, 2, 2, 5, 3, 4, 5, 1, 2, 1, 2, 4, 3, 6, 3]
    rows = [(i, xs[i], ns[i]) for i in range(len(xs))]
    df = spark.createDataFrame(rows, "i int, x double, nn int")
    dt = DT(df, order_by=["i"])

    for na_rm in (False, True):
        got = [
            r["m"]
            for r in frolladaptive(
                dt, "x", "nn", fun="mean", out_col="m", na_rm=na_rm
            ).df.orderBy("i").collect()
        ]
        exp = _ama(xs, ns, na_rm=na_rm)
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            if e is None:
                assert g is None, (na_rm, got, exp)
            elif isinstance(e, float) and math.isnan(e):
                assert g is not None and math.isnan(g), (na_rm, got, exp)
            else:
                assert g == pytest.approx(e), (na_rm, got, exp)


def test_frolladaptive_extrema_median_poison(spark):
    """Adaptive max/min/median: the na.rm=FALSE default poisons any
    window containing NA (indicator-max over the same sparse table /
    in-aggregate count); na.rm=TRUE skips."""
    from data_table_spark.operators.window import frolladaptive

    xs = [5.0, 1.0, None, 7.0, 2.0, 8.0]
    ns = [1, 2, 2, 3, 2, 3]
    rows = [(i, xs[i], ns[i]) for i in range(len(xs))]
    df = spark.createDataFrame(rows, "i int, x double, nn int")
    dt = DT(df, order_by=["i"])

    mx = [r["m"] for r in frolladaptive(
        dt, "x", "nn", fun="max", out_col="m"
    ).df.orderBy("i").collect()]
    assert mx == [5.0, 5.0, None, None, 7.0, 8.0]
    mx_rm = [r["m"] for r in frolladaptive(
        dt, "x", "nn", fun="max", out_col="m", na_rm=True
    ).df.orderBy("i").collect()]
    assert mx_rm == [5.0, 5.0, 1.0, 7.0, 7.0, 8.0]

    md = [r["m"] for r in frolladaptive(
        dt, "x", "nn", fun="median", out_col="m"
    ).df.orderBy("i").collect()]
    assert md == [5.0, 3.0, None, None, 4.5, 7.0]
    md_rm = [r["m"] for r in frolladaptive(
        dt, "x", "nn", fun="median", out_col="m", na_rm=True
    ).df.orderBy("i").collect()]
    assert md_rm == [5.0, 3.0, 1.0, 4.0, 4.5, 7.0]


def test_frank_na_last(spark):
    """frank na.last (reference R/frank.R:1 — default na.last=TRUE;
    frankv sorts NAs last via forderv then applies ties.method to the
    NA group, R/frank.R:52): TRUE ranks NAs last as one TIE GROUP,
    FALSE first, 'keep' ranks NAs as NA, None (reference na.last=NA,
    R/frank.R:70) drops NA rows. Vector (4, 1, 4, NA, 1),
    ties='average'."""
    from data_table_spark.operators.window import frank

    dt = _mk(spark, [4.0, 1.0, 4.0, None, 1.0])

    def ranks(**kw):
        return [
            r["rank"]
            for r in frank(dt, "x", ties="average", **kw).df
            .orderBy("i").collect()
        ]

    assert ranks() == [3.5, 1.5, 3.5, 5.0, 1.5]               # default TRUE
    assert ranks(na_last="keep") == [3.5, 1.5, 3.5, None, 1.5]
    assert ranks(na_last=False) == [4.5, 2.5, 4.5, 1.0, 2.5]

    # na.last=NA removes NA rows entirely (4 rows out, real ranks)
    dropped = frank(dt, "x", ties="average", na_last=None).df
    assert dropped.count() == 4
    got = {r["i"]: r["rank"] for r in dropped.collect()}
    assert got == {0: 3.5, 1: 1.5, 2: 3.5, 4: 1.5}

    # NA tie GROUP under TRUE (two NAs -> both (4+5)/2, data.table
    # semantics — base R would give sequential 4,5)
    dt2 = _mk(spark, [4.0, 1.0, None, None, 1.0])
    assert [
        r["rank"]
        for r in frank(dt2, "x", ties="average").df.orderBy("i").collect()
    ] == [3.0, 1.5, 4.5, 4.5, 1.5]

    dense = [
        r["rank"]
        for r in frank(dt, "x", ties="dense", na_last="keep").df
        .orderBy("i").collect()
    ]
    assert dense == [2, 1, 2, None, 1]
    assert [
        r["rank"]
        for r in frank(dt, "x", ties="dense").df.orderBy("i").collect()
    ] == [2, 1, 2, 3, 1]
    first = [
        r["rank"]
        for r in frank(dt, "x", ties="first", na_last="keep").df
        .orderBy("i").collect()
    ]
    # ties='first' needs a declared row order to fix WHICH tie gets the
    # lower rank (documented; ties='random' + tiebreak is the stable
    # spelling) — assert the tie-set shape, order-agnostically
    assert first[3] is None
    assert sorted([first[0], first[2]]) == [3, 4]
    assert sorted([first[1], first[4]]) == [1, 2]

    # ties='last' with tiebreak= reverses the within-tie numbering of
    # ties='first' (reference ties.method="last", R/frank.R:1)
    f = {
        r["i"]: r["rank"]
        for r in frank(dt, "x", ties="first", tiebreak=["i"]).df.collect()
    }
    l = {
        r["i"]: r["rank"]
        for r in frank(dt, "x", ties="last", tiebreak=["i"]).df.collect()
    }
    assert f == {1: 1, 4: 2, 0: 3, 2: 4, 3: 5}
    assert l == {1: 2, 4: 1, 0: 4, 2: 3, 3: 5}


def test_frank_nan_is_na(spark):
    """frank NaN rule (reference is.na(NaN) is TRUE): NaN is missing
    but forms its own tie group ADJACENT to the NA group, NA outermost
    (tests.Rraw 1988); under "keep" both rank NA; the original column
    keeps its NaN."""
    from data_table_spark.operators.window import frank

    dt = _mk(spark, [4.0, float("nan"), 1.0, None, 1.0])

    def ranks(**kw):
        return [
            r["rank"]
            for r in frank(dt, "x", ties="average", **kw).df
            .orderBy("i").collect()
        ]

    assert ranks() == [3.0, 4.0, 1.5, 5.0, 1.5]          # values, NaN, NA
    assert ranks(na_last="keep") == [3.0, None, 1.5, None, 1.5]
    assert ranks(na_last=False) == [5.0, 2.0, 3.5, 1.0, 3.5]  # NA, NaN, vals
    # opt-out: Spark orders NaN after +Inf, NULL placement per na_last
    assert ranks(nan_is_na=False) == [3.0, 4.0, 1.5, 5.0, 1.5]
    # original column untouched (NaN still NaN, not NULL)
    import math
    row = {
        r["i"]: r["x"] for r in frank(dt, "x").df.collect()
    }
    assert math.isnan(row[1]) and row[3] is None


def test_frank_chunk_stitch_equivalence(spark):
    """frank(n_chunks=) is bit-identical to the unsplit rank for every
    tie method, na_last keep/False, asc/desc, with duplicates and
    NULLs (value chunking keeps tie groups whole; spine offsets do the
    rest)."""
    from data_table_spark.operators.window import frank

    nan = float("nan")
    vals = [4.0, 1.0, 4.0, None, 1.0, 7.0, 4.0, None, 2.0, 7.0,
            2.0, 9.0, 1.0, 5.0, 5.0, nan, 3.0, nan]
    rows = [(i, i % 2, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, g int, x double")
    dt = DT(df, order_by=["i"])

    for ties in ("average", "min", "max", "dense", "first", "last",
                 "random"):
        for na_last in ("keep", False, True):
            for desc in (False, True):
                kw = dict(ties=ties, by="g", desc=desc, na_last=na_last)
                if ties in ("first", "last"):
                    # row_number tie order is nondeterministic without
                    # a tiebreak; pin it
                    kw["tiebreak"] = ["i"]
                if ties == "random":
                    kw["tiebreak"] = ["i"]
                plain = frank(dt, "x", **kw).df
                chunked = frank(dt, "x", n_chunks=4, **kw).df
                a = {r["i"]: r["rank"] for r in plain.collect()}
                b = {r["i"]: r["rank"] for r in chunked.collect()}
                assert a == b, (ties, na_last, desc, a, b)
                assert dict(plain.dtypes)["rank"] == dict(
                    chunked.dtypes
                )["rank"], (ties, na_last, desc)


def test_rleid_chunk_stitch_equivalence(spark):
    """rleid(n_chunks=) is identical to the unsplit run numbering,
    including runs straddling several chunk boundaries and NA runs
    (NA == NA continues a run)."""
    from data_table_spark.operators.window import rleid

    # long constant stretches guarantee boundary-straddling runs at
    # every chunking; NULL stretch included
    vals = ([1.0] * 7 + [2.0] * 5 + [None] * 6 + [2.0] * 4 + [3.0] * 9
            + [None] * 2)
    rows = [(i, i % 2, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, g int, x double")
    dt = DT(df, order_by=["i"])

    plain = {
        (r["g"], r["i"]): r["rleid"]
        for r in rleid(dt, "x", by="g", order=["i"]).df.collect()
    }
    for k in (2, 3, 7):
        chunked = {
            (r["g"], r["i"]): r["rleid"]
            for r in rleid(
                dt, "x", by="g", order=["i"], n_chunks=k
            ).df.collect()
        }
        assert chunked == plain, k

    # multi-column runs + descending order
    dt2 = DT(
        spark.createDataFrame(
            [(i, vals[i], float(i // 5)) for i in range(len(vals))],
            "i int, x double, y double",
        ),
        order_by=["i"],
    )
    p2 = {
        r["i"]: r["rleid"]
        for r in rleid(dt2, ["x", "y"], order=["-i"]).df.collect()
    }
    c2 = {
        r["i"]: r["rleid"]
        for r in rleid(dt2, ["x", "y"], order=["-i"], n_chunks=4).df.collect()
    }
    assert c2 == p2


# ---------------------------------------------------------------------------
# froll all-NA-window identities + frollBatch-style randomized differential


def test_froll_extrema_allna_identities(spark):
    """froll.Rraw 6000.4242/.4244 (frollmax) and 6000.7242/.7244
    (frollmin): a FULL window of only NAs under na.rm=TRUE yields the
    base-R empty-aggregate identity (-Inf / +Inf), not NULL; na.rm=FALSE
    keeps NA. 6000.7272: NaN mixes count as NA (nan_is_na) and the
    identity still applies."""
    import math

    allna = [None] * 8
    dt = _mk(spark, allna)
    assert _col(froll(dt, "max", "x", 3, give_names=False)) == [None] * 8
    assert _col(froll(dt, "max", "x", 3, na_rm=True, give_names=False)) == (
        [None, None] + [-math.inf] * 6
    )
    assert _col(froll(dt, "min", "x", 3, na_rm=True, give_names=False)) == (
        [None, None] + [math.inf] * 6
    )
    # base-R sum/prod identities on the same shape (frollBatch rollfun)
    assert _col(froll(dt, "sum", "x", 3, na_rm=True, give_names=False)) == (
        [None, None] + [0.0] * 6
    )
    assert _col(froll(dt, "prod", "x", 3, na_rm=True, give_names=False)) == (
        [None, None] + [1.0] * 6
    )
    # 6000.7272: all NaN/NA vector
    nanmix = [None, math.nan, None, math.nan, math.nan, math.nan, None, None]
    dt = _mk(spark, nanmix)
    assert _col(froll(dt, "min", "x", 3, na_rm=True, give_names=False)) == (
        [None, None] + [math.inf] * 6
    )
    # round-12 ADVICE fix: INTEGER columns under na.rm get the same
    # identities — the reference computes froll in double (src/froll.c),
    # so max/min/prod over an int column return double with -Inf/+Inf/1
    # on full all-NA windows (previously stayed NULL here)
    idt = _mk(spark, [1, None, None, None, None, 5], "bigint")
    got = froll(idt, "max", "x", 3, na_rm=True, give_names=False)
    assert dict(got.df.dtypes)["x"] == "double"
    assert _col(got) == [None, None, 1.0, -math.inf, -math.inf, 5.0]
    assert _col(froll(idt, "min", "x", 3, na_rm=True, give_names=False)) == [
        None, None, 1.0, math.inf, math.inf, 5.0]
    assert _col(froll(idt, "prod", "x", 3, na_rm=True, give_names=False)) == [
        None, None, 1.0, 1.0, 1.0, 5.0]


def _roll_oracle(xs, n, fun, na_rm, partial):
    """Base-R loop oracle — the frollBatch.Rraw:28-44 rollfun pattern
    with the data.table NaN-as-NA rule (is.na(NaN) TRUE): None/NaN are
    NA; ±Inf are ordinary values; empty aggregates take the base-R
    identities (sum 0, max -Inf, min +Inf, mean NA)."""
    import math

    def is_na(v):
        return v is None or (isinstance(v, float) and math.isnan(v))

    out = []
    for i in range(len(xs)):
        lo = i - n + 1
        if lo < 0 and not partial:
            out.append(None)
            continue
        w = xs[max(lo, 0):i + 1]
        vals = [float(v) for v in w if not is_na(v)]
        if not na_rm and len(vals) != len(w):
            out.append(None)
            continue
        if fun == "sum":
            out.append(sum(vals) if vals else 0.0)
        elif fun == "mean":
            out.append(sum(vals) / len(vals) if vals else None)
        elif fun == "max":
            out.append(max(vals) if vals else -math.inf)
        elif fun == "min":
            out.append(min(vals) if vals else math.inf)
    return out


def test_froll_batch_differential(spark):
    """frollBatch.Rraw batch-validation pattern: random vectors mixing
    NA/NaN/±Inf at high ratio, every fun x na.rm x partial combination
    checked against the loop oracle. Runs as a table of seeded cases
    (deterministic — Date.now/seeding constraints) rather than live
    hypothesis, like the reference's set.seed(108) batch."""
    import itertools
    import math
    import random

    from pyspark.sql import functions as F

    rng = random.Random(108)
    pool = [None, math.nan, math.inf, -math.inf] + [
        float(v) for v in range(-5, 6)
    ]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        return v

    for case in range(12):
        xs = [rng.choice(pool) for _ in range(rng.randint(1, 14))]
        n = rng.randint(1, 5)
        dt = _mk(spark, xs)
        acc = dt
        names = {}
        for j, (fun, na_rm, partial) in enumerate(
            itertools.product(("sum", "mean", "max", "min"),
                              (False, True), (False, True))
        ):
            acc = froll(acc, fun, ["x"], n, na_rm=na_rm, partial=partial)
            out_name = f"o{j}"
            acc = DT(
                acc.df.withColumnRenamed(f"x_roll{fun}_{n}", out_name),
                order_by=acc.order_by,
            )
            names[out_name] = (fun, na_rm, partial)
        rows = acc.df.orderBy("i").collect()
        for out_name, (fun, na_rm, partial) in names.items():
            got = [norm(r[out_name]) for r in rows]
            want = [norm(v) for v in _roll_oracle(xs, n, fun, na_rm, partial)]
            ctx = (case, xs, n, fun, na_rm, partial)
            assert len(got) == len(want), ctx
            for g, w in zip(got, want):
                if g is None or w is None:
                    assert g == w, ctx
                elif math.isinf(g) or math.isinf(w):
                    assert g == w, ctx
                else:
                    assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), ctx


# ---------------------------------------------------------------------------
# between() NAbounds / vector-bounds vectors (tests.Rraw 1529, 1695)


def test_between_nabounds_and_vector_bounds(spark):
    """tests.Rraw 1529.07-1529.17: NAbounds=TRUE treats an NA bound as
    unbounded; NAbounds=NA keeps SQL 3VL (FALSE only when the other
    side proves it). 1695.18-23: character x and per-element vector
    bounds."""
    from pyspark.sql import functions as F

    from data_table_spark.functions import between

    xs = [0.1 * i for i in range(1, 11)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(xs)], "i int, x double")

    def col(expr):
        return [r["b"] for r in
                df.select("i", expr.alias("b")).orderBy("i").collect()]

    # 1529.07/.09
    assert col(between("x", 0.25, 0.75)) == [v >= 0.25 and v <= 0.75 for v in xs]
    assert col(between("x", 0.25, 0.75, incbounds=False)) == [
        0.25 < v < 0.75 for v in xs]
    # 1529.10/.11: NAbounds=NA -> FALSE where provably out, else NA
    assert col(between("x", 0.25, None, NAbounds=None)) == [
        False if v < 0.25 else None for v in xs]
    assert col(between("x", None, 0.75, NAbounds=None)) == [
        False if v > 0.75 else None for v in xs]
    # 1529.12/.13: both bounds NA
    assert col(between("x", None, None, NAbounds=None)) == [None] * 10
    assert col(between("x", None, None)) == [True] * 10
    # 1529.14/.15: scalar lower from the data, NA upper
    lo = xs[2]
    assert col(between("x", lo, None, incbounds=False, NAbounds=None)) == [
        False if v <= lo else None for v in xs]
    assert col(between("x", lo, None, incbounds=True, NAbounds=None)) == [
        False if v < lo else None for v in xs]
    # 1695.07-.15: NA x propagates NA; NA bounds unbounded (default
    # NAbounds=TRUE)
    idf = spark.createDataFrame(
        [(0, None), (1, 1), (2, 5)], "i int, x int"
    )

    def icol(expr):
        return [r["b"] for r in
                idf.select("i", expr.alias("b")).orderBy("i").collect()]

    assert icol(between("x", 3, 7)) == [None, False, True]        # 1695.07
    assert icol(between("x", None, 7)) == [None, True, True]      # 1695.08
    assert icol(between("x", 3, None)) == [None, False, True]     # 1695.09
    assert icol(between("x", None, None)) == [None, True, True]   # 1695.11

    # 1695.18-.21: character x = c("foo","bar","paz")
    cdf = spark.createDataFrame(
        [(0, "foo", "b"), (1, "bar", "f"), (2, "paz", "a")],
        "i int, x string, lo string",
    )
    got = [r["b"] for r in cdf.select(
        "i", between("x", "bag", "fog").alias("b")).orderBy("i").collect()]
    assert got == [False, True, False]                             # 1695.18
    # 1695.19: per-element vector lower bound (Column)
    got = [r["b"] for r in cdf.select(
        "i", between("x", F.col("lo"), F.lit("q")).alias("b")
    ).orderBy("i").collect()]
    assert got == [True, False, True]
    # 1695.22/.23: numeric vector bounds incl. Inf
    import math

    # x = c(3.14, 3.20, -42, Inf); lower = c(3,4,-60,5);
    # upper = c(3.14,10,-30,Inf)
    ndf = spark.createDataFrame(
        [(0, 3.14, 3.0, 3.14), (1, 3.20, 4.0, 10.0),
         (2, -42.0, -60.0, -30.0), (3, math.inf, 5.0, math.inf)],
        "i int, x double, lo double, up double",
    )
    got = [r["b"] for r in ndf.select(
        "i", between("x", F.col("lo"), F.col("up")).alias("b")
    ).orderBy("i").collect()]
    assert got == [True, False, True, True]
    got = [r["b"] for r in ndf.select(
        "i", between("x", F.col("lo"), F.col("up"), incbounds=False).alias("b")
    ).orderBy("i").collect()]
    assert got == [False, False, True, False]
    # check= scalar validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lower"):
        between("x", 5, 1, check=True)


def test_foverlaps_double_point_intervals(spark):
    """tests.Rraw 1390.1-1390.2: point intervals (start == end) on
    DOUBLE types. The reference's C kernel needed a machine-tolerance
    increment (not +1L) to get these right; the declarative closed-
    interval predicate here is type-agnostic, so the same vectors pin
    that no integer-widening bug exists."""
    from data_table_spark.core import DT
    from data_table_spark.operators.overlaps import foverlaps

    eps = 2.220446049250313e-16 ** 0.5  # .Machine$double.eps^0.5
    x = DT(spark.createDataFrame([(0.88, 0.88)], "start double, end double"))
    y = DT(spark.createDataFrame(
        [(0.26, 0.61), (0.5, 0.88), (0.55, 0.88 - eps), (0.7, 0.89)],
        "start double, end double",
    ))
    got = sorted(
        (r["i_start"], r["i_end"])
        for r in foverlaps(
            x, y, by_x=["start", "end"], nomatch=None
        ).df.collect()
    )
    # yid 2 and 4 of the keyed y (sorted order): (0.5,0.88), (0.7,0.89)
    assert got == [(0.5, 0.88), (0.7, 0.89)]

    # 1390.2: no overlap at all -> nomatch=NA keeps both x rows
    x = DT(spark.createDataFrame(
        [(0.3, 0.3), (0.5, 0.5)], "start double, end double"
    ))
    y = DT(spark.createDataFrame([(0.4, 0.4)], "start double, end double"))
    rows = foverlaps(
        x, y, by_x=["start", "end"], nomatch="NA"
    ).df.collect()
    assert sorted((r["start"], r["i_start"]) for r in rows) == [
        (0.3, None), (0.5, None)
    ]


def test_fifelse_fcase_vectors(spark):
    """tests.Rraw 2072 (fifelse) / 2127 (fcase) — the portable
    semantics: NA test rows yield NA (unless fifelse na=), scalar and
    per-row Column branches mix freely, no-condition-matches rows are
    NA without default= and take default= with it, and date arithmetic
    flows through branches. R's vector-length error contracts are
    vector-runtime specifics with no Spark analog (Columns are
    row-aligned by construction); the TYPE contract for literal
    outputs is ported in round 13 — see
    test_fcase_2127_list_outputs_and_type_contract."""
    import datetime

    from pyspark.sql import functions as F

    from data_table_spark.functions import fcase, fifelse

    # test_vec = -5:5 < 0; test_vec_na appends NA
    rows = [(i, v, v < 0, v > 0) for i, v in enumerate(range(-5, 6))]
    rows.append((11, None, None, None))
    df = spark.createDataFrame(rows, "i int, v int, t1 boolean, t2 boolean")

    def col(expr):
        return [r["o"] for r in
                df.select("i", expr.alias("o")).orderBy("i").collect()]

    # 2072.001/.020: scalar branches, NA test -> NA
    assert col(fifelse("t1", F.lit(1), F.lit(0))) == [
        1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, None]
    # 2072.005: na stays NA unless na= supplies a value
    assert col(fifelse("t1", F.lit(True), F.lit(None).cast("boolean")))[:6] \
        == [True] * 5 + [None]
    assert col(fifelse("t1", F.lit(1), F.lit(0), na=-1))[-1] == -1
    # 2072.006-.008/.021-.023: Column-valued branches (R's vector form)
    assert col(fifelse("t1", F.col("v") * 10, F.col("v"))) == [
        -50, -40, -30, -20, -10, 0, 1, 2, 3, 4, 5, None]
    # 2072.018: date arithmetic through branches
    ddf = spark.createDataFrame(
        [(i, datetime.date(2011, 1, 1) + datetime.timedelta(days=i))
         for i in range(5)],
        "i int, d date",
    )
    got = [r["o"] for r in ddf.select(
        "i",
        fifelse(F.col("d") == F.lit("2011-01-01").cast("date"),
                F.date_sub("d", 1), F.col("d")).alias("o"),
    ).orderBy("i").collect()]
    assert got[0] == datetime.date(2010, 12, 31)
    assert got[1:] == [datetime.date(2011, 1, 2) + datetime.timedelta(days=k)
                       for k in range(4)]

    # fcase 2127.01/.02: out_vec has NA where NEITHER condition holds
    # (v == 0), and NA where the test row is NA
    assert col(fcase("t1", F.lit(1), "t2", F.lit(0))) == [
        1, 1, 1, 1, 1, None, 0, 0, 0, 0, 0, None]
    # 2127.09/.10: default= fills the no-match rows (NA test rows
    # match the reference: default applies — R fcase fills them too)
    assert col(fcase("t1", F.lit(1), "t2", F.lit(0), default=2)) == [
        1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 2]
    # 2127.28/.29: Column-valued outputs
    assert col(fcase("t1", F.col("v") - 1, "t2", F.col("v") + 1)) == [
        -6, -5, -4, -3, -2, None, 2, 3, 4, 5, 6, None]
    # 2127.20: odd argument count raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="even|pairs"):
        fcase("t1", F.lit(1), "t2")


def test_fcase_2127_list_outputs_and_type_contract(spark):
    """tests.Rraw 2127 round-13 port: LIST outputs become array columns
    with NULL for unmatched rows (2127.06/.14/.33/.57/.65), literal
    outputs must share one type class (2127.21-.23), default= must
    match the outputs' class (2127.24), conditions must be logical
    (2127.50) and a literal-True condition short-circuits lazily
    (2127.51/.72)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_table_spark.functions import fcase

    rows = [(i, v, v < 0, v > 0, v < 5) for i, v in enumerate(range(-5, 6))]
    df = spark.createDataFrame(
        rows, "i int, v int, t1 boolean, t2 boolean, t3 boolean")

    def col(expr):
        return [r["o"] for r in
                df.select("i", expr.alias("o")).orderBy("i").collect()]

    # 2127.06: list outputs -> array column, NULL where no match
    got = col(fcase("t1", [1.0], "t2", [0.0]))
    assert got == [[1.0]] * 5 + [None] + [[0.0]] * 5
    # 2127.14: default= as a list fills the hole
    got = col(fcase("t1", [1.0], "t2", [0.0], default=[2.0]))
    assert got == [[1.0]] * 5 + [[2.0]] + [[0.0]] * 5
    # 2127.57: three branches of lists
    got = col(fcase("t1", [1.0], "t2", [0.0], "t3", [2.0]))
    assert got == [[1.0]] * 5 + [[2.0]] + [[0.0]] * 5
    # 2127.65: single branch -> NULL tail
    got = col(fcase("t1", [1.0]))
    assert got == [[1.0]] * 5 + [None] * 6
    # 2127.83-.84: lists of unequal lengths are per-branch literals
    got = col(fcase("t1", [1.0] * 3, "t2", [0.0]))
    assert got == [[1.0] * 3] * 5 + [None] + [[0.0]] * 5

    # 2127.21: int vs double literal mix raises
    with _pytest.raises(ValueError, match="type double.*type integer"):
        fcase("t1", 1, "t2", 3.0)
    # 2127.22: bool vs string
    with _pytest.raises(ValueError, match="type logical.*type character"):
        fcase("t1", "FALSE", "t2", True)
    # 2127.23: int vs string
    with _pytest.raises(ValueError, match="type integer.*type character"):
        fcase("t1", "FALSE", "t2", 5)
    # 2127.24: default class mismatch
    with _pytest.raises(ValueError, match="'default' is of type"):
        fcase("t1", 1, "t2", 0, default="2")
    # matched literal classes work; None matches anything
    assert col(fcase("t1", 1, "t2", None, default=2)) == [
        1, 1, 1, 1, 1, 2, None, None, None, None, None]
    # 2127.50: non-logical literal condition raises
    with _pytest.raises(ValueError, match="Argument #1 must be logical"):
        fcase(1, 1, True, 0)
    # 2127.51/.72: literal True short-circuits — the invalid later
    # condition/value is neither validated nor evaluated
    assert col(fcase(True, 1, 5, 0)) == [1] * 11
    assert col(fcase(True, 1, "t2", "mismatch-never-checked")) == [1] * 11
    # literal False branches are skipped; all-False -> NA / default
    assert col(fcase(False, 1))[:3] == [None] * 3
    assert col(fcase(False, 1, default=7)) == [7] * 11


def test_tstrsplit_vectors(spark):
    """tests.Rraw 1507 / 1571 / 2203: tstrsplit names=TRUE auto-naming,
    keep= part selection with bounds errors, names-length errors,
    type.convert=TRUE per-part auto-numeric, dict and callable
    type_convert forms."""
    from pyspark.sql import functions as F

    from data_table_spark.operators.reshape import tstrsplit

    # 1507.1-.3: x = paste(letters[1:5], 1:5, sep="-")
    d = DT(spark.createDataFrame(
        [(i, f"{c}-{i + 1}") for i, c in enumerate("abcde")], "i int, s string"
    ), order_by=["i"])
    out = tstrsplit(d, "s", "-", names=["p1", "p2"])
    rows = out.df.orderBy("i").collect()
    assert [r["p1"] for r in rows] == list("abcde")
    assert [r["p2"] for r in rows] == [str(k) for k in range(1, 6)]
    out = tstrsplit(d, "s", "-", names=["p1", "p2"], type_convert=True)
    rows = out.df.orderBy("i").collect()
    assert [r["p1"] for r in rows] == list("abcde")      # stays string
    assert [r["p2"] for r in rows] == [float(k) for k in range(1, 6)]

    # 1571.1/.3/.4/.5/.6/.7: X$a = c("ABCD", "EFG") split on every char
    # -> 4 parts ("" split means every character; emulate with 1-char
    # parts via sep="" -> use a regex split on empty pattern)
    x = DT(spark.createDataFrame([(0, "A-B-C-D"), (1, "E-F-G")],
                                 "i int, s string"), order_by=["i"])
    out = tstrsplit(x, "s", "-", names=True)
    assert [c for c in out.columns if c.startswith("V")] == [
        "V1", "V2", "V3", "V4"]                           # 1571.1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not equal to"):  # 1571.2
        tstrsplit(x, "s", "-", names=["a", "b", "c"])
    out = tstrsplit(x, "s", "-", names=["a", "b", "c", "d"])  # 1571.3
    assert [c for c in out.columns if c in "abcd"] == ["a", "b", "c", "d"]
    out = tstrsplit(x, "s", "-", keep=[2, 4])             # 1571.4
    rows = out.df.orderBy("i").collect()
    assert [r["V2"] for r in rows] == ["B", "F"]
    assert [r["V4"] for r in rows] == ["D", None]
    with _pytest.raises(ValueError, match="should contain integer"):
        tstrsplit(x, "s", "-", keep=[2, 7])               # 1571.5
    with _pytest.raises(ValueError, match="not equal to"):   # 1571.6
        tstrsplit(x, "s", "-", keep=[2, 4], names=["a", "b", "c", "d", "e"])
    with _pytest.raises(ValueError, match="TRUE/FALSE or a character"):
        tstrsplit(x, "s", "-", names=1)                   # 1571.7

    # 2203.01/.02: z = c("Yes/1/2", "No/5/3.5")
    z = DT(spark.createDataFrame([(0, "Yes/1/2"), (1, "No/5/3.5")],
                                 "i int, s string"), order_by=["i"])
    out = tstrsplit(z, "s", "/", names=True)
    rows = out.df.orderBy("i").collect()
    assert [r["V1"] for r in rows] == ["Yes", "No"]
    assert [r["V2"] for r in rows] == ["1", "5"]
    out = tstrsplit(z, "s", "/", names=True, type_convert=True)
    rows = out.df.orderBy("i").collect()
    assert [r["V1"] for r in rows] == ["Yes", "No"]       # not numeric
    assert [r["V2"] for r in rows] == [1.0, 5.0]
    assert [r["V3"] for r in rows] == [2.0, 3.5]
    # 2203.06: per-position cast dict (positions 2 and 3 numeric)
    out = tstrsplit(z, "s", "/", names=True,
                    type_convert={2: "double", 3: "double"})
    rows = out.df.orderBy("i").collect()
    assert [r["V1"] for r in rows] == ["Yes", "No"]
    assert [r["V2"] for r in rows] == [1.0, 5.0]
    # 2203.03: callable applied to every part
    out = tstrsplit(z, "s", "/", names=True,
                    type_convert=lambda c: F.upper(c))
    assert [r["V1"] for r in out.df.orderBy("i").collect()] == ["YES", "NO"]


def test_setops_1626_vectors(spark):
    """tests.Rraw 1626.01-1626.45, 1626.79-1626.81: the set-operator
    multiset contracts — fintersect/fsetdiff/funion with all= on
    single- and two-column tables, the precise duplicate-count grids
    for intersect/setdiff all=TRUE, fsetequal all=False set semantics,
    and funion(DT, DT, all=TRUE) self-union (#3133). R-type error
    contracts (list/raw/complex columns) are N/A — Spark's type system
    has no such columns."""
    from data_table_spark.operators.setops import (
        fintersect, fsetdiff, fsetequal, funion,
    )

    def dtab(*cols):
        n = len(cols[0])
        schema = ", ".join(f"c{i} double" for i in range(len(cols)))
        return DT(spark.createDataFrame(
            [tuple(float(c[k]) for c in cols) for k in range(n)], schema))

    def rows(dt):
        return sorted(tuple(r) for r in dt.df.collect())

    # 1626.01-.07: single column
    x = dtab([1, 2, 2, 2, 3, 4, 4])
    y = dtab([2, 3, 4, 4, 4, 5])
    assert rows(fintersect(x, y)) == [(2,), (3,), (4,)]
    assert rows(fintersect(x, y, all=True)) == [(2,), (3,), (4,), (4,)]
    assert rows(fsetdiff(x, y)) == [(1,)]
    assert rows(fsetdiff(x, y, all=True)) == [(1,), (2,), (2,)]
    assert rows(funion(x, y)) == [(1,), (2,), (3,), (4,), (5,)]
    assert len(rows(funion(x, y, all=True))) == 13
    assert fsetequal(x, y) is False

    # 1626.08-.14: two columns
    x = dtab([1, 2, 2, 2, 3, 4, 4], [1, 1, 1, 3, 3, 3, 3])
    y = dtab([2, 3, 4, 4, 4, 5], [1, 1, 2, 3, 3, 3])
    assert rows(fintersect(x, y)) == [(2, 1), (4, 3)]
    assert rows(fintersect(x, y, all=True)) == [(2, 1), (4, 3), (4, 3)]
    assert rows(fsetdiff(x, y)) == [(1, 1), (2, 3), (3, 3)]
    assert rows(fsetdiff(x, y, all=True)) == [
        (1, 1), (2, 1), (2, 3), (3, 3)]
    assert rows(funion(x, y)) == [
        (1, 1), (2, 1), (2, 3), (3, 1), (3, 3), (4, 2), (4, 3), (5, 3)]
    assert len(rows(funion(x, y, all=True))) == 13
    assert fsetequal(x, y) is False
    # 1626.79-.80: all=False treats rows as SET elements
    x2 = DT(x.df.dropDuplicates())
    assert fsetequal(x, x2, all=False) is True
    assert fsetequal(x, y, all=False) is False

    # 1626.22-.45: precise duplicate-count grids on a one-row base
    one = dtab([1.0])

    def rep(n):
        return dtab([1.0] * n) if n else DT(one.df.limit(0))

    for n_y, plain, with_all in [
        (0, 0, 0), (1, 1, 1), (2, 1, 2), (3, 1, 3), (4, 1, 4), (5, 1, 4),
    ]:
        assert fintersect(rep(4), rep(n_y)).df.count() == plain, n_y
        assert fintersect(rep(4), rep(n_y), all=True).df.count() == with_all
    for n_y, plain, with_all in [
        (0, 1, 4), (1, 0, 3), (2, 0, 2), (3, 0, 1), (4, 0, 0), (5, 0, 0),
    ]:
        assert fsetdiff(rep(4), rep(n_y)).df.count() == plain, n_y
        assert fsetdiff(rep(4), rep(n_y), all=True).df.count() == with_all

    # 1626.81: self union all keeps both copies
    d = dtab([1.0])
    assert funion(d, d, all=True).df.count() == 2


def test_rleid_rowid_1464_1563_vectors(spark):
    """tests.Rraw 1464 (rleid/rleidv) and 1563.401-.405 (rowid/rowidv):
    exact run-id and within-group-counter vectors, including the
    multi-column rleidv(1:4) = every row its own run (the payload
    column breaks every tie) and the two-column rowid grouping."""
    from data_table_spark.operators.window import rleid, rowid

    # rleid: a = rep(c("A","B","C","A","B"), c(2,2,3,1,2))
    a = ["A", "A", "B", "B", "C", "C", "C", "A", "B", "B"]
    d = DT(spark.createDataFrame(
        [(i, v, i + 1) for i, v in enumerate(a)], "i int, a string, foo int"
    ), order_by=["i"])
    got = [r["rleid"] for r in rleid(d, ["a"]).df.orderBy("i").collect()]
    assert got == [1, 1, 2, 2, 3, 3, 3, 4, 5, 5]            # 1464.01/.02
    # 1464.10: rleidv over ALL columns -> foo breaks every tie
    got = [r["rleid"] for r in
           rleid(d, ["a", "foo"]).df.orderBy("i").collect()]
    assert got == list(range(1, 11))

    # rowid: x=c(20,10,10,30,30,20), y=c(a,a,a,b,b,b)
    rows = [(0, 20, "a"), (1, 10, "a"), (2, 10, "a"),
            (3, 30, "b"), (4, 30, "b"), (5, 20, "b")]
    d = DT(spark.createDataFrame(rows, "i int, x int, y string"),
           order_by=["i"])
    got = [r["rowid"] for r in rowid(d, ["x"]).df.orderBy("i").collect()]
    assert got == [1, 1, 2, 1, 2, 2]                        # 1563.401/.402
    got = [r["rowid"] for r in
           rowid(d, ["x", "y"]).df.orderBy("i").collect()]
    assert got == [1, 1, 2, 1, 2, 1]                        # 1563.404/.405


def test_roll_join_932_941_vectors(spark):
    """tests.Rraw 932-941: roll=+Inf/-Inf/+n/-n/"nearest" × rollends on
    an x table with a QUADRUPLICATED time value (a=4 carries four rows)
    — pins the prevailing-row rule at duplicate times (forward roll
    takes the last row in declared order) and the finite-limit-at-ends
    rule (roll=5 applies its staleness limit when rollends extends past
    the ends: test 936 J(13) is NA though rollends=TRUE)."""
    from data_table_spark.operators.asof import asof_join

    xa = [1, 3, 4, 4, 4, 4, 7]
    xb = [5, 5, 6, 6, 9, 9, 2]
    x = DT(spark.createDataFrame(
        [(xa[k], xb[k], k + 1) for k in range(7)], "a int, b int, v int"
    ), key=["a", "b"], order_by=["a", "b"])

    def run(ivals, **kw):
        i = DT(spark.createDataFrame([(v,) for v in ivals], "a int"),
               order_by=["a"])
        out = asof_join(x, i, on=[], time_x="a", time_i="a", **kw)
        got = {r["a"]: r["v"] for r in out.df.collect()}
        return [got[v] for v in ivals]

    q = [0, 2, 6, 8]
    assert run(q, roll=True, rollends=(True, True)) == [1, 1, 6, 7]   # 932
    assert run(q, roll=float("-inf"), rollends=(True, True)) == [1, 2, 7, 7]  # 933
    assert run(q, roll=True) == [None, 1, 6, 7]                        # 934
    assert run(q, roll="nocb") == [1, 2, 7, None]                      # 935
    q5 = [-10, -1, 2, 12, 13]
    assert run(q5, roll=5, rollends=(True, True)) == [
        None, 1, 1, 7, None]                                           # 936
    q_n = [-10, 2, 6, 7, 8]
    assert run(q_n, roll="nearest") == [1, 1, 7, 7, 7]                 # 938
    assert run(q_n, roll="nearest", rollends=(True, False)) == [
        1, 1, 7, 7, None]                                              # 939
    assert run(q_n, roll="nearest", rollends=(False, True)) == [
        None, 1, 7, 7, 7]                                              # 940
    assert run(q_n, roll="nearest", rollends=(False, False)) == [
        None, 1, 7, 7, None]                                           # 941


def test_roll_backward_1097_1100_rollends_grid(spark):
    """tests.Rraw 1097-1100: backward roll (nocb) × the rollends grid on
    the classic two-observation date table — rows BEFORE the first
    observation are governed by rollends[0], rows AFTER the last by
    rollends[1]."""
    import datetime

    from data_table_spark.operators.asof import asof_join

    d = datetime.date
    x = DT(spark.createDataFrame(
        [(d(2013, 1, 3), 1), (d(2013, 1, 7), 2)], "t date, ind int"
    ), order_by=["t"])
    i = DT(spark.createDataFrame(
        [(d(2013, 1, 1) + datetime.timedelta(days=k),) for k in range(10)],
        "t date",
    ), order_by=["t"])

    def run(re):
        out = asof_join(x, i, on=[], time_x="t", time_i="t",
                        roll=float("-inf"), rollends=re)
        got = {r["t"]: r["ind"] for r in out.df.collect()}
        return [got[d(2013, 1, 1) + datetime.timedelta(days=k)]
                for k in range(10)]

    assert run((False, False)) == [
        None, None, 1, 2, 2, 2, 2, None, None, None]                  # 1097
    assert run((True, True)) == [1, 1, 1, 2, 2, 2, 2, 2, 2, 2]        # 1098
    assert run((True, False)) == [
        1, 1, 1, 2, 2, 2, 2, None, None, None]                        # 1099
    assert run((False, True)) == [None, None, 1, 2, 2, 2, 2, 2, 2, 2]  # 1100


def test_uniqueN_1475_na_semantics(spark):
    """tests.Rraw 1475.03-.14: uniqueN counts NA as a DISTINCT value
    (SQL COUNT(DISTINCT) would skip it); na.rm=TRUE removes NAs first
    (all-NA -> 0)."""
    from data_table_spark.operators.grouping import uniqueN

    def un(vals, na_rm=False):
        d = DT(spark.createDataFrame([(v,) for v in vals], "x boolean"))
        return uniqueN(d, cols=["x"], na_rm=na_rm).df.collect()[0]["uniqueN"]

    assert un([None, True, False]) == 3                     # 1475.03
    assert un([None, True, False], na_rm=True) == 2         # 1475.04
    assert un([True, False], na_rm=True) == 2               # 1475.05
    assert un([True, False]) == 2                           # 1475.06
    assert un([True, None]) == 2                            # 1475.07
    assert un([True, None], na_rm=True) == 1                # 1475.08
    assert un([None, None]) == 1                            # 1475.11
    assert un([None, None], na_rm=True) == 0                # 1475.12
    # 1475.01-.02 shape: distinct rows over a 2-col table, per group
    rows = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3, 4)]
    rows += [(1, 1), (3, 4)]  # duplicates
    d = DT(spark.createDataFrame(rows, "A int, B int"))
    got = {
        r["A"]: r["uniqueN"]
        for r in uniqueN(d, cols=["B"], by=["A"]).df.collect()
    }
    assert got == {1: 4, 2: 4, 3: 4}


def test_uniqueN_narm_group_survives_and_fastpath(spark):
    """Round-12 ADVICE fixes. (a) na.rm=TRUE with by=: a group whose
    counted values are ALL NA still appears with uniqueN=0 (the
    reference's forderv na.last=NA path keeps the group; a row
    pre-filter would lose it). (b) non-nullable fast path: when the
    schema proves no counted column nullable, the plain multi-column
    COUNT(DISTINCT) gives results identical to the struct wrap."""
    from pyspark.sql import functions as F

    from data_table_spark.operators.grouping import uniqueN

    d = DT(spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 1), ("b", None), ("b", None)],
        "g string, x int",
    ))
    got = {
        r["g"]: r["uniqueN"]
        for r in uniqueN(d, cols=["x"], by=["g"], na_rm=True).df.collect()
    }
    assert got == {"a": 2, "b": 0}  # all-NA group survives with 0

    # fast path: a frame whose schema PROVES the counted column
    # non-nullable (explicit StructType) must give results identical
    # to the struct-wrapped path on the same data
    from pyspark.sql.types import LongType, StructField, StructType

    rows = [(i % 7, i % 13) for i in range(100)]
    nn_schema = StructType([
        StructField("g", LongType(), False),
        StructField("x", LongType(), False),
    ])
    base = spark.createDataFrame(rows, nn_schema)
    assert not dict(
        (f.name, f.nullable) for f in base.schema.fields
    )["x"]
    fast = {
        r["g"]: r["uniqueN"]
        for r in uniqueN(DT(base), cols=["x"], by=["g"]).df.collect()
    }
    # struct path forced via a nullable copy of the same data
    nullable = spark.createDataFrame(rows, "g long, x long")
    slow = {
        r["g"]: r["uniqueN"]
        for r in uniqueN(DT(nullable), cols=["x"], by=["g"]).df.collect()
    }
    assert fast == slow


def test_head_tail_negative_n(spark):
    """tests.Rraw 1048/1052 (utils head/tail contracts): head(DT, -k)
    keeps all but the LAST k rows in declared order; tail(DT, -k) drops
    the first k; first/last are head(1)/tail(1)."""
    d = DT(spark.createDataFrame(
        [(i, i * 10) for i in range(1, 8)], "i int, v int"
    ), order_by=["i"])

    def ids(dt):
        return sorted(r["i"] for r in dt.df.collect())

    assert ids(d.head(3)) == [1, 2, 3]
    assert ids(d.tail(3)) == [5, 6, 7]
    assert ids(d.head(-2)) == [1, 2, 3, 4, 5]   # all but last 2
    assert ids(d.tail(-2)) == [3, 4, 5, 6, 7]   # all but first 2
    assert ids(d.head(-10)) == []
    assert ids(d.tail(-10)) == []
    assert ids(d.first()) == [1]
    assert ids(d.last()) == [7]


def test_shift_2067_cyclic_and_negative_n(spark):
    """tests.Rraw 2067.1-.8 (shapes; the reference vectors use complex
    numbers, unsupported in Spark — the shift semantics under test are
    type-independent): default lag, lead, fill=, cyclic wrap in both
    directions, and NEGATIVE n flipping the direction."""
    from data_table_spark.operators.window import shift

    d = DT(spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 20, 30])], "i int, z int"
    ), order_by=["i"])

    def col(out, name):
        return [r[name] for r in out.df.orderBy("i").collect()]

    assert col(shift(d, "z"), "z_lag_1") == [None, 10, 20]          # 2067.1
    assert col(shift(d, "z", type_="lead"), "z_lead_1") == [
        20, 30, None]                                               # 2067.2
    assert col(shift(d, "z", fill=-1), "z_lag_1") == [-1, 10, 20]   # 2067.3
    assert col(shift(d, "z", n=1, type_="cyclic"), "z_cyclic_1") == [
        30, 10, 20]                                                 # 2067.5
    assert col(shift(d, "z", n=-1, type_="cyclic"), "z_cyclic_-1") == [
        20, 30, 10]                                                 # 2067.6
    # negative n on lag == lead (reference shift negative-n rule)
    assert col(shift(d, "z", n=-1), "z_lag_-1") == [20, 30, None]
    assert col(shift(d, "z", n=-1, fill=-1), "z_lag_-1") == [20, 30, -1]


def test_frank_2069_tie_vectors(spark):
    """tests.Rraw 2069.10-.12 (shapes; reference data is complex-typed,
    the tie arithmetic is type-independent): average/max ranks on a
    vector with two tie pairs; min ranks under descending order."""
    from data_table_spark.operators.window import frank

    # two tie pairs then two singletons, mirroring unq_z multiplicity
    vals = [1.0, 1.0, 2.0, 2.0, 3.0, 4.0]
    d = DT(spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, x double"
    ), order_by=["i"])

    def col(ties, desc=False):
        out = frank(d, "x", ties=ties, desc=desc, out_col="r")
        return [r["r"] for r in out.df.orderBy("i").collect()]

    assert col("average") == [1.5, 1.5, 3.5, 3.5, 5.0, 6.0]   # 2069.10
    assert col("max") == [2, 2, 4, 4, 5, 6]                   # 2069.11
    assert col("min", desc=True) == [5, 5, 3, 3, 2, 1]        # 2069.12


def test_frank_1988_nan_na_two_groups(spark):
    """tests.Rraw 1988.1-.4 (divergence FIXED round 12): on a column
    mixing NaN AND NA the reference ranks them as two ADJACENT tie
    groups — values, then the NaN group, then the NA group under
    na.last=TRUE ("we consider NAs to be tied, ditto NaN"). Exact
    reference vectors for every tie method, both unsplit and through
    the chunk stitch."""
    import math

    from data_table_spark.operators.window import frank

    xs = [6, 4, 2, None, 1, math.nan, 5, math.nan, 9, 10, None]
    d = _mk(spark, [float(v) if v is not None else None for v in xs])

    def ranks(dt_, ties, **kw):
        out = frank(dt_, "x", ties=ties, out_col="rk", **kw)
        return [r["rk"] for r in out.df.orderBy("i").collect()]

    # reference expectations, 1988.1-.4
    exp = {
        "average": [5.0, 3.0, 2.0, 10.5, 1.0, 8.5, 4.0, 8.5, 6.0, 7.0, 10.5],
        "max": [5, 3, 2, 11, 1, 9, 4, 9, 6, 7, 11],
        "min": [5, 3, 2, 10, 1, 8, 4, 8, 6, 7, 10],
        "dense": [5, 3, 2, 9, 1, 8, 4, 8, 6, 7, 9],
    }
    for ties, want in exp.items():
        assert ranks(d, ties) == want, ties
        # chunk-stitch twin gives the identical answer
        assert ranks(d, ties, n_chunks=3) == want, f"{ties} chunked"

    # na_last=False mirrors the block order: NA group first, then NaN,
    # then values (forderv na.last=FALSE places the NA-then-NaN block
    # first — 1988.5; frank ranks follow the same order)
    assert ranks(d, "min", na_last=False) == [
        9, 7, 6, 1, 5, 3, 8, 3, 10, 11, 1]
    assert ranks(d, "min", na_last=False, n_chunks=3) == [
        9, 7, 6, 1, 5, 3, 8, 3, 10, 11, 1]

    # "keep"/None treat NaN as NA (reference is_na): NaN ranks NA /
    # drops
    keep = ranks(d, "min", na_last="keep")
    assert keep == [5, 3, 2, None, 1, None, 4, None, 6, 7, None]

    # only-NA and only-NaN columns agree with the reference exactly
    only_na = _mk(spark, [2.0, None, 1.0, None])
    assert ranks(only_na, "average") == [2.0, 3.5, 1.0, 3.5]
    only_nan = _mk(spark, [2.0, math.nan, 1.0, math.nan])
    assert ranks(only_nan, "average") == [2.0, 3.5, 1.0, 3.5]
    assert ranks(only_nan, "min") == [2, 3, 1, 3]

    # by= groups: the two-level key applies inside each partition
    rows = [(i, i % 2, v) for i, v in enumerate(
        [3.0, math.nan, None, 1.0, math.nan, None, 2.0, 4.0])]
    dg = DT(spark.createDataFrame(rows, "i int, g int, x double"),
            order_by=["i"])
    out = frank(dg, "x", ties="min", by=["g"], out_col="rk")
    got = {r["i"]: r["rk"] for r in out.df.collect()}
    # g=0 rows i=0,2,4,6: values 3,2 → 2,1; NaN(i=4) → 3; NA(i=2) → 4
    # g=1 rows i=1,3,5,7: values 1,4 → 1,2; NaN(i=1) → 3; NA(i=5) → 4
    assert got == {0: 2, 2: 4, 4: 3, 6: 1, 1: 3, 3: 1, 5: 4, 7: 2}


def test_setorder_1988_nan_na_placement(spark):
    """tests.Rraw 1988.5-.8 (divergence FIXED round 12): forderv
    places the NA block outermost with NaN adjacent — na.last=FALSE
    (setorder default) puts NA, NaN first in BOTH directions;
    na.last=TRUE puts NaN, NA last in both. The reference vectors are
    1-based row permutations; we sort and compare the resulting row
    ids (0-based)."""
    import math

    xs = [6, 4, 2, None, 1, math.nan, 5, math.nan, 9, 10, None]
    d = _mk(spark, [float(v) if v is not None else None for v in xs])

    def order_ids(*cols, **kw):
        return [r["i"] for r in d.setorder(*cols, **kw).df.collect()]

    def norm(perm):  # reference 1-based → 0-based
        return [p - 1 for p in perm]

    # NaN rows (5, 7 zero-based) tie; either order within the tie
    # group is valid — canonicalize both sides by sorting tie spans
    def canon(ids, spans):
        out = list(ids)
        for lo, hi in spans:
            out[lo:hi] = sorted(out[lo:hi])
        return out

    # 1988.5: asc, na.last=FALSE → NA(2), NaN(2), values asc
    got = order_ids("x")
    want = norm([4, 11, 6, 8, 5, 3, 2, 7, 1, 9, 10])
    spans = [(0, 2), (2, 4)]
    assert canon(got, spans) == canon(want, spans)
    # 1988.6: desc, na.last=FALSE → NA, NaN, values desc
    got = order_ids("-x")
    want = norm([4, 11, 6, 8, 10, 9, 1, 7, 2, 3, 5])
    assert canon(got, spans) == canon(want, spans)
    # 1988.7: asc, na.last=TRUE → values asc, NaN, NA
    got = order_ids("x", na_last=True)
    want = norm([5, 3, 2, 7, 1, 9, 10, 6, 8, 4, 11])
    spans = [(7, 9), (9, 11)]
    assert canon(got, spans) == canon(want, spans)
    # 1988.8: desc, na.last=TRUE → values desc, NaN, NA
    got = order_ids("-x", na_last=True)
    want = norm([10, 9, 1, 7, 2, 3, 5, 6, 8, 4, 11])
    assert canon(got, spans) == canon(want, spans)


def test_cj_fcoalesce_vectors(spark):
    """tests.Rraw 575 (CJ named cross product, sorted key), 995-shape
    (sorted=False keeps argument order), 2060.001-.012 (fcoalesce
    scalar replacement across types incl. dates)."""
    import datetime

    from pyspark.sql import functions as F

    from data_table_spark.functions import fcoalesce
    from data_table_spark.operators.joins import CJ

    out = CJ(spark, x=[1, 2], y=["a", "b"])                 # 575
    assert out.columns == ["x", "y"] and out.key == ["x", "y"]
    assert sorted(tuple(r) for r in out.df.collect()) == [
        (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    out = CJ(spark, sorted_=False, a=[5, 3], b=[5, 1])      # 995 shape
    assert out.df.count() == 4
    assert sorted(tuple(r) for r in out.df.collect()) == [
        (3, 1), (3, 5), (5, 1), (5, 5)]

    # fcoalesce 2060: scalar fallback per type
    d = spark.createDataFrame(
        [(0, True, 1, 1.0, "a", datetime.date(1970, 1, 2)),
         (1, None, 2, 2.0, None, None),
         (2, False, None, None, "b", datetime.date(1970, 1, 4))],
        "i int, b boolean, n int, x double, s string, d date",
    )

    def col(expr):
        return [r["o"] for r in
                d.select("i", expr.alias("o")).orderBy("i").collect()]

    assert col(fcoalesce("b", F.lit(True))) == [True, True, False]
    assert col(fcoalesce("n", F.lit(3))) == [1, 2, 3]
    assert col(fcoalesce("x", F.lit(3.0))) == [1.0, 2.0, 3.0]
    assert col(fcoalesce("s", F.lit("b"))) == ["a", "b", "b"]
    assert col(fcoalesce("d", F.lit(datetime.date(1970, 1, 3)))) == [
        datetime.date(1970, 1, 2), datetime.date(1970, 1, 3),
        datetime.date(1970, 1, 4)]
    # 2060.002 shape: an all-NA middle argument passes through
    assert col(
        fcoalesce("b", F.lit(None).cast("boolean"), F.lit(True))
    ) == [True, True, False]


def test_frank_1988_first_last_random_nan_na(spark):
    """Round-12 completion of the 1988 fix for the ROW-NUMBERING tie
    methods: ties=first/last/random also place the NaN group before
    the NA group under na_last=True (after, mirrored, under False),
    with tiebreak= pinning within-group order — unsplit and chunked."""
    import math

    from data_table_spark.operators.window import frank

    xs = [3.0, math.nan, None, 1.0, math.nan, None]
    d = DT(spark.createDataFrame(
        [(i, v) for i, v in enumerate(xs)], "i int, x double"
    ), order_by=["i"])

    def ranks(ties, **kw):
        out = frank(d, "x", ties=ties, tiebreak=["i"], out_col="rk", **kw)
        return [r["rk"] for r in out.df.orderBy("i").collect()]

    # na_last=True: values (1,3) → 1,2; NaN (i=1,4) → 3,4; NA (2,5) → 5,6
    assert ranks("first") == [2, 3, 5, 1, 4, 6]
    assert ranks("first", n_chunks=3) == [2, 3, 5, 1, 4, 6]
    # ties=last numbers each tie group in reverse (tiebreak desc)
    assert ranks("last") == [2, 4, 6, 1, 3, 5]
    # na_last=False: NA → 1,2; NaN → 3,4; values → 5,6
    assert ranks("first", na_last=False) == [6, 3, 1, 5, 4, 2]
    assert ranks("first", na_last=False, n_chunks=3) == [6, 3, 1, 5, 4, 2]
    # random: seeded determinism, same group placement
    r1 = ranks("random", seed=7)
    r2 = ranks("random", seed=7)
    assert r1 == r2
    assert sorted(r1[1:2] + r1[4:5]) == sorted(r1[1:2] + r1[4:5])
    assert {r1[1], r1[4]} == {3, 4} and {r1[2], r1[5]} == {5, 6}
    assert ranks("random", seed=7, n_chunks=3) == r1


def test_fifelse_2100_na_arg_vectors(spark):
    """tests.Rraw 2100.01/.07/.09/.14 (#3753): fifelse na= exact
    vectors — int/double na branch, date-typed branches with a date
    na, and na=None keeping NULL."""
    import datetime

    from pyspark.sql import functions as F

    from data_table_spark.functions import fifelse

    tv = [v < 0 for v in range(-5, 6)] + [None]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tv)], "i int, t boolean"
    )

    def col(expr):
        return [r["o"] for r in
                d.select("i", expr.alias("o")).orderBy("i").collect()]

    assert col(fifelse("t", F.lit(1), F.lit(0), na=2)) == (
        [1] * 5 + [0] * 6 + [2])                                 # 2100.01
    assert col(fifelse("t", F.lit(1.0), F.lit(0.0), na=2.0)) == (
        [1.0] * 5 + [0.0] * 6 + [2.0])                           # .02
    # .09: date-typed branches; test = (date vec == x) with one NA
    dd = spark.createDataFrame(
        [(0, True), (1, False), (2, None)], "i int, t boolean"
    )
    y, n, na = (datetime.date(2019, 8, 31), datetime.date(2019, 8, 30),
                datetime.date(2019, 8, 29))
    got = [r["o"] for r in dd.select(
        "i", fifelse("t", F.lit(y), F.lit(n), na=F.lit(na)).alias("o")
    ).orderBy("i").collect()]
    assert got == [y, n, na]
    # .14: na omitted -> NULL on the NA test row
    assert col(fifelse("t", F.lit(1.0), F.lit(2.0)))[-1] is None


def test_tail_ports_2369_2386(spark):
    """Round-13 tail mining of tests.Rraw 2369-2386:

    - 2369/2370: yearqtr/yearmon format="character" ("2019Q1" /
      "2019M01", zero-padded month), numeric default unchanged;
    - 2373: group-by on an EMPTY table yields an empty grouped frame
      with the aggregate's schema (no rows fabricated);
    - 2374: duplicate columns in setkey/setindex raise; setnames that
      would create duplicate names raises;
    - 2380: tstrsplit rev=TRUE aligns parts from the END (part 1 =
      last component; short rows get NA deep); rev must be boolean;
    - 2385: setorder(order={col: ±1}) named mapping with the three
      reference errors;
    - 2386: frank(order=-1) == descending rank; order takes
      precedence over desc= with a warning.
    """
    import datetime

    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_table_spark.functions import yearmon, yearqtr
    from data_table_spark.operators.reshape import tstrsplit
    from data_table_spark.operators.window import frank

    # 2369/2370 vectors (subset of the reference's x)
    dates = ["1111-11-11", "2019-01-01", "2019-12-31", "2020-02-29",
             "2040-12-31", "2100-03-01", None]
    df = spark.createDataFrame(
        [(i, d and datetime.date.fromisoformat(d)) for i, d in
         enumerate(dates)],
        "i int, d date",
    )
    got = [tuple(r) for r in df.select(
        yearqtr("d").alias("qn"), yearqtr("d", "character").alias("qc"),
        yearmon("d").alias("mn"), yearmon("d", "character").alias("mc"),
    ).orderBy(F.col("qn").asc_nulls_last()).collect()]
    assert got[0] == (1111.75, "1111Q4", 1111 + 10 / 12, "1111M11")
    assert got[1] == (2019.0, "2019Q1", 2019.0, "2019M01")
    assert got[2] == (2019.75, "2019Q4", 2019 + 11 / 12, "2019M12")
    assert got[3] == (2020.0, "2020Q1", 2020 + 1 / 12, "2020M02")
    assert got[-1] == (None, None, None, None)  # 2369.5/2370.5

    # 2373: empty-table group-by
    empty = DT(spark.createDataFrame([], "g int, v int"))
    out = empty.query(j={"n": F.count(F.lit(1))}, by=["g"])
    assert out.df.count() == 0 and out.columns == ["g", "n"]

    # 2374: duplicate key/index columns raise
    d = DT(spark.createDataFrame([(1, 2)], "a int, b int"))
    with _pytest.raises(ValueError, match="duplicate column names"):
        d.setkey("a", "a")
    with _pytest.raises(ValueError, match="duplicate column names"):
        d.setindex("a", "a")
    with _pytest.raises(ValueError, match="duplicated column names"):
        d.setnames("b", "a")
    # ADVICE r13: renaming TWO different columns to the SAME new name
    # is the same duplicate-creation hazard and must raise too
    with _pytest.raises(ValueError, match="duplicated column names"):
        d.setnames({"a": "x", "b": "x"})
    # a plain swap-free rename of both columns still works
    assert d.setnames({"a": "p", "b": "q"}).columns == ["p", "q"]

    # 2380: tstrsplit rev=
    sdf = DT(spark.createDataFrame(
        [(1, "ABC-DEF"), (2, "ABC-DEF-GHI"), (3, "ABC-DEF-GHI-JKL"),
         (4, "ABC-DEF-GHI-JKL-MNO")], "i int, s string"))
    out = tstrsplit(sdf, "s", "-", keep=[1, 2, 3], rev=True,
                    drop_source=True)
    rows = {r["i"]: (r["V1"], r["V2"], r["V3"])
            for r in out.df.collect()}
    assert rows[1] == ("DEF", "ABC", None)          # 2380.01 row 1
    assert rows[2] == ("GHI", "DEF", "ABC")
    assert rows[4] == ("MNO", "JKL", "GHI")
    with _pytest.raises(ValueError, match="'rev' must be TRUE or FALSE"):
        tstrsplit(sdf, "s", "-", rev="maybe")       # 2380.03

    # 2385: setorder order= named mapping
    d = DT(spark.createDataFrame(
        [(2, 2), (1, 1), (2, 1)], "x int, y int"))
    got = [(r["x"], r["y"]) for r in
           d.setorder(order={"x": 1, "y": -1}).df.collect()]
    assert got == [(1, 1), (2, 2), (2, 1)]          # 2385.02
    with _pytest.raises(ValueError, match="not in the data.table"):
        d.setorder(order={"z": 1})                  # 2385.03
    with _pytest.raises(ValueError, match="named duplicates"):
        d.setorder(order=[("x", 1), ("x", -1)])     # 2385.04
    with _pytest.raises(ValueError, match="\\+1 or -1"):
        d.setorder(order={"x": 2})                  # 2385.05

    # 2386: frank order=-1 == descending; precedence warning
    fd = DT(spark.createDataFrame(
        [(i, v) for i, v in enumerate([3.0, 1.0, 3.0, 5.0, 2.0])],
        "i int, x double"), order_by=["i"])
    asc = [r["rank"] for r in
           frank(fd, "x", ties="min").df.orderBy("i").collect()]
    desc = [r["rank"] for r in
            frank(fd, "x", ties="min", order=-1).df.orderBy("i").collect()]
    assert asc == [3, 1, 3, 5, 2] and desc == [2, 5, 2, 1, 4]
    with _pytest.warns(RuntimeWarning, match="precedence"):
        got = [r["rank"] for r in
               frank(fd, "x", ties="min", desc=True, order=1)
               .df.orderBy("i").collect()]
    assert got == asc                               # 2386.07
    with _pytest.raises(ValueError, match="\\+1 or -1"):
        frank(fd, "x", order=2)


def test_frank_multicolumn_2386_05(spark):
    """frankv(cols=, order=) multi-column lexicographic ranking
    (tests.Rraw 2386.05/.06/.08, round-13 port): frank(DT, cols,
    order=[-1, 1]) == rank over (x desc, y asc); ties are rows equal
    on ALL columns; the NaN/NA two-level key applies per double
    column; desc= recycles and yields to order= with a warning."""
    import pytest as _pytest

    from data_table_spark.operators.window import frank

    # 2386.05: x=c(2,1,2,1,3), y=c(5,4,3,2,1); order=c(-1,1)
    d = DT(spark.createDataFrame(
        [(0, 2.0, 5), (1, 1.0, 4), (2, 2.0, 3), (3, 1.0, 2), (4, 3.0, 1)],
        "i int, x double, y int"), order_by=["i"])
    got = [r["rank"] for r in
           frank(d, ["x", "y"], ties="min", order=[-1, 1])
           .df.orderBy("i").collect()]
    assert got == [3, 2, 2, 4, 1] or got == [3, 5, 2, 4, 1]
    # exact: order by x desc (3,2,2,1,1), y asc within: rows sorted =
    # (3,1),(2,3),(2,5),(1,2),(1,4) -> ranks i4=1,i2=2,i0=3,i3=4,i1=5
    assert got == [3, 5, 2, 4, 1]

    # 2386.06: scalar order recycles over all columns
    d2 = DT(spark.createDataFrame(
        [(0, 1.0, 1), (1, 2.0, 1), (2, 1.0, 2)],
        "i int, a double, b int"), order_by=["i"])
    got = [r["rank"] for r in frank(d2, ["a", "b"], ties="min", order=-1)
           .df.orderBy("i").collect()]
    assert got == [3, 1, 2]  # desc lexicographic: (2,1) (1,2) (1,1)

    # ties: full-row duplicates share a rank; average halves
    d3 = DT(spark.createDataFrame(
        [(0, 1.0, 1), (1, 1.0, 1), (2, 2.0, 0)],
        "i int, a double, b int"), order_by=["i"])
    got = [r["rank"] for r in frank(d3, ["a", "b"], ties="average")
           .df.orderBy("i").collect()]
    assert got == [1.5, 1.5, 3.0]
    # NA outermost per double column under na_last=True
    d4 = DT(spark.createDataFrame(
        [(0, None, 1), (1, 1.0, 1), (2, float("nan"), 1)],
        "i int, a double, b int"), order_by=["i"])
    got = [r["rank"] for r in frank(d4, ["a", "b"], ties="min")
           .df.orderBy("i").collect()]
    assert got == [3, 1, 2]  # value, NaN, NA
    # 2386.08: precedence warning when both desc= and order= given
    with _pytest.warns(RuntimeWarning, match="precedence"):
        frank(d2, ["a", "b"], ties="min", desc=True, order=[1, -1])
    # subset contract: "keep" and n_chunks raise
    with _pytest.raises(ValueError, match="na_last"):
        frank(d2, ["a", "b"], na_last="keep")
    with _pytest.raises(ValueError, match="single-column"):
        frank(d2, ["a", "b"], n_chunks=3)


def test_frolladaptive_extended_vectors(spark):
    """froll.Rraw 6001 adaptive tail (round-14 port): partial= (trims
    n_i to available rows, 6006.902/6001.x29), fill= (incomplete
    leading windows only, 6001.x22/.730), fun="prod" (6001.52x),
    fun="var"/"sd" (6001.72x/.82x incl. the non-negativity stability
    vectors .731-.734), and the width-0 empty-window identities
    (6001.x21: sum 0, mean NaN, max -Inf, min Inf, prod 1,
    var/sd/median NA)."""
    import math

    from data_table_spark.operators.window import (
        frolladaptive, frollapply_adaptive)

    def run(xs, ns, fun, **kw):
        df = spark.createDataFrame(
            [(i, x, n) for i, (x, n) in enumerate(zip(xs, ns))],
            "i int, x double, n int",
        )
        out = frolladaptive(DT(df), "x", "n", order=["i"], fun=fun, **kw)
        rows = out.df.orderBy("i").collect()
        return [r["x_adaptive"] for r in rows]

    def near(got, want):
        assert len(got) == len(want), (got, want)
        for g, w in zip(got, want):
            if w is None or g is None:
                assert g == w, (got, want)
            elif isinstance(w, float) and math.isnan(w):
                assert isinstance(g, float) and math.isnan(g), (got, want)
            elif isinstance(w, float) and math.isinf(w):
                assert g == w, (got, want)
            else:
                assert abs(g - w) <= 1e-12 * max(1.0, abs(w)), (got, want)

    NA, NaN = None, float("nan")
    x13, xNA = [1.0, 2.0, 3.0], [1.0, 2.0, None]
    n202 = [2, 0, 2]
    r05 = math.sqrt(0.5)

    # mean (6001.121-.129)
    near(run(x13, n202, "mean"), [NA, NaN, 2.5])
    near(run(x13, n202, "mean", fill=99), [99, NaN, 2.5])
    near(run(xNA, n202, "mean"), [NA, NaN, NA])
    near(run(xNA, n202, "mean", na_rm=True), [NA, NaN, 2.0])
    near(run(xNA, n202, "mean", na_rm=True, partial=True), [1.0, NaN, 2.0])
    # sum (6001.221-.229)
    near(run(x13, n202, "sum"), [NA, 0.0, 5.0])
    near(run(x13, n202, "sum", fill=99), [99, 0.0, 5.0])
    near(run(xNA, n202, "sum"), [NA, 0.0, NA])
    near(run(xNA, n202, "sum", na_rm=True), [NA, 0.0, 2.0])
    near(run(xNA, n202, "sum", na_rm=True, partial=True), [1.0, 0.0, 2.0])
    # max / min (6001.321-.429)
    inf = float("inf")
    near(run(x13, n202, "max"), [NA, -inf, 3.0])
    near(run(x13, n202, "max", fill=99), [99, -inf, 3.0])
    near(run(xNA, n202, "max"), [NA, -inf, NA])
    near(run(xNA, n202, "max", na_rm=True), [NA, -inf, 2.0])
    near(run(xNA, n202, "max", na_rm=True, partial=True), [1.0, -inf, 2.0])
    near(run(x13, n202, "min"), [NA, inf, 2.0])
    near(run(xNA, n202, "min", na_rm=True, partial=True), [1.0, inf, 2.0])
    # prod (6001.521-.529)
    near(run(x13, n202, "prod"), [NA, 1.0, 6.0])
    near(run(x13, n202, "prod", fill=99), [99, 1.0, 6.0])
    near(run(xNA, n202, "prod"), [NA, 1.0, NA])
    near(run(xNA, n202, "prod", na_rm=True), [NA, 1.0, 2.0])
    near(run(xNA, n202, "prod", na_rm=True, partial=True), [1.0, 1.0, 2.0])
    # median (6001.621-.629, .6212)
    near(run(x13, n202, "median"), [NA, NA, 2.5])
    near(run(x13, [0, 0, 0], "median"), [NA, NA, NA])
    near(run(x13, n202, "median", fill=99), [99, NA, 2.5])
    near(run(xNA, n202, "median", na_rm=True), [NA, NA, 2.0])
    near(run(xNA, n202, "median", na_rm=True, partial=True),
         [1.0, NA, 2.0])
    # var (6001.721-.730, .7241)
    near(run(x13, n202, "var"), [NA, NA, 0.5])
    near(run(x13, n202, "var", fill=99), [99, NA, 0.5])
    near(run(xNA, n202, "var"), [NA, NA, NA])
    near(run(xNA, n202, "var", na_rm=True), [NA, NA, NA])
    near(run(xNA, n202, "var", na_rm=True, partial=True), [NA, NA, NA])
    near(run(xNA, n202, "var", na_rm=True, fill=99), [99, NA, NA])
    near(run(xNA, [2, 2, 2], "var"), [NA, 0.5, NA])
    # sd (6001.8201-.830)
    near(run(x13, [2, 2, 2], "sd"), [NA, r05, r05])
    near(run(x13, n202, "sd"), [NA, NA, r05])
    near(run(xNA, n202, "sd", na_rm=True, fill=99), [99, NA, NA])
    # numerical stability (6001.733/.734): equal large values -> 0
    y = [1e8 + 2.980232e-8, 1e8, 1e8, 1e8]
    assert run(y, [3, 3, 3, 3], "var")[3] == 0.0
    assert run(y, [3, 3, 3, 3], "sd")[3] == 0.0

    # frollapply adaptive partial (6001.295-ish): fn over trimmed /
    # empty windows; NaN returns (mean of empty) map to NULL — the
    # documented engine NA spelling on the pandas-UDF path
    import numpy as np

    df = spark.createDataFrame(
        [(i, x, n) for i, (x, n) in enumerate(zip(xNA, n202))],
        "i int, x double, n int",
    )
    out = frollapply_adaptive(
        DT(df), "x", "n", lambda a: float(np.nansum(a)),
        order=["i"], partial=True,
    )
    got = [r["x_adaptive"] for r in out.df.orderBy("i").collect()]
    near(got, [1.0, 0.0, 2.0])
