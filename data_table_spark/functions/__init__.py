"""Scalar function surface (reference §2.2/§2.10).

Everything here compiles to built-in Catalyst expressions — whole-stage
codegen, no Python in the hot path. Each function cites the reference
behavior it reproduces (file:line relative to /root/reference).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "fifelse",
    "fcase",
    "fcoalesce",
    "between",
    "inrange_pred",
    "chin",
    "notchin",
    "like",
    "ilike",
    "flike",
    "chmatch",
    "nafill_const",
    "fctr",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fifelse(test: Column | str, yes, no, na=None) -> Column:
    """Vectorized typed if-else (reference R/wrappers.R:8, src/fifelse.c:9).

    ``na=`` gives the value used where ``test`` is NULL (data.table's NA
    test branch); default NULL, matching fifelse(na=NA).
    """
    test = _col(test)
    out = F.when(test, yes).when(~test, no)
    # rows where test is NULL fall through; .otherwise supplies the na= value
    return out.otherwise(na) if na is not None else out


def _fcase_typeclass(v):
    """Reference-style type class of a PYTHON LITERAL output value
    (src/fifelse.c:260 TYPEOF checks). Column expressions return
    "column" (dtype unknown until bound to a schema — documented gap vs
    the reference's eager check); None is typeless NA."""
    import datetime

    if v is None:
        return None
    if isinstance(v, Column):
        return "column"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "logical"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "character"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple)):
        return "list"
    return "column"


def fcase(*conds_and_values, default=None) -> Column:
    """N-branch case-when (reference R/wrappers.R:9-13, src/fifelse.c:210).

    fcase(c1, v1, c2, v2, ..., default=d)

    Round-13 port of the tests.Rraw 2127 contract:

    - LITERAL output values must share one type class — mixing e.g. an
      int with a float or a string with a bool raises the reference's
      "Argument #k is of type X, however argument #2 is of type Y"
      (2127.21-.23). Column-expression outputs are exempt (their dtype
      is unknown until bound; Spark's analyzer still rejects truly
      incompatible branches). None (NA) matches any class.
    - ``default=`` must match the output values' class (2127.24) and,
      like the reference's length-1 rule (2127.68), must be a scalar
      (or a list literal when the outputs are lists).
    - LIST outputs (2127.06/.14/.33/.57/.65/.83-.86): a Python
      list/tuple value becomes an ARRAY literal column; unmatched rows
      are NULL (the reference's NULL list element).
    - Conditions must be logical (2127.50 "Argument #1 must be
      logical."): a non-Column, non-name literal condition may only be
      a bool. A literal True condition SHORT-CIRCUITS the remaining
      pairs (the reference evaluates lazily — 2127.51/.72 accept
      invalid later arguments after an always-true branch).
    """
    if len(conds_and_values) % 2 != 0:
        raise ValueError(
            f"Received {len(conds_and_values)} inputs; please supply an "
            "even number of arguments in ..., consisting of logical "
            "condition, resulting value pairs (in that order). Note "
            "that the default argument must be named explicitly, e.g., "
            "default=0"
        )
    pairs = list(zip(conds_and_values[::2], conds_and_values[1::2]))

    def as_value(v, argno, expect):
        tc = _fcase_typeclass(v)
        if tc is not None and tc != "column":
            if expect[0] is None:
                expect[0], expect[1] = tc, argno
            elif tc != expect[0]:
                raise ValueError(
                    f"Argument #{argno} is of type {tc}, however "
                    f"argument #{expect[1]} is of type {expect[0]}. "
                    "Please make sure all output values have the same "
                    "type."
                )
        if tc == "list":
            return F.array([F.lit(x) for x in v])
        return v

    out = None
    expect = [None, None]  # (type class, first argument number)
    for k, (cond, val) in enumerate(pairs):
        if not isinstance(cond, (Column, str)):
            if cond is False:
                continue  # never-true branch: skipped, unevaluated
            if cond is True:
                # lazy short-circuit (2127.51/.72): later pairs are
                # neither validated nor evaluated
                val = as_value(val, 2 * k + 2, expect)
                done = F.lit(True)
                out = (F.when(done, val) if out is None
                       else out.when(done, val))
                break
            raise ValueError(f"Argument #{2 * k + 1} must be logical.")
        cond = _col(cond)
        val = as_value(val, 2 * k + 2, expect)
        out = F.when(cond, val) if out is None else out.when(cond, val)
    if out is None:  # every pair had a literal-False condition → all NA
        out = F.when(F.lit(False), F.lit(None))
    if default is not None:
        dtc = _fcase_typeclass(default)
        if (
            dtc not in (None, "column")
            and expect[0] is not None
            and dtc != expect[0]
        ):
            raise ValueError(
                f"Resulting value is of type {expect[0]} but 'default' "
                f"is of type {dtc}. Please make sure that both "
                "arguments have the same type."
            )
        if dtc == "list":
            default = F.array([F.lit(x) for x in default])
        return out.otherwise(default)
    return out


def fcoalesce(*cols) -> Column:
    """First non-NULL across columns (reference src/coalesce.c:9)."""
    return F.coalesce(*[_col(c) for c in cols])


def between(
    x: Column | str, lower, upper, incbounds: bool = True,
    NAbounds: bool | None = True, check: bool = False,
) -> Column:
    """x %between% [lower, upper] (reference R/between.R:2, src/between.c:9).

    Bounds may be scalars or Columns (the reference's per-element
    vector bounds, tests.Rraw 1695.19-23; Spark columns are row-aligned
    so the recycling-length errors 1695.24-25 cannot arise).

    ``NAbounds`` (reference default TRUE, tests.Rraw 1529.10-17): an NA
    bound means that side is UNBOUNDED (always passes). ``NAbounds=None``
    (the reference's NAbounds=NA) keeps SQL three-valued logic: the
    result is NA unless the other side already proves FALSE — exactly
    Spark's native null-propagating comparison, so no extra expression
    is emitted. ``check=True`` validates lower<=upper for scalar bounds
    (reference check=; a Column-bounds check would need a Spark action,
    so it stays scalar-only here).

    Documented divergence: a NaN ``x`` compares under Spark's NaN
    ordering (NaN > every number), so NaN %between% (3,7) is FALSE
    here where R returns NA (tests.Rraw 1695.01) — between() takes a
    bare Column with no frame, so the engine's usual dtype-aware
    NaN-as-NA masking cannot be applied generically."""
    x = _col(x)
    if check and not isinstance(lower, Column) and not isinstance(upper, Column):
        if lower is not None and upper is not None and lower > upper:
            raise ValueError(f"between: lower ({lower!r}) > upper ({upper!r})")
    lo = lower if isinstance(lower, Column) else F.lit(lower)
    up = upper if isinstance(upper, Column) else F.lit(upper)
    lc = (x >= lo) if incbounds else (x > lo)
    uc = (x <= up) if incbounds else (x < up)
    if NAbounds is True:
        lc = F.when(lo.isNull(), F.lit(True)).otherwise(lc)
        uc = F.when(up.isNull(), F.lit(True)).otherwise(uc)
        # an NA bound is unbounded, but an NA x is still NA
        # (tests.Rraw 1695.11-15 vs 1529.13)
        return F.when(x.isNull(), F.lit(None).cast("boolean")).otherwise(lc & uc)
    return lc & uc


def inrange_pred(x: Column | str, lower, upper, incbounds: bool = True) -> Column:
    """Single-range form of %inrange% (reference R/between.R:76-100).

    The table-of-ranges form (x within ANY of a table of ranges) is a
    semi range-join — see operators.overlaps.inrange.
    """
    return between(x, lower, upper, incbounds)


def chin(x: Column | str, values: Sequence) -> Column:
    """%chin% — fast string membership (reference src/chmatch.c:154-170)."""
    return _col(x).isin(list(values))


def notchin(x: Column | str, values: Sequence) -> Column:
    """%notin% (reference R/notin.R, src/negate.c:15)."""
    return ~_col(x).isin(list(values))


def chmatch(x: Column | str, values: Sequence) -> Column:
    """chmatch: 1-based index of first match in ``values``, NULL if absent
    (reference src/chmatch.c:154)."""
    x = _col(x)
    out = F.lit(None).cast("int")
    expr = None
    for i, v in enumerate(values):
        cond = x == F.lit(v)
        expr = F.when(cond, i + 1) if expr is None else expr.when(cond, i + 1)
    return expr.otherwise(out) if expr is not None else out


def chgroup(df, col: str, order: Sequence[str]):
    """chgroup (reference R/data.table.R chgroup, src/chmatch.c): group
    identical strings together, groups ordered by each value's FIRST
    appearance in the declared order. `order` names the columns that
    define appearance order and must form a TOTAL order (the reference
    uses vector position; a distributed engine needs it declared — same
    contract as every positional op here; ties would make the grouping
    nondeterministic).

    Relational form (no global windows — the earlier two-window form
    funneled all rows through one partition): per-value first-appearance
    key via groupBy(col).agg(min(struct(order...))), joined back (one
    row per distinct value — AQE broadcasts it when it fits), then a
    distributed range-partitioned sort on (first_key, order...). One
    agg shuffle + one sort shuffle, both fully parallel."""
    sdf = df.df if hasattr(df, "df") else df
    firsts = _first_appearance(sdf, col, order)
    order_cols = [F.col(c) for c in order]
    # null-safe equality: NULL group-values form their own group (as the
    # reference and the former window form do) instead of being dropped
    # by a null-unsafe equi-join
    return (
        sdf.join(firsts, sdf[col].eqNullSafe(firsts["__val__"]), "inner")
        .orderBy(F.col("__first__"), *order_cols)
        .select(*[sdf[c] for c in sdf.columns])
    )


def _first_appearance(sdf, col: str, order: Sequence[str]):
    """Per-distinct-value first-appearance key frame shared by chgroup
    and chgroup_ids: groupBy(col).agg(min(struct(order...))) — one
    partial-aggregated shuffle, one row per distinct value, renamed to
    __val__/__first__ for a null-safe join back."""
    order_cols = [F.col(c) for c in order]
    return (
        sdf.groupBy(col)
        .agg(F.min(F.struct(*order_cols)).alias("__first__"))
        .withColumnRenamed(col, "__val__")
    )


def like(x: Column | str, pattern: str, fixed: bool = False) -> Column:
    """%like% — regex (or fixed-string) match (reference R/like.R:1-24)."""
    x = _col(x)
    if fixed:
        return x.contains(pattern)
    return x.rlike(pattern)


def ilike(x: Column | str, pattern: str) -> Column:
    """%ilike% — case-insensitive regex match (reference R/like.R:19)."""
    return F.lower(_col(x)).rlike(pattern.lower())


def flike(x: Column | str, pattern: str) -> Column:
    """%flike% — fixed-string match (reference R/like.R:21)."""
    return _col(x).contains(pattern)


def nafill_const(x: Column | str, fill) -> Column:
    """nafill(type="const") (reference src/nafill.c:120); locf/nocb live in
    operators.window (they need an ordering)."""
    return F.coalesce(_col(x), F.lit(fill))


def fctr(x: Column | str) -> Column:
    """factor columns are represented as plain strings (SURVEY §1.2);
    fctr (reference R/helpers.R:4) is therefore a cast."""
    return _col(x).cast("string")


def yearqtr(x: Column | str, format: str = "numeric") -> Column:
    """yearqtr (reference R/IDateTime.R yearqtr; tests.Rraw 2369,
    #7694 — round-13 port): numeric year + (quarter-1)/4 by default;
    format="character" renders "2019Q1". NULL propagates."""
    c = _col(x)
    y, q = F.year(c), F.quarter(c)
    if format == "character":
        return F.concat(y.cast("string"), F.lit("Q"), q.cast("string"))
    return (y + (q - 1) / F.lit(4.0)).cast("double")


def yearmon(x: Column | str, format: str = "numeric") -> Column:
    """yearmon (reference R/IDateTime.R yearmon; tests.Rraw 2370):
    numeric year + (month-1)/12 by default; format="character"
    renders "2019M01" (zero-padded month)."""
    c = _col(x)
    y, m = F.year(c), F.month(c)
    if format == "character":
        return F.concat(
            y.cast("string"), F.lit("M"),
            F.lpad(m.cast("string"), 2, "0"),
        )
    return (y + (m - 1) / F.lit(12.0)).cast("double")


def plike(x: Column | str, pattern: str) -> Column:
    """%plike% — perl-flavored regex (reference R/like.R:24). Java regex
    covers the perl syntax the reference delegates to PCRE."""
    return _col(x).rlike(pattern)


def idatetime(ts: Column | str):
    """IDateTime(ts) (reference R/IDateTime.R:334): split a timestamp
    into the integer date part and the seconds-of-day time part
    (IDate + ITime columns)."""
    c = _col(ts)
    idate = F.to_date(c)
    itime = (
        F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)
    ).cast("int")
    return idate.alias("idate"), itime.alias("itime")


# ITime class surface (reference R/IDateTime.R:175-334): ITime is an
# integer count of seconds since midnight. Here it is a plain int
# column + these constructors/accessors — same representation choice as
# IDate→DateType (SURVEY §1.2): the VALUE semantics are the class; Spark
# needs no S3 wrapper to keep them.


def as_itime(x: Column | str) -> Column:
    """as.ITime (reference R/IDateTime.R:175): from a timestamp/date
    (seconds-of-day of its wall clock), an 'HH:MM:SS' / 'HH:MM' string,
    or an integer second count (taken modulo day, negative wraps —
    matching the integer-storage semantics). A bare date (DateType or
    'YYYY-MM-DD' literal) is midnight → 0, matching as.ITime(Date)."""
    c = _col(x)
    secs = (
        F.when(
            c.cast("timestamp").isNotNull() & ~c.cast("string").rlike("^[0-9:.-]+$"),
            F.hour(c.cast("timestamp")) * 3600
            + F.minute(c.cast("timestamp")) * 60
            + F.second(c.cast("timestamp")),
        )
        .when(
            c.cast("string").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
            F.lit(0),
        )
        .when(
            c.cast("string").rlike("^[0-9]{1,2}:[0-9]{2}(:[0-9]{2})?$"),
            F.split(c.cast("string"), ":").getItem(0).cast("int") * 3600
            + F.split(c.cast("string"), ":").getItem(1).cast("int") * 60
            + F.coalesce(
                F.split(c.cast("string"), ":").getItem(2).cast("int"),
                F.lit(0),
            ),
        )
        .otherwise(c.cast("int"))
    )
    return F.pmod(secs, F.lit(86400)).cast("int")


def itime_add(x: Column | str, seconds) -> Column:
    """ITime + seconds: integer addition wrapping within the day (the
    reference's integer storage + format.ITime's %%-day rendering,
    R/IDateTime.R:214)."""
    s = seconds if isinstance(seconds, Column) else F.lit(int(seconds))
    return F.pmod(_col(x) + s, F.lit(86400)).cast("int")


def itime_format(x: Column | str) -> Column:
    """format.ITime (reference R/IDateTime.R:214): 'HH:MM:SS'."""
    c = F.pmod(_col(x), F.lit(86400))
    return F.format_string(
        "%02d:%02d:%02d",
        (c / 3600).cast("int"),
        F.pmod((c / 60).cast("int"), F.lit(60)),
        F.pmod(c, F.lit(60)).cast("int"),
    )


def itime_hour(x: Column | str) -> Column:
    """hour() accessor on ITime seconds (reference R/IDateTime.R:253)."""
    return (F.pmod(_col(x), F.lit(86400)) / 3600).cast("int")


def itime_minute(x: Column | str) -> Column:
    return F.pmod((_col(x) / 60).cast("int"), F.lit(60)).cast("int")


def itime_second(x: Column | str) -> Column:
    return F.pmod(_col(x), F.lit(60)).cast("int")


def round_itime(x: Column | str, digits: str = "hours") -> Column:
    """round.ITime (reference R/IDateTime.R:229): truncate seconds-of-
    day to the containing hour/minute."""
    unit = {"hours": 3600, "minutes": 60, "seconds": 1}[digits]
    return (
        (F.pmod(_col(x), F.lit(86400)) / unit).cast("int") * unit
    ).cast("int")


def chmatchdup_table(
    x, table, x_col: str, t_col: str, order_x=None, order_t=None
):
    """chmatchdup (reference src/chmatch.c:154, wrapper R/data.table.R):
    multiset match — the i-th occurrence of a value in x matches the
    i-th occurrence in table (each table row consumed once); unmatched
    occurrences get NULL.

    Relational form: occurrence-number both sides (row_number over the
    value partition in declared order) and equi-join on
    (value, occurrence) — two codegen window passes + one join, no
    per-row search. Returns x's DataFrame + `match_pos` (the matched
    table row's 1-based position in order_t, data.table's return)."""
    from pyspark.sql import Window

    xdf = x.df if hasattr(x, "df") else x
    tdf = table.df if hasattr(table, "df") else table
    ox = order_x or [x_col]
    ot = order_t or [t_col]
    xo = Window.partitionBy(x_col).orderBy(*[F.col(c) for c in ox])
    to = Window.partitionBy(t_col).orderBy(*[F.col(c) for c in ot])
    tpos = Window.orderBy(*[F.col(c) for c in ot])
    xr = xdf.withColumn("__occ__", F.row_number().over(xo))
    tr = (
        tdf.withColumn("__occ__", F.row_number().over(to))
        .withColumn("__pos__", F.row_number().over(tpos))
        .select(
            F.col(t_col).alias("__val__"), "__occ__",
            F.col("__pos__").alias("match_pos"),
        )
    )
    out = xr.join(
        tr,
        (F.col(x_col) == F.col("__val__"))
        & (xr["__occ__"] == tr["__occ__"]),
        "left",
    ).drop("__occ__", "__val__")
    return out


def timetaken(started_at: float, cpu_started_at: float | None = None) -> str:
    """timetaken (reference R/timetaken.R:1-14): format elapsed wall +
    cpu time with the reference's width rules — "HH:MM:SS" above a
    minute, "12.3s" above ten seconds, "0.123s" below. Pass
    ``time.perf_counter()`` (and optionally ``time.process_time()``)
    captured before the work."""
    import time as _time

    def _fmt(secs: float) -> str:
        if secs > 60.0:
            s = int(secs)
            return f"{s // 3600:02d}:{(s // 60) % 60:02d}:{s % 60:02d}"
        return f"{secs:.1f}s" if secs >= 10.0 else f"{secs:.3f}s"

    wall = _time.perf_counter() - started_at
    if cpu_started_at is None:
        # no cpu baseline captured -> don't fabricate a cpu figure
        return f"{_fmt(wall)} elapsed"
    cpu = _time.process_time() - cpu_started_at
    return f"{_fmt(wall)} elapsed ({_fmt(cpu)} cpu)"


def set_dt_threads(spark, n: int | None = None) -> int:
    """setDTthreads (reference src/openmp-utils.c:66 via R wrapper):
    the reference throttles its OpenMP team; the Spark analog of "how
    parallel is a table operation" is the shuffle-partition count
    (executor threading itself is cluster-managed, not per-query).
    Sets ``spark.sql.shuffle.partitions`` (``n=None``/0 = leave
    unchanged, mirroring ``setDTthreads(0)`` = all) and returns the
    PREVIOUS value, like the reference."""
    prev = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if n:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(n)))
    return prev


def get_dt_threads(spark) -> int:
    """getDTthreads — current shuffle-partition count (see
    set_dt_threads for the mapping rationale)."""
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


def chgroup_ids(df, col: str, order: Sequence[str]):
    """First-appearance group ids — the relational core of chgroup
    exposed as a column: every row gains `grp`, the 1-based rank of its
    value's FIRST appearance in the declared total order (reference
    chgroup's group ordering, src/chmatch.c). The dense_rank window
    runs only over the per-value frame (vocabulary-sized, one row per
    distinct value); the row table itself never funnels through a
    single partition."""
    from pyspark.sql import Window as _W

    sdf = df.df if hasattr(df, "df") else df
    firsts = (
        _first_appearance(sdf, col, order)
        .withColumn("grp", F.dense_rank().over(_W.orderBy("__first__")))
        .drop("__first__")
    )
    return (
        sdf.join(firsts, sdf[col].eqNullSafe(F.col("__val__")), "inner")
        .drop("__val__")
    )
