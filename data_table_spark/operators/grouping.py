"""Grouping / aggregation operators beyond plain groupBy().agg()
(SURVEY §2.4).

The GForce kernel set (reference src/gsumm.c: gsum :348, gmean :582,
gminmax :730, gmedian :869, gfirstlast :923, ghead/gtail :1004,
gvar/gsd :1023, gprod :1116) maps 1:1 onto Spark's built-in aggregate
functions executed by HashAggregateExec with partial (map-side)
aggregation — the distributed generalization of data.table's two-level
batch grouping (src/gsumm.c:76-120). This module holds what needs more
than a single agg call.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core import DT, _namelist, _ocol, _oflip, _order_exprs

__all__ = [
    "agg_exprs",
    "patterns",
    "sd_cols",
    "lapply_sd",
    "uniqueN",
    "unique",
    "duplicated",
    "any_duplicated",
    "fdistinct",
    "ghead",
    "gtail",
    "weighted_mean",
    "groupingsets",
    "rollup",
    "cube",
    "dogroups",
    "grp_id",
]

#: GForce function name → Spark aggregate builder (SURVEY §2.4 row 2)
GFORCE = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "first": lambda c: F.first(c, ignorenulls=False),
    "last": lambda c: F.last(c, ignorenulls=False),
    "median": F.median,
    "var": F.var_samp,
    "sd": F.stddev_samp,
    "prod": F.product,
    "N": lambda _=None: F.count(F.lit(1)),
    # struct-wrapped: the reference counts NA as a distinct value
    # (tests.Rraw 1475.03); bare COUNT(DISTINCT x) would skip it
    "uniqueN": lambda c: F.countDistinct(F.struct(c)),
}


def gforce_strict(fun: str, col: str) -> Column:
    """Reference-R NA semantics for a grouped aggregate (na.rm=FALSE,
    the R default): any NA in the group makes the group's result NA.
    Spark/ANSI-SQL aggregates skip nulls (= na.rm=TRUE), which is this
    repo's default because it matches the SQL oracle semantics; this
    wrapper restores the R default by masking groups whose non-null
    count falls short of the row count. Same pattern as
    window.froll(na_rm=False)."""
    base = GFORCE[fun](F.col(col))
    return F.when(F.count(F.col(col)) == F.count(F.lit(1)), base)


def agg_exprs(spec: Mapping[str, tuple[str, str] | Column]) -> list[Column]:
    """Build an aggregate list from {alias: ("fun", "col")} using the
    GForce mapping, or raw Columns."""
    out = []
    for alias, v in spec.items():
        if isinstance(v, Column):
            out.append(v.alias(alias))
        else:
            fun, col = v
            out.append(GFORCE[fun](F.col(col) if col else None).alias(alias))
    return out


class Patterns:
    """``.SDcols=patterns(...)`` marker (reference R/data.table.R
    patterns, tests.Rraw 1971): one or more regexes whose matches are
    INTERSECTED over the column names."""

    def __init__(self, *regexes: str):
        if not regexes:
            raise ValueError("patterns() needs at least one regex")
        self.regexes = regexes


def patterns(*regexes: str) -> Patterns:
    """Build a :class:`Patterns` spec for ``sd_cols``/``lapply_sd``."""
    return Patterns(*regexes)


def sd_cols(dt: DT, spec=None, by=None, invert: bool = False) -> list[str]:
    """Resolve the reference's ``.SDcols`` mini-language to column names
    (reference R/data.table.R .SDcols resolution; tests.Rraw 1137,
    1498, 1971, 2128 — round-12 port).

    Accepted ``spec`` forms:
    - None → every column not in ``by`` (the default .SD);
    - list of names → validated as-is; a name prefixed ``-`` drops it
      (all-or-none: mixing plain and ``-`` names raises, 1137.07);
    - "a:b" range string → the contiguous column span in table order
      (reference startcol:endcol);
    - int / list of ints → 1-based positions; NEGATIVE positions drop
      (mixing signs raises ".SDcols is numeric but has both", 1137.06);
    - list of bools → logical mask, length must equal ncol (1498.2);
    - :class:`Patterns` → intersection of regex matches (1971.2);
    - callable → applied to each column's SPARK DTYPE STRING (the
      distributed adaptation of the reference's per-column-vector
      predicate, e.g. ``is.numeric`` → ``lambda t: t in NUMERIC``);
      must return a bool or ".SDcols conditions were not met" raises
      (2128.3-.5).

    ``invert=True`` complements the selection (the reference's ``!`` /
    ``-`` prefix, 1971.3) while preserving table column order. ``by``
    columns are excluded from the default and from pattern/callable
    selections (reference: by columns never enter .SD) but an EXPLICIT
    name list may include them.
    """
    names = list(dt.columns)
    byn = set(_namelist(by))
    if spec is None:
        out = [c for c in names if c not in byn]
        if invert:
            # complement of the default inside .SD-eligible space (by
            # columns never enter .SD, even inverted — ADVICE r12)
            return [c for c in names if c not in out and c not in byn]
        return out

    def finish(sel: list[str], exclude_by: bool = False) -> list[str]:
        if invert:
            sel_set = set(sel)
            # spec forms that exclude by (None/Patterns/callable) keep
            # excluding it under invert= — the complement must not
            # re-admit by columns into .SD (ADVICE r12)
            return [
                c for c in names
                if c not in sel_set and not (exclude_by and c in byn)
            ]
        return sel

    if isinstance(spec, Patterns):
        sel = [
            c for c in names
            if c not in byn
            and all(re.search(rx, c) for rx in spec.regexes)
        ]
        return finish(sel, exclude_by=True)
    if callable(spec):
        dtypes = dict(dt.df.dtypes)
        sel, bad = [], []
        for c in names:
            if c in byn:
                continue
            v = spec(dtypes[c])
            if not isinstance(v, bool):
                bad.append(c)
            elif v:
                sel.append(c)
        if bad:
            raise ValueError(
                ".SDcols conditions were not met for: "
                f"[{', '.join(bad)}] (the callable must return a bool "
                "per column dtype)"
            )
        return finish(sel, exclude_by=True)
    if isinstance(spec, bool):
        raise ValueError(".SDcols cannot be a single boolean")
    if isinstance(spec, int):
        spec = [spec]
    if isinstance(spec, str):
        if ":" in spec and spec not in names:
            lo, hi = (s.strip() for s in spec.split(":", 1))
            if lo not in names or hi not in names:
                raise ValueError(f".SDcols range {spec!r}: unknown column")
            i, j2 = names.index(lo), names.index(hi)
            step = 1 if j2 >= i else -1
            return finish(names[i:j2 + step:step])
        spec = [spec]
    spec = list(spec)
    if spec and all(isinstance(v, bool) for v in spec):
        if len(spec) != len(names):
            raise ValueError(
                f".SDcols is a logical vector length {len(spec)} but "
                f"there are {len(names)} columns"
            )
        return finish([c for c, keep in zip(names, spec) if keep])
    if spec and all(isinstance(v, int) for v in spec):
        neg = [v for v in spec if v < 0]
        pos = [v for v in spec if v > 0]
        if neg and pos:
            raise ValueError(
                ".SDcols is numeric but has both +ve and -ve indices"
            )
        if any(v == 0 or abs(v) > len(names) for v in spec):
            raise ValueError(".SDcols position out of range")
        if neg:
            drop = {names[-v - 1] for v in neg}
            return finish([c for c in names if c not in drop])
        return finish([names[v - 1] for v in pos])
    if spec and all(isinstance(v, str) for v in spec):
        minus = [v[1:] for v in spec if v.startswith("-")]
        plain = [v for v in spec if not v.startswith("-")]
        if minus and plain:
            raise ValueError(
                "invalid unary operator: .SDcols mixes plain and "
                "'-'-prefixed names"
            )
        use = minus or plain
        missing = [v for v in use if v not in names]
        if missing:
            raise ValueError(f"Some items of .SDcols are not column "
                             f"names: {missing}")
        if minus:
            return finish([c for c in names if c not in set(minus)])
        return finish(list(plain))
    raise ValueError(f"unsupported .SDcols spec: {spec!r}")


def lapply_sd(dt: DT, fun, spec=None, by=None, invert: bool = False) -> DT:
    """``DT[, lapply(.SD, fun), by=, .SDcols=]`` (reference
    R/data.table.R dogroups→GForce path; tests.Rraw 1137.12, 1971).

    ``fun`` is a GForce name ("sum", "mean", ...) or a callable
    Column→Column; it is applied to every ``sd_cols``-resolved column
    in ONE grouped aggregate (single exchange, map-side partials —
    the distributed form of the reference's GForce batch loop). Output:
    by columns then the .SD columns under their own names (reference
    lapply(.SD) keeps names)."""
    byn = _namelist(by)
    # by columns never enter .SD (reference dogroups contract) — also
    # for EXPLICIT name/position selections that happen to include one
    cols = [c for c in sd_cols(dt, spec, by=by, invert=invert)
            if c not in byn]
    f = GFORCE[fun] if isinstance(fun, str) else fun
    exprs = [f(F.col(c)).alias(c) for c in cols]
    if not exprs:
        raise ValueError("lapply_sd: .SDcols resolved to no columns")
    if byn:
        return DT(dt.df.groupBy(*byn).agg(*exprs))
    return DT(dt.df.agg(*exprs))


def uniqueN(dt: DT, cols=None, by=None, na_rm: bool = False) -> DT:
    """uniqueN — count distinct rows / column-combos (reference
    R/duplicated.R:102, src/uniqlist.c:354). Exact by default (the
    reference is exact); approx_count_distinct is available for the
    100 TB path via ``approx=`` in callers."""
    cols = _namelist(cols) or [c for c in dt.columns if c not in _namelist(by)]
    fields = {f.name: f for f in dt.df.schema.fields}
    non_nullable = all(
        c in fields and not fields[c].nullable for c in cols
    )
    if na_rm:
        # reference na.rm=TRUE drops rows with NA in ANY counted column
        # (forderv na.last=NA — tests.Rraw 1475.04/.08/.12) — but a
        # group whose rows are ALL dropped still appears with uniqueN=0,
        # so the drop is a conditional distinct INSIDE the agg (a
        # pre-filter would lose the group): COUNT(DISTINCT ...) skips
        # the NULL the failed condition yields
        valid = reduce(
            lambda l, r: l & r, [F.col(c).isNotNull() for c in cols]
        )
        expr = F.countDistinct(
            F.when(valid, F.struct(*[F.col(c) for c in cols]))
        ).alias("uniqueN")
    elif non_nullable:
        # fast path: when the schema proves no counted column can be
        # NULL the struct wrap below is a semantic no-op — plain
        # multi-column COUNT(DISTINCT) keeps the narrower hash key
        expr = F.countDistinct(*[F.col(c) for c in cols]).alias("uniqueN")
    else:
        # countDistinct over a STRUCT, not the bare columns: SQL
        # COUNT(DISTINCT x) skips NULL rows, but the reference counts NA
        # as a distinct value (tests.Rraw 1475.03: uniqueN(c(NA,TRUE,
        # FALSE)) is 3) — a struct is never null, so null-carrying rows
        # count
        expr = F.countDistinct(
            F.struct(*[F.col(c) for c in cols])
        ).alias("uniqueN")
    if by:
        return DT(dt.df.groupBy(*_namelist(by)).agg(expr))
    return DT(dt.df.agg(expr))


def unique(dt: DT, by=None, fromLast: bool = False, order=None) -> DT:
    """unique(DT, by=) — keep first (or last) row per duplicate group in
    the declared order (reference R/duplicated.R:26).

    Deterministic by construction: Spark's dropDuplicates keeps an
    arbitrary row, so we use a row_number window over the declared order
    — same shuffle cost, reproducible result.
    """
    by = _namelist(by) or dt.columns
    order = _namelist(order) or dt.order_by
    if not order:
        # pure distinct on all columns — order-free, safe
        return DT(dt.df.dropDuplicates(by))
    ordering = _order_exprs(dt.df, order, flip=fromLast)
    w = Window.partitionBy(*by).orderBy(*ordering)
    out = (
        dt.df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    return DT(out, key=dt.key, order_by=dt.order_by)


def duplicated(dt: DT, by=None, fromLast: bool = False, order=None, out_col="dup") -> DT:
    """duplicated — flag rows that repeat an earlier (later, fromLast) key
    (reference R/duplicated.R:1)."""
    by = _namelist(by) or dt.columns
    order = _namelist(order) or dt.order_by
    if not order:
        raise ValueError("duplicated needs a declared order")
    ordering = _order_exprs(dt.df, order, flip=fromLast)
    w = Window.partitionBy(*by).orderBy(*ordering)
    return DT(
        dt.df.withColumn(out_col, F.row_number().over(w) > 1),
        key=dt.key,
        order_by=dt.order_by,
    )


def any_duplicated(dt: DT, by=None) -> bool:
    """anyDuplicated (reference R/duplicated.R:90) → boolean."""
    by = _namelist(by) or dt.columns
    return (
        dt.df.groupBy(*by).count().filter(F.col("count") > 1).limit(1).count() > 0
    )


def fdistinct(dt: DT, on=None, mult: str = "first", order=None, cols=None) -> DT:
    """fdistinct — distinct on key columns retaining payload of the
    first/last row (reference R/mergelist.R:50-82).

    Reference argument contracts (mergelist.Rraw 2.01-2.04): ``on``
    defaults to the key and must name columns of ``dt``; ``mult`` is
    first/last; ``cols`` selects payload columns (on= always kept,
    reference someCols keep=on)."""
    if not isinstance(dt, DT):
        raise ValueError("'x' must be data.table")
    on = _namelist(on) or list(dt.key)
    if not on or any(c not in dt.columns for c in on):
        raise ValueError("'on' must be character column names of 'x' argument")
    if mult not in ("first", "last"):
        raise ValueError("'mult' must be 'first' or 'last'")
    if cols is not None:
        cols = _namelist(cols)
        if not cols or any(c not in dt.columns for c in cols):
            raise ValueError(
                "'cols' must be non-zero length, non-NA, integer or "
                "character columns of 'x' argument"
            )
    if not (_namelist(order) or dt.order_by):
        # no declared order: first/last refer to table order (reference
        # forderv row indices) — tag the current physical order
        tagged = DT(
            dt.df.withColumn("__ord__", F.monotonically_increasing_id())
        )
        out = unique(tagged, by=on, fromLast=(mult == "last"), order=["__ord__"])
        out = DT(out.df.drop("__ord__"), key=dt.key, order_by=dt.order_by)
    else:
        out = unique(dt, by=on, fromLast=(mult == "last"), order=order)
    if cols is not None:
        keep = [c for c in dt.columns if c in set(on) | set(cols)]
        out = DT(out.df.select(*keep), key=out.key, order_by=out.order_by)
    return out


def ghead(dt: DT, n: int, by, order=None) -> DT:
    """head(.SD, n) per group — GForce ghead (reference src/gsumm.c:1004).
    Window row_number ≤ n; no driver collect, distributes per group."""
    order = _namelist(order) or dt.order_by
    w = Window.partitionBy(*_namelist(by)).orderBy(
        *_order_exprs(dt.df, order)
    )
    return DT(
        dt.df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__"),
        order_by=dt.order_by,
    )


def gtail(dt: DT, n: int, by, order=None) -> DT:
    """tail(.SD, n) per group — GForce gtail (reference src/gsumm.c:1010)."""
    order = _namelist(order) or dt.order_by
    w = Window.partitionBy(*_namelist(by)).orderBy(
        *_order_exprs(dt.df, order, flip=True)
    )
    return DT(
        dt.df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__"),
        order_by=dt.order_by,
    )


def weighted_mean(x: str | Column, w: str | Column) -> Column:
    """weighted.mean — GForce decomposes to a gsum ratio (reference
    R/data.table.R:3353-3363); same decomposition here."""
    x = F.col(x) if isinstance(x, str) else x
    w = F.col(w) if isinstance(w, str) else w
    return F.sum(x * w) / F.sum(w)


def grp_id(by) -> Column:
    """.GRP as a Column — dense group counter in group-sorted order
    (man/special-symbols.Rd:20). A dense_rank over an UNPARTITIONED
    window: single-reducer, fine inside an already-aggregated (small)
    frame, an anti-pattern over raw rows — use :func:`with_grp` there
    (distributed: number the distinct keys, join back)."""
    return F.dense_rank().over(Window.orderBy(*[F.col(c) for c in _namelist(by)]))


def with_grp(dt: DT, by, out_col: str = "grp") -> DT:
    """Distributed .GRP: attach the dense 1-based group counter (in
    group-sorted order, matching the reference's keyed .GRP) to every
    row WITHOUT a global window. The distinct group keys — tiny relative
    to the data — are numbered with one single-partition window (cost
    O(#groups), not O(rows)), then broadcast/hash-joined back on the
    group keys. At any scale the big side only shuffles if the join
    isn't broadcastable."""
    keys = _namelist(by)
    groups = dt.df.select(*keys).distinct()
    numbered = groups.withColumn(
        out_col,
        F.row_number()
        .over(Window.orderBy(*[F.col(c) for c in keys]))
        .cast("long"),
    )
    return DT(
        dt.df.join(F.broadcast(numbered), on=keys, how="left"),
        key=dt.key,
        order_by=dt.order_by,
    )


_R_CLASS_SYNONYMS = {  # class-key → set of matching R-ish classes
    "character": {"character", "factor"},
    "factor": {"character", "factor"},
    "integer": {"integer", "integer64"},
    "integer64": {"integer64"},
    "numeric": {"numeric"},
    "double": {"numeric"},
    "Date": {"Date", "IDate"},
    "IDate": {"Date", "IDate"},
    "logical": {"logical"},
    "POSIXct": {"POSIXct"},
}


def _r_class(dtype) -> str:
    """Spark column type → the reference's class1() name (SURVEY §1.2
    type table)."""
    import pyspark.sql.types as T

    if isinstance(dtype, T.StringType):
        return "character"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        return "integer"
    if isinstance(dtype, T.LongType):
        return "integer64"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "numeric"
    if isinstance(dtype, T.DateType):
        return "Date"
    if isinstance(dtype, T.BooleanType):
        return "logical"
    if isinstance(dtype, T.TimestampType):
        return "POSIXct"
    return type(dtype).__name__


def _scalar_class(v) -> str:
    import datetime

    if isinstance(v, bool):
        return "logical"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "numeric"
    if isinstance(v, datetime.datetime):
        return "POSIXct"
    if isinstance(v, datetime.date):
        return "Date"
    return "character"


def _label_plan(df, by_cols: Sequence[str], label) -> tuple[list[Column], Callable]:
    """label= support for rollup/cube/groupingsets (reference
    R/groupingsets.R:60-146, man/groupingsets.Rd): relabel the 'total'
    rows of grouping columns. Reference semantics:
    - scalar: applies to every by column whose class matches the
      scalar's class (R/groupingsets.R:140-143 — NOT all columns);
    - mapping: keys are column names (value class must match the
      column, R/groupingsets.R:90-99) or class names
      ('character','integer','numeric','factor','Date','IDate', or an
      actual class of a by column), which apply to every by column of
      that class not named explicitly (R/groupingsets.R:133-138).
    Aggregated-ness comes from F.grouping() (computed IN the agg — a
    data NULL is not a total row), carried out via hidden columns then
    applied/dropped."""
    if label is None:
        return [], lambda df: df
    col_class = {c: _r_class(df.schema[c].dataType) for c in by_cols}
    if not isinstance(label, Mapping):
        cls = _scalar_class(label)
        match = _R_CLASS_SYNONYMS.get(cls, {cls})
        label = {c: label for c in by_cols if col_class[c] in match}
    else:
        by_keys = {k: v for k, v in label.items() if k in by_cols}
        class_keys = {k: v for k, v in label.items() if k not in by_cols}
        bad = [
            k for k in class_keys
            if k not in _R_CLASS_SYNONYMS
            and k not in set(col_class.values())
        ]
        if bad:
            raise ValueError(
                "label= keys must be grouping columns or classes of "
                f"grouping columns; invalid: {sorted(bad)}"
            )
        for c, v in by_keys.items():
            want = _R_CLASS_SYNONYMS.get(col_class[c], {col_class[c]})
            if _scalar_class(v) not in want:
                raise ValueError(
                    f"label for column {c!r} has class "
                    f"{_scalar_class(v)!r}, column is {col_class[c]!r}"
                )
        expanded = dict(by_keys)
        for k, v in class_keys.items():
            match = _R_CLASS_SYNONYMS.get(k, {k})
            for c in by_cols:
                if c not in expanded and col_class[c] in match:
                    expanded[c] = v
        label = expanded
    if not label:
        return [], lambda df: df
    hidden = [F.grouping(F.col(c)).alias(f"__g_{c}__") for c in label]

    def apply(df):
        for c, v in label.items():
            df = df.withColumn(
                c,
                F.when(F.col(f"__g_{c}__") == 1, F.lit(v)).otherwise(F.col(c)),
            )
        return df.drop(*[f"__g_{c}__" for c in label])

    return hidden, apply


def groupingsets(
    dt: DT,
    sets: Sequence[Sequence[str]],
    j: Mapping[str, Column],
    id_col: str | None = None,
    label=None,
) -> DT:
    """groupingsets.data.table (reference R/groupingsets.R:44-172).

    The reference loops per-set aggregations and rbinds
    (R/groupingsets.R:154); Spark has native GROUPING SETS — one pass,
    partial aggregation shared across sets.
    """
    all_cols: list[str] = []
    for s in sets:  # first-occurrence order — grouping_id bit order must
        for c in s:  # match the caller's column order, not a sort
            if c not in all_cols:
                all_cols.append(c)
    gdf = dt.df.groupingSets([list(s) for s in sets], *[F.col(c) for c in all_cols])
    exprs = [v.alias(k) for k, v in j.items()]
    if id_col:
        exprs = [F.grouping_id(*[F.col(c) for c in all_cols]).alias(id_col)] + exprs
    hidden, relabel = _label_plan(dt.df, all_cols, label)
    return DT(relabel(gdf.agg(*exprs, *hidden)))


def rollup(dt: DT, by: Sequence[str], j: Mapping[str, Column], id_col=None, label=None) -> DT:
    """rollup (reference R/groupingsets.R:4) → native df.rollup."""
    by = _namelist(by)
    exprs = [v.alias(k) for k, v in j.items()]
    if id_col:
        exprs = [F.grouping_id(*[F.col(c) for c in by]).alias(id_col)] + exprs
    hidden, relabel = _label_plan(dt.df, by, label)
    return DT(relabel(dt.df.rollup(*by).agg(*exprs, *hidden)))


def cube(dt: DT, by: Sequence[str], j: Mapping[str, Column], id_col=None, label=None) -> DT:
    """cube (reference R/groupingsets.R:22) → native df.cube."""
    by = _namelist(by)
    exprs = [v.alias(k) for k, v in j.items()]
    if id_col:
        exprs = [F.grouping_id(*[F.col(c) for c in by]).alias(id_col)] + exprs
    hidden, relabel = _label_plan(dt.df, by, label)
    return DT(relabel(dt.df.cube(*by).agg(*exprs, *hidden)))


def _pandas_sort(pdf, order):
    """Sort a per-group pandas frame by an order list: '-' prefix =
    descending, null placement from the list's na_last flag (forder
    default first) — the pandas half of _order_exprs' contract (NaN/NA
    are one class in pandas, so the two-level key collapses)."""
    names = [c[1:] if c.startswith("-") else c for c in order]
    asc = [not c.startswith("-") for c in order]
    keep = [(n, a) for n, a in zip(names, asc) if n in pdf.columns]
    if not keep:
        return pdf
    return pdf.sort_values(
        [n for n, _ in keep], ascending=[a for _, a in keep],
        kind="mergesort",
        na_position="last" if getattr(order, "na_last", False) else "first",
    )


def _arrow_sort(tbl, order):
    """Arrow twin of _pandas_sort (pyarrow sort_by keys +
    null_placement)."""
    keys = [
        ((c[1:], "descending") if c.startswith("-") else (c, "ascending"))
        for c in order
    ]
    keys = [(n, d) for n, d in keys if n in tbl.column_names]
    if not keys:
        return tbl
    return tbl.sort_by(
        keys,
        null_placement=(
            "at_end" if getattr(order, "na_last", False) else "at_start"
        ),
    )



def dogroups(
    dt: DT,
    by,
    fn: Callable,
    schema,
    order=None,
) -> DT:
    """Generic per-group j — the dogroups path (reference src/dogroups.c:76):
    an arbitrary function of the group's .SD returning any number of rows
    (scalar UDAF, multi-row UDTF, or table).

    Spark: groupBy().applyInPandas — Arrow-batched, one pandas DataFrame
    per group, the vectorized upgrade of the reference's per-group R eval
    (its main scalability cliff, SURVEY §3.1). The group's rows arrive
    sorted by the DT's declared order so order-sensitive j logic matches.
    """
    by = _namelist(by)
    order = _namelist(order) or dt.order_by

    def wrapped(pdf):
        if order:
            pdf = _pandas_sort(pdf, order)
        return fn(pdf)

    return DT(dt.df.groupBy(*by).applyInPandas(wrapped, schema=schema))


def dogroups_arrow(
    dt: DT,
    by,
    fn: Callable,
    schema,
    order=None,
) -> DT:
    """Arrow-native dogroups twin (Spark 4 ``applyInArrow``): the group
    arrives as a ``pyarrow.Table`` and ``fn`` returns one — skipping
    the Arrow→pandas→Arrow conversion ``applyInPandas`` pays on both
    edges. Prefer this for j-functions expressible in pyarrow.compute
    (or that feed Arrow-native libraries); keep the pandas form for
    numpy/pandas-idiom logic. Same contract: rows arrive sorted by the
    declared order, output schema is explicit."""
    by = _namelist(by)
    order = _namelist(order) or dt.order_by

    def wrapped(tbl):
        if order:
            tbl = _arrow_sort(tbl, order)
        return fn(tbl)

    return DT(dt.df.groupBy(*by).applyInArrow(wrapped, schema=schema))


def salted_agg(
    dt: DT,
    by,
    sums: Mapping[str, Column] | None = None,
    count_name: str = "n",
    n_salts: int = 16,
) -> DT:
    """Two-phase salted aggregation for skewed group keys (SURVEY §4.2:
    the reference's OpenMP threads share one memory — skew is free
    there; on a cluster a hot key funnels to one reducer).

    Phase 1 groups by (key, salt) where salt = pmod(xxhash64(all cols'
    monotonic row id surrogate), n_salts) — here a cheap deterministic
    spread via spark_partition_id — so a hot key splits across n_salts
    reducers; phase 2 re-aggregates the partials by key alone. Only
    algebraic aggregates (sum/count → also mean) decompose this way.

    AQE's skew-join handles JOIN skew automatically; this is the GROUPBY
    skew tool."""
    by = _namelist(by)
    sums = dict(sums or {})
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    ).alias("__salt__")
    phase1 = (
        dt.df.select("*", salt)
        .groupBy(*by, "__salt__")
        .agg(
            *[v.alias(k) for k, v in sums.items()],
            F.count(F.lit(1)).alias("__cnt__"),
        )
    )
    phase2 = phase1.groupBy(*by).agg(
        *[F.sum(F.col(k)).alias(k) for k in sums],
        F.sum("__cnt__").alias(count_name),
    )
    return DT(phase2, key=list(by))


def cogroup_apply(
    x: DT, y: DT, by: Sequence[str], fn, schema: str,
    order_x=None, order_y=None,
) -> DT:
    """Co-grouped map (groupBy().cogroup().applyInPandas): `fn(key,
    x_pdf, y_pdf) -> pdf` sees BOTH tables' rows for each key — the
    two-table generalization of dogroups (reference dogroups.c runs one
    table per group; data.table users express this as X[Y, j, by=.EACHI]
    with .SD on both sides). Arrow-batched; one co-partitioned shuffle
    of each side."""
    by = _namelist(by)
    ox = _namelist(order_x) or x.order_by
    oy = _namelist(order_y) or y.order_by

    def wrapped(key, xp, yp):
        if ox:
            xp = _pandas_sort(xp, ox)
        if oy:
            yp = _pandas_sort(yp, oy)
        return fn(key, xp, yp)

    cg = x.df.groupBy(*by).cogroup(y.df.groupBy(*by))
    return DT(cg.applyInPandas(wrapped, schema=schema))


def cogroup_apply_arrow(
    x: DT, y: DT, by: Sequence[str], fn, schema: str,
    order_x=None, order_y=None,
) -> DT:
    """Arrow-native co-grouped map (cogroup().applyInArrow): `fn(key,
    x_tbl, y_tbl) -> pyarrow.Table` — the two-table twin of
    dogroups_arrow, skipping both sides' Arrow↔pandas conversions.
    Same contract as cogroup_apply: each side's rows arrive sorted by
    its declared order, output schema is explicit (applyInArrow does
    not auto-widen types — match it exactly)."""
    by = _namelist(by)
    ox = _namelist(order_x) or x.order_by
    oy = _namelist(order_y) or y.order_by

    def wrapped(key, xt, yt):
        if ox:
            xt = _arrow_sort(xt, ox)
        if oy:
            yt = _arrow_sort(yt, oy)
        return fn(key, xt, yt)

    cg = x.df.groupBy(*by).cogroup(y.df.groupBy(*by))
    return DT(cg.applyInArrow(wrapped, schema=schema))
