"""Reshape operators (SURVEY §2.8): dcast, melt, transpose, tstrsplit,
rbindlist, cbindlist, split.

Reference: dcast /root/reference/R/fcast.R:11 (+ src/fcast.c:7), melt
/root/reference/R/fmelt.R:6 (+ src/fmelt.c:785), rbindlist
/root/reference/src/rbindlist.c:5, transpose /root/reference/src/transpose.c:5.

Spark-first: dcast → groupBy().pivot() (explicit value list keeps the plan
one-pass and deterministic — without it Spark runs an extra distinct job);
melt → native unpivot; rbindlist → unionByName(allowMissingColumns).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core import DT, _namelist, _ocol, _order_exprs

__all__ = [
    "dcast",
    "melt",
    "melt_multi",
    "transpose",
    "transpose_distributed",
    "tstrsplit",
    "rbindlist",
    "cbindlist",
    "split_table",
    "measure_sep",
]


def dcast(
    dt: DT,
    rowvars: Sequence[str],
    colvar: str,
    value_var: str | Sequence[str],
    fun_agg: Mapping[str, Column] | None = None,
    pivot_values: Sequence[str] | None = None,
    fill=None,
    sep: str = "_",
    drop: bool | tuple[bool, bool] = True,
    margins: bool | Sequence[str] | None = None,
) -> DT:
    """dcast — long→wide pivot (reference R/fcast.R:11,126-253).

    ``fun_agg``: {suffix: aggregate-builder Column over value_var};
    default = the reference's fun.aggregate=NULL rule (first of a
    unique cell; length() with a warning when combinations duplicate).
    ``pivot_values``: pass the expected spread values to keep the plan
    single-pass (else Spark runs a distinct job first) and the output
    schema deterministic — matters at 100 TB.

    ``colvar`` may be a LIST of columns (the reference's multi-RHS
    formula ``a ~ b + c``, tests.Rraw 1102.188): the spread columns
    are the observed combinations named ``b<sep>c`` (values joined by
    ``sep``, NA printed "NA" like the reference's composite level
    labels); the pivot runs on ONE derived composite string column, so
    the plan stays a single groupBy+pivot.

    ``drop``: (rows, cols) like the reference's 2-vector
    (R/fcast.R:127,217-226). ``drop[0]=False`` emits every combination
    of the rowvars' observed levels (reference ``cj_uniq``): per-column
    distinct frames (tiny) cross-joined, then left-joined to the
    aggregate — the CJ side is broadcast-able so no extra big-table
    shuffle. ``drop[1]=False`` (all colvar levels as columns) is
    ``pivot_values``: Spark has no factor levels, so the full level set
    must be passed explicitly; observed-only equals ``drop=True``.
    """
    drop_rows, _drop_cols = (drop, drop) if isinstance(drop, bool) else drop
    rowvars = _namelist(rowvars)
    df = dt.df
    if not isinstance(colvar, str):
        # multi-RHS formula: pivot one composite label column
        # (reference pastes the RHS combination with sep — R/fcast.R
        # value_vars naming; NA prints "NA" in the level label)
        parts = _namelist(colvar)
        composite = F.concat_ws(
            sep, *[
                F.coalesce(F.col(c).cast("string"), F.lit("NA"))
                for c in parts
            ]
        )
        df = df.withColumn("__dcast_col__", composite)
        colvar = "__dcast_col__"
    if margins:
        # Subtotal rows — reference declares margins= but marks it "Not
        # implemented yet" (man/dcast.data.table.Rd:25); semantics follow
        # reshape2::dcast, the reference's stated model. margins=True ->
        # every rollup level of rowvars (incl. grand total); a list of
        # rowvar names -> per name, the level collapsing that var and all
        # subsequent rowvars. Collapsed rowvars show "(all)". Implemented
        # as union-with-rollup of the PIVOT INPUT: each level replicates
        # the input with collapsed rowvars relabeled, then ONE
        # groupBy+pivot aggregates all levels — one shuffle, any
        # aggregate valid (subtotals aggregate raw rows, never
        # totals-of-totals). Replication = #levels, the inherent price
        # of subtotals (GROUPING SETS replicates identically).
        if margins is True:
            cut_points = list(range(len(rowvars)))
        else:
            cut_points = sorted({rowvars.index(m) for m in _namelist(margins)})
        cut_points = [c for c in cut_points if c < len(rowvars)]
        # ONE scan: row-local explode of per-level rowvar structs (the
        # same Expand encoding Spark's native ROLLUP uses) — a union of
        # relabeled replicas would scan the input once per level.
        # rowvars coerce to string ("(all)" must share the type —
        # reshape2 likewise coerces margined factors to character)
        levels = [
            F.struct(*[F.col(v).cast("string").alias(v) for v in rowvars])
        ] + [
            F.struct(
                *[
                    (F.lit("(all)") if i >= cut else F.col(v).cast("string")).alias(v)
                    for i, v in enumerate(rowvars)
                ]
            )
            for cut in cut_points
        ]
        rest = [c for c in df.columns if c not in rowvars]
        df = df.select(
            *rest, F.explode(F.array(*levels)).alias("__lvl__")
        ).select(*[F.col(f"__lvl__.{v}").alias(v) for v in rowvars], *rest)
    gb = df.groupBy(*rowvars)
    piv = gb.pivot(colvar, list(pivot_values) if pivot_values is not None else None)
    if fun_agg is None:
        # reference default (R/fcast.R:181): fun.aggregate=NULL with
        # duplicate row/column combinations warns and defaults to
        # length(); unique combinations take the value itself (first
        # of one). One bounded probe, only when fun_agg is omitted.
        has_dups = (
            df.groupBy(*rowvars, colvar).count()
            .filter(F.col("count") > 1).limit(1).count() > 0
        )
        if has_dups:
            import warnings

            warnings.warn(
                "'fun_agg' is None, but found duplicate row/column "
                "combinations, so defaulting to length() (count). The "
                "formula variables do not uniquely identify rows; pass "
                "fun_agg= to choose the representative value "
                "(reference R/fcast.R:181).",
                RuntimeWarning,
                stacklevel=2,
            )
            # length() counts ROWS (count(1), not count(col): NULL
            # values still count); empty cells take length(empty) = 0
            # — the reference's fill default is fun(emptyvector)
            out = piv.agg(F.count(F.lit(1)))
            if fill is None:
                fill = 0
        else:
            out = piv.agg(F.first(value_var))
    elif len(fun_agg) == 1:
        ((_, expr),) = fun_agg.items()
        out = piv.agg(expr)
    else:
        out = piv.agg(*[e.alias(name) for name, e in fun_agg.items()])
    if not drop_rows:
        frames = [df.select(v).distinct() for v in rowvars]
        cj = reduce(lambda a, b: a.crossJoin(b), frames)
        out = cj.join(out, rowvars, "left")
    if fill is not None:
        out = out.na.fill(fill, subset=[c for c in out.columns if c not in rowvars])
    return DT(out, key=rowvars)


def melt(
    dt: DT,
    id_vars: Sequence[str],
    measure_vars: Sequence[str],
    variable_name: str = "variable",
    value_name: str = "value",
    na_rm: bool = False,
) -> DT:
    """melt — wide→long (reference R/fmelt.R:6, src/fmelt.c:785) → native
    unpivot (no shuffle: row-local expansion)."""
    out = dt.df.unpivot(
        [F.col(c) for c in _namelist(id_vars)],
        [F.col(c) for c in _namelist(measure_vars)],
        variable_name,
        value_name,
    )
    if na_rm:
        out = out.filter(F.col(value_name).isNotNull())
    return DT(out)


def melt_multi(
    dt: DT,
    id_vars: Sequence[str],
    measure_groups: Mapping[str, Sequence[str]],
    variable_name: str = "variable",
    na_rm: bool = False,
) -> DT:
    """Multi-measure-group melt — melt(measure=list(...)) / measure(sep=)
    (reference R/fmelt.R:32-124): several column groups melt in lockstep
    into one value column per group, aligned by position.

    Implemented as a row-local posexplode over zipped struct arrays —
    no shuffle, no driver collect.
    """
    id_vars = _namelist(id_vars)
    names = list(measure_groups.keys())
    groups = [_namelist(v) for v in measure_groups.values()]
    width = len(groups[0])
    if any(len(g) != width for g in groups):
        raise ValueError("measure groups must have equal length")
    arr = F.array(*[
        F.struct(
            F.lit(i + 1).alias("__pos__"),
            *[F.col(g[i]).alias(names[k]) for k, g in enumerate(groups)],
        )
        for i in range(width)
    ])
    out = (
        dt.df.withColumn("__m__", F.explode(arr))
        .select(
            *id_vars,
            F.col("__m__.__pos__").alias(variable_name),
            *[F.col(f"__m__.{n}").alias(n) for n in names],
        )
    )
    if na_rm:
        pred = reduce(lambda l, r: l | r, [F.col(n).isNotNull() for n in names])
        out = out.filter(pred)
    return DT(out)


def transpose(dt: DT, spark=None) -> DT:
    """transpose (reference src/transpose.c:5) — rows↔cols is inherently
    driver-side (the result schema depends on the data); restricted to
    small tables, like the reference's in-memory use. For tables whose
    CELLS are too big to collect (but whose row count is still a legal
    column count), use :func:`transpose_distributed`."""
    import pandas as pd

    pdf = dt.df.toPandas().T.reset_index()
    pdf.columns = ["column"] + [f"V{i+1}" for i in range(len(pdf.columns) - 1)]
    spark = spark or dt.df.sparkSession
    return DT(spark.createDataFrame(pdf.astype(str)))


def transpose_distributed(dt: DT, order=None) -> DT:
    """Medium-table transpose (reference src/transpose.c:5 semantics)
    with NO driver collect of cell data — removes the `transpose`
    cliff for tables where nrow (= output ncol) is bounded (Spark's
    practical column limit, ~10k) but nrow*ncol cells exceed what the
    driver should hold.

    Plan: (1) the output column for each input row is its 1-based rank
    in `order` (must be a unique key — verified); the rank map is built
    from a projection of ONLY the order columns, so the single-task
    global sort never carries payload, and joins back as a broadcast;
    (2) melt every column to (rn, column, val-as-string) via stack —
    row-local; (3) groupBy(column) + ONE collect_list(struct(rn,val))
    aggregate, array_sort'd, then a flat element_at projection to
    V1..Vn. (A pivot over n values would emit n aggregate expressions
    — measured pathological past ~2k columns — whereas one array agg +
    n simple projections codegens in seconds at the 10k cap.) One
    shuffle keyed by output row; each output row holds n cells, which
    is exactly the per-row width any n-column result needs anyway.
    Output matches `transpose`: (column, V1..Vn), all strings.
    """
    df = dt.df
    order_cols = _namelist(order) or list(dt.order_by or ()) or list(dt.key or ())
    if not order_cols:
        raise ValueError(
            "transpose_distributed needs a deterministic row order: pass "
            "order= or set a key/order_by on the DT (output columns are "
            "positional — SURVEY §2.8, Spark DataFrames are unordered)"
        )
    # r14 optimization: the two guard actions (count() then
    # distinct().count()) each re-executed the input subtree; one
    # combined aggregate answers both. (A variant that also collected
    # the <=10k keys and joined them back as a local relation was
    # measured SLOWER at bench scale — 1.16x, driver round-trip and
    # local-relation setup outweigh one tiny subtree re-run — so the
    # rank map stays a lazy broadcast branch.)
    row = (
        df.select(*order_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # distinct over a STRUCT of the keys: count(distinct a, b)
            # would skip rows with a null key column, but the old
            # distinct().count() guard counted them — struct-wrapping
            # preserves that (a struct itself is never null)
            F.count_distinct(
                F.struct(*[F.col(c) for c in order_cols])
            ).alias("nd"),
        )
        .first()
    )
    n = row["n"]
    if n > 10_000:
        raise ValueError(
            f"transpose of {n} rows would create {n} output columns; "
            "Spark's columnar plans degrade past ~10k columns — reshape "
            "with melt instead (SURVEY §2.8)"
        )
    if row["nd"] != n:
        raise ValueError("transpose_distributed order= must be a unique key")
    from pyspark.sql import Window

    rank_map = df.select(*order_cols).withColumn(
        "__rn__", F.row_number().over(Window.orderBy(*[F.col(c) for c in order_cols]))
    )
    with_rn = df.join(F.broadcast(rank_map), on=order_cols)
    cols = [c for c in df.columns]
    stack_expr = "stack({}, {}) as (column, val)".format(
        len(cols),
        ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols),
    )
    cells = with_rn.select(F.col("__rn__"), F.expr(stack_expr))
    packed = cells.groupBy("column").agg(
        F.array_sort(F.collect_list(F.struct("__rn__", "val"))).alias("__arr__")
    )
    out = packed.select(
        "column",
        *[F.element_at("__arr__", i)["val"].alias(f"V{i}") for i in range(1, n + 1)],
    )
    return DT(out)


def tstrsplit(
    dt: DT,
    col: str,
    sep: str,
    names: Sequence[str] | bool = True,
    keep: Sequence[int] | None = None,
    fixed: bool = True,
    fill=None,
    type_convert=False,
    n_parts: int | None = None,
    drop_source: bool = True,
    rev: bool = False,
) -> DT:
    """tstrsplit — split a string column into typed columns (reference
    R/transpose.R:26-77, src/transpose.c). Row-local; no shuffle.

    Reference argument contracts (tests.Rraw 1507, 1571, 2203):

    - ``names=True`` auto-names the parts V1..Vn (1571.1); a name list
      must match the number of KEPT parts (1571.3/.6 "is not equal
      to"); anything else raises (1571.7/2074.30).
    - ``keep=`` selects 1-based PART positions (1571.4); positions
      outside 1..n_parts raise (1571.5 "should contain integer").
    - ``fill=`` substitutes missing trailing parts (reference fill=NA
      default = NULL here).
    - ``type_convert=True`` auto-casts each part like R type.convert
      (2203.02: numeric-looking parts become numbers); a dict
      {position: cast} applies per-part casts (the 2203.06 list form),
      where cast is a Spark type string or a Column->Column callable
      (2203.03 function form applies to every part via a plain
      callable).

    The part COUNT for names=True / keep validation comes from
    ``n_parts`` when given, else one bounded probe over the column
    (max parts; cached nowhere — pass n_parts on hot paths).
    ``drop_source=False`` keeps the source column (this library's
    pre-r11 ``keep=`` flag, renamed to free ``keep`` for the
    reference's meaning)."""
    import re as _re

    if not isinstance(rev, bool):
        raise ValueError("'rev' must be TRUE or FALSE.")
    pat = _re.escape(sep) if fixed else sep
    parts = F.split(F.col(col), pat)
    if rev:
        # rev=TRUE (reference #7694 sibling, tests.Rraw 2380): parts
        # align from the END — part 1 is the LAST component, shorter
        # rows get NA at the deep positions
        parts = F.reverse(parts)

    if n_parts is None:
        # the reference scans to learn the part count (transpose of
        # strsplit); pass n_parts= to skip the probe on hot paths
        n_parts = (
            dt.df.select(
                F.max(F.size(F.split(F.col(col), pat))).alias("n")
            ).collect()[0]["n"]
            or 0
        )
    if keep is not None:
        keep = [int(k) for k in keep]
        if any(k < 1 or k > n_parts for k in keep):
            raise ValueError(
                "'keep' should contain integer values between 1 and "
                f"{n_parts} (max number of parts)"
            )
        positions = keep
    else:
        positions = list(range(1, n_parts + 1))
    if names is True:
        out_names = [f"V{p}" for p in positions]
    elif names is False:
        out_names = [f"V{p}" for p in positions]
    elif isinstance(names, (list, tuple)):
        if len(names) != len(positions):
            raise ValueError(
                f"length of 'names' ({len(names)}) is not equal to the "
                f"number of kept parts ({len(positions)})"
            )
        out_names = list(names)
    else:
        raise ValueError("'names' must be TRUE/FALSE or a character vector")

    auto_numeric: set[int] = set()
    if type_convert is True and positions:
        # R type.convert converts a part to numeric only when EVERY
        # non-missing value parses (2203.02: "Yes"/"No" stays string,
        # "1"/"5" -> int, "2"/"3.5" -> double); one bounded probe
        # decides per kept part
        probe = dt.df.select(
            *[
                F.sum(
                    F.when(
                        F.get(parts, p - 1).isNotNull()
                        & F.get(parts, p - 1).try_cast("double").isNull(),
                        1,
                    ).otherwise(0)
                ).alias(f"p{p}")
                for p in positions
            ]
        ).collect()[0]
        auto_numeric = {p for p in positions if (probe[f"p{p}"] or 0) == 0}

    def _cast(expr, pos):
        if type_convert is False or type_convert is None:
            return expr
        if type_convert is True:
            return expr.try_cast("double") if pos in auto_numeric else expr
        if callable(type_convert):
            return type_convert(expr)
        if isinstance(type_convert, dict):
            c = type_convert.get(pos)
            if c is None:
                return expr
            return c(expr) if callable(c) else expr.cast(c)
        raise ValueError("bad type_convert")

    new = {}
    for name, pos in zip(out_names, positions):
        # F.get (not getItem): a row with fewer parts yields NULL under
        # ANSI mode instead of INVALID_ARRAY_INDEX (reference fill=NA)
        e = F.get(parts, pos - 1)
        if fill is not None:
            e = F.coalesce(e, F.lit(fill))
        new[name] = _cast(e, pos)
    df = dt.df.withColumns(new)
    if drop_source:
        df = df.drop(col)
    return DT(df, key=dt.key, order_by=dt.order_by)


#: reference rbindlist type-promotion ladder (src/rbindlist.c
#: coerceColumns; factor maps to string here): logical < integer <
#: integer64 < double < character. Date/timestamp promote to each
#: other (timestamp wins) or to character against a string.
_RBIND_RANK = {
    "boolean": 0, "tinyint": 1, "smallint": 1, "int": 1, "bigint": 2,
    "float": 3, "double": 3, "string": 4, "date": 10, "timestamp": 11,
    "timestamp_ntz": 11,
}


def _rbind_common_type(types: list[str]) -> str:
    """Per-column common type for rbindlist (reference promotion):
    highest rank wins; date+timestamp → timestamp; temporal+string →
    string; anything outside the ladder must match exactly."""
    uniq = sorted(set(types))
    if len(uniq) == 1:
        return uniq[0]
    if any(t not in _RBIND_RANK for t in uniq):
        raise ValueError(
            f"rbindlist: column types {uniq} cannot be bound (no "
            "common type in the promotion ladder)"
        )
    temporal = [t for t in uniq if _RBIND_RANK[t] >= 10]
    plain = [t for t in uniq if _RBIND_RANK[t] < 10]
    if temporal and plain:
        if all(p == "string" for p in plain):
            return "string"  # reference: Date+character → character
        raise ValueError(
            f"rbindlist: column types {uniq} cannot be bound "
            "(temporal vs non-string)"
        )
    if temporal:
        return max(temporal, key=lambda t: _RBIND_RANK[t])
    winner = max(plain, key=lambda t: _RBIND_RANK[t])
    if winner == "float" and any(_RBIND_RANK[t] <= 2 for t in plain):
        # float32's 24-bit mantissa cannot hold int32/int64 exactly; the
        # reference promotes integer/integer64 vs any floating to double
        # (src/rbindlist.c coerceColumns — R has no float32).
        return "double"
    return winner


def rbindlist(
    tables: Sequence[DT],
    use_names: bool = True,
    fill: bool = False,
    idcol: str | None = None,
) -> DT:
    """rbindlist (reference src/rbindlist.c:5) → unionByName; idcol= adds
    the 1-based source table index.

    Column TYPE promotion follows the reference ladder (logical <
    integer < integer64 < double < character; factor arrives as
    string — tests.Rraw 984/985: factor+character binds to one string
    column) instead of Spark's positional ANSI union coercion, which
    would cast a string side to BIGINT and throw CAST_INVALID_INPUT at
    runtime on non-numeric strings. Casts are applied per column
    BEFORE the union, so the plan stays a zero-shuffle row-local
    union."""
    dfs = []
    for i, t in enumerate(tables):
        df = t.df
        if idcol:
            df = df.select(F.lit(i + 1).alias(idcol), *[F.col(c) for c in df.columns])
        dfs.append(df)
    # reference type promotion per output column name (by-name mode)
    # or position (use_names=False)
    if use_names:
        targets: dict[str, list[str]] = {}
        for df in dfs:
            for c, typ in df.dtypes:
                targets.setdefault(c, []).append(typ)
        common = {c: _rbind_common_type(ts) for c, ts in targets.items()}
        dfs = [
            df if all(t == common[c] for c, t in df.dtypes)
            else df.select(*[
                F.col(c).cast(common[c]).alias(c)
                if dict(df.dtypes)[c] != common[c] else F.col(c)
                for c in df.columns
            ])
            for df in dfs
        ]
        out = reduce(lambda l, r: l.unionByName(r, allowMissingColumns=fill), dfs)
    else:
        ncols = {len(df.columns) for df in dfs}
        if len(ncols) > 1:
            raise ValueError(
                "rbindlist(use_names=False): tables differ in column "
                f"count {sorted(ncols)}"
            )
        n = ncols.pop()
        common_pos = [
            _rbind_common_type([df.dtypes[j][1] for df in dfs])
            for j in range(n)
        ]
        dfs = [
            df if all(df.dtypes[j][1] == common_pos[j] for j in range(n))
            else df.select(*[
                F.col(df.columns[j]).cast(common_pos[j]).alias(df.columns[j])
                if df.dtypes[j][1] != common_pos[j]
                else F.col(df.columns[j])
                for j in range(n)
            ])
            for df in dfs
        ]
        out = reduce(lambda l, r: l.union(r), dfs)
    return DT(out)


def cbindlist(tables: Sequence[DT], on: Sequence[str] | None = None) -> DT:
    """cbindlist (reference R/mergelist.R:1-12, src Ccbindlist).

    With ``on`` (or a key on the first table): the SCALE path — the
    bind compiles to key joins, co-partitionable and broadcastable.

    Without ``on``: the reference's positional column-bind. Spark rows
    have no position (SURVEY §2.8), so each table gets a row_number —
    over its DECLARED order when it has one (deterministic), else over
    its current physical order with a RuntimeWarning: a plan containing
    a shuffle (e.g. a groupBy result) has no stable physical order, so
    unordered alignment is nondeterministic across runs (round-12
    ADVICE fix). Single-reducer window either way — documented
    small/medium-table path; keyed binds use ``on``.
    Reference contracts ported (mergelist.Rraw 11-13): zero-column
    tables are skipped; unequal row counts raise (recycling is
    unimplemented in the reference too, 12.13-12.16); duplicated
    output names are allowed but wipe key/index metadata; the first
    surviving key is retained and index names concatenate.

    setcbindlist is an alias (immutable frames)."""
    if isinstance(tables, (DT, DataFrame)) or not isinstance(
        tables, (list, tuple)
    ):
        raise ValueError("'l' must be a list")
    for i, t in enumerate(tables):
        if not isinstance(t, DT):
            raise ValueError(f"Element {i + 1} of 'l' is not a data.table")
    if on is not None:
        if not tables:
            raise ValueError("empty list")
        on = _namelist(on)
        acc = tables[0].df
        for t in tables[1:]:
            acc = acc.join(t.df, on=on, how="inner")
        return DT(acc, key=list(on))
    live = [t for t in tables if t.columns]  # 0-col tables skipped (11.05)
    if not live:
        from pyspark.sql import SparkSession
        from pyspark.sql.types import StructType

        spark = SparkSession.getActiveSession()
        if spark is None:  # pragma: no cover
            raise ValueError("empty list and no active SparkSession")
        return DT(spark.createDataFrame([], StructType([])))
    counts = [t.df.count() for t in live]
    if len(set(counts)) > 1:
        raise ValueError(
            "cbindlist: tables have to have the same number of rows "
            f"({counts}); recycling is not yet implemented"
        )
    pos_w = Window.orderBy(F.monotonically_increasing_id())
    if any(not t.order_by for t in live):
        import warnings

        warnings.warn(
            "cbindlist positional bind: input table(s) without a "
            "declared order align by physical order, which is "
            "nondeterministic when the plan contains a shuffle; "
            "declare order_by on every input (or bind with on=) for a "
            "reproducible result",
            RuntimeWarning,
            stacklevel=2,
        )
    acc = None
    out_cols: list = []
    for i, t in enumerate(live):
        w_i = (
            Window.orderBy(*_order_exprs(t.df, t.order_by))
            if t.order_by
            else pos_w
        )
        tagged = t.df.withColumn(
            f"__pos{i}__", F.row_number().over(w_i)
        ).alias(f"__c{i}__")
        out_cols += [F.col(f"__c{i}__.`{c}`") for c in t.columns]
        if acc is None:
            acc = tagged
        else:
            acc = acc.join(
                tagged,
                F.col("__pos0__") == F.col(f"__pos{i}__"),
                "inner",
            )
    out = acc.select(*out_cols)
    names = [c for t in live for c in t.columns]
    if len(set(names)) != len(names):
        return DT(out)  # duplicate names wipe key/index (cbindlist_impl_)
    key = next((list(t.key) for t in live if t.key), None)
    res = DT(out, key=key)
    res.index_names = [ix for t in live for ix in t.index_names]
    return res


#: in-place variant alias (reference R/mergelist.R:12 setcbindlist)
setcbindlist = cbindlist


def split_table(
    dt: DT,
    by: Sequence[str],
    values: Sequence | None = None,
    sorted_: bool = False,
    keep_by: bool = True,
    flatten: bool = True,
    sep: str = ".",
) -> dict:
    """split.data.table (reference R/data.table.R:2684-2770): a dict of
    filtered DTs — lazy views, not materialized copies. For write-out the
    scalable path is df.write.partitionBy(by).

    Reference contracts (round-12 completion):
    - ``values=None`` derives the observed level combinations with one
      distinct job (driver-bound by the number of GROUPS, not rows —
      the same cardinality the reference's result list has; pass
      ``values=`` on hot paths to skip the job);
    - ``sorted_`` orders the dict by key (reference sorted=TRUE;
      insertion order is the dict order in Python);
    - ``keep_by=False`` drops the split columns from each part
      (reference keep.by=FALSE);
    - multi-column ``by`` with ``flatten=True`` (reference default)
      keys the flat dict by the sep-joined combination ("a.1"); with
      ``flatten=False`` returns nested dicts, one level per by column.
    """
    by = _namelist(by)
    if values is None:
        rows = dt.df.select(*by).distinct().collect()
        values = [
            tuple(r[c] for c in by) if len(by) > 1 else r[by[0]]
            for r in rows
        ]
    if sorted_:
        values = sorted(values, key=lambda v: tuple(
            (x is None, x) for x in (v if isinstance(v, tuple) else (v,))
        ))
    if not flatten and len(by) > 1:
        # nested: split on the first column, recurse on the rest
        firsts = []
        for v in values:
            f0 = v[0] if isinstance(v, (list, tuple)) else v
            if f0 not in firsts:
                firsts.append(f0)
        out = {}
        for f0 in firsts:
            subdf = dt.df.filter(F.col(by[0]).eqNullSafe(F.lit(f0)))
            order_by = dt.order_by
            if not keep_by:
                # keep.by=FALSE drops EVERY split column; this level's
                # column goes here, the rest at deeper levels — so a
                # declared order naming ANY split column is pruned now
                # (the leaf parts can't resolve it; ADVICE r12)
                subdf = subdf.drop(by[0])
                if order_by and any(
                    (c[1:] if c.startswith("-") else c) in by
                    for c in order_by
                ):
                    order_by = None
            sub = DT(
                subdf,
                key=dt.key if keep_by else None,
                order_by=order_by,
            )
            out[f0] = split_table(
                sub, by[1:],
                values=[v[1:] if len(v) > 2 else v[1]
                        for v in values
                        if (v[0] if isinstance(v, (list, tuple)) else v) == f0],
                sorted_=sorted_, keep_by=keep_by, flatten=False, sep=sep,
            )
        return out
    out = {}
    for v in values:
        vals = list(v) if isinstance(v, (list, tuple)) else [v]
        pred = reduce(
            lambda l, r: l & r,
            [F.col(c).eqNullSafe(F.lit(x)) for c, x in zip(by, vals)],
        )
        part = dt.df.filter(pred)
        order_by = dt.order_by
        if not keep_by:
            part = part.drop(*by)
            if order_by and any(
                (c[1:] if c.startswith("-") else c) in by for c in order_by
            ):
                order_by = None
        key = (
            sep.join("NA" if x is None else str(x) for x in vals)
            if len(by) > 1
            else (vals[0])
        )
        out[key] = DT(part, key=dt.key if keep_by else None,
                      order_by=order_by)
    return out


def rowwiseDT(spark, columns: Sequence[str], *rows) -> DT:
    """rowwiseDT (reference R/rowwiseDT.R:1-31): row-wise literal table
    constructor -> spark.createDataFrame."""
    return DT(spark.createDataFrame([tuple(r) for r in rows], list(columns)))


def _suffix_groups(
    pairs: "Sequence[tuple[str, str, str]]",
) -> dict[str, list[str]]:
    """Shared tail of the measure() selectors: group (stem, suffix,
    column) triples by stem, order members by suffix (numeric when the
    suffix parses as an int; a missing suffix sorts like a non-numeric
    one), and drop single-member stems (the reference requires >1
    measure per group — they stay id vars)."""
    groups: dict[str, list[tuple[str, str]]] = {}
    for stem, idx, col in pairs:
        groups.setdefault(stem, []).append((idx, col))

    def keyf(t):
        try:
            return (0, int(t[0]), t[0])
        except (ValueError, TypeError):
            return (1, 0, t[0] or "")

    return {
        stem: [c for _, c in sorted(v, key=keyf)]
        for stem, v in groups.items()
        if len(v) > 1
    }


def measure_sep(
    columns: Sequence[str], sep: str = "_"
) -> dict[str, list[str]]:
    """measure(sep=) selector (reference R/fmelt.R:32-124): derive
    melt_multi measure-groups from column-name structure. Each name
    containing `sep` splits into (stem, suffix); columns sharing a stem
    form one value group, ordered by suffix (numeric when possible).
    Stems with a single column are left alone (they stay id vars),
    matching the reference's requirement of >1 measure per group."""
    pairs = []
    for c in columns:
        parts = c.split(sep)
        if len(parts) < 2:
            continue
        pairs.append((sep.join(parts[:-1]), parts[-1], c))
    return _suffix_groups(pairs)


def patterns(regex: str, columns: Sequence[str]) -> list[str]:
    """patterns() measure-var selector for melt (reference R/fmelt.R:15):
    columns matching a regex."""
    import re as _re

    return [c for c in columns if _re.search(regex, c)]


def measure_pattern(
    columns: Sequence[str], pattern: str
) -> dict[str, list[str]]:
    """measure(pattern=) / measurev selector (reference R/fmelt.R:64-139):
    like measure(sep=) but the (stem, suffix) split comes from a regex
    with exactly TWO capture groups — group 1 names the value column of
    the melt group, group 2 orders the columns within it. Non-matching
    columns stay id vars; single-member stems are dropped like
    measure_sep. Returns the same {stem: [cols...]} shape melt_multi
    consumes."""
    import re as _re

    rx = _re.compile(pattern)
    if rx.groups != 2:
        raise ValueError(
            f"measure_pattern needs exactly 2 capture groups, got {rx.groups}"
        )
    pairs = []
    for c in columns:
        m = rx.search(c)
        if not m:
            continue
        pairs.append((m.group(1), m.group(2), c))
    return _suffix_groups(pairs)


# setcbindlist (reference R/mergelist.R:setcbindlist): in-place spelling
# of cbindlist — identity-by-design under Spark immutability.
setcbindlist = cbindlist
