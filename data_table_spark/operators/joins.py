"""Join surface (SURVEY §2.3).

The reference funnels every native join through bmerge — a multi-column
binary search over the sorted right table (/root/reference/R/bmerge.R:28,
/root/reference/src/bmerge.c:39) with vecseq row expansion
(/root/reference/src/vecseq.c:3). Here each flavor compiles to a
declarative DataFrame join and Catalyst/AQE picks
broadcast-hash/shuffled-hash/sort-merge at runtime — the physical
machinery data.table hand-rolls.

Scale notes:
- Small dimension sides are broadcast automatically (threshold set in
  session.py); `lookup(..., broadcast=True)` forces it.
- ``X[Y]`` semantics (one output row per Y row, nomatch=NA) compile to
  ``Y left-join X`` so no extra pass is needed to restore Y rows.
- NA-joins-NA (reference src/bmerge.c:9-13) is opt-in via
  ``na_matches=True`` → null-safe equality (`<=>`). Default False matches
  SQL semantics and keeps the equi-key usable by hash joins (Spark's
  eqNullSafe still hash-joins, so the cost is semantic, not physical).
- ``mult="first"/"last"`` compiles to a per-i-row window row_number — one
  extra shuffle on the i-row id, no driver involvement.
- the allow_cartesian guard (reference R/data.table.R:923-937) is an
  opt-in pre-count of duplicate keys (extra job) — off by default.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core import DT, _namelist

__all__ = [
    "lookup",
    "join",
    "merge",
    "update_on_join",
    "eachi",
    "mergepair",
    "mergelist",
    "setmergelist",
    "CJ",
    "SJ",
]

_YID = "__y_row__"


def _resolve_on(x: DT, y: DT, on) -> list[tuple[str, str, str]]:
    """Normalize ``on`` to [(x_col, op, y_col)].

    Accepted forms: None (key / common columns — .NATURAL, reference
    R/data.table.R:576-584), "col", ["a","b"], {"xcol": "ycol"}, and
    non-equi strings "xcol >= ycol" (reference src/bmerge.c:20-24).
    """
    if on is None:
        common = (
            [k for k in x.key if k in y.columns]
            if x.key
            else [c for c in x.columns if c in y.columns]
        )
        if not common:
            raise ValueError("no join columns: set `on=` or a key")
        return [(c, "==", c) for c in common]
    if isinstance(on, str):
        on = [on]
    if isinstance(on, Mapping):
        return [(xc, "==", yc) for xc, yc in on.items()]
    out = []
    for item in on:
        if isinstance(item, str):
            for op in (">=", "<=", "==", "!=", ">", "<", "="):
                if op in item:
                    lhs, rhs = item.split(op, 1)
                    op = "==" if op == "=" else op
                    out.append((lhs.strip(), op, rhs.strip()))
                    break
            else:
                out.append((item, "==", item))
        else:
            xc, op, yc = item
            out.append((xc, op, yc))
    return out


#: Spark dtype → the reference's mergeType buckets (R/bmerge.R:1-8).
#: data.table's integer64 maps to bigint; factor has no Spark analog
#: (factors arrive as string = character).
_MERGE_TYPE = {
    "tinyint": "integer", "smallint": "integer", "int": "integer",
    "bigint": "integer64", "float": "double", "double": "double",
    "string": "character", "boolean": "logical", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
}


def _bmerge_coerce(xdf: DataFrame, ydf: DataFrame, pairs):
    """Join-column type reconciliation — the reference's bmerge coercion
    contract (R/bmerge.R:19 coerce_col, :60-160), round-12 port.

    Rules, x = right/lookup table, i = y = the query rows (X[Y]):
    - same merge type → untouched (incl. both-double: int-as-double
      joins int-as-double without the fitsInInt32 probe);
    - character/logical vs anything else → "Incompatible join types"
      UNLESS the mismatched column is ALL-NA, which coerces to the
      other side's type (R/bmerge.R:100-110; one bounded count probe,
      only run when the types already mismatch);
    - integer64 vs integer → integer widens; integer64 vs double →
      double side must fit int64 (no fractions) or error;
    - integer vs double: i-double that fitsInInt32 (no fractions, in
      range — one bounded agg probe on the i side, the reference's
      ad-hoc-join convenience for a forgotten L postfix) coerces i to
      integer AND RETURNS integer; otherwise x widens to double.
      NaN counts as fractional (floor(NaN) is NULL — masked) so it
      routes to the widen-x branch;
    - complex types (array/map/struct) → "not supported" error
      (reference ORDERING_TYPES gate).

    Probes are single-column bounded aggregates on the i side (the
    small side of X[Y]) and fire only on mismatched types — zero cost
    on the typical same-typed join. Returns (xdf, ydf, pairs): casts
    the reference propagates to the caller (fitsInInt32, all-NA) are
    applied to the join column in place; join-only casts (double →
    integer64, which the reference applies to a shallow copy) go
    through a ``__bm_*__`` shadow column referenced by the rewritten
    pair so the output keeps the original dtype.
    """
    xt, yt = dict(xdf.dtypes), dict(ydf.dtypes)

    def mt(t, name, side):
        if t not in _MERGE_TYPE:
            raise ValueError(
                f"{side}.{name} is type {t} which is not supported by "
                "data.table join"
            )
        return _MERGE_TYPE[t]

    def side_counts(df, c):
        # one bounded agg: (total rows, non-null rows) — empty and
        # all-NA must be told apart (reference anyNA && allNA is FALSE
        # on a zero-row column, R/bmerge.R:100)
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.count(F.col(c)).alias("nn")
        ).collect()[0]
        return row["n"], row["nn"]

    new_pairs = []
    for a, op, b in pairs:
        new_pairs.append((a, op, b))
        if op != "==":
            continue  # non-equi pairs keep SQL numeric comparison rules
        if a not in xt or b not in yt:
            continue  # unknown name: the join raises Spark's own error
        if xt[a] == yt[b]:
            # identical Spark dtypes need no reconciliation — this also
            # lets same-typed columns OUTSIDE the mergeType map (decimal,
            # binary, struct) join as Spark natively allows, a documented
            # superset of the reference's ORDERING_TYPES gate
            continue
        ta, tb = mt(xt[a], a, "x"), mt(yt[b], b, "i")
        if ta == tb:
            continue
        cfl = ("character", "logical", "date", "timestamp")
        if ta in cfl or tb in cfl:
            # all-NA columns coerce to the other side (R/bmerge.R:100).
            # A ZERO-ROW i also coerces (the reference skips bmerge
            # entirely when nrow(i)==0, tests.Rraw 2101 — casting the
            # empty column keeps the Spark comparison resolvable), but a
            # zero-row x with a populated i is an ERROR exactly like the
            # reference's anyNA && allNA (false on empty) requires.
            yn, ynn = side_counts(ydf, b)
            if ynn == 0:  # empty i OR all-NA i
                ydf = ydf.withColumn(b, F.col(b).cast(xt[a]))
                continue
            xn, xnn = side_counts(xdf, a)
            if xn > 0 and xnn == 0:
                xdf = xdf.withColumn(a, F.col(a).cast(yt[b]))
            else:
                raise ValueError(
                    f"Incompatible join types: x.{a} ({ta}) and i.{b} "
                    f"({tb})"
                )
            continue
        if "integer64" in (ta, tb):
            if "integer" in (ta, tb):
                # int vs int64: the reference widens the int side on a
                # SHALLOW copy (callersi untouched → output type keeps
                # the original); Spark's implicit int==bigint
                # comparison is exact, so no cast is needed here
                continue
            # double vs integer64: the double must FIT int64 (no
            # fractions, in range) or the join errors
            wdf, wc, wside = (
                (ydf, b, "i") if tb == "double" else (xdf, a, "x")
            )
            c = F.col(wc)
            row = wdf.agg(
                F.max(
                    F.when(F.isnan(c), F.lit(1)).otherwise(
                        (c != F.floor(c)).cast("int")
                    )
                ).alias("frac"),
                F.max(F.abs(c)).alias("mx"),
            ).collect()[0]
            if row["frac"] == 1 or (
                row["mx"] is not None and row["mx"] >= 2.0 ** 63
            ):
                raise ValueError(
                    f"Incompatible join types: {wside}.{wc} is type "
                    "double and cannot be coerced to integer64 "
                    "(e.g. has fractions)"
                )
            # join-only cast (reference coerces the shallow copy):
            # match through a shadow column, output keeps the double
            shadow = f"__bm_{wc}__"
            if wside == "i":
                ydf = ydf.withColumn(shadow, F.col(wc).cast("bigint"))
                new_pairs[-1] = (a, op, shadow)
            else:
                xdf = xdf.withColumn(shadow, F.col(wc).cast("bigint"))
                new_pairs[-1] = (shadow, op, b)
            continue
        # just integer and double left
        if tb == "double":  # i is double: probe fitsInInt32
            c = F.col(b)
            row = ydf.agg(
                F.max(
                    F.when(F.isnan(c), F.lit(1)).otherwise(
                        (c != F.floor(c)).cast("int")
                    )
                ).alias("frac"),
                F.max(F.abs(c)).alias("mx"),
            ).collect()[0]
            if row["frac"] != 1 and (
                row["mx"] is None or row["mx"] <= 2 ** 31 - 1
            ):
                # ad-hoc-join convenience: i coerces to integer AND the
                # RESULT returns integer (reference sets callersi)
                ydf = ydf.withColumn(b, F.col(b).cast(xt[a]))
            # else: x widens to double — Spark's implicit int==double
            # comparison already does this exactly; output keeps i's
            # double (reference coerces x's shallow copy only)
        # else: i integer vs x double — the reference widens i's
        # shallow copy "(for join)" without touching callersi; Spark's
        # implicit comparison is the same widening, output stays as-is
    return xdf, ydf, new_pairs


def _qualified_order_exprs(xdf, entries, na_last: bool, flip: bool):
    """X's declared order rebuilt with xdf-QUALIFIED columns (the
    joined frame holds both sides, so bare F.col is ambiguous) —
    forder's two-level NaN/NA key + na_last placement, mirrored
    (direction AND missing block) when ``flip`` (mult='last')."""
    dtypes = dict(xdf.dtypes)
    eff_last = (not na_last) if flip else na_last
    exprs = []
    for e in entries:
        desc = e.startswith("-")
        name = e[1:] if desc else e
        if flip:
            desc = not desc
        col = xdf[name]
        if dtypes.get(name) in ("float", "double"):
            lvl = (
                F.when(col.isNull(), F.lit(2))
                .when(F.isnan(col), F.lit(1))
                .otherwise(F.lit(0))
            )
            exprs.append(lvl.asc() if eff_last else lvl.desc())
            exprs.append(col.desc() if desc else col.asc())
        elif eff_last:
            exprs.append(
                col.desc_nulls_last() if desc else col.asc_nulls_last()
            )
        else:
            exprs.append(
                col.desc_nulls_first() if desc else col.asc_nulls_first()
            )
    return exprs


def _declared_entries(source_list, available):
    """Filter an order/key entry list to available columns, matching on
    the '-'-stripped name (a '-col' declared-desc entry used to be
    silently dropped by the bare membership test) and carrying the
    source's na_last flag."""
    from ..core import _OrderList

    kept = [
        c for c in source_list
        if (c[1:] if c.startswith("-") else c) in available
    ]
    return _OrderList(kept, na_last=getattr(source_list, "na_last", False))



def lookup(
    x: DT,
    y: DT,
    on=None,
    nomatch: str | None = "NA",
    mult: str = "all",
    notjoin: bool = False,
    na_matches: bool = False,
    broadcast: bool = False,
    allow_cartesian: bool | None = None,
    prefix: str = "i_",
    which: bool = False,
) -> DT:
    """``X[Y, on=...]`` — right-table-lookup join (reference
    R/data.table.R:842-997).

    ``which=True`` (``DT[i, which=TRUE]`` with a join i — reference
    R/data.table.R:617, tests.Rraw 1744.1): instead of X's payload,
    return each matched X row's 1-based position in X's declared
    key/order (NA for unmatched i rows under nomatch="NA") as a
    ``which`` column alongside Y's columns. The position needs one
    unpartitioned row_number over X — the same deliberate
    single-reducer cost as ``DT.which`` (driver-bound use). The
    roll-join form (1744.2) is the as-of join carrying a precomputed
    row-number payload column — no separate surface.

    Result: one row per Y row (per match under mult="all"); Y's join-column
    values; X's payload columns; Y's payload columns prefixed ``i_`` on
    name clash (data.table's ``i.`` prefix, '.' avoided for Spark
    identifier hygiene).

    - nomatch="NA" → unmatched Y rows kept with NULL X payload (left join
      from Y); nomatch=None → dropped (inner). Reference R/data.table.R:610-616.
    - mult="first"/"last": first/last matching X row per Y row in X's key
      order (reference src/bmerge.c:32); "error" raises if any Y row
      matches more than one X row.
    - notjoin → X rows NOT matched by any Y row (``X[!Y]``, reference
      R/data.table.R:1041-1051) — note this returns rows OF X.
    """
    pairs = _resolve_on(x, y, on)
    equi = [(a, b) for a, op, b in pairs if op == "=="]
    theta = [(a, op, b) for a, op, b in pairs if op != "=="]

    # cpairs may reference __bm_*__ shadow columns (join-only casts);
    # output assembly below keeps using the ORIGINAL pairs/names
    xdf, ydf, cpairs = _bmerge_coerce(x.df, y.df, pairs)

    if which:
        if notjoin:
            raise ValueError("which=True cannot combine with notjoin "
                             "(X[!Y] returns rows of X, not positions)")
        order_cols = _declared_entries(x.key or x.order_by, xdf.columns)
        if not order_cols:
            raise ValueError("which=True needs a key/order on x "
                             "(row positions are order-relative)")
        from ..core import _order_exprs

        xdf = xdf.withColumn(
            "__xrow__",
            F.row_number().over(
                Window.orderBy(*_order_exprs(xdf, order_cols))
            ),
        )

    if notjoin:
        cond = _cond(xdf, ydf, cpairs, na_matches)
        out = xdf.join(ydf, cond, "left_anti")
        return DT(
            out.select(*[out[c] for c in x.columns]),
            key=x.key, order_by=x.order_by,
        )

    if allow_cartesian is False and equi:
        xk = xdf.groupBy([F.col(a) for a, _ in equi]).count()
        yk = ydf.groupBy([F.col(b) for _, b in equi]).count()
        j = xk.join(
            yk,
            [xk[a] == yk[b] for (a, _), (_, b) in zip(equi, equi)],
            "inner",
        )
        expl = j.select(F.sum(xk["count"] * yk["count"]).alias("n")).collect()[0]["n"]
        if expl is not None and expl > max(xdf.count(), ydf.count()):
            raise ValueError(
                f"join would produce {expl} rows (> max(nrow(x), nrow(y))); "
                "pass allow_cartesian=True (reference R/data.table.R:923-937)"
            )

    if broadcast:
        xdf = F.broadcast(xdf)

    need_yid = mult in ("first", "last", "error")
    if need_yid:
        ydf = ydf.withColumn(_YID, F.monotonically_increasing_id())

    cond = _cond(xdf, ydf, cpairs, na_matches)
    how = "left" if nomatch == "NA" else "inner"
    joined = ydf.join(xdf, cond, how)

    # mult: keep first/last X match per Y row in X's declared order
    if need_yid:
        order_cols = _declared_entries(x.key or x.order_by, xdf.columns)
        if not order_cols:
            order_cols = [a for a, _ in equi]
        if mult == "error":
            counts = joined.groupBy(_YID).count().filter(F.col("count") > 1)
            if counts.limit(1).count() > 0:
                raise ValueError('mult="error": some i rows match multiple x rows')
            joined = joined.drop(_YID)
        else:
            ordering = _qualified_order_exprs(
                xdf, order_cols,
                na_last=getattr(order_cols, "na_last", False),
                flip=(mult == "last"),
            )
            w = Window.partitionBy(_YID).orderBy(*ordering)
            joined = (
                joined.withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") == 1)
                .drop("__rn__", _YID)
            )

    if which:
        return DT(joined.select(
            *[ydf[b].alias(b) for b in y.columns],
            xdf["__xrow__"].alias("which"),
        ))

    # column assembly: y join cols + x payload + y payload (i_ prefix on clash)
    ycols_join = {b for _, _, b in pairs}
    out_cols: list[Column] = []
    for b in y.columns:
        if b in ycols_join:
            out_cols.append(ydf[b].alias(b))
    xcols_kept = [c for c in x.columns if c not in {a for a, _, _ in pairs}]
    for c in xcols_kept:
        out_cols.append(xdf[c].alias(c))
    for b in y.columns:
        if b in ycols_join:
            continue
        name = b if b not in x.columns else f"{prefix}{b}"
        out_cols.append(ydf[b].alias(name))
    return DT(joined.select(*out_cols))


def _cond(xdf: DataFrame, ydf: DataFrame, pairs, na_matches: bool) -> Column:
    conds = []
    for a, op, b in pairs:
        xa, yb = xdf[a], ydf[b]
        if op == "==":
            conds.append(xa.eqNullSafe(yb) if na_matches else (xa == yb))
        elif op == ">=":
            conds.append(xa >= yb)
        elif op == "<=":
            conds.append(xa <= yb)
        elif op == ">":
            conds.append(xa > yb)
        elif op == "<":
            conds.append(xa < yb)
        elif op == "!=":
            conds.append(xa != yb)
        else:  # pragma: no cover
            raise ValueError(f"bad op {op}")
    return reduce(lambda l, r: l & r, conds)


def join(x: DT, y: DT, on=None, how: str = "inner", na_matches: bool = False) -> DT:
    """Plain SQL-style join on same-named columns (semi/anti included)."""
    pairs = _resolve_on(x, y, on)
    if all(a == b and op == "==" for a, op, b in pairs) and not na_matches:
        out = x.df.join(y.df, [a for a, _, _ in pairs], how)
    else:
        out = x.df.join(y.df, _cond(x.df, y.df, pairs, na_matches), how)
    return DT(out)


def merge(
    x: DT,
    y: DT,
    by: Sequence[str] | None = None,
    by_x: Sequence[str] | None = None,
    by_y: Sequence[str] | None = None,
    all: bool = False,
    all_x: bool = False,
    all_y: bool = False,
    suffixes: tuple[str, str] = ("_x", "_y"),
    no_dups: bool = True,
    incomparables: Sequence | None = None,
) -> DT:
    """merge.data.table (reference R/merge.R:1-149): SQL-style merge with
    all/all.x/all.y and suffix disambiguation.

    ``no_dups`` (reference R/merge.R no.dups, #1396): a NON-key y column
    that collides with a by.x key name gets the y suffix too (default);
    ``no_dups=False`` reproduces the legacy duplicate-name output.

    ``incomparables`` (reference R/merge.R:86-95, #2587): values that
    cannot be matched — rows whose join-key value is in the list are
    DROPPED from both sides before the merge (the reference subsets x
    and y), so they neither match nor survive as outer rows. A narrow
    pre-join filter: it pushes to the scans."""
    if all:
        all_x = all_y = True
    how = {
        (False, False): "inner",
        (True, False): "left",
        (False, True): "right",
        (True, True): "full",
    }[(all_x, all_y)]
    if by is None and by_x is None:
        by = [c for c in x.columns if c in y.columns]
    bx = _namelist(by_x) or _namelist(by)
    bby = _namelist(by_y) or _namelist(by)

    xdf, ydf = x.df, y.df
    if incomparables is not None:
        vals = list(incomparables)
        for c in bx:
            xdf = xdf.filter(~F.col(c).isin(vals) | F.col(c).isNull())
        for c in bby:
            ydf = ydf.filter(~F.col(c).isin(vals) | F.col(c).isNull())
        if any(v is None for v in vals):
            for c in bx:
                xdf = xdf.filter(F.col(c).isNotNull())
            for c in bby:
                ydf = ydf.filter(F.col(c).isNotNull())
    clash = [
        c for c in x.columns
        if c in y.columns and c not in bx and c not in bby
    ]
    for c in clash:
        xdf = xdf.withColumnRenamed(c, c + suffixes[0])
        ydf = ydf.withColumnRenamed(c, c + suffixes[1])
    if no_dups:
        for c in [c for c in ydf.columns if c not in bby and c in bx]:
            ydf = ydf.withColumnRenamed(c, c + suffixes[1])

    # merge funnels through the same bmerge coercion contract as X[Y]
    # (reference R/merge.R → bmerge; tests.Rraw 2044 — round-12): here
    # y plays the i role, so an all-NA / fitsInInt32 y key coerces
    pairs = [(a, "==", b) for a, b in zip(bx, bby)]
    xdf, ydf, cpairs = _bmerge_coerce(xdf, ydf, pairs)
    cond = [xdf[a] == ydf[b] for a, _, b in cpairs]
    joined = xdf.join(ydf, reduce(lambda l, r: l & r, cond), how)
    # key columns: coalesce both sides so full-outer keeps them non-null
    keys = [F.coalesce(xdf[a], ydf[b]).alias(a) for a, b in zip(bx, bby)]
    rest_x = [xdf[c] for c in xdf.columns if c not in bx and not c.startswith("__bm_")]
    rest_y = [ydf[c] for c in ydf.columns if c not in bby and not c.startswith("__bm_")]
    return DT(joined.select(*keys, *rest_x, *rest_y), key=bx)


def update_on_join(x: DT, y: DT, on=None, na_matches: bool = False, **cols) -> DT:
    """``X[Y, c := expr]`` — update-on-join (reference R/data.table.R:1520,
    src/assign.c:355). ``cols`` maps new/updated X column → expression over
    the joined row; unmatched X rows keep their old value.

    Implemented as a left join from X plus when(matched, rhs) — a single
    shuffle (or broadcast), no driver round-trip.
    """
    pairs = _resolve_on(x, y, on)
    ydf = y.df.withColumn("__matched__", F.lit(True))
    cond = _cond(x.df, ydf, pairs, na_matches)
    joined = x.df.join(
        F.broadcast(ydf) if _is_small(y) else ydf, cond, "left"
    )
    matched = F.col("__matched__").isNotNull()
    out_cols = []
    for c in x.columns:
        if c in cols:
            rhs = cols[c]
            rhs = F.expr(rhs) if isinstance(rhs, str) else rhs
            out_cols.append(F.when(matched, rhs).otherwise(x.df[c]).alias(c))
        else:
            out_cols.append(x.df[c].alias(c))
    for c, rhs in cols.items():
        if c not in x.columns:
            rhs = F.expr(rhs) if isinstance(rhs, str) else rhs
            out_cols.append(F.when(matched, rhs).alias(c))
    return DT(joined.select(*out_cols), key=x.key, order_by=x.order_by)


def _is_small(y: DT) -> bool:
    return False  # conservative; Catalyst auto-broadcasts below threshold


def eachi(x: DT, y: DT, on=None, j: Mapping | None = None, nomatch=None) -> DT:
    """``X[Y, j, by=.EACHI]`` — evaluate j once per Y ROW over its matches
    (reference R/data.table.R:573,915-959), NOT per distinct key value:
    two Y rows carrying the same key each produce their own output row.

    Implemented by tagging each Y row with a unique id before the lookup
    and grouping on (id, join keys); the id is dropped from the output.
    One shuffle on the (id, key) tuple — same cost shape as grouping on
    the key alone, and no driver involvement.
    """
    pairs = _resolve_on(x, y, on)
    y_tagged = DT(
        y.df.withColumn(_YID, F.monotonically_increasing_id()),
        key=y.key,
        order_by=y.order_by,
    )
    joined = lookup(x, y_tagged, on=on, nomatch="NA" if nomatch == "NA" else None)
    group_cols = [b for _, _, b in pairs]
    exprs = [
        (F.expr(v) if isinstance(v, str) else v).alias(k) for k, v in (j or {}).items()
    ]
    out = joined.df.groupBy(_YID, *group_cols).agg(*exprs).drop(_YID)
    return DT(out)


_ML_HOWS = ("left", "inner", "full", "right", "semi", "anti", "cross")
_ML_MULTS = ("error", "all", "first", "last")


def _onkeys(xkey, ykey):
    """Default join columns from two keys (reference R/mergelist.R:15-25
    onkeys): one-sided key passes through; two keys intersect, order
    aligned to the shorter (or RHS on ties)."""
    if xkey and not ykey:
        return list(xkey)
    if ykey and not xkey:
        return list(ykey)
    if xkey and ykey:
        if len(xkey) >= len(ykey):
            return [c for c in ykey if c in xkey] or None
        return [c for c in xkey if c in ykey] or None
    return None


def _some_cols(all_cols, sel, keep=(), drop=(), retain_order=False):
    """Column selection (reference R/mergelist.R:28-35 someCols):
    keep ∪ (sel − drop); keep leads unless retain_order puts everything
    back in table order (used by semi/anti, reference mergepair
    retain.order=semi_or_anti)."""
    sel = list(sel) if sel is not None else list(all_cols)
    dropset = set(drop)
    if retain_order:
        chosen = set(keep) | {c for c in sel if c not in dropset}
        return [c for c in all_cols if c in chosen]
    out = list(keep)
    out += [c for c in sel if c not in dropset and c not in out]
    return out


def _nsafe_cond(a, b, on):
    """Null-safe equality over aliased frames — bmerge matches NA to NA
    (reference src/bmerge.c:9-13; mergelist.Rraw 251.*)."""
    return reduce(
        lambda l, r: l & r,
        [F.col(f"{a}.`{c}`").eqNullSafe(F.col(f"{b}.`{c}`")) for c in on],
    )


def _mult_error_check(dup_side: DT, other_side: DT, on) -> None:
    """mult="error": raise iff some key with >1 rows on ``dup_side`` has
    a match in ``other_side`` (reference bmerge mult="error" raises on
    multiple MATCHES — unmatched duplicate keys are fine; mergelist.Rraw
    104.03 vs 104.05). One aggregate + semi-join probe job."""
    dups = (
        dup_side.df.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") > 1)
        .select(*on)
        .alias("__d__")
    )
    other = other_side.df.select(*on).alias("__o__")
    hit = dups.join(other, _nsafe_cond("__d__", "__o__", on), "left_semi")
    if hit.limit(1).count():
        raise ValueError(
            "multiple matches during merge (mult='error'); use "
            "mult='all'/'first'/'last' to control cardinality"
        )


def _join_many_check(from_dt: DT, to_dt: DT, on) -> None:
    """join.many=FALSE guard (reference R/mergelist.R:120-125, #4383):
    raise when some key has >1 rows on BOTH sides — a true many-to-many
    explosion. Probe job, opt-in like allow.cartesian."""

    def _dupkeys(d, tag):
        return (
            d.df.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("__n__"))
            .filter(F.col("__n__") > 1)
            .select(*on)
            .alias(tag)
        )

    hit = _dupkeys(from_dt, "__f__").join(
        _dupkeys(to_dt, "__t__"), _nsafe_cond("__f__", "__t__", on), "left_semi"
    )
    if hit.limit(1).count():
        raise ValueError(
            "Joining resulted in many-to-many join. Perform quality check "
            "on your data, use mult!='all', or set join_many=True to "
            "allow rows explosion."
        )


def mergepair(
    lhs: DT,
    rhs: DT,
    on=None,
    how: str = "left",
    mult: str | None = None,
    lhs_cols: Sequence[str] | None = None,
    rhs_cols: Sequence[str] | None = None,
    join_many: bool = True,
) -> DT:
    """Atomic pairwise merge — the reference's mergepair
    (R/mergelist.R:147-262), the building block of mergelist.

    Semantics ported exactly (mergelist.Rraw 21-29, 101-110, 121,
    221-227, 251 vectors in tests/test_reference_rraw_parity.py):

    - ``on=None`` derives join columns from keys: left/semi/anti →
      key(rhs); right → key(lhs); inner/full → aligned key intersection
      (onkeys). Missing → "necessary key is not present".
    - join keys match NA to NA (null-safe equality, bmerge semantics).
    - ``mult`` reduces the MATCH side per key: left reduces RHS, right
      reduces LHS, inner/full reduce BOTH sides (reference applies
      fdistinct to the i side and bmerge mult to the x side).
      "first"/"last" keep one row per key in table order; "error" (the
      default) raises only when a duplicated key actually matches;
      "all" keeps everything. semi/anti default "last" and reject
      "all" (reference dtmerge); cross requires on=(), mult="all",
      join_many=True.
    - ``join_many=False``: raise on true many-to-many keys.
    - duplicated non-key output names raise (use ``cols``/rename);
      ``lhs_cols``/``rhs_cols`` subset payload columns (on= always kept).
    - output column order: on, then LHS payload, then RHS payload
      (reference setcolorder for how="right"); semi/anti keep the LHS
      column order untouched (someCols retain.order).

    Spark-first: the reduction is a per-key window (grouping.unique),
    the checks are bounded aggregate probes, and the join itself is one
    null-safe equi join Catalyst is free to broadcast — no driver data.
    Row order is not defined (SURVEY §1.1); the reference's row-order
    guarantees are not reproduced.
    """
    if how not in _ML_HOWS:
        raise ValueError(
            "'how' must be one of [left, inner, full, right, semi, anti, "
            "cross], or a list of such"
        )
    if mult is not None and mult not in _ML_MULTS:
        raise ValueError(
            "'mult' must be one of [error, all, first, last] or NULL, "
            "or a list of such"
        )
    semi_or_anti = how in ("semi", "anti")
    inner_or_full = how in ("inner", "full")

    if how == "cross":
        if (on is not None and len(_namelist(on))) or (
            mult not in (None, "all")
        ) or not join_many:
            raise ValueError(
                "cross join must be used with zero-length on, mult='all', "
                "join.many=TRUE"
            )
        lc = _some_cols(lhs.columns, lhs_cols)
        rc = _some_cols(rhs.columns, rhs_cols)
        dup = [c for c in rc if c in lc]
        if dup:
            raise ValueError(
                f"merge result has duplicated column names {dup}, use "
                "'cols' argument or rename columns"
            )
        return DT(lhs.df.select(*lc).crossJoin(rhs.df.select(*rc)))

    if on is None:
        if how == "left" or semi_or_anti:
            on = list(rhs.key) or None
        elif how == "right":
            on = list(lhs.key) or None
        else:
            on = _onkeys(lhs.key, rhs.key)
        if not on:
            raise ValueError("'on' is missing and necessary key is not present")
    else:
        on = _namelist(on)
        if not on:
            raise ValueError("'on' must be non-zero length character vector")
        if len(set(on)) != len(on) or any(c is None for c in on):
            raise ValueError(
                "'on' must be non-NA, non-duplicated, character vector, "
                "or a list of such"
            )
    bad = [c for c in on if c not in lhs.columns]
    if bad:
        raise ValueError(
            f"'on' argument specifies columns to join {bad} that are not "
            f"present in LHS table {lhs.columns}"
        )
    bad = [c for c in on if c not in rhs.columns]
    if bad:
        raise ValueError(
            f"'on' argument specifies columns to join {bad} that are not "
            f"present in RHS table {rhs.columns}"
        )

    if mult is None:
        mult = "last" if semi_or_anti else "error"
    if semi_or_anti:
        if mult == "all":
            raise ValueError(
                "semi and anti joins must be used with mult!='all'"
            )
        if mult == "error":
            _mult_error_check(rhs, lhs, on)
        a = lhs.df.alias("__l__")
        b = rhs.df.select(*on).alias("__r__")
        out = a.join(
            b, _nsafe_cond("__l__", "__r__", on), f"left_{how}"
        ).select(*_some_cols(lhs.columns, lhs_cols, keep=on, retain_order=True))
        return DT(out, key=lhs.key, order_by=lhs.order_by)

    swap = how == "right"
    from_dt, from_cols = (rhs, rhs_cols) if swap else (lhs, lhs_cols)
    to_dt, to_cols = (lhs, lhs_cols) if swap else (rhs, rhs_cols)

    if mult in ("first", "last"):
        to_dt = _apply_mult(to_dt, on, mult)
        if inner_or_full:
            from_dt = _apply_mult(from_dt, on, mult)
    elif mult == "error":
        _mult_error_check(to_dt, from_dt, on)
        if inner_or_full:
            _mult_error_check(from_dt, to_dt, on)
    if mult == "all" and not join_many:
        _join_many_check(from_dt, to_dt, on)

    cols_i = _some_cols(from_dt.columns, from_cols, keep=on)
    cols_x = _some_cols(to_dt.columns, to_cols, drop=on)
    dup = [c for c in cols_i if c in cols_x]
    if dup:
        raise ValueError(
            f"merge result has duplicated column names {dup}, use 'cols' "
            "argument or rename columns in 'l' tables"
        )
    fd = from_dt.df.alias("__i__")
    xd = to_dt.df.alias("__x__")
    spark_how = {"left": "left", "right": "left", "inner": "inner", "full": "full"}[how]
    joined = fd.join(xd, _nsafe_cond("__i__", "__x__", on), spark_how)
    if how == "full":
        key_cols = [
            F.coalesce(F.col(f"__i__.`{c}`"), F.col(f"__x__.`{c}`")).alias(c)
            for c in on
        ]
    else:
        key_cols = [F.col(f"__i__.`{c}`").alias(c) for c in on]
    others_i = [
        F.col(f"__i__.`{c}`").alias(c) for c in cols_i if c not in on
    ]
    others_x = [F.col(f"__x__.`{c}`").alias(c) for c in cols_x]
    # visible order: on, LHS payload, RHS payload (reference arranges
    # how="right" back to i.on, x.cols, i.cols via setcolorder)
    if swap:
        out = joined.select(*key_cols, *others_x, *others_i)
    else:
        out = joined.select(*key_cols, *others_i, *others_x)
    # key metadata: the reference keeps the baseline (i-side) table's
    # key through left/right/inner (mergepair .shallow retain.key) —
    # this is what lets default-on chains walk a star schema
    # (mergelist.Rraw 102.611-635). full joins lose the key (102.34).
    # A KEYLESS baseline yields a keyless result (no fallback to `on`:
    # the reference drops the key after join subsetting, so a later
    # default-on merge must raise "'on' is missing" rather than
    # silently picking the join columns — round-12 ADVICE fix).
    # DT.key is advisory (on-defaults / orderings), never a uniqueness
    # contract, so retaining it under mult="all" is safe.
    key = None if how == "full" else (list(from_dt.key) or None)
    return DT(out, key=key)


def _per_step(value, n_steps, is_step_value, default=None):
    """Normalize a scalar-or-per-step argument to a list of length
    ``n_steps`` (reference mergelist_impl_ rep(list(x), n-1L))."""
    if isinstance(value, (list, tuple)) and not is_step_value(value):
        steps = list(value)
    else:
        steps = [value] * n_steps
    if len(steps) != n_steps:
        return None
    return steps


def mergelist(
    tables: Sequence[DT],
    on=None,
    how=None,
    mult=None,
    cols: Sequence | None = None,
    join_many=True,
) -> DT:
    """mergelist — n-way fold of mergepair (reference R/mergelist.R:264-352).

    ``on``/``how``/``mult``/``join_many`` accept one value for every
    step or a per-step list of length ``len(tables)-1`` (``on`` steps
    are themselves name lists); ``cols`` is a per-table payload
    selection of length ``len(tables)`` (None = all columns). Defaults:
    how="left", mult=None → per-how default (error for outer/inner,
    "last" for semi/anti, "all" for cross). Validation and error
    contracts follow the reference (mergelist.Rraw 101.*).

    setmergelist is an alias: Spark frames are immutable, so the
    reference's in-place variant (R/mergelist.R:354) has no separate
    semantics here.
    """
    if isinstance(tables, (DT, DataFrame)) or not isinstance(
        tables, (list, tuple)
    ):
        raise ValueError("'l' must be a list")
    for t in tables:
        if not isinstance(t, DT):
            raise ValueError(
                "Every element of 'l' list must be data.table objects"
            )
    bad = [i + 1 for i, t in enumerate(tables) if not t.columns]
    if bad:
        raise ValueError(
            f"Tables in 'l' must all have columns, but these entries "
            f"have 0: {bad}"
        )
    bad = [
        i + 1
        for i, t in enumerate(tables)
        if len(set(t.columns)) != len(t.columns)
    ]
    if bad:
        raise ValueError(
            "Column names in individual 'l' entries must be unique, but "
            f"these have some duplicates: {bad}"
        )
    n = len(tables)
    if n == 0:
        from pyspark.sql import SparkSession
        from pyspark.sql.types import StructType

        spark = SparkSession.getActiveSession()
        if spark is None:  # pragma: no cover
            raise ValueError("empty table list and no active SparkSession")
        return DT(spark.createDataFrame([], StructType([])))
    if n == 1:
        return tables[0]

    hows = _per_step(
        how if how is not None else "left",
        n - 1,
        lambda v: False,
    )
    if hows is None or not all(
        isinstance(h, str) and h in _ML_HOWS for h in hows
    ):
        raise ValueError(
            "'how' must be one of [left, inner, full, right, semi, anti, "
            "cross], or a list of such whose length must be len(l)-1"
        )
    mults = _per_step(mult, n - 1, lambda v: False)
    if mults is None or not all(
        m is None or (isinstance(m, str) and m in _ML_MULTS) for m in mults
    ):
        raise ValueError(
            "'mult' must be one of [error, all, first, last] or NULL, or "
            "a list of such whose length must be len(l)-1"
        )
    jms = _per_step(join_many, n - 1, lambda v: False)
    if jms is None or not all(isinstance(j, bool) for j in jms):
        raise ValueError(
            "'join.many' must be TRUE or FALSE, or a list of such whose "
            "length must be len(l)-1"
        )
    if cols is None:
        cols_steps = [None] * n
    else:
        if not isinstance(cols, (list, tuple)):
            raise ValueError("'cols' must be a list")
        if len(cols) != n:
            raise ValueError(
                f"'cols' must be same length as 'l' ({len(cols)} != {n})"
            )
        # a bare string is R's length-1 character vector
        cols_steps = [[c] if isinstance(c, str) else c for c in cols]
        for c in cols_steps:
            if c is None:
                continue
            # an EMPTY vector is valid and means "no payload columns,
            # on= only" (reference 101.20: cols=list(NULL, character()))
            names = list(c) if isinstance(c, (list, tuple)) else None
            if (
                names is None
                or any(not isinstance(x, str) for x in names)
                or len(set(names)) != len(names)
            ):
                raise ValueError(
                    "'cols' must be a list of non-zero length, non-NA, "
                    "non-duplicated, character vectors, or eventually "
                    "NULLs (all columns)"
                )
        for t, c in zip(tables, cols_steps):
            if c is not None and any(x not in t.columns for x in c):
                raise ValueError(
                    "'cols' specify columns not present in corresponding "
                    "table"
                )
    # on: a plain str/name-list is shared across steps; a list whose
    # elements are lists/None is per-step (the reference's list-of-
    # character-vectors form)
    if on is None:
        on_steps = [None] * (n - 1)
    elif isinstance(on, str):
        on_steps = [[on]] * (n - 1)
    elif isinstance(on, (list, tuple)) and any(
        e is None or isinstance(e, (list, tuple)) for e in on
    ):
        # per-step form; a bare string element is a length-1 name vector
        on_steps = [
            [e] if isinstance(e, str) else (list(e) if e is not None else None)
            for e in on
        ]
        if len(on_steps) != n - 1:
            raise ValueError(
                "'on' must be non-NA, non-duplicated, character vector, "
                "or a list of such which length must be len(l)-1"
            )
    elif isinstance(on, (list, tuple)):
        on_steps = [list(on)] * (n - 1)
    else:
        raise ValueError(
            "'on' must be non-NA, non-duplicated, character vector, or a "
            "list of such which length must be len(l)-1"
        )
    for step in on_steps:
        if step is not None and (
            any(not isinstance(x, str) for x in step)
            or len(set(step)) != len(step)
        ):
            raise ValueError(
                "'on' must be non-NA, non-duplicated, character vector, "
                "or a list of such which length must be len(l)-1"
            )

    out = tables[0]
    out_cols = cols_steps[0]
    for i in range(1, n):
        out = mergepair(
            out,
            tables[i],
            on=on_steps[i - 1],
            how=hows[i - 1],
            mult=mults[i - 1],
            lhs_cols=out_cols,
            rhs_cols=cols_steps[i],
            join_many=jms[i - 1],
        )
        out_cols = None
    return out


#: in-place variant alias — Spark frames are immutable so set* has the
#: same semantics (reference R/mergelist.R:354 setmergelist)
setmergelist = mergelist


def _apply_mult(t: DT, by: Sequence[str], mult: str) -> DT:
    """Reduce ``t`` to one row per ``by`` key (mult="first"/"last") or
    raise on duplicate keys (mult="error"). Delegates the keep-one-row
    window to grouping.unique (the one implementation of that pattern);
    only the no-declared-order fallback (table order via a monotonic
    id) lives here."""
    if not by:
        raise ValueError("mergelist mult requires join columns")
    if mult == "error":
        dups = t.df.groupBy(*by).count().filter(F.col("count") > 1)
        if dups.limit(1).count() > 0:
            raise ValueError(
                'mergelist(mult="error"): right table has duplicate join keys'
            )
        return t
    from .grouping import unique

    src_list = t.key or t.order_by
    order_cols = _declared_entries(
        src_list,
        set(t.columns) - set(by),
    )
    if order_cols:
        return unique(t, by=by, fromLast=(mult == "last"), order=order_cols)
    tagged = DT(
        t.df.withColumn("__ord__", F.monotonically_increasing_id()),
        key=t.key,
        order_by=t.order_by,
    )
    out = unique(tagged, by=by, fromLast=(mult == "last"), order=["__ord__"])
    return DT(out.df.drop("__ord__"), key=t.key, order_by=t.order_by)


def CJ(spark, sorted_: bool = True, unique: bool = False, **cols) -> DT:
    """CJ — cross-join table of value vectors (reference R/setkey.R:311,
    src/cj.c:9). Accepts python sequences or single-column DataFrames."""
    dfs = []
    for name, values in cols.items():
        if isinstance(values, DataFrame):
            d = values.toDF(name)
        elif isinstance(values, DT):
            d = values.df.toDF(name)
        else:
            d = spark.createDataFrame([(v,) for v in values], [name])
        if unique:
            d = d.dropDuplicates()
        dfs.append(d)
    out = reduce(lambda l, r: l.crossJoin(r), dfs)
    names = list(cols.keys())
    if sorted_:
        out = out.orderBy(*names)
    return DT(out, key=names, order_by=names)


def J(spark, **cols) -> DT:
    """J — the i-lookup constructor (reference NAMESPACE export; J(a,b)
    builds data.table(a,b) for ``X[J(...)]`` — vectors ZIP row-wise
    with scalar/divisible-length recycling, unlike CJ which crosses).
    Pass the result as the ``i`` of ``DT.query`` / ``lookup``."""
    names = list(cols.keys())
    vecs = []
    n = 1
    for v in cols.values():
        v = list(v) if isinstance(v, (list, tuple)) else [v]
        vecs.append(v)
        n = max(n, len(v))
    rows = []
    for v in vecs:
        if n % len(v):
            raise ValueError(
                f"J: vector of length {len(v)} does not recycle to {n}"
            )
        rows.append(v * (n // len(v)))
    return DT(spark.createDataFrame(list(zip(*rows)), names))


def SJ(spark, **cols) -> DT:
    """SJ — sorted join table (reference R/setkey.R:303)."""
    names = list(cols.keys())
    rows = list(zip(*cols.values()))
    df = spark.createDataFrame(rows, names).orderBy(*names)
    return DT(df, key=names, order_by=names)


# setmergelist (reference R/mergelist.R set* variant): the reference
# mutates the first table in place; under Spark immutability every
# "set" verb is identity-by-design (SURVEY §1 copy/setattr rationale),
# so the in-place spelling IS the functional fold.
setmergelist = mergelist
