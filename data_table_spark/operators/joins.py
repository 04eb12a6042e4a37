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
    "mergelist",
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
) -> DT:
    """``X[Y, on=...]`` — right-table-lookup join (reference
    R/data.table.R:842-997).

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

    xdf, ydf = x.df, y.df

    if notjoin:
        cond = _cond(xdf, ydf, pairs, na_matches)
        return DT(xdf.join(ydf, cond, "left_anti"), key=x.key, order_by=x.order_by)

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

    cond = _cond(xdf, ydf, pairs, na_matches)
    how = "left" if nomatch == "NA" else "inner"
    joined = ydf.join(xdf, cond, how)

    # mult: keep first/last X match per Y row in X's declared order
    if need_yid:
        order_cols = [c for c in (x.key or x.order_by) if c in xdf.columns]
        if not order_cols:
            order_cols = [a for a, _ in equi]
        if mult == "error":
            counts = joined.groupBy(_YID).count().filter(F.col("count") > 1)
            if counts.limit(1).count() > 0:
                raise ValueError('mult="error": some i rows match multiple x rows')
            joined = joined.drop(_YID)
        else:
            ordering = [
                xdf[c].desc() if mult == "last" else xdf[c].asc() for c in order_cols
            ]
            w = Window.partitionBy(_YID).orderBy(*ordering)
            joined = (
                joined.withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") == 1)
                .drop("__rn__", _YID)
            )

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

    cond = [xdf[a] == ydf[b] for a, b in zip(bx, bby)]
    joined = xdf.join(ydf, reduce(lambda l, r: l & r, cond), how)
    # key columns: coalesce both sides so full-outer keeps them non-null
    keys = [F.coalesce(xdf[a], ydf[b]).alias(a) for a, b in zip(bx, bby)]
    rest_x = [xdf[c] for c in xdf.columns if c not in bx]
    rest_y = [ydf[c] for c in ydf.columns if c not in bby]
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


def mergelist(tables: Sequence[DT], on=None, how: str = "left", mult: str = "all") -> DT:
    """mergelist — n-way fold of joins (reference R/mergelist.R:84-259,347).

    ``mult`` applies per fold step to the incoming (right) table's matches,
    as the reference's per-step cardinality control:

    - "all" (default): every matching right row.
    - "first"/"last": the right table is reduced to one row per join key
      (first/last in its declared key/order, else table order via a
      monotonic id) BEFORE the merge — a per-key window shuffle on the
      small right side, no driver involvement.
    - "error": raise if the right table carries duplicate join keys
      (reference mergelist mult="error" semantics); costs one extra
      aggregate job on the right side.
    """
    if not tables:
        raise ValueError("empty table list")
    if mult not in ("all", "first", "last", "error"):
        raise ValueError(f'bad mult: {mult!r}')
    if mult != "all" and how not in ("left", "inner", "full", "right"):
        # semi/anti never multiply rows and cross multiplies by design;
        # accepting-and-ignoring mult here would repeat the silent no-op
        # this argument was added to eliminate
        raise ValueError(f'mult={mult!r} is not meaningful for how={how!r}')
    acc = tables[0]
    for t in tables[1:]:
        if mult != "all" and how in ("left", "inner", "full", "right"):
            by = _namelist(on) or [c for c in acc.columns if c in t.columns]
            t = _apply_mult(t, by, mult)
        if how == "cross":
            acc = DT(acc.df.crossJoin(t.df))
        elif how in ("semi", "anti"):
            acc = join(acc, t, on=on, how=f"left_{how}")
        elif how in ("left", "inner", "full", "right"):
            acc = merge(
                acc, t, by=_namelist(on) or None,
                all_x=how in ("left", "full"), all_y=how in ("right", "full"),
            )
        else:
            raise ValueError(f"bad how: {how}")
    return acc


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

    order_cols = [c for c in (t.key or t.order_by) if c in t.columns and c not in by]
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
