"""Interval (overlap) joins — foverlaps / inrange (SURVEY §2.3).

Reference: /root/reference/R/foverlaps.R:1-249 (driver; type=
any/within/start/end/equal, maxgap/minoverlap reserved), C lookup
/root/reference/src/ijoin.c:9; inrange /root/reference/src/inrange.c:4.

Spark-first: an overlap join is a range join with an equi prefix. With at
least one equi key Catalyst executes hash/sort-merge on the prefix and
filters the range predicate on the probe side; with no equi key it falls
back to broadcast-nested-loop — callers should pass an equi prefix at
scale (document, as the reference requires keyed tables here too).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import DT, _namelist

__all__ = ["foverlaps", "inrange"]


def _overlap_pred(
    xs, xe, ys, ye, type_: str, maxgap: int = 0, minoverlap: int = 1
) -> Column:
    """Predicate table for foverlaps type= (reference R/foverlaps.R:1-249).
    x = the i-side intervals being looked up, y = the keyed table.

    maxgap / minoverlap (the reference RESERVES these arguments and
    errors on non-default values — implemented here, a strict surface
    extension): with closed integer intervals, overlap length
    ov = min(xe, ye) - max(xs, ys) + 1 is the number of shared
    positions; when the intervals are disjoint, -ov is the number of
    positions strictly between them (adjacent intervals have ov = 0).
    So type="any" generalizes to ONE predicate threshold:
    - minoverlap = m > 1: require ov >= m (at least m shared positions)
    - maxgap = g > 0: require ov >= -g (overlap, touch, or a gap of at
      most g positions)
    The two knobs are mutually exclusive, as the reference documents."""
    if type_ == "any":        # intervals intersect (closed ends)
        if maxgap and minoverlap > 1:
            raise ValueError("maxgap and minoverlap are mutually exclusive")
        if maxgap or minoverlap > 1:
            ov = F.least(xe, ye) - F.greatest(xs, ys) + F.lit(1)
            return ov >= F.lit(minoverlap if minoverlap > 1 else -maxgap)
        return (xs <= ye) & (ys <= xe)
    if type_ == "within":     # x within y
        return (xs >= ys) & (xe <= ye)
    if type_ == "start":      # same start
        return xs == ys
    if type_ == "end":        # same end
        return xe == ye
    if type_ == "equal":      # identical interval
        return (xs == ys) & (xe == ye)
    raise ValueError(f"bad type: {type_}")


def foverlaps(
    x: DT,
    y: DT,
    by_x: Sequence[str],
    by_y: Sequence[str] | None = None,
    type_: str = "any",
    mult: str = "all",
    nomatch: str | None = None,
    prefix: str = "i_",
    maxgap: int = 0,
    minoverlap: int = 1,
) -> DT:
    """foverlaps(x, y): for each x interval, find overlapping y intervals.

    by_x / by_y: equi key columns followed by (start, end) — the
    reference's convention that the last two key columns are the interval
    (R/foverlaps.R docs). Output: x columns + y payload (prefix on clash).
    maxgap/minoverlap (type="any" only, integer intervals): see
    _overlap_pred — implemented here although the reference only
    reserves them.
    """
    if (maxgap or minoverlap > 1) and type_ != "any":
        raise ValueError("maxgap/minoverlap apply to type='any' only")
    by_x = _namelist(by_x)
    by_y = _namelist(by_y) or by_x
    *keys_x, sx, ex = by_x
    *keys_y, sy, ey = by_y

    xdf, ydf = x.df, y.df
    conds = [xdf[a] == ydf[b] for a, b in zip(keys_x, keys_y)]
    conds.append(
        _overlap_pred(
            xdf[sx], xdf[ex], ydf[sy], ydf[ey], type_,
            maxgap=maxgap, minoverlap=minoverlap,
        )
    )
    cond = reduce(lambda l, r: l & r, conds)
    how = "left" if nomatch == "NA" else "inner"
    joined = xdf.join(ydf, cond, how)

    out_cols = [xdf[c].alias(c) for c in x.columns]
    for c in y.columns:
        if c in keys_y:
            continue
        name = c if c not in x.columns else f"{prefix}{c}"
        out_cols.append(ydf[c].alias(name))
    out = joined.select(*out_cols)

    if mult in ("first", "last"):
        from pyspark.sql import Window

        order = [c for c in x.order_by if c in x.columns] or list(by_x)
        ycols = [c if c not in x.columns else f"{prefix}{c}" for c in y.columns if c not in keys_y]
        direction = F.asc if mult == "first" else F.desc
        w = Window.partitionBy(*[F.col(c) for c in order]).orderBy(
            *[direction(c) for c in ycols]
        )
        out = (
            out.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
    return DT(out, order_by=x.order_by)


def inrange(
    dt: DT,
    col: str,
    ranges: DT,
    lower: str,
    upper: str,
    keys: Sequence[str] | None = None,
    incbounds: bool = True,
) -> DT:
    """x %inrange% table-of-ranges (reference R/between.R:76-100,
    src/inrange.c:4): keep rows whose ``col`` falls in ANY range.

    left_semi join — Spark never materializes the multiplicity, and a
    small ranges table broadcasts.
    """
    keys = _namelist(keys)
    xdf, rdf = dt.df, ranges.df
    lo, hi = rdf[lower], rdf[upper]
    pred = (xdf[col] >= lo) & (xdf[col] <= hi) if incbounds else (xdf[col] > lo) & (xdf[col] < hi)
    conds = [xdf[k] == rdf[k] for k in keys] + [pred]
    cond = reduce(lambda l, r: l & r, conds)
    return DT(xdf.join(rdf, cond, "left_semi"), key=dt.key, order_by=dt.order_by)
