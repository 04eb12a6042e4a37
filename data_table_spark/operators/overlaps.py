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

__all__ = ["foverlaps", "foverlaps_bucketed", "inrange", "suggest_bucket_width"]


def suggest_bucket_width(
    dt: DT, lower: str, upper: str, quantile: float = 0.75,
    rel_error: float = 0.05,
) -> float:
    """Pick a bucket_width for foverlaps_bucketed / inrange from the
    interval-length distribution: the chosen quantile of (upper -
    lower), floored at 1. One approxQuantile job returning a single
    scalar to the driver (the same convenience trade as froll's n_max
    fallback — at 100 TB either run it once on a sample or pass
    bucket_width explicitly; the helper exists so callers don't guess).
    The default 0.75 quantile keeps ≥75% of intervals within ~1-2
    buckets while bounding the per-bucket cross product."""
    diff = dt.df.select((F.col(upper) - F.col(lower)).cast("double").alias("__len__"))
    q = diff.approxQuantile("__len__", [quantile], rel_error)[0]
    return max(float(q or 0.0), 1.0)


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
    out = _project_overlap(x, y, joined, xdf, ydf, keys_y, prefix)
    out = _apply_mult(out, x, y, keys_y, prefix, by_x, mult)
    return DT(out, order_by=x.order_by)


def _project_overlap(x, y, joined, xdf, ydf, keys_y, prefix):
    """Shared foverlaps output shape: x columns + y payload (prefix on
    clash), y equi keys dropped (they equal x's)."""
    out_cols = [xdf[c].alias(c) for c in x.columns]
    for c in y.columns:
        if c in keys_y:
            continue
        name = c if c not in x.columns else f"{prefix}{c}"
        out_cols.append(ydf[c].alias(name))
    return joined.select(*out_cols)


def _apply_mult(out, x, y, keys_y, prefix, by_x, mult):
    if mult not in ("first", "last"):
        return out
    from pyspark.sql import Window

    order = [c for c in x.order_by if c in x.columns] or list(by_x)
    ycols = [c if c not in x.columns else f"{prefix}{c}" for c in y.columns if c not in keys_y]
    direction = F.asc if mult == "first" else F.desc
    w = Window.partitionBy(*[F.col(c) for c in order]).orderBy(
        *[direction(c) for c in ycols]
    )
    return (
        out.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def foverlaps_bucketed(
    x: DT,
    y: DT,
    by_x: Sequence[str],
    by_y: Sequence[str] | None = None,
    type_: str = "any",
    bucket_width: float | int = None,
    mult: str = "all",
    nomatch: str | None = None,
    prefix: str = "i_",
    maxgap: int = 0,
    minoverlap: int = 1,
) -> DT:
    """foverlaps for the case where BOTH sides are too large to broadcast.

    Same semantics and output shape as :func:`foverlaps` (reference
    R/foverlaps.R:1-249), different physical strategy. ``foverlaps``
    leans on Catalyst's range-join handling, which at 100 TB × 100 TB
    with a low-selectivity equi prefix degrades to a huge sort-merge
    with a fat per-key cross product. This variant turns the interval
    predicate itself into an equi key:

    1. bin the number line into fixed-width buckets (``bucket_width``);
    2. replicate every interval into each bucket it spans —
       ``explode(sequence(floor(s/w), floor((e+maxgap)/w)))``, pure
       codegen'd JVM expressions, expansion factor ≈ interval_length/w;
    3. shuffle-equi-join on (equi keys…, bucket) — an ordinary hash /
       sort-merge join, AQE-skew-splittable, no BroadcastNestedLoop;
    4. keep a matched pair ONLY in the bucket containing
       ``greatest(x.start, y.start)`` so each qualifying pair survives
       exactly once — no post-join ``distinct`` (the classic
       report-in-one-cell trick from grid spatial joins).

    Why step 4 is sound for every supported ``type_``: each predicate
    (any/within/start/end/equal, and the maxgap/minoverlap forms)
    implies ``m := greatest(xs, ys) <= least(xe, ye) + pad`` where pad
    is 0 for overlap-implying forms and ``maxgap + 1`` for the gap form
    (closed integer intervals: ov = least(e) - greatest(s) + 1 >= -g
    allows m = least(e) + g + 1), so m lies in BOTH replicated bucket
    ranges ``[floor(s/w), floor((e+pad)/w)]``; conversely only the
    single bucket ``floor(m/w)`` passes the filter.

    ``bucket_width`` must be supplied and should be on the order of the
    typical interval length: too small → replication blow-up, too big →
    per-bucket cross products. At scale derive it once from a sample
    quantile of ``e - s`` upstream.
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("foverlaps_bucketed requires bucket_width > 0")
    if (maxgap or minoverlap > 1) and type_ != "any":
        raise ValueError("maxgap/minoverlap apply to type='any' only")
    by_x = _namelist(by_x)
    by_y = _namelist(by_y) or by_x
    *keys_x, sx, ex = by_x
    *keys_y, sy, ey = by_y
    w = F.lit(bucket_width)

    def bkt(col: Column) -> Column:
        return F.floor(col / w).cast("long")

    # Replication pad: with closed integer intervals the gap predicate is
    # ov = least(xe,ye) - greatest(xs,ys) + 1 >= -maxgap, so the meeting
    # point m = greatest(xs,ys) can sit at least(xe,ye) + maxgap + 1 —
    # hence the +1 (plain overlap needs no pad: m <= least(xe,ye)).
    pad = F.lit(maxgap + 1 if maxgap else 0)
    # Tag x rows pre-explode so nomatch="NA" can restore unmatched rows.
    xdf = x.df.withColumn("__xid__", F.monotonically_increasing_id())
    xrep = xdf.withColumn(
        "__bkt__", F.explode(F.sequence(bkt(F.col(sx)), bkt(F.col(ex) + pad)))
    )
    yrep = y.df.withColumn(
        "__bkt__", F.explode(F.sequence(bkt(F.col(sy)), bkt(F.col(ey) + pad)))
    )

    conds = [xrep["__bkt__"] == yrep["__bkt__"]]
    conds += [xrep[a] == yrep[b] for a, b in zip(keys_x, keys_y)]
    conds.append(
        _overlap_pred(
            xrep[sx], xrep[ex], yrep[sy], yrep[ey], type_,
            maxgap=maxgap, minoverlap=minoverlap,
        )
    )
    conds.append(xrep["__bkt__"] == bkt(F.greatest(xrep[sx], yrep[sy])))
    cond = reduce(lambda l, r: l & r, conds)
    joined = xrep.join(yrep, cond, "inner")
    matched = _project_overlap(x, y, joined, xrep, yrep, keys_y, prefix)

    if nomatch == "NA":
        ypay = [c for c in y.columns if c not in keys_y]
        ynames = [c if c not in x.columns else f"{prefix}{c}" for c in ypay]
        hit_ids = joined.select(xrep["__xid__"].alias("__xid__"))
        misses = xdf.join(hit_ids, "__xid__", "left_anti").select(
            *[F.col(c) for c in x.columns],
            *[F.lit(None).cast(y.df.schema[c].dataType).alias(n)
              for c, n in zip(ypay, ynames)],
        )
        matched = matched.unionByName(misses)

    out = _apply_mult(matched, x, y, keys_y, prefix, by_x, mult)
    return DT(out, order_by=x.order_by)


def _merge_ranges(
    rdf, lower: str, upper: str, keys: Sequence[str], incbounds: bool
):
    """Disjoint interval union of a ranges table, per key group — the
    inrange pre-pass (see inrange docstring for the invariance
    argument). Classic sweep: sort by (lo, hi), a range starts a new
    merge group iff its lo clears the running max of all PRIOR his
    (strictly above for incbounds — touching endpoints share the
    closed point x = b; at-or-above for exclusive bounds — (a,b),(b,c)
    exclude x = b, so they must NOT merge), then one (group) aggregate
    takes min(lo)/max(hi). Empty ranges (lo > hi, or lo >= hi when
    exclusive) and NULL bounds/keys match nothing under either
    predicate form and are dropped up front — also what keeps the
    running-max comparison two-valued."""
    from pyspark.sql import Window as _W

    lo, hi = F.col(lower), F.col(upper)
    valid = lo.isNotNull() & hi.isNotNull() & (
        (lo <= hi) if incbounds else (lo < hi)
    )
    for k in keys:
        valid = valid & F.col(k).isNotNull()
    r = rdf.select(*keys, lower, upper).filter(valid)
    order = _W.partitionBy(*keys).orderBy(lower, upper)
    prev_max = F.max(hi).over(
        order.rowsBetween(_W.unboundedPreceding, -1)
    )
    new_grp = F.when(
        prev_max.isNull()
        | ((lo > prev_max) if incbounds else (lo >= prev_max)),
        F.lit(1),
    ).otherwise(F.lit(0))
    grp = F.sum(new_grp).over(
        order.rowsBetween(_W.unboundedPreceding, 0)
    )
    return (
        r.withColumn("__grp__", grp)
        .groupBy(*keys, "__grp__")
        .agg(F.min(lo).alias(lower), F.max(hi).alias(upper))
        .drop("__grp__")
    )


def inrange(
    dt: DT,
    col: str,
    ranges: DT,
    lower: str,
    upper: str,
    keys: Sequence[str] | None = None,
    incbounds: bool = True,
    bucket_width: float | int | None = None,
) -> DT:
    """x %inrange% table-of-ranges (reference R/between.R:76-100,
    src/inrange.c:4): keep rows whose ``col`` falls in ANY range.

    left_semi join — Spark never materializes the multiplicity, and a
    small ranges table broadcasts.

    ``bucket_width``: big-big posture for when the RANGES table is also
    too large to broadcast. Each point belongs to exactly ONE
    fixed-width bucket and each range explodes into the buckets it
    spans, so the semi join becomes an ordinary shuffle equi-join on
    (keys, bucket) + the range predicate — no broadcast, no
    BroadcastNestedLoopJoin, and semi-join semantics make the
    replicated matches free (no dedup needed). Pick a width on the
    order of the typical range length, as for foverlaps_bucketed.

    r14 optimization (broadcast path only): the ranges are pre-merged
    into their DISJOINT interval union per key group before the join.
    Membership in ANY range depends only on the union of the ranges,
    so the output is invariant (pinned by
    test_inrange_merged_equals_naive); what changes is the
    BroadcastNestedLoopJoin's inner loop — |merged| disjoint intervals
    instead of |ranges| overlapping ones. On the declared inrange_semi
    the ~3.6k overlapping [size, size+2] ranges collapse to ONE
    interval (measured 9.1s -> sub-second at sf0.1; the bound at scale
    is rows x disjoint-intervals instead of rows x ranges). Touching
    endpoints merge only under incbounds (x = b is in [a,b] u [b,c]
    but NOT in (a,b) u (b,c)); empty and NULL-bound ranges match
    nothing and are dropped. The merge itself is two windows + one
    aggregate over the RANGES side, which this path already declares
    broadcastable-small; the bucketed big-big path is untouched (a
    global sort of an unbroadcastable ranges table is the exact
    anti-pattern this operator's bucketing avoids).
    """
    keys = _namelist(keys)
    xdf, rdf = dt.df, ranges.df
    if bucket_width is None:
        rdf = _merge_ranges(rdf, lower, upper, keys, incbounds)
    if bucket_width is not None:
        if bucket_width <= 0:
            raise ValueError("bucket_width must be > 0")
        w = F.lit(bucket_width)
        xdf = xdf.withColumn("__bkt__", F.floor(xdf[col] / w).cast("long"))
        rdf = rdf.withColumn(
            "__bkt__",
            F.explode(
                F.sequence(
                    F.floor(rdf[lower] / w).cast("long"),
                    F.floor(rdf[upper] / w).cast("long"),
                )
            ),
        )
    lo, hi = rdf[lower], rdf[upper]
    pred = (xdf[col] >= lo) & (xdf[col] <= hi) if incbounds else (xdf[col] > lo) & (xdf[col] < hi)
    conds = [xdf[k] == rdf[k] for k in keys] + [pred]
    if bucket_width is not None:
        conds.append(xdf["__bkt__"] == rdf["__bkt__"])
    cond = reduce(lambda l, r: l & r, conds)
    out = xdf.join(rdf, cond, "left_semi")
    if bucket_width is not None:
        out = out.drop("__bkt__")
    return DT(out, key=dt.key, order_by=dt.order_by)
