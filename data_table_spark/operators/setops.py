"""Table set operations (SURVEY §2.7) — funion / fintersect / fsetdiff /
fsetequal / all_equal (reference /root/reference/R/setops.R:60-108,109-260).

Direct Spark primitives; `all=` maps to the multiset variants. These
shuffle on the full row — at scale prefer restricting columns first
(column pruning keeps the exchange narrow).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import DT

__all__ = ["funion", "fintersect", "fsetdiff", "fsetequal", "all_equal"]


def funion(x: DT, y: DT, all: bool = False) -> DT:
    """funion (reference R/setops.R:91)."""
    u = x.df.unionByName(y.df)
    return DT(u if all else u.dropDuplicates())


def fintersect(x: DT, y: DT, all: bool = False) -> DT:
    """fintersect (reference R/setops.R:60)."""
    return DT(x.df.intersectAll(y.df) if all else x.df.intersect(y.df))


def fsetdiff(x: DT, y: DT, all: bool = False) -> DT:
    """fsetdiff (reference R/setops.R:76)."""
    return DT(x.df.exceptAll(y.df) if all else x.df.subtract(y.df))


def fsetequal(x: DT, y: DT, all: bool = True) -> bool:
    """fsetequal (reference R/setops.R:98): multiset equality via exceptAll
    both ways (two jobs; short-circuits on the first)."""
    if x.df.columns != y.df.columns:
        return False
    if all:
        return (
            x.df.exceptAll(y.df).limit(1).count() == 0
            and y.df.exceptAll(x.df).limit(1).count() == 0
        )
    return (
        x.df.subtract(y.df).limit(1).count() == 0
        and y.df.subtract(x.df).limit(1).count() == 0
    )


_NUMERIC_DTYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
)


def _mode(dtype: str) -> str:
    """R mode() analog: the comparison family all.equal checks first —
    every numeric width is one mode (integer==numeric in base R)."""
    if dtype.startswith(_NUMERIC_DTYPES):
        return "numeric"
    if dtype == "string":
        return "character"
    if dtype == "boolean":
        return "logical"
    return dtype


def all_equal(
    target: DT,
    current: DT,
    check_attributes: bool = True,
    ignore_col_order: bool = False,
    ignore_row_order: bool = False,
    tolerance: float = 1.4901161193847656e-08,
):
    """all.equal.data.table (reference R/setops.R:109-260): returns True
    or a STRING describing the first difference (the base-R all.equal
    contract — callers test `is True`).

    Checks in the reference's order: row/column counts, column names,
    column order (unless ignore_col_order), column modes
    (integer==numeric, like base R), then — with check_attributes —
    keys and declared order (the index analog here). Data comparison:

    - ignore_row_order=False needs a deterministic row pairing, which
      an unordered Spark frame only has through a declared order —
      both sides' order_by is required, rows pair by row_number over
      it (the reference compares in memory order, which Spark does not
      have).
    - ignore_row_order=True with tolerance=0, no double columns, or
      duplicate rows on both sides (the reference FORCES tolerance to
      0 in that case) compares multisets via exceptAll both ways.
    - otherwise (duplicate-free sides, double columns, tolerance>0):
      rows pair ONE-TO-ONE — rank-by-rank within each non-double key
      group, doubles sorted lexicographically — and equality holds
      when every pair is within tolerance on every double column (the
      relational form of the reference's rolling-join pairing; plain
      two-way semi-joins would accept bipartite coverage without a
      valid matching). NULL doubles pair with NULL and compare equal
      (base R NA==NA under all.equal).
    """
    x, y = target.df, current.df
    nx, ny = x.count(), y.count()
    msg = []
    if nx != ny:
        msg.append("Different number of rows")
    if len(x.columns) != len(y.columns):
        msg.append("Different number of columns")
    diff_names = sorted(x.columns) != sorted(y.columns)
    if check_attributes and diff_names:
        msg.append("Different column names")
    if not diff_names and not ignore_col_order and x.columns != y.columns:
        msg.append("Different column order")
    if msg:
        return "; ".join(msg)
    if diff_names:
        # check_attributes=False with equal counts but different names:
        # the reference compares positionally — rename so every
        # downstream by-name lookup pairs column i with column i.
        y = y.toDF(*x.columns)
    elif ignore_col_order and x.columns != y.columns:
        y = y.select(*x.columns)

    tmodes = {c: _mode(t) for c, t in x.dtypes}
    cmodes = {c: _mode(t) for c, t in y.dtypes}
    bad = [c for c in x.columns if tmodes[c] != cmodes[c]][:3]
    if bad:
        detail = " ".join(
            f"{c}({tmodes[c]}!={cmodes[c]})" for c in bad
        )
        return f"Datasets have different column modes. First 3: {detail}"

    if check_attributes:
        if target.key != current.key:
            return (
                f"Datasets have different keys. 'target': {target.key or 'has no key'}."
                f" 'current': {current.key or 'has no key'}."
            )
        if target.order_by != current.order_by:
            return (
                "Datasets have different declared orders. "
                f"'target': {target.order_by or 'none'}. "
                f"'current': {current.order_by or 'none'}."
            )

    dbl = [c for c, t in x.dtypes if t in ("double", "float")]

    if not ignore_row_order:
        if not target.order_by or not current.order_by:
            return (
                "ignore_row_order=False needs BOTH sides to declare an "
                "order (Spark frames have no memory order to compare in)"
            )
        from ..core import _order_exprs
        from pyspark.sql import Window

        wx = Window.orderBy(*_order_exprs(x, target.order_by))
        wy = Window.orderBy(*_order_exprs(y, current.order_by))
        xr = x.withColumn("__rn__", F.row_number().over(wx))
        yr = y.withColumn("__rn__", F.row_number().over(wy))
        conds = [
            (
                # eqNullSafe first: NULL==NULL is equal (base R NA==NA),
                # and abs(NULL-NULL)<=tol alone would evaluate to NULL
                xr[c].eqNullSafe(yr[c]) | (F.abs(xr[c] - yr[c]) <= tolerance)
                if c in dbl and tolerance > 0
                else xr[c].eqNullSafe(yr[c])
            )
            for c in x.columns
        ]
        pred = conds[0]
        for c in conds[1:]:
            pred = pred & c
        matched = xr.join(yr, on="__rn__").filter(pred).count()
        return True if matched == nx else (
            f"Rows differ in order-paired comparison: {nx - matched} of {nx}"
        )

    def _dup(df) -> bool:
        return (
            df.groupBy(*df.columns).agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1).limit(1).count() > 0
        )

    if tolerance > 0 and dbl:
        tdup, cdup = _dup(x), _dup(y)
        if tdup != cdup:
            which = "target" if tdup else "current"
            other = "current" if tdup else "target"
            return (
                f"Dataset '{which}' has duplicate rows while '{other}' doesn't"
            )
        if tdup:  # both: the reference forces tolerance to 0
            tolerance = 0.0

    if tolerance == 0 or not dbl:
        if (
            x.exceptAll(y).limit(1).count() == 0
            and y.exceptAll(x).limit(1).count() == 0
        ):
            return True
        return "Dataset 'current' has rows not present in 'target' (or vice versa)"

    other = [c for c in x.columns if c not in dbl]
    # A one-to-one PAIRING, not bipartite coverage: two one-way
    # semi-joins would accept e.g. target {0.0, 0.1, 1.0} vs current
    # {0.05, 1.0, 1.05} at tolerance 0.07 (every row has SOME match
    # both ways but no valid matching exists). Instead sort both sides
    # within each non-double key group and pair rank-by-rank — the
    # relational form of the reference's rolling-join pairing. Both
    # sides are duplicate-free here, and for 1-D sorted sequences
    # rank-pairing is the optimal matching; multi-double rows sort
    # lexicographically, which keeps the pairing deterministic.
    from pyspark.sql import Window

    wkey = Window.partitionBy(*[F.col(c) for c in other]).orderBy(
        *[F.col(c).asc_nulls_first() for c in dbl]
    ) if other else Window.partitionBy(F.lit(1)).orderBy(
        *[F.col(c).asc_nulls_first() for c in dbl]
    )
    # explicit aliases: both sides may share lineage (comparing a frame
    # with a recomputation of itself is the common call)
    xr = x.withColumn("__rk__", F.row_number().over(wkey)).alias("__t__")
    yr = (
        y.select(*x.columns)
        .withColumn("__rk__", F.row_number().over(wkey))
        .alias("__c__")
    )
    on = [
        F.col(f"__t__.{c}").eqNullSafe(F.col(f"__c__.{c}")) for c in other
    ] + [F.col("__t__.__rk__") == F.col("__c__.__rk__")]
    pred = on[0]
    for c in on[1:]:
        pred = pred & c
    close = [
        # eqNullSafe first: NULL pairs with NULL (asc_nulls_first puts
        # them at the same ranks); bare abs-diff would yield NULL
        F.col(f"__t__.{c}").eqNullSafe(F.col(f"__c__.{c}"))
        | (F.abs(F.col(f"__t__.{c}") - F.col(f"__c__.{c}")) <= tolerance)
        for c in dbl
    ]
    ok = close[0]
    for c in close[1:]:
        ok = ok & c
    matched = xr.join(yr, pred, "inner").filter(ok).count()
    if matched == nx:
        return True
    return (
        f"Rows without a tolerance match in rank pairing: "
        f"{nx - matched} of {nx}"
    )
