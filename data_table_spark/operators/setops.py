"""Table set operations (SURVEY §2.7) — funion / fintersect / fsetdiff /
fsetequal (reference /root/reference/R/setops.R:60-108).

Direct Spark primitives; `all=` maps to the multiset variants. These
shuffle on the full row — at scale prefer restricting columns first
(column pruning keeps the exchange narrow).
"""

from __future__ import annotations

from ..core import DT

__all__ = ["funion", "fintersect", "fsetdiff", "fsetequal"]


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
