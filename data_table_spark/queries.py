"""Query registry: every implemented operator from SURVEY.md §2 exposed as
(spark, sf_dir) -> DataFrame, with a DuckDB oracle SQL string.

Conventions (see __spark_entry__.py docstring):
- double aggregates go through DECIMAL(18,4) for order-independent exact
  sums, then cast to DOUBLE;
- every computed column is aliased identically in Spark and SQL;
- ordered operators order by natural keys (never file order).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .core import DT, N, load_tables

QUERIES: dict = {}
ORACLE: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


def dsum(c, alias):
    """Order-independent exact sum of a double column → double."""
    return F.sum(F.col(c).cast("decimal(18,4)")).cast("double").alias(alias)


def dsum_expr(e, alias):
    return F.sum(e.cast("decimal(18,4)")).cast("double").alias(alias)


# --------------------------------------------------------------------------
# §2.4 grouping / GForce aggregate set
# --------------------------------------------------------------------------

@query(
    "gforce_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_gforce_q1(spark, sf_dir):
    """TPC-H Q1-shaped grouped aggregate — the GForce hot path
    (reference src/gsumm.c:45 gforce; gsum :348, gmean :582).
    Spark plan: partial HashAggregate → exchange on group keys → final
    HashAggregate, whole-stage codegen; no Python in the loop."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    out = li.query(
        i=F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"),
        j={
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"),
            "sum_base_price": F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double"),
            "sum_disc_price": F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).cast("double"),
            "avg_qty": (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).cast("double"),
            "count_order": F.count(F.lit(1)),
        },
        by=["l_returnflag", "l_linestatus"],
    )
    return out.df


# --------------------------------------------------------------------------
# §2.2 projection / filter / predicates
# --------------------------------------------------------------------------

@query(
    "select_compute",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price,
           CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE) AS charged
    FROM lineitem
    """,
)
def q_select_compute(spark, sf_dir):
    """DT[, .(computed cols)] — j-select (reference R/data.table.R:1102,
    src/subset.c:278). Column pruning reaches the parquet scan."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].query(
        j={
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "net_price": F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "charged": F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
        }
    ).df


@query(
    "filter_scan",
    """
    SELECT * FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    """,
)
def q_filter_scan(spark, sf_dir):
    """DT[i] predicate filter (reference R/data.table.R:998-1051); the
    subset→join/auto-index rewrite (R/data.table.R:3514) is subsumed by
    Catalyst predicate pushdown into the parquet scan."""
    t = load_tables(spark, sf_dir)
    return t["orders"].query(
        i=(F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)
    ).df


@query(
    "filter_chin",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_chin(spark, sf_dir):
    """%chin% / %in% membership (reference src/chmatch.c:154-170)."""
    from .functions import chin

    t = load_tables(spark, sf_dir)
    return t["orders"].query(
        i=chin("o_orderpriority", ["1-URGENT", "2-HIGH"]),
        j=["o_orderkey", "o_orderpriority"],
    ).df


@query(
    "filter_notin",
    """
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE o_orderstatus NOT IN ('O')
    """,
)
def q_filter_notin(spark, sf_dir):
    """%notin% (reference R/notin.R, src/negate.c:15)."""
    from .functions import notchin

    t = load_tables(spark, sf_dir)
    return t["orders"].query(
        i=notchin("o_orderstatus", ["O"]), j=["o_orderkey", "o_orderstatus"]
    ).df


@query(
    "filter_between",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
    """,
)
def q_filter_between(spark, sf_dir):
    """%between% incbounds (reference R/between.R:2, src/between.c:9)."""
    from .functions import between

    t = load_tables(spark, sf_dir)
    return t["lineitem"].query(
        i=between("l_quantity", 10, 20),
        j=["l_orderkey", "l_linenumber", "l_quantity"],
    ).df


@query(
    "filter_like",
    """
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name, 'red|blue')
    """,
)
def q_filter_like(spark, sf_dir):
    """%like% regex filter (reference R/like.R:1-24)."""
    from .functions import like

    t = load_tables(spark, sf_dir)
    return t["part"].query(i=like("p_name", "red|blue"), j=["p_partkey", "p_name"]).df


@query(
    "fifelse_fcase",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_tag,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                WHEN o_orderpriority = '2-HIGH' THEN 2
                ELSE 9 END AS prio_rank
    FROM orders
    """,
)
def q_fifelse_fcase(spark, sf_dir):
    """fifelse + fcase (reference src/fifelse.c:9,210)."""
    from .functions import fcase, fifelse

    t = load_tables(spark, sf_dir)
    return t["orders"].query(
        j={
            "o_orderkey": F.col("o_orderkey"),
            "size_tag": fifelse(F.col("o_totalprice") > 200000, F.lit("big"), F.lit("small")),
            "prio_rank": fcase(
                F.col("o_orderpriority") == "1-URGENT", F.lit(1),
                F.col("o_orderpriority") == "2-HIGH", F.lit(2),
                default=F.lit(9),
            ),
        }
    ).df


@query(
    "fcoalesce_nafill",
    """
    SELECT event_id,
           CAST(COALESCE(CASE WHEN event_type = 'purchase' THEN NULL ELSE value END, -1.0) AS DOUBLE) AS v_filled
    FROM events
    """,
)
def q_fcoalesce(spark, sf_dir):
    """fcoalesce / nafill const (reference src/coalesce.c:9,
    src/nafill.c:120). NULLs injected deterministically."""
    from .functions import fcoalesce

    t = load_tables(spark, sf_dir)
    v = F.when(F.col("event_type") == "purchase", F.lit(None).cast("double")).otherwise(F.col("value"))
    return t["events"].query(
        j={
            "event_id": F.col("event_id"),
            "v_filled": fcoalesce(v, F.lit(-1.0)).cast("double"),
        }
    ).df
