"""Driver contract for the spark-graft builder (PySpark target).

Each entry in ``queries()`` exercises one operator family from SURVEY.md §2
through the data_table_spark API; ``oracle_sql()`` holds the DuckDB-
runnable ANSI-SQL equivalent. Aggregates over doubles are cast to
DECIMAL(18,4) before summation in BOTH engines: decimal addition is
order-independent and exact, so the value-hash comparison is immune to
float summation-order differences between Spark partial aggregation and
DuckDB, then cast back to DOUBLE for a common output schema.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from data_table_spark.queries import QUERIES, ORACLE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped GForce aggregate) on sf0.001."""
    return QUERIES["gforce_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
