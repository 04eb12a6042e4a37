"""Differential oracle suite: every registered query vs its DuckDB SQL.

Mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): run the
Spark query and the oracle SQL on the same parquet, compare row count,
schema (column names), and values. Queries without an oracle entry get a
weaker runs-and-returns-rows check, same as the driver.
"""

from __future__ import annotations

import pytest

from data_table_spark.queries import QUERIES, ORACLE

from conftest import SF_DIR, assert_same


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    sdf = df.df if hasattr(df, "df") else df
    if name in ORACLE:
        assert_same(sdf, duck, ORACLE[name])
    else:
        # no-oracle ops (streaming/iterative): schema is stable + runs
        assert sdf.columns, f"{name}: empty schema"
        assert sdf.count() >= 0
