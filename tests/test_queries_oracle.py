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


def test_stateful_tws(spark):
    """transformWithStateInPandas per-user stats == the batch GROUP BY
    (same contract as stream_stateful_stats). Skips where the protobuf
    package (the tws state protocol) is unavailable; the import guard
    itself is asserted in that case."""
    import pytest

    from data_table_spark.streaming import (
        read_events_stream,
        run_available_now,
        stateful_user_stats_tws,
    )

    s = read_events_stream(spark, "/root/testdata/sf0.001")
    try:
        out = stateful_user_stats_tws(s)
    except ImportError as e:
        assert "protobuf" in str(e)
        pytest.skip("protobuf unavailable: transformWithState gated")
    from pyspark.sql import functions as F

    got = run_available_now(out, output_mode="update").withColumn(
        "sum_value", F.round("sum_value", 4)
    )
    from data_table_spark.core import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"].df
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.countDistinct("event_type").alias("n_types"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
