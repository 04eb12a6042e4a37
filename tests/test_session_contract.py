"""Environment-drift smoke tests (VERDICT r3 item 3).

Round 3 was lost to a silent Spark-version change: the events parquet
TIMESTAMP(NANOS) column started arriving as TIMESTAMP_NTZ instead of
int64 nanos, and nothing failed until deep inside query 9. These tests
pin the event-time contract to literal values at sf0.001 so any future
read-path drift fails loudly in seconds, at session start.

Expected literals were produced by DuckDB (`epoch_us(ts)`), the oracle
engine, on /root/testdata/sf0.001/events.parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_table_spark.core import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

# DuckDB: select event_id, epoch_us(ts) from events where event_id in (0,1,2)
EXPECTED_US = {
    0: 1704067798778549,
    1: 1704068166738090,
    2: 1704068217102229,
}


def test_events_ts_contract(spark):
    t = load_tables(spark, SF_DIR)
    ev = t["events"].df
    # contract columns present with the right types
    fields = {f.name: f.dataType.simpleString() for f in ev.schema.fields}
    assert fields["ts_us"] == "bigint"
    assert fields["ts_ns"] == "bigint"
    assert fields["ts"] == "timestamp"
    rows = (
        ev.filter(F.col("event_id").isin(list(EXPECTED_US)))
        .select("event_id", "ts_us", "ts_ns")
        .collect()
    )
    assert len(rows) == len(EXPECTED_US)
    for r in rows:
        assert r.ts_us == EXPECTED_US[r.event_id], (
            f"event {r.event_id}: ts_us={r.ts_us} != {EXPECTED_US[r.event_id]}"
            " — events read path drifted (Spark version change?)"
        )
        assert r.ts_ns == r.ts_us * 1000


def test_events_ts_contract_vanilla_nonutc_session(spark):
    """The derivation must not depend on spark.sql.session.timeZone —
    a vanilla driver session in any tz must produce identical epoch-µs."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        t = load_tables(spark, SF_DIR)
        r = (
            t["events"].df.filter(F.col("event_id") == 0)
            .select("ts_us")
            .collect()
        )
        assert r[0].ts_us == EXPECTED_US[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_events_stream_matches_batch(spark):
    """Stream reader must yield the identical ts_us values as batch."""
    from data_table_spark.streaming import read_events_stream, run_available_now

    sdf = read_events_stream(spark, SF_DIR)
    out = run_available_now(
        sdf.filter(F.col("event_id").isin(list(EXPECTED_US))).select(
            "event_id", "ts_us"
        ),
        output_mode="append",
    )
    got = {r.event_id: r.ts_us for r in out.collect()}
    assert got == EXPECTED_US
