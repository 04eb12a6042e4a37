"""Partition-invariance gate: the drift-prone oracle queries must
hash-match DuckDB under the DRIVER's default partitioning (200 shuffle
partitions), not just the repo session's 32. Round 1's gforce_var_sd
failed exactly this way — float partial-aggregation combine order
changed with partitioning. Full-registry version:
`python tools/check_correctness.py --vanilla`.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# float-aggregate-heavy queries — the ones partitioning could flip
DRIFT_PRONE = [
    "gforce_var_sd",
    "gforce_q1",
    "weighted_mean",
    "frollapply_corr",
    "embedding_cosine_pairs",
    "text_quality",
    "froll_mean_sum",
    # determinism-contract ops: their whole claim is that partitioning
    # cannot change the answer (seeded permutation, bigint thresholds,
    # micro-nat LM sums, strict-order funnel, epoch-bucket retention)
    "shuffle_shards",
    "mixture_sample",
    "bigram_lm_score",
    "funnel_stages",
    "retention_cohorts",
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    return str(v)


def _sig(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        "\x1f".join(_norm(v) for v in t)
        for t in pdf[cols].itertuples(index=False)
    )
    return cols, rows


@pytest.fixture(scope="module")
def spark200(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", DRIFT_PRONE)
def test_partition_invariant_vs_oracle(spark200, duck, name):
    from data_table_spark.queries import ORACLE, QUERIES

    got = QUERIES[name](spark200, SF_DIR).toPandas()
    exp = duck.execute(ORACLE[name]).fetchdf()
    gc, gr = _sig(got)
    ec, er = _sig(exp)
    assert gc == ec
    assert gr == er
