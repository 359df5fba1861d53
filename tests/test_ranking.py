"""Determinism tests for operators.ranking.global_row_number.

Regression for the round-2 red query (ev_value_rank: 1004 rows vs 1000):
the range-partitioned frame used to be consumed by two subtrees without
materialization, so the sampled range boundaries could diverge between the
offset aggregation and the final join — duplicated/skipped ranks. The fix
pins one evaluation with an eager localCheckpoint. These tests evaluate
the ranked output repeatedly and assert the ranks are an exact permutation
of 1..N, consistent with the requested order, every time.
"""

import pytest
from pyspark.sql import functions as F

from aegisthus_spark.operators.ranking import global_row_number


@pytest.fixture(scope="module")
def skewed_df(spark):
    # Values drawn from a narrow range so range-boundary sampling matters;
    # unique tiebreaker id makes the total order deterministic.
    n = 20_000
    return (
        spark.range(n, numPartitions=16)
        .withColumn("value", (F.col("id") * 2654435761 % 997).cast("double"))
        .withColumn("grp", (F.col("id") % 7).cast("int"))
    )


def _assert_valid_ranking(rows, n):
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, n + 1)), (
        f"ranks are not a permutation of 1..{n}: "
        f"len={len(rows)} min={ranks[0] if ranks else None} max={ranks[-1] if ranks else None}"
    )
    # rank order must agree with the requested sort order
    by_rank = sorted(rows, key=lambda r: r["rank"])
    keys = [(-r["value"], r["id"]) for r in by_rank]
    assert keys == sorted(keys), "rank order disagrees with (value desc, id)"


def test_global_row_number_repeated_evaluations(spark, skewed_df):
    n = skewed_df.count()
    ranked = global_row_number(
        skewed_df, [F.desc("value"), F.col("id")], rank_col="rank", num_partitions=16
    )
    # The SAME DataFrame collected repeatedly: every evaluation must see one
    # consistent partitioning (this is where the old two-subtree divergence
    # produced 1004-row results).
    for _ in range(4):
        _assert_valid_ranking(ranked.collect(), n)


def test_global_row_number_fresh_plans(spark, skewed_df):
    # Fresh operator applications (new sampling each time) must each be a
    # valid permutation as well.
    n = skewed_df.count()
    for rep in range(3):
        ranked = global_row_number(
            skewed_df,
            [F.desc("value"), F.col("id")],
            rank_col="rank",
            num_partitions=8 + rep,
        )
        _assert_valid_ranking(ranked.collect(), n)


def test_global_row_number_filter_pushdown_consumer(spark, skewed_df):
    # The ev_value_rank shape: a rank filter on top. Row count must be exact.
    ranked = global_row_number(
        skewed_df, [F.desc("value"), F.col("id")], rank_col="rank", num_partitions=16
    )
    top = ranked.filter(F.col("rank") <= 1000)
    for _ in range(3):
        got = top.collect()
        assert len(got) == 1000
        assert sorted(r["rank"] for r in got) == list(range(1, 1001))
