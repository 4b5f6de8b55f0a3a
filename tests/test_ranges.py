"""Unit semantics of the bucketed interval join (operators/ranges.py):
exact boundaries, equivalence with a brute-force theta join, and an
equi-join physical plan (no nested-loop/cartesian)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark.operators.ranges import interval_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_interval_boundaries(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "at_zero"),      # gap 0: excluded
            (1, _ts("2024-01-01 10:00:01"), "inside"),       # gap 1s: included
            (1, _ts("2024-01-01 10:10:00"), "at_upper"),     # gap 600s: included
            (1, _ts("2024-01-01 10:10:00.000001"), "past"),  # gap 600s+1us: out
            (2, _ts("2024-01-01 10:00:01"), "wrong_key"),
        ],
        "k int, t timestamp, tag string",
    )
    got = {
        r["tag"]: r["gap_us"]
        for r in interval_join(left, right, "k", "t", "t").collect()
    }
    assert got == {"inside": 1_000_000, "at_upper": 600_000_000}


def test_interval_matches_bruteforce(spark):
    """Bucketed candidate generation must lose no pairs vs a theta join."""
    base = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame(
        [(i % 5, base + datetime.timedelta(seconds=37 * i)) for i in range(200)],
        "k int, t timestamp",
    ).withColumn("lid", F.monotonically_increasing_id())
    right = spark.createDataFrame(
        [(i % 5, base + datetime.timedelta(seconds=53 * i)) for i in range(200)],
        "k int, t timestamp",
    )
    got = {
        (r["lid"], r["t_r"])
        for r in interval_join(
            left, right, "k", "t", "t", min_delta_us=0, max_delta_us=120_000_000
        ).collect()
    }
    brute = {
        (r["lid"], r["rt"])
        for r in left.alias("l")
        .join(
            right.select(F.col("k").alias("rk"), F.col("t").alias("rt")),
            (F.col("k") == F.col("rk"))
            & (F.col("rt") > F.col("t"))
            & (F.col("rt") <= F.col("t") + F.expr("INTERVAL 120 SECONDS")),
        )
        .collect()
    }
    assert got == brute and len(got) > 0


def test_interval_plan_is_equijoin(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:01"), 1.0)], "k int, t timestamp, v double"
    )
    df = interval_join(left, right, "k", "t", "t")
    df.collect()
    final = (
        df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    assert "BroadcastNestedLoopJoin" not in final
    assert "CartesianProduct" not in final
