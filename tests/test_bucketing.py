"""Bucketed co-located joins + salted-join equivalence (operators/skew.py):
the pay-the-shuffle-once patterns for recurring joins at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark.operators.skew import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from lambda_kafka_to_s3_parquet_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    o = load_table(spark, SF, "orders").withColumnRenamed("o_custkey", "custkey")
    c = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "custkey")
    plain = o.join(c, "custkey").groupBy("custkey").count()
    salted = salted_join(o, c, "custkey", n_salts=4).groupBy("custkey").count()
    assert {(r["custkey"], r["count"]) for r in plain.collect()} == {
        (r["custkey"], r["count"]) for r in salted.collect()
    }


def test_salted_join_spreads_hot_key(spark):
    """A pathological hot key must land in multiple salt buckets."""
    from lambda_kafka_to_s3_parquet_spark.operators.skew import salt_column

    hot = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    n_buckets = hot.withColumn("_salt", salt_column(8)).select("_salt").distinct().count()
    assert n_buckets == 8


def test_salted_join_spreads_duplicate_row_hot_key(spark):
    """Byte-identical duplicate rows of a hot key must STILL fan out (a
    content-derived salt collapses them into one bucket — the skew bug this
    guards against) and the join result must match the plain join."""
    from lambda_kafka_to_s3_parquet_spark.operators.skew import salt_column

    dup = spark.range(10_000).select(
        F.lit(7).alias("k"), F.lit("same-payload").alias("payload")
    )
    n_buckets = dup.withColumn("_salt", salt_column(8)).select("_salt").distinct().count()
    assert n_buckets == 8

    dim = spark.range(3).select(F.lit(7).alias("k"), F.col("id").alias("dim_val"))
    out = salted_join(dup, dim, "k", n_salts=8)
    assert out.count() == 10_000 * 3
    assert out.groupBy("dim_val").count().count() == 3


def test_salted_join_rejects_unsafe_how(spark):
    df = spark.range(4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner"):
        salted_join(df, df, "k", how="full_outer")


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must join with zero
    shuffles (and with sortBy, zero sorts) — the co-location contract."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF, "orders")
        lineitem = load_table(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=4)
        write_bucketed(lineitem, "lineitem_b", "o_orderkey", n_buckets=4)

        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the co-location contract: NO shuffle on either side of the join
        # (Spark may still add a local per-bucket Sort when a bucket spans
        # multiple files — that's a narrow, spill-free operation, fine)
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") >= 2  # both scans read bucket layout

        # sanity: row count matches a plain join
        assert joined.count() == orders.join(
            load_table(spark, SF, "lineitem"),
            orders.o_orderkey == F.col("l_orderkey"),
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
