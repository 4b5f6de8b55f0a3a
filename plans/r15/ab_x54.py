"""Interleaved warm A/B: x54 sequential (r14 shape) vs threaded (r15)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.plans.extensions import (
    _t,
    x54_change_feed,
)


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def x54_sequential(spark, sf_dir):
    import tempfile

    from lambda_kafka_to_s3_parquet_spark.operators.cdc import merge_cdc_batch
    from lambda_kafka_to_s3_parquet_spark.operators.snapshots import (
        current_version,
        snapshot_append,
        snapshot_consume_changes,
        snapshot_read,
        snapshot_rewrite,
        snapshot_row_changes,
    )
    from lambda_kafka_to_s3_parquet_spark.operators.ivm import (
        incremental_view_refresh,
        read_view,
    )

    base = tempfile.mkdtemp(prefix="x54seq_")
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    state = f"{base}/state"
    merge_cdc_batch(
        spark,
        ev.filter((F.col("event_id") % 2 == 0) & (F.col("user_id") % 10 != 0)),
        state,
        ["user_id"], "ts", "event_id", commit_protocol="snapshot",
    )
    v1 = current_version(spark, state)
    vw = f"{base}/view"
    incremental_view_refresh(
        spark, state, vw, ["user_id"], ["event_type"], ["event_id"]
    )
    snapshot_rewrite(spark, state, ["bucket"])
    merge_cdc_batch(
        spark, ev.filter(F.col("event_id") % 2 == 1), state,
        ["user_id"], "ts", "event_id", commit_protocol="snapshot",
    )
    incremental_view_refresh(
        spark, state, vw, ["user_id"], ["event_type"], ["event_id"]
    )
    view = read_view(spark, vw).select(
        F.col("event_type").alias("tag"),
        F.col("n_rows"),
        F.col("n_rows").alias("n_keys"),
        F.col("sum_event_id").alias("id_sum"),
    )
    chg = snapshot_row_changes(spark, state, ["user_id"], v1)
    diff = chg.groupBy(F.col("_change_type").alias("tag")).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_keys"),
        F.sum("event_id").alias("id_sum"),
    )
    src, snk = f"{base}/src", f"{base}/snk"
    snapshot_append(spark, src, ev.filter(F.col("event_id") % 3 == 0))
    snapshot_consume_changes(spark, src, snk)
    snapshot_append(spark, src, ev.filter(F.col("event_id") % 3 == 1))
    snapshot_consume_changes(spark, src, snk)
    landed = snapshot_read(spark, snk)
    consume = landed.groupBy(F.col("event_type").alias("tag")).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_keys"),
        F.sum("event_id").alias("id_sum"),
    )
    return (
        diff.select(F.lit("diff").alias("branch"), "*")
        .unionByName(consume.select(F.lit("consume").alias("branch"), "*"))
        .unionByName(view.select(F.lit("view").alias("branch"), "*"))
        .orderBy("branch", "tag")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="x54-ab")
    from lambda_kafka_to_s3_parquet_spark.session import load_table
    load_table(spark, sf_dir, "lineitem").count()
    variants = [("seq", x54_sequential), ("thr", x54_change_feed)]
    rows = {}
    for r in range(4):
        for tag, fn in variants:
            s0, t0 = steal(), time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt, ds = time.perf_counter() - t0, steal() - s0
            print(f"RUN {r} {tag} wall={dt:.3f} steal={ds:.1f}", flush=True)
            rows.setdefault(tag, []).append(dt)
            spark.catalog.clearCache()
        variants.reverse()  # alternate order each round
    for tag, ts in rows.items():
        print(f"{tag}: min={min(ts):.3f} all={[round(t,2) for t in ts]}")
    # row-identity check between the two shapes
    a = sorted(map(tuple, x54_sequential(spark, sf_dir).collect()))
    b = sorted(map(tuple, x54_change_feed(spark, sf_dir).collect()))
    print("ROWS_IDENTICAL", a == b)
    spark.stop()


if __name__ == "__main__":
    main()
