"""Materialized time rollups (continuous aggregates) — SURVEY.md §2.9
family: the hypertable-rollup pattern (TimescaleDB continuous aggregates,
Druid ingestion rollup) re-expressed Spark-first.

At 100 TB you do not re-scan raw events for every dashboard query: a
scheduled job folds the raw stream into an hourly rollup table (orders of
magnitude smaller), and coarser granularities (day, month) re-aggregate
the rollup, never the raw data.

The design contract is **mergeability**: the rollup stores only aggregates
that compose associatively — count, sum, min, max (and HLL sketches for
distincts). Averages are NEVER stored; they are derived (sum/count) at
query time, because an avg of avgs is wrong under uneven bucket sizes.
The pytest/oracle checks pin exactly that: daily answers derived from the
hourly rollup must equal direct aggregation over raw events.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

#: Mergeable aggregate columns carried by every rollup level.
_MERGEABLE = ("n_events", "sum_value", "min_value", "max_value")


def hourly_rollup(events: DataFrame, distinct_col: str | None = None) -> DataFrame:
    """Fold raw events into the hour × event_type rollup (mergeable aggs).

    One shuffle on (hour, event_type) with map-side partial aggregation;
    the output is what a scheduled materialization job would append to the
    rollup table, partitioned by date at scale.

    ``distinct_col`` opts in the mergeable-distinct column: an HLL sketch
    (``hll_sketch_agg``, Apache DataSketches binary) stored per bucket.
    Exact distinct counts do NOT compose across buckets — storing them
    would repeat the avg-of-avgs mistake — but sketches union losslessly,
    so a year of hourly sketches re-aggregates to daily/monthly distincts
    without ever touching raw data. ~KB per bucket at any cardinality.
    """
    aggs = [
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("distinct_hll"))
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(*aggs)


def materialize_hourly(events: DataFrame, path: str) -> None:
    """Land the hourly rollup as a date-partitioned parquet table."""
    (
        hourly_rollup(events)
        .withColumn("d", F.to_date("hour"))
        .repartition("d")
        .write.mode("overwrite")
        .partitionBy("d")
        .parquet(path)
    )


def reaggregate(rollup: DataFrame, granularity: str = "day") -> DataFrame:
    """Coarser granularity FROM the rollup — raw data is never touched.

    count/sum/min/max merge associatively across the finer buckets;
    avg_value is derived from merged sum/count (never averaged averages);
    a ``distinct_hll`` column (when present) merges via ``hll_union_agg``
    and surfaces as ``approx_distinct`` — union of sketches over buckets
    is byte-identical to sketching the raw data directly.
    """
    aggs = [
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]
    if "distinct_hll" in rollup.columns:
        aggs.append(F.hll_union_agg("distinct_hll").alias("distinct_hll"))
    out = rollup.groupBy(
        F.date_trunc(granularity, F.col("hour")).alias("bucket"),
        "event_type",
    ).agg(*aggs)
    if "distinct_hll" in out.columns:
        out = out.withColumn(
            "approx_distinct", F.hll_sketch_estimate("distinct_hll")
        )
    return out.withColumn("avg_value", F.col("sum_value") / F.col("n_events"))


# --------------------------------------------------------------------------
# Streaming maintenance: the CONTINUOUS aggregate.
# --------------------------------------------------------------------------


def merge_rollup_batch(spark: SparkSession, batch: DataFrame, path: str) -> None:
    """Fold one micro-batch of raw events into the stored hourly rollup.

    Mergeability does all the work: the batch's partial hourly aggregate
    unions with the STORED buckets of the affected dates only (a semi-join
    on ``d`` — no driver-side partition listing) and re-merges with the
    same associative aggregates; dynamic partition overwrite then rewrites
    only the date partitions present in that output. Cost per batch is
    proportional to the batch's time span, never to the rollup's history —
    the property that makes the continuous aggregate viable at 100 TB of
    raw events.
    """
    # null-ts events roll into a NULL hour/date bucket; drop them here so
    # the Hive default partition never exists — a semi-join on d could not
    # retain stored NULL-date rows (NULL never equals NULL) and dynamic
    # overwrite would clobber that partition on every later null batch.
    # Corrupt timestamps belong in the ingest path's _corrupt_record flow,
    # not silently in a rollup bucket.
    part = (
        hourly_rollup(batch)
        .filter(F.col("hour").isNotNull())
        .withColumn("d", F.to_date("hour"))
    )
    try:
        existing = spark.read.parquet(path)
    except AnalysisException:
        part.write.partitionBy("d").parquet(path)
        return
    affected = part.select("d").distinct()
    touched = existing.join(affected, "d", "left_semi")
    merged = (
        touched.unionByName(part)
        .groupBy("hour", "event_type", "d")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("d")
        .parquet(path)
    )


def _marker_fs(spark: SparkSession, marker: str):
    """Hadoop FileSystem + Path for the high-water-mark file — resolved
    through the JVM so the marker works on any supported scheme (local,
    hdfs, s3a) exactly like the rollup table itself, not just local disk."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(marker)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _read_last_batch_id(spark: SparkSession, marker: str) -> int:
    """-1 only when the marker genuinely does not exist. A marker that
    exists but cannot be read or parsed RAISES: treating it as -1 would
    re-merge already-applied batches on retry (silent double counts) —
    the one failure mode worse than halting the maintenance query."""
    fs, path = _marker_fs(spark, marker)
    if not fs.exists(path):
        return -1
    stream = fs.open(path)
    try:
        raw = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return int(json.loads(raw.decode("utf-8"))["batch_id"])


def _write_last_batch_id(spark: SparkSession, marker: str, batch_id: int) -> None:
    fs, path = _marker_fs(spark, marker)
    stream = fs.create(path, True)  # overwrite
    try:
        stream.write(json.dumps({"batch_id": batch_id}).encode("utf-8"))
    finally:
        stream.close()


def run_rollup_stream(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    rollup_path: str,
    checkpoint: str,
    max_files_per_trigger: int | None = 1,
) -> StreamingQuery:
    """Continuously maintain the hourly rollup from an event stream.

    ``foreachBatch`` hands each micro-batch to :func:`merge_rollup_batch`.
    The merge is NOT naturally idempotent (re-merging a batch would double
    its counts), and foreachBatch is at-least-once on retry, so a tiny
    batch-id high-water mark next to the rollup table (written through the
    Hadoop FileSystem API, so it lives wherever the table lives — local,
    hdfs, or s3a) skips already-merged batches (single maintenance writer
    per rollup table, which a scheduled materialization job satisfies by
    construction).

    Honest consistency contract: merge and marker write are two steps, so
    a crash BETWEEN them re-merges that one batch on restart — the
    residual at-least-once window of any non-transactional two-step sink.
    Clean stop/restart (the availableNow maintenance cadence) is exactly-
    once, which the restart test pins. Closing the crash window requires
    an atomic table format (Delta/Iceberg txn carrying the batch id with
    the data) — the drop-in upgrade at production scale.
    """
    marker = os.path.join(rollup_path, "_last_merged_batch.json")

    def land(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_last_batch_id(spark, marker) or batch_df.isEmpty():
            return
        merge_rollup_batch(spark, batch_df, rollup_path)
        _write_last_batch_id(spark, marker, batch_id)

    reader = spark.readStream.schema(events_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = reader.parquet(events_dir)
    return (
        events.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
