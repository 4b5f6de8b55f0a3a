"""Lambda Kafka-event fixture replay source (SURVEY.md §2.1, M1/M3).

Production ingest is the Structured Streaming Kafka source
(``spark.readStream.format("kafka").option("subscribe", topics)``), whose
output schema is fixed by Spark. No broker exists in this environment, so
this module replays the reference's event-envelope fixtures
(``sample_kafka_event.json`` shape: ``{"records": {"<topic>-<partition>":
[record, ...]}}``) into a DataFrame with EXACTLY the Kafka source's
columns — every downstream stage (decode, sink, streaming wrap) is written
against that schema and cannot tell replay from broker.

The parse itself is JVM-side: ``spark.read.text(wholetext)`` +
``from_json`` with a map type over the dynamic topic-partition keys, then
two explodes and ``unbase64`` for the key/value bytes. A directory of
event fixtures parallelizes across files; one fixture is one task — fine
for replay, irrelevant for production (which uses the real source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: Schema of one record inside the Lambda event envelope.
EVENT_RECORD = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", LongType()),
        StructField("timestampType", StringType()),
        StructField("key", StringType()),
        StructField("value", StringType()),
    ]
)

#: The envelope: records maps "<topic>-<partition>" to record lists.
EVENT_ENVELOPE = StructType(
    [StructField("records", MapType(StringType(), ArrayType(EVENT_RECORD)))]
)


def envelope_to_kafka(env: DataFrame) -> DataFrame:
    """Parsed envelope rows (``records`` map column) -> Kafka-source shape.

    Works identically on batch and streaming inputs — the transform is the
    source-agnostic piece SURVEY §7/M3 calls for.
    """
    rec = (
        env.select(F.explode("records").alias("tp", "recs"))
        .select(F.explode("recs").alias("r"))
        .select("r.*")
    )
    return rec.select(
        F.unbase64("key").alias("key"),
        F.unbase64("value").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        "timestampType",
    )


def read_lambda_events(spark: SparkSession, path: str) -> DataFrame:
    """Replay Lambda Kafka event fixture(s) as a Kafka-source-shaped frame.

    Columns match ``spark.readStream.format("kafka")``: key/value binary,
    topic string, partition int, offset long, timestamp (epoch millis as
    long — callers convert), timestampType string.
    """
    env = spark.read.schema(EVENT_ENVELOPE).option("multiLine", "true").json(path)
    return envelope_to_kafka(env)


def stream_lambda_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of :func:`read_lambda_events` (file source).

    One fixture file = one Lambda invocation's batch; the file source's
    ``maxFilesPerTrigger`` is the replay analog of the reference's Kafka
    batch-size knob (``maxOffsetsPerTrigger`` against a real broker).
    """
    reader = spark.readStream.schema(EVENT_ENVELOPE).option("multiLine", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return envelope_to_kafka(reader.json(path))
