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

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
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


# --------------------------------------------------------------------------
# The REAL Kafka connector (production path).
# --------------------------------------------------------------------------

#: The reference's production subscription: the 11 CDC topics its trigger
#: script registers one Lambda event-source mapping each for
#: (configure_lambda_triggeres.sh:13-23). The Spark engine subscribes to
#: all of them with ONE source and routes by the ``topic`` column
#: (avro_codec.route_by_topic) instead of running 11 pipelines.
REFERENCE_TOPICS: tuple[str, ...] = (
    "lndcdcadsprpsl_flightyear",
    "lndcdcadsprpsl_flightquarter",
    "lndcdcadsprpsl_flightmonth",
    "lndcdcadsprpsl_flightweek",
    "lndcdcadsprpsl_flightday",
    "lndcdcadsrtcrd_flightquarter",
    "lndcdcadsprpsl_flightrange",
    "lndcdcadsrtcrd_flightrange",
    "lndcdcadsrtcrd_flight",
    "lndcdcadsprpsl_flight",
    "lndcdcncstcs_flightdates",
)

#: Fixed output schema of ``spark.readStream.format("kafka")`` (Spark's
#: Kafka source contract; SURVEY §1.1). ``normalize_kafka_source`` maps it
#: onto the engine's canonical ingest shape.
KAFKA_SOURCE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def kafka_source_options(
    bootstrap_servers: str | Iterable[str],
    topics: Iterable[str] = REFERENCE_TOPICS,
    max_offsets_per_trigger: int = 10_000,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Kafka source options with the reference deployment's knobs mapped.

    * brokers — the trigger script's 3-broker bootstrap list
      (configure_lambda_triggeres.sh:9-11) becomes
      ``kafka.bootstrap.servers`` (comma-joined when given as a list);
    * topics — one ``subscribe`` list replaces the per-topic event-source
      mappings (default: the 11-topic production catalog);
    * batch size — the Lambda mapping's ``--batch-size`` (500 in the
      trigger script, 10000 in the "10k" deployment, README.md:18-21)
      becomes ``maxOffsetsPerTrigger``: both bound how many records one
      micro-batch may contain;
    * ``failOnDataLoss=false`` mirrors the reference's tolerance of
      retention-expired offsets (it simply never sees them).

    Returned as a plain dict so tests can assert the mapping without a
    broker or the spark-sql-kafka jar on the classpath.
    """
    servers = (
        bootstrap_servers
        if isinstance(bootstrap_servers, str)
        else ",".join(bootstrap_servers)
    )
    return {
        "kafka.bootstrap.servers": servers,
        "subscribe": ",".join(topics),
        "maxOffsetsPerTrigger": str(int(max_offsets_per_trigger)),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(bool(fail_on_data_loss)).lower(),
    }


def normalize_kafka_source(df: DataFrame) -> DataFrame:
    """Real-Kafka-source frame -> the engine's canonical ingest shape.

    The canonical shape is what :func:`read_lambda_events` emits (and what
    ``decode_stage`` consumes): the real source differs only in
    ``timestamp`` (TimestampType instant vs the Lambda envelope's epoch
    millis, sample_kafka_event.json:10) and ``timestampType`` (int enum vs
    name) — both converted here losslessly, everything else passes
    through byte-identical.
    """
    ts_type = (
        F.when(F.col("timestampType") == 1, F.lit("CREATE_TIME"))
        .when(F.col("timestampType") == 2, F.lit("LOG_APPEND_TIME"))
        .otherwise(F.lit("NO_TIMESTAMP_TYPE"))
    )
    return df.select(
        "key",
        "value",
        "topic",
        "partition",
        "offset",
        F.unix_millis("timestamp").alias("timestamp"),
        ts_type.alias("timestampType"),
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str | Iterable[str],
    topics: Iterable[str] = REFERENCE_TOPICS,
    max_offsets_per_trigger: int = 10_000,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """The production ingest source: ``readStream.format("kafka")``.

    Returns the canonical ingest frame (``normalize_kafka_source``
    applied), so ``decode_stage``/``route_by_topic`` and the whole sink
    stack run on it unchanged — swapping replay for broker really is this
    one call. Requires the spark-sql-kafka connector jar on the classpath
    (absent in this container; the construction is covered by an
    options-level unit test plus a skip-with-reason plan test).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers,
        topics,
        max_offsets_per_trigger,
        starting_offsets,
        fail_on_data_loss,
    ).items():
        reader = reader.option(k, v)
    return normalize_kafka_source(reader.load())
