"""Ingest/decode queries (SURVEY.md §2.1-§2.3, M1) over the golden fixture.

These run the reference's core pipeline — Kafka event envelope → base64 →
key cascade + Confluent-Avro value decode → columnar records — re-expressed
as Spark stages (sources/kafka_replay.py + sources/avro_codec.py), against
the reference's own golden input fixture.

The Avro *bytes* are not expressible in ANSI SQL, but the decode's expected
OUTPUT is: the reference ships its own golden result parquet
(lndcdcadsrtcrd_ratecard_*_local_test.parquet, 16 rows x 19 cols — the
landed file check_parquet.py:87-94 reads back), and a repo-local copy of
that fixture (testdata/golden_ratecard.parquet) gives i01 a full DuckDB
oracle (which since late round 10 also runs the stale-twin CDC compaction,
former i04): ``SELECT ... FROM parquet_scan('<golden>')``. The remaining
i-queries (envelope metrics, synthesized batches, side-effecting sinks)
stay rows-only with byte-exact asserts in tests/test_ingest.py.

Reference parity: lambda_function.py:184-252 (handler flow),
lambda_function_with_AWS_datawrangler.py:63-90 (batch metrics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import latest_by_key
from ..sources.avro_codec import RATECARD_FIELDS, SchemaProvider, decode_stage
from ..sources.kafka_replay import read_lambda_events
from . import register

#: The reference's golden input event (read-only fixture).
GOLDEN_EVENT = "/root/reference/sample_kafka_event.json"
GOLDEN_TOPIC = "lndcdcadsrtcrd_ratecard"

#: Repo-local copy of the reference's golden OUTPUT parquet (16x19). The
#: reference wrote it through pandas, which promotes a nullable int column
#: (EPSD_IMP_EST_FILE_TYP_ID) to float64; the engine keeps nullable LongType
#: (SURVEY §7 "hard parts" — deliberate divergence), so the oracle casts
#: that one column back to BIGINT (values are integral or NULL).
GOLDEN_PARQUET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "testdata",
    "golden_ratecard.parquet",
)

_GOLDEN_COLS = ",\n           ".join(
    f"CAST({f.name} AS BIGINT) AS {f.name}"
    if f.name == "EPSD_IMP_EST_FILE_TYP_ID"
    else f.name
    for f in RATECARD_FIELDS
)


def decoded_golden(spark: SparkSession) -> DataFrame:
    """Replay + decode the golden event: the full M1 pipeline."""
    kafka_shaped = read_lambda_events(spark, GOLDEN_EVENT)
    return decode_stage(kafka_shaped, SchemaProvider(), GOLDEN_TOPIC)


@register(
    "i01_replay_decode",
    oracle=f"""
    SELECT {_GOLDEN_COLS}, CAST(2 AS BIGINT) AS n_copies
    FROM parquet_scan('{GOLDEN_PARQUET}')
    ORDER BY SRC_KEY_VAL
    """,
    doc="Kafka envelope replay -> Confluent-Avro decode -> CDC latest-"
    "version compaction == the reference's own golden output parquet "
    "(check_parquet.py:87-94 read-back shape; former i04 folded in r10)",
)
def i01_replay_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's core competency, driver-checked end-to-end: replay the
    reference's golden Kafka event (sample_kafka_event.json), run the full
    base64 -> envelope-split -> Confluent-wire Avro decode, CDC-compact,
    and return the 19 payload columns. The oracle is the reference's own
    landed parquet for the same event, so rows + schema + value-hash all
    confirm the decode byte-for-byte (envelope columns are checked
    separately by i02/i05 and tests/test_ingest.py).

    The CDC stage (former i04, folded in round 10 to free an oracle-window
    slot) keeps its TEETH: the golden event's 16 keys are unique, so
    deduping it alone would be the identity and prove nothing about
    ordering. Each decoded record is therefore replayed TWICE — once
    as-is, once as a synthesized STALE predecessor (older
    SRC_COMMIT_DT_UTC, marker operation name) — and compacted. Only a
    correct latest-by-(commit-ts DESC) reduction returns exactly the
    golden rows with n_copies = 2; an ordering regression surfaces the
    STALE twins and hash-mismatches."""
    d = decoded_golden(spark).filter(F.col("_corrupt_record").isNull())
    stale = d.withColumn("SRC_COMMIT_DT_UTC", F.lit("2021-07-01 00:00:00")).withColumn(
        "SRC_CDC_OPER_NM", F.lit("STALE")
    )
    cdc = d.unionByName(stale)
    return latest_by_key(cdc, ["SRC_KEY_VAL"], "SRC_COMMIT_DT_UTC", "offset").select(
        *[f.name for f in RATECARD_FIELDS], "n_copies"
    )


@register(
    "i02_per_partition_counts",
    oracle=None,
    doc="per topic-partition record counts (lambda_function.py:202-203 as groupBy)",
)
def i02_per_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_lambda_events(spark, GOLDEN_EVENT)
        .groupBy("topic", "partition")
        .agg(F.count("*").alias("n_records"))
        .orderBy("topic", "partition")
    )


@register(
    "i03_batch_metrics",
    oracle=None,
    doc="batch write metrics: total + distinct SRC_KEY_VAL "
    "(lambda_function_with_AWS_datawrangler.py:67-74 semantics)",
)
def i03_batch_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decoded_golden(spark).agg(
        F.count("*").alias("total_records"),
        F.countDistinct("SRC_KEY_VAL").alias("distinct_records"),
        F.count("_corrupt_record").alias("corrupt_records"),
    )


@register(
    "i05_batch_json",
    oracle=None,
    doc="JSON serialization of the decoded batch "
    "(lambda_function.py:228 json.dumps -> to_json(struct(*)))",
)
def i05_batch_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = decoded_golden(spark)
    payload = F.to_json(F.struct(*[c for c in d.columns if c != "_corrupt_record"]))
    return d.select("offset", "partition", payload.alias("json"))


@register(
    "i06_decode_throughput",
    oracle=None,
    doc="Arrow-batched Avro decode over a synthesized 20k-record batch "
    "(throughput proof vs the reference's >=11.1 rec/s envelope, BASELINE.md)",
)
def i06_decode_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode throughput at a real batch size.

    The golden fixture is 16 records; this synthesizes a 20,000-record
    Confluent-wire batch EXECUTOR-SIDE (``spark.range`` fanned through an
    Arrow-batched encode using the engine's own spec-derived writer — one
    golden row template with varied keys) and runs the full
    JVM-envelope-split + Arrow-batched-decode stage over it. Registered
    rows-only: the check pins row count (= batch size) while the bench
    records wall time — the reference's whole 900 s Lambda envelope
    processes 10k records.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..sources.avro_codec import RATECARD_FIELDS, confluent_wrap, encode_avro_record

    n = 20_000
    template = decoded_golden(spark).filter(F.col("offset") == 0).collect()[0].asDict()
    row = {f.name: template[f.name] for f in RATECARD_FIELDS}

    # Avro binary is concatenative, so the constant fields encode ONCE and
    # each record is prefix + the two varying fields + suffix — the synth
    # stage stays cheap relative to the decode being measured. Field
    # layout: [0..12] constant, 13 = CNCRNCY_VRSN, 14 = SRC_KEY_VAL,
    # [15..18] constant CDC metadata.
    pre = encode_avro_record(row, RATECARD_FIELDS[:13])
    suf = encode_avro_record(row, RATECARD_FIELDS[15:])
    var_fields = RATECARD_FIELDS[13:15]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "key": [str(i).encode() for i in ids],
                    "value": [
                        confluent_wrap(
                            391,
                            pre
                            + encode_avro_record(
                                {"CNCRNCY_VRSN": int(i), "SRC_KEY_VAL": str(i % 997)},
                                var_fields,
                            )
                            + suf,
                        )
                        for i in ids
                    ],
                    "topic": GOLDEN_TOPIC,
                    "partition": (ids % 8).astype("int32"),
                    "offset": ids,
                    "timestamp": 1625877624954 + ids,
                    "timestampType": "CREATE_TIME",
                }
            )

    # 8 synth partitions mirror the 8 synthetic Kafka partitions (ids % 8):
    # a 20k-record batch doesn't amortize 32 Python-worker spin-ups, and at
    # production scale the decode parallelism comes from the Kafka source's
    # own partitioning, not from an oversplit range.
    kafka_shaped = spark.range(n, numPartitions=8).mapInPandas(
        synth,
        schema="key binary, value binary, topic string, partition int, "
        "offset long, timestamp long, timestampType string",
    )
    decoded = decode_stage(kafka_shaped, SchemaProvider(), GOLDEN_TOPIC)
    return decoded.groupBy("topic").agg(
        F.count("*").alias("n_decoded"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.countDistinct("SRC_KEY_VAL").alias("distinct_keys"),
    )


@register(
    "i09_decode_throughput_mixed",
    oracle=None,
    doc="i06 with TWO writer-schema versions mixed per batch: prices the "
    "per-record version dispatch (avro_codec per-batch id grouping) vs "
    "the single-writer fast path; benched alongside i06",
)
def i09_decode_throughput_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-writer decode throughput (schema-evolution cost probe).

    Identical batch shape to :func:`i06_decode_throughput` (20k records,
    8 partitions) but records alternate between the latest ratecard
    writer (id 391, 19 fields) and a historical version written before
    the last two columns existed (id 390, 17 fields) — so every Arrow
    batch exercises the per-record writer-version dispatch
    (avro_codec.py: per-batch grouping by envelope schema id) instead of
    the single-writer fast path. Registered rows-only: the check pins the
    half/half row split (evolved columns NULL exactly on v1 rows) while
    bench.py records wall time next to i06 — the dispatch's measured
    price, not an assumed one.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..sources.avro_codec import RATECARD_FIELDS, confluent_wrap, encode_avro_record

    n = 20_000
    v2 = RATECARD_FIELDS
    v1 = RATECARD_FIELDS[:-2]  # before the last two columns were added
    provider = SchemaProvider(history={GOLDEN_TOPIC: {390: v1}})

    template = decoded_golden(spark).filter(F.col("offset") == 0).collect()[0].asDict()
    row = {f.name: template[f.name] for f in v2}

    # Same concatenative-prefix trick as i06; v1 shares the prefix and the
    # varying fields, only its constant suffix is shorter (fields 15..16).
    pre = encode_avro_record(row, RATECARD_FIELDS[:13])
    suf_v2 = encode_avro_record(row, RATECARD_FIELDS[15:])
    suf_v1 = encode_avro_record(row, RATECARD_FIELDS[15:17])
    var_fields = RATECARD_FIELDS[13:15]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            values = []
            for i in ids:
                body = pre + encode_avro_record(
                    {"CNCRNCY_VRSN": int(i), "SRC_KEY_VAL": str(i % 997)},
                    var_fields,
                )
                if i % 2:  # odd ids: the historical writer
                    values.append(confluent_wrap(390, body + suf_v1))
                else:
                    values.append(confluent_wrap(391, body + suf_v2))
            yield pd.DataFrame(
                {
                    "key": [str(i).encode() for i in ids],
                    "value": values,
                    "topic": GOLDEN_TOPIC,
                    "partition": (ids % 8).astype("int32"),
                    "offset": ids,
                    "timestamp": 1625877624954 + ids,
                    "timestampType": "CREATE_TIME",
                }
            )

    kafka_shaped = spark.range(n, numPartitions=8).mapInPandas(
        synth,
        schema="key binary, value binary, topic string, partition int, "
        "offset long, timestamp long, timestampType string",
    )
    decoded = decode_stage(kafka_shaped, provider, GOLDEN_TOPIC)
    evolved = RATECARD_FIELDS[-1].name  # exists only in v2-written rows
    return decoded.groupBy("topic").agg(
        F.count("*").alias("n_decoded"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.sum(F.col(evolved).isNull().cast("bigint")).alias("n_v1_rows"),
        F.sum(F.col(evolved).isNotNull().cast("bigint")).alias("n_v2_rows"),
    )


@register(
    "i07_compact_small_files",
    oracle=None,
    doc="partition compaction: 3 appended small files -> 1 file/partition "
    "via dynamic partition overwrite (the Lambda-per-invocation "
    "small-file problem at scale)",
)
def i07_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.sink import (
        compact_partitions,
        with_partition_columns,
        write_partitioned,
    )

    path = tempfile.mkdtemp(prefix="i07_") + "/sink"
    d = with_partition_columns(decoded_golden(spark))
    for _ in range(3):  # the reference's one-file-per-invocation pattern
        write_partitioned(d, path)
    return compact_partitions(spark, path, topic=GOLDEN_TOPIC)


@register(
    "i08_multi_topic_routing",
    oracle=None,
    doc="full 12-subject catalog routed into per-topic decodes (golden "
    "ratecard + the 11 CDC topics of configure_lambda_triggeres.sh:13-23), "
    "each with its own Avro schema",
)
def i08_multi_topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole subscription in one source frame: the golden
    ratecard event plus synthesized batches for each of the 11 trigger-
    script CDC topics, fanned by route_by_topic into per-topic decode
    stages off the shared scan. The result reports each topic's decoded
    record count and column width (schemas genuinely differ per entity),
    plus corruption counts (must be 0)."""
    import base64 as b64
    import json
    import tempfile

    from ..sources.avro_codec import (
        SchemaProvider,
        confluent_wrap,
        encode_avro_record,
        route_by_topic,
    )
    from ..sources.kafka_replay import read_lambda_events

    provider = SchemaProvider()  # full default catalog: ratecard + 11 CDC
    env = json.load(open(GOLDEN_EVENT))
    for topic in provider.topics():
        if topic == GOLDEN_TOPIC:
            continue  # golden event already carries the ratecard records
        sid, fields = provider.schema_for(topic)
        entity = topic.split("_", 1)[1].upper()
        env["records"][f"{topic}-0"] = [
            {
                "topic": topic,
                "partition": 0,
                "offset": i,
                "timestamp": 1625877624954 + i,
                "timestampType": "CREATE_TIME",
                "key": b64.b64encode(str(i).encode()).decode(),
                "value": b64.b64encode(
                    confluent_wrap(
                        sid,
                        encode_avro_record(
                            {
                                f"{entity}_ID": i,
                                f"{entity}_NM": f"{entity}-{i}",
                                "START_DT": "2021-01-01 00:00:00",
                                "END_DT": "2021-12-31 23:59:59",
                                "LAST_MODIFIED_BY": "loader",
                                "LAST_MODIFIED_DT": "2021-07-09 00:00:00",
                                "CNCRNCY_VRSN": i,
                                "SRC_KEY_VAL": str(i),
                                "SRC_CDC_OPER_NM": "INSERT",
                                "SRC_COMMIT_DT_UTC": "2021-07-09 00:00:00",
                                "TRG_CRT_DT_PART_UTC": "2021-07-09",
                                # source schema = the topic's lnd-prefix, not
                                # the entity (two source schemas share entities)
                                "SRC_SCHEMA_NM": topic.split("_", 1)[0].upper(),
                            },
                            fields,
                        ),
                    )
                ).decode(),
            }
            for i in range(3)
        ]
    # NamedTemporaryFile(delete=False), not the deprecated/race-prone
    # mktemp: the file must outlive the with-block (Spark reads it
    # lazily below) but the NAME is allocated atomically with the fd.
    with tempfile.NamedTemporaryFile(
        "w", prefix="i08_", suffix=".json", delete=False
    ) as f:
        fixture = f.name
        json.dump(env, f)

    ev = read_lambda_events(spark, fixture)
    try:
        routed = route_by_topic(ev, provider)
        stats = [
            df.agg(
                F.lit(topic).alias("topic"),
                F.count("*").alias("n_records"),
                F.lit(len(df.columns)).alias("n_cols"),
                F.count("_corrupt_record").alias("n_corrupt"),
            )
            for topic, df in sorted(routed.items())
        ]
        out = stats[0]
        for s in stats[1:]:
            out = out.unionByName(s)
        # localize (12 rows) so the fixture file and the route_by_topic
        # source cache can be released before the caller collects
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        os.unlink(fixture)
        # route_by_topic's localCheckpoint boundary frees itself when the
        # routed frames go out of scope — nothing to release here beyond
        # the fixture file
