"""Golden-fixture tests for the ingest/decode pipeline (SURVEY.md §5).

Upgrades the reference's eyeball verification (check_parquet.py:96-98) to
exact asserts: replaying sample_kafka_event.json through the Spark decode
stages must reproduce the golden parquet's 16 rows and 19-column schema
byte-for-byte (modulo the documented pandas NaN-promotion divergence on
EPSD_IMP_EST_FILE_TYP_ID — SURVEY.md §7).
"""

from __future__ import annotations

import base64
import json
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark.plans.ingest import (
    GOLDEN_EVENT,
    GOLDEN_TOPIC,
    decoded_golden,
)
from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
    RATECARD_FIELDS,
    SchemaProvider,
    decode_avro_record,
    decode_stage,
)
from lambda_kafka_to_s3_parquet_spark.sources.kafka_replay import read_lambda_events

GOLDEN_PARQUET = (
    "/root/reference/lndcdcadsrtcrd_ratecard_1630613001.008183_local_test.parquet"
)
DATA_COLS = [f.name for f in RATECARD_FIELDS]


@pytest.fixture(scope="module")
def decoded(spark):
    return decoded_golden(spark).collect()


def test_envelope_replay_shape(spark):
    df = read_lambda_events(spark, GOLDEN_EVENT)
    rows = df.collect()
    assert len(rows) == 16
    assert {r["topic"] for r in rows} == {GOLDEN_TOPIC}
    assert len({(r["topic"], r["partition"]) for r in rows}) == 6
    assert dict(df.dtypes)["key"] == "binary"
    assert dict(df.dtypes)["value"] == "binary"


def test_key_cascade(spark):
    keys = {
        r["offset"]: r["key_decoded"]
        for r in decoded_golden(spark).select("offset", "key_decoded", "partition").collect()
    }
    # fixture keys are utf-8 digit strings ("NA==" -> "4")
    assert all(k.isdigit() for k in keys.values())


def test_golden_schema_and_rowcount(spark, decoded):
    assert len(decoded) == 16
    got_cols = [c for c in decoded_golden(spark).columns if c in DATA_COLS]
    want_cols = [
        r[0]
        for r in duckdb.sql(f"DESCRIBE SELECT * FROM '{GOLDEN_PARQUET}'").fetchall()
    ]
    assert got_cols == want_cols, "decoded columns must match golden parquet order"
    assert all(r["_corrupt_record"] is None for r in decoded)


def test_golden_values_exact(decoded):
    golden = duckdb.sql(
        f"SELECT * FROM '{GOLDEN_PARQUET}' ORDER BY SRC_KEY_VAL, CNCRNCY_VRSN"
    ).df()
    ours = sorted(decoded, key=lambda r: (r["SRC_KEY_VAL"], r["CNCRNCY_VRSN"]))
    assert len(ours) == len(golden)
    for i, row in enumerate(ours):
        for col in DATA_COLS:
            want = golden.iloc[i][col]
            got = row[col]
            if isinstance(want, float) and math.isnan(want):
                # pandas wrote nullable ints as NaN-promoted float64; the
                # engine keeps a true null LongType (documented divergence)
                assert got is None, (i, col)
            elif isinstance(want, float):
                assert got == int(want), (i, col)  # float-promoted int column
            else:
                assert got == want, (i, col, got, want)


def test_schema_id_is_391_for_all_records(spark):
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import confluent_schema_id

    ids = (
        read_lambda_events(spark, GOLDEN_EVENT)
        .select(confluent_schema_id("value").alias("sid"))
        .distinct()
        .collect()
    )
    assert [r["sid"] for r in ids] == [391]


def test_pure_decoder_roundtrip_first_record():
    ev = json.load(open(GOLDEN_EVENT))
    first = next(iter(ev["records"].values()))[0]
    raw = base64.b64decode(first["value"])
    assert raw[0] == 0
    row = decode_avro_record(raw[5:], RATECARD_FIELDS)
    assert row["RATE_CARD_ID"] == 4
    assert row["SRC_CDC_OPER_NM"] == "INSERT"
    assert row["SRC_SCHEMA_NM"] == "ADS_RTCRD"
    assert row["EPSD_IMP_EST_FILE_TYP_ID"] is None


def test_permissive_corrupt_record(spark):
    """Truncated/garbage values must land in _corrupt_record, not raise."""
    ev = read_lambda_events(spark, GOLDEN_EVENT)
    corrupted = ev.withColumn(
        "value",
        F.when(F.col("offset") == 0, F.expr("substring(value, 1, 8)")).otherwise(
            F.col("value")
        ),
    )
    out = decode_stage(corrupted, SchemaProvider(), GOLDEN_TOPIC).collect()
    assert len(out) == 16
    bad = [r for r in out if r["_corrupt_record"] is not None]
    good = [r for r in out if r["_corrupt_record"] is None]
    assert len(bad) >= 1
    assert all(r["RATE_CARD_ID"] is None for r in bad)
    assert all(r["RATE_CARD_ID"] is not None for r in good)


def test_wrong_schema_id_goes_corrupt(spark):
    ev = read_lambda_events(spark, GOLDEN_EVENT)
    # flip the schema-id bytes: decode must refuse rather than misparse
    patched = ev.withColumn(
        "value", F.expr("concat(substring(value,1,1), unhex('00000000'), substring(value,6,length(value)-5))")
    )
    out = decode_stage(patched, SchemaProvider(), GOLDEN_TOPIC).collect()
    assert all(r["_corrupt_record"] is not None for r in out)


def test_encoder_decoder_roundtrip_byte_exact():
    """encode(decode(body)) must reproduce every golden body byte-for-byte."""
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import encode_avro_record

    ev = json.load(open(GOLDEN_EVENT))
    for recs in ev["records"].values():
        for rec in recs:
            body = base64.b64decode(rec["value"])[5:]
            row = decode_avro_record(body, RATECARD_FIELDS)
            assert encode_avro_record(row, RATECARD_FIELDS) == body


def test_key_cascade_branches(spark):
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import key_cascade

    rows = [
        (b"4",),                      # printable utf-8 digits -> "4"
        (b"hello",),                  # printable utf-8 -> itself
        (b"\x00\x00\x01\x87",),       # 4-byte BE int -> "391"
        (b"\xff\xff\xff\xff",),       # 4-byte BE SIGNED int -> "-1", not 2^32-1
        (b"\xff\xff\xfe\x00",),       # high bit set -> "-512"
        (b"\x00\x01",),               # non-printable, not 4 bytes -> hex
        (None,),                      # absent key -> null
    ]
    df = spark.createDataFrame(rows, "key binary")
    got = [r["k"] for r in df.select(key_cascade("key").alias("k")).collect()]
    assert got == ["4", "hello", "391", "-1", "-512", "0001", None]


def test_multi_topic_routing(spark, tmp_path):
    """Two topics with different Avro schemas route into separate decoded
    frames off one stream (configure_lambda_triggeres.sh:13-27 semantics)."""
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
        AvroField,
        SchemaProvider,
        confluent_wrap,
        encode_avro_record,
        route_by_topic,
    )

    other_fields = (
        AvroField("ORDER_ID", "long", True),
        AvroField("AMOUNT", "double", True),
        AvroField("SRC_KEY_VAL", "string", False),
    )
    provider = SchemaProvider(
        {
            GOLDEN_TOPIC: (391, RATECARD_FIELDS),
            "orders_cdc": (77, other_fields),
        }
    )

    golden = json.load(open(GOLDEN_EVENT))
    synth = [
        {"ORDER_ID": 1, "AMOUNT": 12.5, "SRC_KEY_VAL": "1"},
        {"ORDER_ID": None, "AMOUNT": -3.25, "SRC_KEY_VAL": "2"},
    ]
    golden["records"]["orders_cdc-0"] = [
        {
            "topic": "orders_cdc",
            "partition": 0,
            "offset": i,
            "timestamp": 1625877624954,
            "timestampType": "CREATE_TIME",
            "key": base64.b64encode(str(i).encode()).decode(),
            "value": base64.b64encode(
                confluent_wrap(77, encode_avro_record(row, other_fields))
            ).decode(),
        }
        for i, row in enumerate(synth)
    ]
    fixture = tmp_path / "multi_topic_event.json"
    fixture.write_text(json.dumps(golden))

    ev = read_lambda_events(spark, str(fixture))
    routed = route_by_topic(ev, provider)
    assert set(routed) == {GOLDEN_TOPIC, "orders_cdc"}
    assert routed[GOLDEN_TOPIC].count() == 16
    orders = {r["SRC_KEY_VAL"]: r for r in routed["orders_cdc"].collect()}
    assert orders["1"]["ORDER_ID"] == 1 and orders["1"]["AMOUNT"] == 12.5
    assert orders["2"]["ORDER_ID"] is None and orders["2"]["AMOUNT"] == -3.25
    assert all(r["_corrupt_record"] is None for r in orders.values())
    ev.unpersist()


def test_route_by_topic_reads_source_once(spark, tmp_path):
    """The multi-topic fan-out must consume ONE cached scan of the shared
    source, not re-read it per topic: every routed frame's plan reads the
    materialization boundary (InMemoryTableScan/Relation) route_by_topic
    persisted — the same boundary contract as the curation chain's
    cleaning cache (test_x28_chain_persists_cleaning_boundary)."""
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
        SchemaProvider,
        route_by_topic,
    )

    provider = SchemaProvider({GOLDEN_TOPIC: (391, RATECARD_FIELDS)})
    ev = read_lambda_events(spark, GOLDEN_EVENT)
    routed = route_by_topic(ev, provider)
    for topic, df in routed.items():
        df.write.mode("overwrite").format("noop").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the localCheckpoint boundary shows as a materialized-RDD scan
        # (and the json fixture scan disappears from the per-topic plans)
        assert "ExistingRDD" in plan or "Scan RDD" in plan, (topic, plan[:2000])
        assert "FileScan json" not in plan, (topic, plan[:2000])


def test_batch_json_serialization(spark):
    from lambda_kafka_to_s3_parquet_spark.plans.ingest import i05_batch_json

    rows = i05_batch_json(spark, "")
    first = json.loads(rows.first()["json"])
    assert first["topic"] == GOLDEN_TOPIC
    assert "RATE_CARD_ID" in first


def test_schema_provider_memoizes():
    p = SchemaProvider()
    for _ in range(5):
        sid, fields = p.schema_for(GOLDEN_TOPIC)
    assert p.lookups == 1
    assert sid == 391
    assert len(fields) == 19


def test_jvm_from_avro_dispatch(spark):
    """The decode stage dispatches on spark-avro jar availability; the Avro
    JSON schema derives from RATECARD_FIELDS in order; when the JVM path is
    available both paths must agree on the golden fixture byte-for-byte."""
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
        avro_json_schema,
        jvm_from_avro_available,
    )

    sch = json.loads(avro_json_schema(RATECARD_FIELDS))
    assert sch["type"] == "record"
    assert [f["name"] for f in sch["fields"]] == [f.name for f in RATECARD_FIELDS]
    assert sch["fields"][0]["type"] == ["null", "long"]  # nullable union
    assert sch["fields"][-1]["type"] == "string"  # non-null CDC metadata

    kafka = read_lambda_events(spark, GOLDEN_EVENT)
    py_rows = sorted(
        decode_stage(kafka, SchemaProvider(), GOLDEN_TOPIC, use_jvm=False).collect(),
        key=lambda r: (r["partition"], r["offset"]),
    )
    assert len(py_rows) == 16

    # whatever the environment, the default dispatch must decode the batch
    assert decode_stage(kafka, SchemaProvider(), GOLDEN_TOPIC).count() == 16


def test_jvm_from_avro_path_byte_exact(spark):
    """The JVM ``from_avro`` fast path must produce the identical golden
    rows as the Arrow fallback. The spark-avro MODULE jar is not bundled
    with the pyspark wheel and this container has no network to resolve
    ``org.apache.spark:spark-avro`` via spark.jars.packages, so where the
    classpath probe fails this skips WITH REASON — the fast path's
    coverage gap stays visible in every test run instead of silently
    collapsing into the fallback branch. On any cluster with spark-avro
    installed (every managed Spark distribution) this runs for real."""
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
        jvm_from_avro_available,
    )

    if not jvm_from_avro_available(spark):
        pytest.skip(
            "spark-avro module jar absent and unfetchable offline: JVM "
            "from_avro path exercised only on jar-equipped clusters "
            "(dispatch + gating logic covered by test_jvm_from_avro_dispatch)"
        )
    kafka = read_lambda_events(spark, GOLDEN_EVENT)
    key = lambda r: (r["partition"], r["offset"])  # noqa: E731
    jvm_rows = sorted(
        decode_stage(kafka, SchemaProvider(), GOLDEN_TOPIC, use_jvm=True).collect(), key=key
    )
    py_rows = sorted(
        decode_stage(kafka, SchemaProvider(), GOLDEN_TOPIC, use_jvm=False).collect(), key=key
    )
    assert jvm_rows == py_rows


def test_full_catalog_routing(spark):
    """The default catalog must model the reference's whole subscription:
    golden ratecard + the 11 trigger-script CDC topics, all decoding with
    0 corrupt records and genuinely different schema widths."""
    from lambda_kafka_to_s3_parquet_spark.plans import all_specs
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import CDC_TOPICS

    assert len(CDC_TOPICS) == 11
    rows = all_specs()["i08_multi_topic_routing"].fn(spark, "").collect()
    assert len(rows) == 12
    assert all(r["n_corrupt"] == 0 for r in rows)
    assert sum(r["n_records"] for r in rows) == 16 + 11 * 3
    widths = {r["topic"]: r["n_cols"] for r in rows}
    # ratecard keeps the recovered 19-field golden schema (+5 meta +1 corrupt)
    assert widths["lndcdcadsrtcrd_ratecard"] > widths["lndcdcadsprpsl_flightyear"]


def test_tombstone_value_goes_corrupt_not_crash(spark):
    """A CDC delete marker (key present, value NULL) must land as a corrupt
    record with an empty-bytes marker — visible to corruption counters —
    instead of crashing the decode task."""
    ev = read_lambda_events(spark, GOLDEN_EVENT)
    with_tombstone = ev.withColumn(
        "value",
        F.when(F.col("offset") == 0, F.lit(None).cast("binary")).otherwise(F.col("value")),
    )
    out = decode_stage(with_tombstone, SchemaProvider(), GOLDEN_TOPIC).collect()
    assert len(out) == 16
    n_tombstones = ev.filter(F.col("offset") == 0).count()  # offset restarts per partition
    bad = [r for r in out if r["_corrupt_record"] is not None]
    assert len(bad) == n_tombstones > 0
    assert all(bytes(r["_corrupt_record"]) == b"" for r in bad)
    assert all(r["RATE_CARD_ID"] is None for r in bad)


def test_schema_evolution_mixed_writer_versions(spark, tmp_path):
    """One batch mixing writer-schema versions: each record decodes under
    its own envelope schema id; rows written before a column existed get
    NULL there; an id outside the catalog is corrupt; a historical version
    with a field the latest lacks fails at plan build (non-additive)."""
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
        AvroField,
        confluent_wrap,
        encode_avro_record,
    )

    v2 = RATECARD_FIELDS
    v1 = RATECARD_FIELDS[:-2]  # before the last two columns were added
    provider = SchemaProvider(history={GOLDEN_TOPIC: {390: v1}})

    golden = json.load(open(GOLDEN_EVENT))
    first = next(iter(golden["records"].values()))[0]
    body = base64.b64decode(first["value"])[5:]
    row = decode_avro_record(body, v2)
    old_row = {f.name: row[f.name] for f in v1}

    def rec(offset, sid, fields, r):
        return {
            "topic": GOLDEN_TOPIC,
            "partition": 9,
            "offset": offset,
            "timestamp": 1625877624954,
            "timestampType": "CREATE_TIME",
            "key": base64.b64encode(b"k").decode(),
            "value": base64.b64encode(
                confluent_wrap(sid, encode_avro_record(r, fields))
            ).decode(),
        }

    golden["records"] = {
        f"{GOLDEN_TOPIC}-9": [
            rec(0, 391, v2, row),      # current version
            rec(1, 390, v1, old_row),  # historical version
            rec(2, 999, v1, old_row),  # unknown id -> corrupt
        ]
    }
    fixture = tmp_path / "evolution_event.json"
    fixture.write_text(json.dumps(golden))

    out = {
        r["offset"]: r
        for r in decode_stage(
            read_lambda_events(spark, str(fixture)), provider, GOLDEN_TOPIC
        ).collect()
    }
    new_cols = [f.name for f in v2[-2:]]
    assert out[0]["_corrupt_record"] is None
    assert all(out[0][c] is not None for c in new_cols)
    assert out[1]["_corrupt_record"] is None
    assert out[1]["RATE_CARD_ID"] == row["RATE_CARD_ID"]
    assert all(out[1][c] is None for c in new_cols)  # predates the columns
    assert out[2]["_corrupt_record"] is not None

    with pytest.raises(ValueError, match="non-additive"):
        bad = SchemaProvider(
            history={GOLDEN_TOPIC: {390: v1 + (AvroField("GONE", "string", True),)}}
        )
        decode_stage(read_lambda_events(spark, str(fixture)), bad, GOLDEN_TOPIC)


def test_schema_evolution_type_promotion(spark, tmp_path):
    """Avro schema-resolution numeric promotion: a v1 writer stores
    RATE_CARD_ID as int and a price as float; the latest version widens
    them to long/double (the reference's CDC world — NUMBER columns
    arriving as int then long). Records of BOTH versions must decode to
    the latest (wide) column types with the golden values; a
    NON-promotable change (long -> int) fails at plan build."""
    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
        AvroField,
        confluent_wrap,
        decode_stage,
        encode_avro_record,
    )
    from lambda_kafka_to_s3_parquet_spark.sources.kafka_replay import (
        read_lambda_events,
    )

    topic = "promo_topic"
    v2 = (
        AvroField("ID", "long", True),
        AvroField("PRICE", "double", True),
        AvroField("NM", "string", False),
    )
    v1 = (
        AvroField("ID", "int", True),
        AvroField("PRICE", "float", True),
        AvroField("NM", "string", False),
    )
    provider = SchemaProvider(
        catalog={topic: (501, v2)}, history={topic: {500: v1}}
    )

    def rec(offset, sid, fields, r):
        return {
            "topic": topic,
            "partition": 0,
            "offset": offset,
            "timestamp": 1625877624954,
            "timestampType": "CREATE_TIME",
            "key": base64.b64encode(b"k").decode(),
            "value": base64.b64encode(
                confluent_wrap(sid, encode_avro_record(r, fields))
            ).decode(),
        }

    event = {
        "records": {
            f"{topic}-0": [
                rec(0, 501, v2, {"ID": 2**40, "PRICE": 1.25, "NM": "wide"}),
                rec(1, 500, v1, {"ID": 7, "PRICE": 2.5, "NM": "narrow"}),
            ]
        }
    }
    fixture = tmp_path / "promotion_event.json"
    fixture.write_text(json.dumps(event))

    decoded = decode_stage(read_lambda_events(spark, str(fixture)), provider, topic)
    types = dict(decoded.dtypes)
    assert types["ID"] == "bigint" and types["PRICE"] == "double"
    out = {r["offset"]: r for r in decoded.collect()}
    assert out[0]["_corrupt_record"] is None and out[1]["_corrupt_record"] is None
    assert out[0]["ID"] == 2**40 and out[0]["PRICE"] == 1.25
    assert out[1]["ID"] == 7 and out[1]["PRICE"] == 2.5  # exact: 2.5 is a float32
    assert out[1]["NM"] == "narrow"

    with pytest.raises(ValueError, match="non-resolvable"):
        narrowing = SchemaProvider(
            catalog={topic: (501, v1)}, history={topic: {500: v2}}
        )
        decode_stage(read_lambda_events(spark, str(fixture)), narrowing, topic)


# --------------------------------------------------------------------------
# Real Kafka connector builder (production path; no broker in CI).
# --------------------------------------------------------------------------


def test_kafka_source_options_reference_mapping():
    """The builder maps the reference deployment's knobs onto the Kafka
    source options: 3-broker bootstrap list, 11-topic subscribe list
    (configure_lambda_triggeres.sh:9-23), batch size -> maxOffsetsPerTrigger
    (README.md:18-21)."""
    from lambda_kafka_to_s3_parquet_spark.sources.kafka_replay import (
        REFERENCE_TOPICS,
        kafka_source_options,
    )

    brokers = ["b1:9093", "b2:9093", "b3:9093"]
    opts = kafka_source_options(brokers, max_offsets_per_trigger=500)
    assert opts["kafka.bootstrap.servers"] == "b1:9093,b2:9093,b3:9093"
    assert opts["subscribe"].split(",") == list(REFERENCE_TOPICS)
    assert len(REFERENCE_TOPICS) == 11  # the trigger script's full list
    assert opts["maxOffsetsPerTrigger"] == "500"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
    # single-string broker form passes through unchanged
    assert kafka_source_options("k:9093")["kafka.bootstrap.servers"] == "k:9093"


def test_kafka_source_builds_unresolved_plan_or_skips(spark):
    """With the spark-sql-kafka jar present the builder must produce a
    streaming frame in the engine's canonical ingest shape; without it
    (this container) the construction fails at load() -- skip WITH REASON
    so the coverage gap stays visible in test output."""
    from lambda_kafka_to_s3_parquet_spark.sources.kafka_replay import kafka_source

    try:
        df = kafka_source(spark, "localhost:9092", max_offsets_per_trigger=500)
    except Exception as e:  # DATA_SOURCE_NOT_FOUND / missing class
        msg = str(e)
        assert "kafka" in msg.lower(), msg
        pytest.skip(f"spark-sql-kafka connector jar not on classpath: {msg[:120]}")
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
    ]


def test_normalize_kafka_source_feeds_decode_stage(spark):
    """A frame with the REAL Kafka source's exact schema (binary key/value,
    TimestampType timestamp, int timestampType), once normalized, must be
    schema-identical to the replay twin and decode byte-exactly through
    decode_stage."""
    import datetime

    from lambda_kafka_to_s3_parquet_spark.sources.kafka_replay import (
        KAFKA_SOURCE_SCHEMA,
        normalize_kafka_source,
    )

    ev = json.load(open(GOLDEN_EVENT))
    recs = next(iter(ev["records"].values()))
    r = recs[0]
    row = (
        base64.b64decode(r["key"]),
        base64.b64decode(r["value"]),
        r["topic"],
        r["partition"],
        r["offset"],
        datetime.datetime.fromtimestamp(r["timestamp"] / 1000, datetime.timezone.utc),
        1,  # CREATE_TIME
    )
    real = spark.createDataFrame([row], KAFKA_SOURCE_SCHEMA)
    norm = normalize_kafka_source(real)

    twin = read_lambda_events(spark, GOLDEN_EVENT)
    # canonical shape: same names and types (nullability flags differ only
    # because literals are provably non-null — irrelevant downstream)
    assert [(f.name, f.dataType) for f in norm.schema.fields] == [
        (f.name, f.dataType) for f in twin.schema.fields
    ]

    out = decode_stage(norm, SchemaProvider(), GOLDEN_TOPIC).collect()
    assert len(out) == 1
    got = out[0]
    assert got["_corrupt_record"] is None
    assert got["kafka_ts"] == r["timestamp"]  # epoch millis preserved
    ref = (
        decode_stage(twin, SchemaProvider(), GOLDEN_TOPIC)
        .filter((F.col("offset") == r["offset"]) & (F.col("partition") == r["partition"]))
        .collect()[0]
    )
    assert got.asDict() == ref.asDict()


def test_i09_mixed_writer_throughput_batch_splits_half(spark):
    """The i09 throughput probe must decode the full 20k batch with the
    evolved columns NULL on exactly the v1-written half — proving the
    per-record version dispatch ran (not a single-writer fast path that
    would corrupt or drop the odd records)."""
    from lambda_kafka_to_s3_parquet_spark.plans import all_specs

    row = all_specs()["i09_decode_throughput_mixed"].fn(spark, "").collect()[0]
    assert row["n_decoded"] == 20_000
    assert row["n_corrupt"] == 0
    assert row["n_v1_rows"] == 10_000 and row["n_v2_rows"] == 10_000


def test_schema_compat_gate_fires_at_provider_load():
    """The compat gate is WIRED IN, not detection-only: an incompatible
    registry update (a narrowing latest version) raises when the
    provider loads the topic's version history — before decode_stage
    ever sees a record — while check_topic_compat still REPORTS on the
    same provider (enforce=False), and the strict Confluent levels are
    opt-in per deployment."""
    import pytest

    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
        AvroField,
        SchemaProvider,
        check_topic_compat,
    )

    f = AvroField
    wide = (f("id", "long", True), f("price", "double", True))
    narrow = (f("id", "int", True), f("price", "float", True))

    # (a) default RESOLVABLE gate: a narrowing registry update fails at
    # history load — no kafka frame, no decode stage involved
    bad = SchemaProvider(catalog={"t": (2, narrow)}, history={"t": {1: wide}})
    with pytest.raises(ValueError, match="at provider load.*non-resolvable"):
        bad.versions_for("t")
    # the reporting path still works on the SAME rejected provider
    audit = check_topic_compat(bad, "t", "BACKWARD")
    assert any(v for v in audit.values())

    # (b) the gate memoizes: a compatible topic audits once, then loads free
    ok = SchemaProvider(catalog={"t": (2, wide)}, history={"t": {1: narrow}})
    assert sorted(ok.versions_for("t")) == [1, 2]
    assert sorted(ok.versions_for("t")) == [1, 2]  # memoized, no re-audit

    # (c) strict Confluent BACKWARD rejects what RESOLVABLE tolerates:
    # a non-nullable added field (the engine decodes it as NULL, but the
    # registry level calls it incompatible)
    plus_required = wide + (f("sku", "string", False),)
    lenient = SchemaProvider(
        catalog={"t": (2, plus_required)}, history={"t": {1: wide}}
    )
    assert sorted(lenient.versions_for("t")) == [1, 2]  # RESOLVABLE: fine
    strict = SchemaProvider(
        catalog={"t": (2, plus_required)}, history={"t": {1: wide}},
        compat_mode="BACKWARD",
    )
    with pytest.raises(ValueError, match="BACKWARD compatibility gate"):
        strict.versions_for("t")

    # (d) gate disabled: the decode stage's own plan-build defense remains
    off = SchemaProvider(
        catalog={"t": (2, narrow)}, history={"t": {1: wide}}, compat_mode=None
    )
    assert sorted(off.versions_for("t")) == [1, 2]  # provider loads

    # (e) unknown mode names reject loudly
    with pytest.raises(ValueError, match="unknown compat_mode"):
        SchemaProvider(
            catalog={"t": (1, wide)}, compat_mode="SIDEWAYS"
        ).versions_for("t")


def test_schema_compat_levels():
    """Registry-style compatibility gates on the flat-record model:
    promotions pass BACKWARD, narrowing fails, non-nullable adds fail
    BACKWARD, removals fail FORWARD when the removed field was required,
    FULL = both directions, and the per-topic audit walks adjacent
    version pairs."""
    import pytest

    from lambda_kafka_to_s3_parquet_spark.sources.avro_codec import (
        AvroField,
        SchemaProvider,
        check_schema_compat,
        check_topic_compat,
    )

    f = AvroField
    v1 = (f("id", "int", False), f("amount", "float", True))
    # widen id int->long, add nullable note: BACKWARD + FORWARD clean
    v2 = (f("id", "long", False), f("amount", "float", True), f("note", "string", True))
    assert check_schema_compat(v1, v2, "BACKWARD") == []
    # FORWARD: old reader (v1) reads v2 data: id written long read as int
    viol_f = check_schema_compat(v1, v2, "FORWARD")
    assert len(viol_f) == 1 and "cannot resolve writer type 'long'" in viol_f[0]
    assert check_schema_compat(v1, v2, "FULL") == viol_f

    # narrowing double->float fails BACKWARD
    v3 = (f("id", "long", False), f("amount", "double", True))
    v4 = (f("id", "long", False), f("amount", "float", True))
    assert any("not an Avro promotion" in v for v in check_schema_compat(v3, v4, "BACKWARD"))

    # non-nullable add fails BACKWARD (no default for old data)
    v5 = (f("id", "long", False), f("created", "string", False))
    bad = check_schema_compat((f("id", "long", False),), v5, "BACKWARD")
    assert any("added without a default" in v for v in bad)
    # nullable add passes
    v6 = (f("id", "long", False), f("created", "string", True))
    assert check_schema_compat((f("id", "long", False),), v6, "BACKWARD") == []

    # nullable -> non-nullable fails (null branch would crash the reader)
    v7 = (f("id", "long", False), f("amount", "float", False))
    assert any("allows null" in x for x in check_schema_compat(v4, v7, "BACKWARD"))
    # non-nullable -> nullable widening passes BACKWARD
    assert check_schema_compat(v7, v4, "BACKWARD") == []

    # removal: BACKWARD fine (reader skips), FORWARD fails when the old
    # reader required the field
    v8 = (f("id", "long", False),)
    assert check_schema_compat(v7, v8, "BACKWARD") == []
    assert any("added without a default" in x for x in check_schema_compat(v7, v8, "FORWARD"))

    with pytest.raises(ValueError, match="unknown compatibility mode"):
        check_schema_compat(v1, v2, "SIDEWAYS")

    # topic audit: adjacent pairs, keyed by (old_id, new_id)
    provider = SchemaProvider(
        catalog={"t": (3, v2)},
        history={"t": {1: v1, 2: (f("id", "long", False), f("amount", "float", True))}},
    )
    audit = check_topic_compat(provider, "t", "BACKWARD")
    assert set(audit) == {(1, 2), (2, 3)}
    assert audit[(1, 2)] == [] and audit[(2, 3)] == []
