"""Round-trip tests for the partitioned Parquet sink (SURVEY.md §2.4, M2):
decode golden event → land Hive-partitioned → read back pruned, with the
physical plan proving partition pruning actually happened."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark.operators.sink import (
    PARTITION_COLS,
    read_partition,
    with_partition_columns,
    write_partitioned,
)
from lambda_kafka_to_s3_parquet_spark.plans.ingest import GOLDEN_TOPIC, decoded_golden


@pytest.fixture(scope="module")
def landed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("landed") / "ratecard")
    df = with_partition_columns(decoded_golden(spark))
    metrics = write_partitioned(df, path)
    return path, metrics


def test_write_metrics_match_v2_semantics(spark, landed):
    _, metrics = landed
    assert metrics.total_records == 16
    # golden batch has 8 distinct SRC_KEY_VALs; HLL is exact at this tiny n
    assert metrics.approx_distinct_keys == decoded_golden(spark).select(
        "SRC_KEY_VAL"
    ).distinct().count()


def test_hive_partition_layout(landed):
    path, _ = landed
    assert os.path.isdir(os.path.join(path, f"topic={GOLDEN_TOPIC}"))
    # fixture kafka_ts = 1625877624954 -> 2021-07-10 00:40:24 UTC
    assert os.path.isdir(
        os.path.join(path, f"topic={GOLDEN_TOPIC}", "y=2021", "m=7", "d=10", "h=0")
    )


def test_roundtrip_values(spark, landed):
    path, _ = landed
    back = spark.read.parquet(path)
    assert back.count() == 16
    want = {r["SRC_KEY_VAL"] for r in decoded_golden(spark).collect()}
    got = {r["SRC_KEY_VAL"] for r in back.collect()}
    assert got == want
    for c in PARTITION_COLS:
        assert c in back.columns


def test_partition_pruned_scan(spark, landed):
    path, _ = landed
    pruned = read_partition(spark, path, topic=GOLDEN_TOPIC, y=2021, m=7, d=10, h=0)
    assert pruned.count() == 16
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition predicates must show up as PartitionFilters on the scan,
    # NOT as post-scan data Filters
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "topic" in seg and "y" in seg and "h" in seg

    empty = read_partition(spark, path, topic=GOLDEN_TOPIC, y=1999)
    assert empty.count() == 0


def test_wall_clock_partitioning(spark):
    df = with_partition_columns(decoded_golden(spark), wall_clock=True)
    row = df.select("y", "m", "d", "h").first()
    import datetime

    now = datetime.datetime.now(datetime.timezone.utc)
    assert row["y"] == now.year


def test_verify_landed_readback(spark, landed):
    from lambda_kafka_to_s3_parquet_spark.operators.sink import verify_landed

    path, _ = landed
    got = verify_landed(spark, path)
    assert got["n_rows"] == 16
    assert "RATE_CARD_ID" in got["columns"] and "topic" in got["columns"]
    assert len(got["sample"]) == 5
    assert "struct<" in got["schema"]


def test_decode_throughput_query(spark):
    from lambda_kafka_to_s3_parquet_spark.plans.ingest import i06_decode_throughput

    row = i06_decode_throughput(spark, "").collect()[0]
    assert row["n_decoded"] == 20_000
    assert row["n_corrupt"] == 0
    assert row["distinct_keys"] == 997


def test_compact_partitions(spark, tmp_path):
    from lambda_kafka_to_s3_parquet_spark.operators.sink import compact_partitions

    path = str(tmp_path / "compact")
    df = with_partition_columns(decoded_golden(spark))
    other = df.withColumn("topic", F.lit("other_topic"))
    for _ in range(3):
        write_partitioned(df, path)
    for _ in range(2):
        write_partitioned(other, path)

    def files_for(topic: str) -> int:
        return (
            spark.read.parquet(path)
            .filter(F.col("topic") == topic)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    assert files_for(GOLDEN_TOPIC) >= 3
    n_other_before = files_for("other_topic")

    stats = compact_partitions(spark, path, topic=GOLDEN_TOPIC)
    rows = stats.collect()
    assert rows and all(r["n_files"] == 1 for r in rows)
    back = spark.read.parquet(path)
    assert back.filter(F.col("topic") == GOLDEN_TOPIC).count() == 48
    # dynamic overwrite: the other topic's partitions are untouched
    assert back.filter(F.col("topic") == "other_topic").count() == 32
    assert files_for("other_topic") == n_other_before

    # the file-size bound splits an oversized partition into ceil(48/20)=3
    stats2 = compact_partitions(
        spark, path, topic=GOLDEN_TOPIC, max_records_per_file=20
    )
    assert all(r["n_files"] == 3 for r in stats2.collect())


def test_append_mode_accumulates(spark, landed, tmp_path):
    path = str(tmp_path / "accum")
    df = with_partition_columns(decoded_golden(spark))
    write_partitioned(df, path)
    write_partitioned(df, path)
    assert spark.read.parquet(path).count() == 32


def test_sse_kms_encryption_confs_land(spark):
    """The SSE-KMS knob must land the reference's fs.s3a encryption confs
    (lambda_function.py:96-105 / check_parquet.py:37-51 parity) on the
    session's Hadoop configuration."""
    from lambda_kafka_to_s3_parquet_spark.session import configure_encryption

    arn = "arn:aws:kms:us-east-1:000000000000:key/test-key"
    applied = configure_encryption(spark, kms_key_arn=arn)
    assert applied == {
        "fs.s3a.server-side-encryption-algorithm": "SSE-KMS",
        "fs.s3a.server-side-encryption.key": arn,
    }
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("fs.s3a.server-side-encryption-algorithm") == "SSE-KMS"
    assert hc.get("fs.s3a.server-side-encryption.key") == arn

    # SSE-S3 variant: algorithm only, no key
    assert configure_encryption(spark, algorithm="AES256") == {
        "fs.s3a.server-side-encryption-algorithm": "AES256"
    }
    # off = no-op
    assert configure_encryption(spark) == {}


def test_daily_partition_granularity(spark, tmp_path):
    """granularity='day' must reproduce the v2 handler's daily layout
    (topic/y/m/d, no hour directory) and still prune on day."""
    import os

    from lambda_kafka_to_s3_parquet_spark.operators.sink import (
        partition_cols,
        read_partition,
        with_partition_columns,
        write_partitioned,
    )
    from lambda_kafka_to_s3_parquet_spark.plans.ingest import decoded_golden

    assert partition_cols("day") == ("topic", "y", "m", "d")
    with pytest.raises(ValueError):
        partition_cols("minute")

    path = str(tmp_path / "daily")
    d = with_partition_columns(decoded_golden(spark), granularity="day")
    assert "h" not in d.columns
    m = write_partitioned(d, path, granularity="day")
    assert m.total_records == 16

    walked = {root for root, _, files in os.walk(path) if files}
    assert not any("/h=" in w for w in walked)
    assert any("/d=" in w for w in walked)

    days = [r["d"] for r in d.select("d").distinct().collect()]
    pruned = read_partition(spark, path, d=days[0])
    assert pruned.count() == d.filter(F.col("d") == days[0]).count() > 0


def test_clustered_layout_touches_fewer_files_than_scattered(spark, sf_dir):
    """The write-side layout claims, measured per (layout, probe):
    scattered skips nothing; range clustering skips only on its leading
    column; the Z-order layout skips on BOTH the time and user probes."""
    from lambda_kafka_to_s3_parquet_spark.plans import all_specs

    rows = {
        (r["layout"], r["probe"]): r
        for r in all_specs()["x34_clustered_layout"].fn(spark, sf_dir).collect()
    }
    total = rows[("scattered", "ts_quarter")]["total_files"]
    assert all(r["total_files"] == total for r in rows.values())
    for probe in ("ts_quarter", "user_quarter"):
        # identical answers across layouts
        ns = {r["n_rows"] for (lay, p), r in rows.items() if p == probe}
        assert len(ns) == 1 and ns.pop() > 0
        # the scattered baseline reads everything
        assert rows[("scattered", probe)]["files_touched"] == total
    # range clustering: skips on ts, helpless on the other dimension
    assert rows[("range_ts", "ts_quarter")]["files_touched"] <= (total * 3) // 4
    assert rows[("range_ts", "user_quarter")]["files_touched"] == total
    # z-order: both probes skip
    assert rows[("zorder", "ts_quarter")]["files_touched"] <= (total * 3) // 4
    assert rows[("zorder", "user_quarter")]["files_touched"] <= (total * 3) // 4


def test_physical_file_skipping_matches_layout_claims(spark, tmp_path):
    """The PHYSICAL half of x34's zone-map census (x34's registered form
    went deterministic/oracle-checked in round 9): really write the
    three layouts with write_clustered / interleave_bits and count the
    files a filtered scan touches via input_file_name(). Scattered reads
    everything; range clustering skips on its leading column only;
    Z-order skips on both probe dimensions."""
    from lambda_kafka_to_s3_parquet_spark.operators.sink import (
        files_touched,
        interleave_bits,
        write_clustered,
    )
    from lambda_kafka_to_s3_parquet_spark.session import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "value"
    )
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = max((hi - lo).total_seconds(), 1.0)
    tbucket = F.least(
        (
            (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                - F.unix_timestamp(F.lit(lo).cast("timestamp"))
            )
            / F.lit(span / 1024)
        ).cast("bigint"),
        F.lit(1023),
    )
    ubucket = F.pmod(F.xxhash64("user_id"), F.lit(1024))

    n_files = 16
    base = tmp_path / "layouts"
    events.repartition(n_files).write.parquet(str(base / "scattered"))
    write_clustered(events, str(base / "range_ts"), ["ts"], n_files=n_files)
    write_clustered(
        events.withColumn("zkey", interleave_bits(tbucket, ubucket, bits=10)),
        str(base / "zorder"),
        ["zkey"],
        n_files=n_files,
    )

    quarter = lo + (hi - lo) / 4
    probes = {
        "ts": (F.col("ts") >= lo) & (F.col("ts") < quarter),
        "user": ubucket < 256,
    }
    touched = {}
    for layout in ("scattered", "range_ts", "zorder"):
        df = spark.read.parquet(str(base / layout))
        total = files_touched(df)
        assert total == n_files
        for pname, pred in probes.items():
            touched[(layout, pname)] = files_touched(df.filter(pred))

    assert touched[("scattered", "ts")] == n_files
    assert touched[("scattered", "user")] == n_files
    assert touched[("range_ts", "ts")] <= (n_files * 3) // 4
    assert touched[("range_ts", "user")] == n_files
    assert touched[("zorder", "ts")] <= (n_files * 3) // 4
    assert touched[("zorder", "user")] <= (n_files * 3) // 4


def test_write_clustered_sorts_within_files(spark, tmp_path):
    """Each clustered file must be internally sorted on the cluster column
    (tight row-group min/max is the point of the layout)."""
    from lambda_kafka_to_s3_parquet_spark.operators.sink import write_clustered
    from lambda_kafka_to_s3_parquet_spark.session import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "clu")
    write_clustered(events.select("event_id", "ts"), path, ["ts"], n_files=4)
    got = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), "ts")
        .collect()
    )
    by_file: dict[str, list] = {}
    for r in got:
        by_file.setdefault(r["f"], []).append(r["ts"])
    assert len(by_file) >= 2
    for ts_list in by_file.values():
        assert ts_list == sorted(ts_list)  # parquet preserves write order
    # disjoint ranges: files ordered by min must not overlap
    spans = sorted((min(v), max(v)) for v in by_file.values())
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_sink_zone_maps_partitioned(spark, tmp_path):
    """Plain-sink zone maps, partition granularity: stats-driven skipping
    via read_pruned must (a) touch strictly fewer files than the raw
    scan for a disjoint-range probe, (b) never lose rows for an
    overlapping probe, (c) WIDEN on append (the appended values' range
    is honored), and (d) read statless partitions conservatively."""
    from lambda_kafka_to_s3_parquet_spark.operators.sink import (
        files_touched,
        read_pruned,
        read_zone_maps,
        write_partitioned,
    )

    path = str(tmp_path / "t")
    rows = [(i, "t1", 2021, 7, (i % 3) + 1, f"k{i}") for i in range(300)]
    df = spark.createDataFrame(
        rows, "event_id long, topic string, y int, m int, d int, key string"
    )
    write_partitioned(
        df, path, key_col="key", granularity="day", stats_cols=["event_id"]
    )
    maps = read_zone_maps(spark, path)
    assert maps["kind"] == "partitions" and len(maps["entries"]) == 3

    # (a) disjoint probe: every partition's [min,max] excludes it
    full = files_touched(spark.read.parquet(path))
    pruned = read_pruned(spark, path, skip_where=[("event_id", 10_000, 20_000)])
    assert pruned.count() == 0
    # the exclusion predicate prunes at PLANNING: no files scanned
    assert files_touched(pruned.filter(F.lit(True))) == 0 < full

    # (b) overlapping probe loses nothing vs the real filter
    hit = read_pruned(spark, path, skip_where=[("event_id", 0, 99)])
    want = spark.read.parquet(path).filter("event_id between 0 and 99")
    assert sorted(r["event_id"] for r in hit.filter(
        "event_id between 0 and 99").collect()) == sorted(
        r["event_id"] for r in want.collect())

    # (c) append widens: new high ids land in d=1 only; a probe on the
    # new range must read d=1 but may skip d=2/d=3
    more = spark.createDataFrame(
        [(50_000 + i, "t1", 2021, 7, 1, f"n{i}") for i in range(50)],
        "event_id long, topic string, y int, m int, d int, key string",
    )
    write_partitioned(
        more, path, key_col="key", granularity="day", stats_cols=["event_id"]
    )
    new_probe = read_pruned(spark, path, skip_where=[("event_id", 50_000, 60_000)])
    assert new_probe.filter("event_id >= 50000").count() == 50
    assert files_touched(new_probe) < files_touched(spark.read.parquet(path))

    # (d) a statless partition (written WITHOUT stats_cols) is always read
    bypass = spark.createDataFrame(
        [(999_999, "t1", 2021, 7, 9, "x")],
        "event_id long, topic string, y int, m int, d int, key string",
    )
    write_partitioned(bypass, path, key_col="key", granularity="day")
    ids = {r["event_id"] for r in read_pruned(
        spark, path, skip_where=[("event_id", 10_000, 20_000)]).collect()}
    assert 999_999 in ids  # unknown dir: conservative read


def test_sink_zone_maps_widen_before_write_crash_safe(spark, tmp_path):
    """The sidecar is widened BEFORE the data lands (round-9 advice): a
    crash between the two steps leaves bounds WIDER than the data —
    conservative — never an existing entry narrower than its partition.
    Simulated crash: merge the batch's stats, don't write the batch; the
    probe covering the phantom range just reads conservatively. After
    the retry lands the data, every row is found."""
    from lambda_kafka_to_s3_parquet_spark.operators.sink import (
        _merge_partition_stats,
        partition_cols,
        read_pruned,
        read_zone_maps,
        write_partitioned,
    )

    path = str(tmp_path / "t")
    schema = "event_id long, topic string, y int, m int, d int, key string"
    base = spark.createDataFrame(
        [(i, "t1", 2021, 7, 1, f"k{i}") for i in range(100)], schema
    )
    write_partitioned(
        base, path, key_col="key", granularity="day", stats_cols=["event_id"]
    )

    # "crash": the appending writer widened the sidecar but never landed
    # its data (the order write_partitioned now guarantees)
    more = spark.createDataFrame(
        [(5_000 + i, "t1", 2021, 7, 1, f"n{i}") for i in range(10)], schema
    )
    _merge_partition_stats(
        more, path, list(partition_cols("day")), ["event_id"], "day"
    )
    entry = next(iter(read_zone_maps(spark, path)["entries"].values()))
    assert entry["event_id"][1] >= 5_009  # pre-widened past the data

    # wider-than-data is conservative: a probe skipping [5000, 6000]
    # cannot skip d=1 (its recorded range now overlaps), so the base
    # rows all survive; and the real filter loses nothing
    got = read_pruned(spark, path, skip_where=[("event_id", 5_000, 6_000)])
    assert got.count() == 100

    # retry lands the data inside the already-published bounds: the
    # pre-widened entry still admits the new range, so the probe that
    # targets it reads the partition and finds every retried row
    write_partitioned(
        more, path, key_col="key", granularity="day", stats_cols=["event_id"]
    )
    found = read_pruned(spark, path, skip_where=[("event_id", 5_000, 6_000)])
    assert found.filter("event_id >= 5000").count() == 10


def test_sink_zone_maps_clustered_files(spark, tmp_path):
    """File-granularity zone maps from write_clustered: a range probe on
    the cluster column scans only surviving files (strict subset), the
    kept rows equal the real filter, and append mode refuses stats."""
    import pytest

    from lambda_kafka_to_s3_parquet_spark.operators.sink import (
        files_touched,
        read_pruned,
        read_zone_maps,
        write_clustered,
    )
    from lambda_kafka_to_s3_parquet_spark.session import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "value"
    )
    path = str(tmp_path / "clu")
    write_clustered(events, path, ["event_id"], n_files=8, stats_cols=["event_id"])
    maps = read_zone_maps(spark, path)
    assert maps["kind"] == "files" and maps["complete"] and len(maps["entries"]) == 8

    lo, hi = 0, events.count() // 8  # ~first file's range
    pruned = read_pruned(spark, path, skip_where=[("event_id", lo, hi)])
    assert files_touched(pruned) < 8
    got = sorted(r["event_id"] for r in pruned.filter(
        f"event_id between {lo} and {hi}").collect())
    want = sorted(r["event_id"] for r in events.filter(
        f"event_id between {lo} and {hi}").collect())
    assert got == want and len(got) > 0

    # provably-empty range: zero rows, schema intact
    none = read_pruned(spark, path, skip_where=[("event_id", 10**12, 10**13)])
    assert none.count() == 0 and none.columns == pruned.columns

    with pytest.raises(ValueError, match="overwrite"):
        write_clustered(events, path, ["event_id"], mode="append",
                        stats_cols=["event_id"])


def test_sink_zone_maps_cas_never_loses_rival_widening(spark, tmp_path, monkeypatch):
    """A rival writer publishing BETWEEN this writer's sidecar read and
    its publish must not be clobbered: the versioned-name CAS makes the
    first publish attempt fail, and the retry re-merges from the rival's
    state — the final sidecar carries BOTH widenings (round-10 advice:
    the old read-compare-replace still had a lost-update window)."""
    import lambda_kafka_to_s3_parquet_spark.operators.sink as sink_mod
    from lambda_kafka_to_s3_parquet_spark.operators.sink import (
        _merge_partition_stats,
        _publish_zone_maps_cas,
        partition_cols,
        read_zone_maps,
        write_partitioned,
    )

    path = str(tmp_path / "t")
    schema = "event_id long, topic string, y int, m int, d int, key string"
    base = spark.createDataFrame(
        [(i, "t1", 2021, 7, 1, f"k{i}") for i in range(10)], schema
    )
    write_partitioned(
        base, path, key_col="key", granularity="day", stats_cols=["event_id"]
    )

    real_cas = sink_mod._publish_zone_maps_cas
    fired = {"n": 0}

    def racing_cas(spark_, path_, maps_, base_version):
        if fired["n"] == 0:
            fired["n"] += 1
            # rival lands v(base+1) first, widening the hi bound to 9999
            rival, rv = sink_mod._read_zone_maps_versioned(spark_, path_)
            key = next(iter(rival["entries"]))
            rival["entries"][key]["event_id"][1] = 9_999
            assert real_cas(spark_, path_, rival, rv)
        return real_cas(spark_, path_, maps_, base_version)

    monkeypatch.setattr(sink_mod, "_publish_zone_maps_cas", racing_cas)
    lo_batch = spark.createDataFrame(
        [(-50, "t1", 2021, 7, 1, "neg")], schema
    )
    _merge_partition_stats(
        lo_batch, path, list(partition_cols("day")), ["event_id"], "day"
    )
    assert fired["n"] == 1  # the race actually happened (first CAS lost)

    entry = next(iter(read_zone_maps(spark, path)["entries"].values()))
    assert entry["event_id"][0] <= -50      # this writer's widening kept
    assert entry["event_id"][1] == 9_999    # rival's widening kept too
