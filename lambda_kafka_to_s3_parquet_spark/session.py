"""SparkSession factory and table catalog.

Engine-session bootstrap — the Spark-side equivalent of the reference's
``initialize()`` (schema_registry_connect.py:54-123) and the session builder
in its read-back script (check_parquet.py:22-29), generalized: one place
that owns Spark configuration tuned for large-scale batch + streaming, and
registers the landed parquet tables as temp views (catalog registration).

Scale design notes (targets a 1000-executor cluster; tested on local[N]):

* AQE is on (coalesce + skew-join): shuffle partition counts self-tune at
  runtime, so ``spark.sql.shuffle.partitions`` is only an upper bound.
* Session timezone is pinned to UTC so event-time semantics are
  deterministic across drivers/executors regardless of host zone.
* Arrow is enabled for all pandas interchange — every Python-side operator
  in this engine is Arrow-batched (mapInPandas / pandas_udf).
* Broadcast threshold is raised to 64 MiB: the dimension tables of a
  TPC-H-style star schema (region/nation/supplier/part/customer at typical
  ratios) stay broadcast-able far beyond sf1, eliminating shuffles on the
  fact-table joins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver generates under /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_count() -> int:
    """Worker-thread count: $SPARK_GRAFT_CPUS, else host CPUs."""
    return int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)


def get_spark(
    app_name: str = "lambda-kafka-to-s3-parquet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    kms_key_arn: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    All knobs here are plan-level defaults; AQE re-plans at runtime. The
    reference's physical tactics (schema memoization, columnar batching,
    partition-pruned paths — SURVEY.md §4) are all subsumed by Catalyst
    once the plan is declared through this session.
    """
    cpus = cpu_count()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") or max(2 * cpus, 32)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Driver fixtures store events.ts as TIMESTAMP(NANOS), which Spark 4
        # only reads as a long via this legacy conf; load_table converts the
        # nanos back to TimestampType. Set unconditionally so the first read
        # never has to probe-and-retry (the aborted probe job polluted round-1
        # bench logs).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # SSE-KMS parity knob (reference: USE_KMS + KMS key ARN env params).
    kms = kms_key_arn or os.environ.get("SPARK_GRAFT_KMS_KEY_ARN")
    if kms:
        configure_encryption(spark, kms_key_arn=kms)
    return spark


def configure_encryption(
    spark: SparkSession,
    kms_key_arn: str | None = None,
    algorithm: str | None = None,
) -> dict[str, str]:
    """Server-side-encryption knob for s3a-landed output (SURVEY.md §2.6).

    The reference encrypts uploads with SSE-KMS when USE_KMS is set
    (lambda_function.py:96-105 passes ServerSideEncryption='aws:kms' +
    SSEKMSKeyId to put_object; check_parquet.py:37-51 registers the same
    key on the read path via fs.s3a.server-side-encryption* Hadoop conf).
    Spark's equivalent is exactly those Hadoop confs on the session —
    set once, applied by the s3a committer to every write and read.

    With ``kms_key_arn`` the algorithm defaults to SSE-KMS; pass
    ``algorithm='AES256'`` (and no key) for SSE-S3. Returns the conf dict
    it applied (empty when encryption is off) so callers/tests can assert
    what landed.
    """
    conf: dict[str, str] = {}
    if kms_key_arn:
        conf["fs.s3a.server-side-encryption-algorithm"] = algorithm or "SSE-KMS"
        conf["fs.s3a.server-side-encryption.key"] = kms_key_arn
    elif algorithm:
        conf["fs.s3a.server-side-encryption-algorithm"] = algorithm
    hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hadoop_conf.set(k, v)
    return conf


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver table (mirrors check_parquet.py:94).

    Handles nanosecond-precision parquet timestamps (events.ts is
    TIMESTAMP(NANOS)), which Spark 4 only reads via the nanosAsLong legacy
    conf: the long nanos column is rebuilt as TIMESTAMP_NTZ by pure integer
    arithmetic from the epoch (integer division — double division would
    lose precision on ~1e18 ns values; truncation to micros matches
    DuckDB's NS → US cast). NTZ rather than TIMESTAMP so windowing /
    formatting render the stored wall-clock value regardless of the
    session timezone — exactly how DuckDB reads the same file, keeping the
    oracle comparison timezone-independent. Streaming operators that need
    an instant (watermarks reject NTZ) cast at their own boundary.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Runtime-set (not only in get_spark's builder) because the driver runs
    # queries through a vanilla SparkSession: without this conf the first
    # events.parquet read fails on its TIMESTAMP(NANOS) column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # Scoped to the events table: its ts column is the only TIMESTAMP(NANOS)
    # in the fixtures (FIXTURES.md §3). A bigint 'ts' in any other table is
    # left untouched.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every driver table as a temp view; returns name → DataFrame.

    Catalog-registration altitude of the reference's initialize()
    (schema_registry_connect.py:54-123): resolve schemas once up front,
    query many times.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
