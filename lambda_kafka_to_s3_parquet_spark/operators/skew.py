"""Skew mitigation + shuffle co-location operators (SURVEY.md §4).

Two techniques every 100 TB join strategy needs in the toolbox beyond what
AQE does automatically:

* **salting** — when one side of a shuffle join has pathological hot keys
  (a handful of keys holding most rows), hash partitioning sends each hot
  key to ONE task. ``salted_join`` splits every hot key into ``n_salts``
  synthetic sub-keys on the skewed side and replicates the matching rows
  of the other side across those sub-keys, so a hot key fans out over
  ``n_salts`` tasks. Results are provably identical to the plain join
  (oracle-checked in the registry). AQE's skew-join handles many cases at
  runtime; explicit salting is for when the skew is known and extreme
  (AQE can only split what lands in one shuffle file).
* **bucketed co-located joins** — pre-shuffling both tables into the same
  bucket layout at WRITE time (``bucketBy`` on the join key) lets every
  subsequent join on that key run with zero exchanges: tasks read
  co-numbered buckets from both sides. This is the batch-layer answer to
  "this join runs every hour on the same keys" — pay the shuffle once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salt_column(n_salts: int, ordinal_col: str | None = None) -> "F.Column":
    """Per-row salt in [0, n_salts), independent of the join key's VALUE so
    a hot key whose rows are byte-identical duplicates still fans out over
    all salt buckets (a full-row content hash collapses them into one —
    the round-2 skew bug).

    With ``ordinal_col`` (any unique row id column — the right choice
    whenever one exists) the salt is ``xxhash64(ordinal)``: fully
    deterministic, stable under task retries. Without one it falls back to
    the row's physical position (``monotonically_increasing_id``): the
    join OUTPUT is identical for any salt assignment, but a lost map task
    recomputed after a partial shuffle fetch could in principle re-salt
    rows differently (the SPARK-23207 nondeterministic-partitioning
    hazard), so prefer passing an ordinal at scale.
    """
    src = F.col(ordinal_col) if ordinal_col else F.monotonically_increasing_id()
    return F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    ordinal_col: str | None = None,
) -> DataFrame:
    """Inner/left join robust to hot keys on ``skewed``.

    skewed side: each row gets a salt in [0, n_salts) (:func:`salt_column`
    — pass ``ordinal_col`` for retry-deterministic salting); other side:
    exploded ``n_salts`` times so every (key, salt) bucket finds its
    match. Join output == plain join output, row-for-row.

    Only ``inner`` and ``left`` are salt-safe: with right/full-outer the
    explode would emit every unmatched ``other`` row once per salt —
    silently duplicated results — so anything else raises.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): the "
            "exploded side would duplicate unmatched rows under right/full joins"
        )
    lhs = skewed.withColumn("_salt", salt_column(n_salts, ordinal_col))
    rhs = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    out = lhs.join(rhs, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
) -> None:
    """Persist a table pre-shuffled into ``n_buckets`` on the join key.

    ``bucketBy`` + ``sortBy`` on the key: subsequent equi-joins between
    tables bucketed identically on the same key execute with NO exchange
    (and with sorted buckets, no sort either) — asserted in
    tests/test_bucketing.py.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def skew_report(
    df: DataFrame,
    key: str,
    top_n: int = 20,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Per-key skew diagnosis for a prospective shuffle key: the decision
    input for :func:`salted_join` / AQE skew thresholds.

    For the ``top_n`` heaviest keys: row count, share of the table, and
    ``suggested_salts`` = the fan-out needed so the key's rows spread
    over at most one average partition's worth each
    (``ceil(share × P)``, 1 = no salting needed). A key with
    ``suggested_salts > 1`` would make one reducer process more than
    1/P of the data — the straggler signature this engine's salted join
    and AQE skew-join handling exist for.

    One count-by-key pass with map-side combine + a TakeOrderedAndProject
    top-n — the table is scanned ONCE (the total re-derives from the
    per-key counts via a broadcast 1-row join, never a second scan) and
    the report never shuffles more than the distinct-key set, so it is
    safe to run on the full table it diagnoses. An empty table yields an
    empty report.
    """
    spark = df.sparkSession
    p = shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count("*").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("double").alias("_total"))
    share = F.col("n_rows") / F.col("_total")
    return (
        counts.join(F.broadcast(total))
        .orderBy(F.desc("n_rows"), F.asc("key_value"))
        .limit(top_n)
        .select(
            F.col("key_value").cast("string").alias("key_value"),
            "n_rows",
            F.round(share, 6).alias("share"),
            F.greatest(F.lit(1), F.ceil(share * p)).cast("bigint").alias(
                "suggested_salts"
            ),
        )
    )
