"""Bucketed range (interval) join — the second custom temporal operator
next to :mod:`operators.asof` (SURVEY.md §2.9 family).

Pairs a left row with every right row of the same key whose time falls in
``(left_time + min_delta, left_time + max_delta]`` — "clicks within 10
minutes after each purchase", "readings during each maintenance window".

Scale design — candidate generation by TIME BUCKETS, not a theta join:

* a bare ``l.key = r.key AND r.t BETWEEN …`` forces Spark into a
  broadcast-nested-loop / cartesian-per-key plan: O(|L|·|R|/keys)
  comparisons;
* instead both sides are bucketed at width = ``max_delta - min_delta``:
  the right side by ``floor(t/width)``, the left exploded to the (at most
  2) buckets its window can overlap. The join is then a plain EQUI-join
  on (key, bucket) — hash-partitioned, AQE-planned, skew-salvageable —
  followed by the exact interval filter on the ~2× candidate set.

All time arithmetic is integer microseconds (``unix_micros``), so the
filter boundary is exact — no float epoch rounding. Lower bound is
exclusive, upper inclusive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    min_delta_us: int = 0,
    max_delta_us: int = 600_000_000,
    suffix: str = "_r",
) -> DataFrame:
    """Inner interval join: right rows with
    ``left_time + min_delta_us < right_time <= left_time + max_delta_us``,
    same key. Right columns that collide with left names get ``suffix``.

    Returns left columns + (suffixed) right columns + ``gap_us``
    (``right_time - left_time`` in integer microseconds).
    """
    width = max_delta_us - min_delta_us
    if width <= 0:
        raise ValueError("max_delta_us must exceed min_delta_us")

    def micros(df: DataFrame, col: str) -> "F.Column":
        # TIMESTAMP_NTZ (wall-clock) lacks unix_micros; timestampdiff from
        # the epoch is the same integer, type-appropriate for either kind.
        if dict(df.dtypes)[col] == "timestamp_ntz":
            return F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
            )
        return F.unix_micros(F.col(col))

    lt_us = micros(left, left_time)

    renames = {
        c: f"{c}{suffix}" for c in right.columns if c in left.columns and c != key
    }
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    rt_col = renames.get(right_time, right_time)
    rt_us = micros(r, rt_col)

    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor((lt_us + F.lit(min_delta_us)) / width).cast("long"),
                F.floor((lt_us + F.lit(max_delta_us)) / width).cast("long"),
            )
        ),
    )
    rb = r.withColumn("_bucket", F.floor(rt_us / width).cast("long"))

    gap = rt_us - lt_us
    return (
        lb.join(rb, [key, "_bucket"])
        .filter((gap > min_delta_us) & (gap <= max_delta_us))
        .drop("_bucket")
        .withColumn("gap_us", gap)
    )
