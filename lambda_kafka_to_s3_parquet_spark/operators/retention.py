"""Cohort retention analysis over event tables.

The second classic event-analytics question (beside the funnel): group
users by the period they FIRST appeared (their cohort), then count how
many of each cohort were active again N periods later — the retention
matrix every growth dashboard draws.

Spark-first shape, two key-shuffles total: one groupBy(user) for the
cohort assignment, one join back on the same user key (Catalyst reuses
the hash partitioning — no third exchange), one final (cohort, offset)
aggregate over the DISTINCT (user, period) activity pairs. Periods are
epoch-aligned integer buckets (``timestampdiff`` microseconds — the
NTZ-safe construction shared with ``timeseries.time_bucket``), so the
same event lands in the same period in any session timezone and any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 7 * 86400,
) -> DataFrame:
    """Retention matrix: one row per (cohort_period, offset) —
    ``cohort_period`` = the epoch-aligned period index (``floor(epoch /
    period_s)``) of the user's FIRST event, ``offset`` = periods since
    the cohort period (0 = the cohort's own period, so offset 0 counts
    the cohort's size), ``n_users`` = distinct cohort members active in
    that period. NULL users/timestamps are excluded (no identity — no
    cohort)."""
    if period_s <= 0:
        raise ValueError(f"period_s must be positive, got {period_s}")
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    p = F.floor(us / F.lit(int(period_s) * 1_000_000)).cast("long")
    act = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("user"), p.alias("p"))
        .distinct()
    )
    cohort = act.groupBy("user").agg(F.min("p").alias("cohort_p"))
    return (
        act.join(cohort, "user")
        .groupBy(
            F.col("cohort_p").alias("cohort_period"),
            (F.col("p") - F.col("cohort_p")).alias("offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
