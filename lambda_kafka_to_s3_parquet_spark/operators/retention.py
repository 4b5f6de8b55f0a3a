"""Cohort retention analysis over event tables.

The second classic event-analytics question (beside the funnel): group
users by the period they FIRST appeared (their cohort), then count how
many of each cohort were active again N periods later — the retention
matrix every growth dashboard draws.

Spark-first shape, ONE input scan and one user-key shuffle: the per-user
distinct period set aggregates as a ``collect_set`` (bounded by the
calendar — a year of weekly periods is 52 longs per user, never the
user's event count; map-side partial combine applies), the cohort is its
``array_min``, and the matrix falls out of one explode + one small
(cohort, offset) aggregate. The naive join-back form re-scans the input
for the cohort side (plan-audited: two FileScans) — at 100 TB the scan
is the cost, so the set-aggregate form wins. Periods are epoch-aligned
integer buckets (``timestampdiff`` microseconds — the NTZ-safe
construction shared with ``timeseries.time_bucket``), so the same event
lands in the same period in any session timezone and any engine.
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
    per_user = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("user"), p.alias("p"))
        .groupBy("user")
        .agg(F.collect_set("p").alias("ps"))
    )
    return (
        per_user.select(
            F.array_min("ps").alias("cohort_period"),
            F.explode("ps").alias("p"),
        )
        .groupBy(
            "cohort_period",
            (F.col("p") - F.col("cohort_period")).alias("offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
