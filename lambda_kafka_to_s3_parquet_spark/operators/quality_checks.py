"""Declarative data-quality constraint checks (validation stage).

The reference eyeballs its landed parquet with a schema print and a
sample read-back (``check_parquet.py:22-32`` — the whole QA surface).
A production pipeline wants that as enforced, reportable constraints:
not-null, uniqueness, value ranges, referential integrity — the
Deequ/Great-Expectations stage, re-expressed as plain aggregates so
Catalyst fuses every check on a table into ONE pass over it.

Scale shape: each check compiles to a conditional-count aggregate
(``sum(case when violated)``) — map-side combined, one shuffle per
TABLE regardless of how many checks it carries. Uniqueness needs its
own groupBy on the checked key (a second keyed shuffle); referential
integrity is a left-anti join, broadcast when the parent side is a
dimension. The report is rows — pipeable to a sink, an alert, or a
circuit breaker gating the downstream write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report_row(name: str, violations: Column, checked: Column):
    # sum() over zero rows is NULL — coalesce so an EMPTY table reports a
    # clean (violations=0, passed=true) instead of NULL/NULL, which a
    # passed-gating circuit breaker would silently wave through
    v = F.coalesce(violations, F.lit(0))
    return F.struct(
        F.lit(name).alias("check"),
        v.cast("bigint").alias("violations"),
        checked.cast("bigint").alias("rows_checked"),
        (v == 0).alias("passed"),
    )


def run_checks(
    df: DataFrame,
    not_null: list[str] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list] | None = None,
) -> DataFrame:
    """Row-level checks on one table, fused into a single aggregate pass.

    ``not_null``: columns that must never be NULL. ``ranges``: inclusive
    ``col -> (lo, hi)`` bounds (NULLs are not range violations — list the
    column under ``not_null`` too if they should be). ``accepted``:
    ``col -> allowed values``. Returns one row per check:
    (check, violations, rows_checked, passed).
    """
    ranges = ranges or {}
    accepted = accepted or {}
    n = F.count("*")
    rows = []
    for c in not_null:
        rows.append(_report_row(f"not_null({c})", F.sum(F.col(c).isNull().cast("long")), n))
    for c, (lo, hi) in ranges.items():
        bad = ~F.col(c).between(lo, hi) & F.col(c).isNotNull()
        rows.append(_report_row(f"range({c},[{lo},{hi}])", F.sum(bad.cast("long")), n))
    for c, vals in accepted.items():
        bad = ~F.col(c).isin(list(vals)) & F.col(c).isNotNull()
        rows.append(_report_row(f"accepted({c})", F.sum(bad.cast("long")), n))
    if not rows:
        raise ValueError("run_checks called with no checks")
    return (
        df.agg(F.array(*rows).alias("_r"))
        .select(F.explode("_r").alias("r"))
        .select("r.check", "r.violations", "r.rows_checked", "r.passed")
    )


def check_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Uniqueness of a key tuple: one keyed shuffle, violations = rows
    beyond the first per duplicated key."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .agg(
            F.coalesce(F.sum(F.when(F.col("_n") > 1, F.col("_n") - 1)), F.lit(0)).alias(
                "violations"
            ),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("rows_checked"),
        )
    )
    return dup.select(
        F.lit(f"unique({','.join(keys)})").alias("check"),
        F.col("violations").cast("bigint").alias("violations"),
        F.col("rows_checked").cast("bigint").alias("rows_checked"),
        (F.col("violations") == 0).alias("passed"),
    )


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential integrity: every non-null ``child_key`` must exist in
    ``parent_key``. Left-anti join — broadcast the parent when it is a
    dimension; set ``broadcast_parent=False`` for fact-sized parents
    (falls back to a keyed shuffle join)."""
    c = child.filter(F.col(child_key).isNotNull())
    p = (
        parent.select(F.col(parent_key).alias(child_key))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_parent:
        p = F.broadcast(p)
    # ONE pass over the child: a left join marks orphans (_hit IS NULL),
    # and a single aggregate produces both counts — not an anti-join agg
    # plus a second full child scan for the denominator.
    joined = c.select(child_key).join(p, child_key, "left")
    return joined.agg(
        F.coalesce(F.sum(F.col("_hit").isNull().cast("long")), F.lit(0)).alias("_v"),
        F.count("*").alias("_n"),
    ).select(
        F.lit(f"ref({child_key}->{parent_key})").alias("check"),
        F.col("_v").cast("bigint").alias("violations"),
        F.col("_n").cast("bigint").alias("rows_checked"),
        (F.col("_v") == 0).alias("passed"),
    )
