"""Distributed as-of (backward) join — a custom temporal operator
(SURVEY.md §2.9 family: operators Spark lacks natively, built as a
composition of DataFrame ops, no UDF).

For each left row, attach the most recent right row whose time is <= the
left row's time, per key — the point-in-time lookup every event pipeline
needs (attach the prevailing rate/config/profile version to each event).

Scale design — the union-window formulation, NOT a range join:

* a naive range join (``l.key = r.key AND r.t <= l.t`` + keep max) explodes
  to O(|L|·|R|/keys) intermediate rows before pruning;
* instead both sides are tagged and unioned, shuffled ONCE on the key, and
  a single running ``last(right_payload, ignorenulls)`` over
  ``(key ORDER BY t, side)`` ROWS UNBOUNDED PRECEDING..CURRENT resolves
  every left row's match in one sorted pass — O(|L|+|R|) rows through one
  exchange, the same shape Pandas' merge_asof uses per group but executed
  as a distributed window.

Right rows sort before left rows at equal times, so the match is
INCLUSIVE (a right row at exactly t matches a left row at t) — the same
semantics as DuckDB's ``ASOF JOIN`` (>=) and pandas ``merge_asof``.

The right side must be unique per (key, time): equal-time duplicates make
"the" most recent row ambiguous (dedup first, e.g. with
``operators.dedup.latest_by_key``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with time <= left time, per key.

    Returns every left row (left outer semantics) plus ``prefix``-named
    copies of ``right_cols`` (default: all non-key right columns, incl.
    ``right_time``) from the matched row, or nulls when no right row
    precedes it. ``tolerance``: optional max age (an interval Column, e.g.
    ``F.expr("INTERVAL 1 HOUR")``); older matches are nulled out.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c != key]
    if right_time not in right_cols:
        right_cols = [right_time, *right_cols]

    rpay = F.struct(*[F.col(c) for c in right_cols])
    rtype = right.select(rpay.alias("_rpay")).schema["_rpay"].dataType

    l2 = left.select(
        "*",
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
    )
    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        rpay.alias("_rpay"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rpay", ignorenulls=True).over(w)
    out = u.withColumn("_m", matched).filter(F.col("_side") == 1)

    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m").isNotNull()
                & (F.col("_t") <= F.col("_m")[right_time] + tolerance),
                F.col("_m"),
            ).cast(rtype),
        )

    keep = [c for c in left.columns]
    picked = [F.col("_m")[c].alias(f"{prefix}{c}") for c in right_cols]
    return out.select(*keep, *picked)
