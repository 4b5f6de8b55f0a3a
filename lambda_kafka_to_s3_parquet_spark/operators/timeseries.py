"""Time-series resampling and gap filling (hypertable-style rollup).

The reference's event tables are time-keyed CDC/event streams
(SURVEY §2.1: ``ts`` on every subject); downstream consumers of such
tables want them on a REGULAR grid — "one row per series per bucket,
gaps filled" — the TimescaleDB ``time_bucket_gapfill`` / ``locf`` /
``interpolate`` shape, re-expressed as DataFrame ops:

* **bucket**: epoch-aligned integer arithmetic (``floor(epoch/every) ×
  every``) on the NTZ-safe microsecond epoch (``timestampdiff`` from
  the NTZ origin — ``unix_micros`` rejects TIMESTAMP_NTZ, the
  ``ranges.py`` lesson), so the same row lands in the same bucket in
  any session timezone and any engine;
* **grid**: per series, ``sequence(min_bucket, max_bucket, every)`` +
  ``explode`` — generated JVM-side, sized by the series' own span,
  never a driver loop or a cross join;
* **fill**: ``locf`` = last observation carried forward
  (``last(value, ignorenulls=True)`` over the unbounded-preceding
  window); ``linear`` = interpolation between the bracketing
  observations, NULL at the edges (TimescaleDB's ``interpolate``
  semantics — no extrapolation).

Scale shape: one groupBy shuffle to the (series, bucket) aggregate, one
series-sized grid explode, one left join, one window pass per series.
The window partitions by the SERIES key — correct and parallel for the
many-series corpora hypertables hold (the per-series grid is small);
a single global series is inherently one partition's work, and callers
get the standard ``WindowExec: No Partition Defined`` warning as the
signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def epoch_seconds(ts_col: Column | str) -> Column:
    """Integer seconds since the epoch for TIMESTAMP *or* TIMESTAMP_NTZ
    (wall-clock NTZ reads as UTC, so bucketing is session-tz-independent
    — the decode path's convention)."""
    col = ts_col if isinstance(ts_col, str) else ts_col._jc.toString()
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def time_bucket(ts_col: Column | str, every_s: int) -> Column:
    """Epoch-aligned bucket start (bigint seconds): the TimescaleDB
    ``time_bucket`` — pure integer arithmetic both engines reproduce."""
    return (F.floor(epoch_seconds(ts_col) / F.lit(every_s)) * every_s).cast(
        "long"
    )


def resample(
    df: DataFrame,
    ts_col: str,
    every_s: int,
    value_col: str,
    group_by: list[str] | None = None,
    agg: str = "avg",
    fill: str | None = None,
    max_grid_per_series: int = 10_000_000,
) -> DataFrame:
    """Resample ``df`` onto a regular ``every_s``-second grid per series.

    Returns one row per (series, bucket) for every bucket between the
    series' first and last observation: ``group_by`` columns, ``bucket``
    (bigint epoch seconds), ``n_rows`` (observations in the bucket, 0 on
    gap rows), ``value`` (the ``agg`` of ``value_col`` over the bucket's
    rows, gap-filled per ``fill``), ``filled`` (1 on rows whose value
    did NOT come from the bucket's own aggregate: gap rows, and
    observed buckets whose rows were all NULL that a fill mode papered
    over; 0 on rows whose value is the bucket's own — gap rows a fill
    mode could not reach keep NULL value with filled=1).

    ``agg``: any of avg/sum/min/max (one aggregate expression — the
    mergeable single-pass kind). ``fill``: ``None`` (gaps keep NULL),
    ``"locf"`` (last observation carried forward), ``"linear"``
    (interpolate between bracketing observations; edge gaps stay NULL —
    no extrapolation, the TimescaleDB rule).
    """
    if fill not in (None, "locf", "linear"):
        raise ValueError(f"fill must be None, 'locf' or 'linear', got {fill!r}")
    agg_fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}
    if agg not in agg_fns:
        raise ValueError(f"agg must be one of {sorted(agg_fns)}, got {agg!r}")
    gcols = list(group_by or [])
    b = time_bucket(ts_col, every_s).alias("bucket")
    agged = (
        df.select(*gcols, b, F.col(value_col).alias("_v"))
        .groupBy(*gcols, "bucket")
        .agg(F.count("*").alias("n_rows"), agg_fns[agg]("_v").alias("_val"))
        # materialize ONCE: both the grid span and the grid join consume
        # this subtree — lazy, each would re-run the full input scan +
        # aggregate (plan-audited: two FileScans). The checkpoint is
        # grid-sized (series × buckets), tiny next to the input.
        .localCheckpoint()
    )
    # per-series grid: sequence over the series' own [min, max] span —
    # buckets are multiples of every_s, so the step lands exactly on them
    span = agged.groupBy(*gcols).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    # grid-size guard: sequence() materializes each series' grid as ONE
    # array in one row — a mis-parameterized call (1 s buckets over a
    # ten-year series) would build a multi-hundred-million-element array
    # and OOM the task. The check is one tiny agg over the checkpointed
    # span frame; raise with the offending size instead of dying deep in
    # an executor.
    worst = span.agg(
        F.max((F.col("_hi") - F.col("_lo")) / F.lit(int(every_s))).alias("g")
    ).first()["g"]
    if worst is not None and worst + 1 > max_grid_per_series:
        raise ValueError(
            f"resample grid would need {int(worst) + 1} buckets for one "
            f"series (span / every_s); above max_grid_per_series="
            f"{max_grid_per_series} — coarsen every_s or split the series"
        )
    grid = span.select(
        *gcols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(every_s)))
        ).alias("bucket"),
    )
    out = grid.join(agged, gcols + ["bucket"], "left").withColumn(
        "n_rows", F.coalesce("n_rows", F.lit(0))
    )
    observed = F.col("n_rows") > 0
    if fill is None:
        filled_val = F.col("_val")
    else:
        # each window expression lands as ONE named column so the single
        # Window node carries exactly the aggregates needed (reusing the
        # Column object in several expressions re-instantiates the
        # windowexpr — plan-audited at 8 where 4 suffice)
        w_prev = (
            Window.partitionBy(*gcols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            "_pv", F.last("_val", ignorenulls=True).over(w_prev)
        )
        if fill == "locf":
            filled_val = F.col("_pv")
        else:  # linear
            w_next = (
                Window.partitionBy(*gcols)
                .orderBy("bucket")
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            ob = F.when(F.col("_val").isNotNull(), F.col("bucket"))
            out = (
                out.withColumn(
                    "_pb", F.last(ob, ignorenulls=True).over(w_prev)
                )
                .withColumn(
                    "_nv", F.first("_val", ignorenulls=True).over(w_next)
                )
                .withColumn(
                    "_nb", F.first(ob, ignorenulls=True).over(w_next)
                )
            )
            filled_val = F.when(F.col("_val").isNotNull(), F.col("_val")).when(
                F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
                F.col("_pv")
                + (F.col("_nv") - F.col("_pv"))
                * (F.col("bucket") - F.col("_pb"))
                / (F.col("_nb") - F.col("_pb")),
            )
    # filled=1 exactly when the emitted value did NOT come from the
    # bucket's own aggregate: gap rows, AND observed buckets whose rows
    # were all NULL (n_rows > 0, aggregate NULL) that a fill mode then
    # papered over — without the second term those carried a previous
    # bucket's value while flagged 0. filled_val here is plain column
    # arithmetic over already-materialized window columns, so reusing
    # it does not re-instantiate any windowexpr.
    filled_flag = (~observed) | (
        F.col("_val").isNull() & filled_val.isNotNull()
    )
    return out.select(
        *gcols,
        "bucket",
        "n_rows",
        filled_val.alias("value"),
        filled_flag.cast("int").alias("filled"),
    )
