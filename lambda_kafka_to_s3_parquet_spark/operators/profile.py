"""One-pass per-column data profiling (SURVEY.md §2.9 family).

Every landed table needs a cheap answer to "what is in this data?" —
null rates, cardinalities, ranges, numeric centers — before anything
downstream (quality gates, schema checks, partition sizing) can be
tuned. The reference's check_parquet.py answers it by eyeballing
``printSchema``/``show`` (check_parquet.py:96-98); this is the
queryable upgrade.

Scale design: the ENTIRE profile is ONE aggregate job — every statistic
for every column is an expression in a single ``agg`` over one scan, so
the cost is one map-side-combined pass regardless of column count; the
1-row result is then exploded to a per-column frame driver-side-free.
Distinct counts use ``approx_count_distinct`` (HLL) because C exact
distincts would mean C shuffles — the same exact-vs-sketch trade the
rollup documents, with the error measured by x29.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dtypes whose mean is meaningful — exact names plus the decimal(p,s)
#: family; a prefix match on "int" would also catch interval types, whose
#: avg() fails analysis
_NUMERIC_TYPES = frozenset(
    {"int", "bigint", "smallint", "tinyint", "double", "float"}
)


def profile(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Per-column statistics of ``df`` in one aggregate pass.

    Returns one row per column: ``(column, n_rows, n_nulls,
    approx_distinct, min_str, max_str, mean)`` — min/max computed in the
    column's own type THEN rendered to string (so numeric ranges are
    numeric, not lexicographic); ``mean`` is NULL for non-numeric
    columns.
    """
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in df.columns:
        is_num = dtypes[c] in _NUMERIC_TYPES or dtypes[c].startswith("decimal")
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            (F.round(F.avg(c), 6) if is_num else F.lit(None).cast("double")).alias(
                f"{c}__mean"
            ),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__rows").alias("n_rows"),
                (F.col("__rows") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("approx_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
                F.col(f"{c}__mean").alias("mean"),
            )
            for c in df.columns
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
