"""Local replica of the driver's DuckDB-oracle comparison.

For each registered query: run the Spark plan and the oracle SQL on the
same parquet tables, compare column sets, dtype kinds, row counts, and
canonicalized values order-insensitively — a strict local stand-in for the
driver's row-count + schema + value-hash check.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

from lambda_kafka_to_s3_parquet_spark.session import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, (np.floating, float)):
        v = float(v)
        if math.isnan(v):
            return "<nan>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, float) and math.isnan(v):
        return "<nan>"
    return str(v)


def _kind(dtype) -> str:
    k = dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "ts"
    if k == "b":
        return "bool"
    return "obj"


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    dp = con.execute(sql).df()

    if sorted(sp.columns) != sorted(dp.columns):
        return False, f"column mismatch: spark={sorted(sp.columns)} duckdb={sorted(dp.columns)}"
    for c in sorted(sp.columns):
        ks, kd = _kind(sp[c].dtype), _kind(dp[c].dtype)
        # pandas promotes nullable ints to float/object; only flag hard conflicts
        hard = {"int", "float"}
        if ks != kd and ks in hard and kd in hard and not (sp[c].isna().any() or dp[c].isna().any()):
            return False, f"dtype mismatch on {c}: spark={sp[c].dtype} duckdb={dp[c].dtype}"
    if len(sp) != len(dp):
        return False, f"row count mismatch: spark={len(sp)} duckdb={len(dp)}"
    cs, cd = canonical_rows(sp), canonical_rows(dp)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
