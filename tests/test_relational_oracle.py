"""Every registered oracle-checkable query must match DuckDB exactly."""

from __future__ import annotations

import pytest

from lambda_kafka_to_s3_parquet_spark.plans import all_specs

from .oracle_harness import compare, duck_connection

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(name, spark, sf_dir, duck):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # driver contract: entry() must produce rows
    assert df.columns[0] == "l_returnflag"


def test_queries_oracle_keys_align():
    import __spark_entry__ as mod

    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
