"""Unit semantics of the union-window as-of join (operators/asof.py):
inclusive equal-time matches, left-outer nulls, tolerance aging."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark.operators.asof import asof_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),  # exact tie with right@10:00
            (1, _ts("2024-01-01 11:30:00"), "b"),  # matches right@11:00
            (2, _ts("2024-01-01 09:00:00"), "c"),  # no right row precedes
            (3, _ts("2024-01-01 12:00:00"), "d"),  # key absent on right
        ],
        "k int, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 11:00:00"), 110.0),
            (2, _ts("2024-01-01 09:30:00"), 200.0),
        ],
        "k int, rt timestamp, price double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r
        for r in asof_join(left, right, "k", "t", "rt").collect()
    }
    assert len(out) == 4  # left-outer: every left row survives
    assert out["a"]["asof_price"] == 100.0  # equal time matches (inclusive)
    assert out["b"]["asof_price"] == 110.0  # latest preceding, not first
    assert out["c"]["asof_price"] is None  # right row is later -> no match
    assert out["c"]["asof_rt"] is None
    assert out["d"]["asof_price"] is None  # key never on right


def test_asof_tolerance_ages_out(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r
        for r in asof_join(
            left, right, "k", "t", "rt",
            tolerance=F.expr("INTERVAL 20 MINUTES"),
        ).collect()
    }
    # b's match is 30 min old -> nulled; a's is 0 min -> kept
    assert out["a"]["asof_price"] == 100.0
    assert out["b"]["asof_price"] is None
    assert out["d"]["asof_price"] is None


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized equivalence with pandas merge_asof (backward, inclusive)
    — the canonical as-of semantics — across keys, ties, and no-match
    rows. Seeded trials instead of hypothesis: each case is a Spark job."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    for _ in range(3):
        nl, nr = 300, 200
        left = pd.DataFrame(
            {
                "k": rng.randint(0, 8, nl),
                "t": pd.to_datetime(rng.randint(0, 10_000, nl), unit="s"),
                "lid": np.arange(nl),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.randint(0, 8, nr),
                "rt": pd.to_datetime(rng.randint(0, 10_000, nr), unit="s"),
                "price": rng.rand(nr).round(6),
            }
        ).drop_duplicates(subset=["k", "rt"], keep="first")

        expected = pd.merge_asof(
            left.sort_values(["t", "lid"]),
            right.sort_values("rt"),
            left_on="t",
            right_on="rt",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.price) else float(r.price))
            for r in expected.itertuples()
        }

        got_df = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "k",
            "t",
            "rt",
            right_cols=["rt", "price"],
        )
        got = {int(r["lid"]): r["asof_price"] for r in got_df.collect()}
        assert got == want


def test_asof_single_exchange_plan(spark):
    """The operator must shuffle once on the key — union + one window,
    no join node, no range explosion."""
    left, right = _frames(spark)
    df = asof_join(left, right, "k", "t", "rt")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert "Join" not in final
    assert final.count("Exchange hashpartitioning") <= 1
