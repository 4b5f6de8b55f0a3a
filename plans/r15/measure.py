"""Round-15 measurement harness: warm A/B timings with per-run steal.

Usage: python plans/r15/measure.py <query> [<query> ...] [--runs N]
Times each named bench query (same clock protocol as bench.py: noop
sink, EAGER_FN/SINGLE_RUN clock before fn) in ONE session, interleaved
round-robin so host weather hits all variants alike, printing per-run
wall + steal delta. Measurement-only tooling — not part of the engine.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.plans import all_specs


def steal() -> float:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lk2sp-r15-measure")
    specs = dict(all_specs())
    from lambda_kafka_to_s3_parquet_spark.session import load_table
    load_table(spark, sf_dir, "lineitem").count()
    for r in range(runs):
        for name in args:
            fn = specs[name].fn
            s0, t0 = steal(), time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt, ds = time.perf_counter() - t0, steal() - s0
            print(f"RUN {r} {name} wall={dt:.3f}s steal={ds:.1f}cpu-s",
                  flush=True)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
