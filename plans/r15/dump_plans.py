"""Dump .explain('formatted') for named bench queries to plans/r15/.

Usage: python plans/r15/dump_plans.py <tag> <query> [<query> ...]
Writes plans/r15/<query>_<tag>.txt. Protocol queries (x44/x54/w*) run
their fn eagerly to build the returned frame — expect real work.
"""
from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.plans import all_specs


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lk2sp-r15-plans")
    specs = dict(all_specs())
    out_dir = os.path.join(ROOT, "plans", "r15")
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print("dumped", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
