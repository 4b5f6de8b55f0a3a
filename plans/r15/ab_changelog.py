"""Changelog-checkpointing A/B on the state-store streams (w07/w14/w05)
at sf0.1 — interleaved, per-run steal. The conf is read at stream start,
so flipping spark.conf between runs A/Bs it in ONE session."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.plans import all_specs

CONF = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = ["w07_stream_stream_join", "w14_token_quota_stream",
             "w05_stateful_user_profiles"]
    spark = get_spark(app_name="changelog-ab")
    specs = dict(all_specs())
    from lambda_kafka_to_s3_parquet_spark.session import load_table
    load_table(spark, sf_dir, "lineitem").count()
    acc = {}
    order = ["false", "true"]
    for r in range(3):
        for mode in order:
            spark.conf.set(CONF, mode)
            for name in names:
                s0, t0 = steal(), time.perf_counter()
                df = specs[name].fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt, ds = time.perf_counter() - t0, steal() - s0
                print(f"RUN {r} {name} changelog={mode} wall={dt:.3f} "
                      f"steal={ds:.1f}", flush=True)
                acc.setdefault((name, mode), []).append(dt)
                spark.catalog.clearCache()
        order.reverse()
    for (name, mode), ts in sorted(acc.items()):
        print(f"{name} changelog={mode}: min={min(ts):.3f} "
              f"all={[round(x,2) for x in ts]}")
    # --- second sweep: state-partition count (the _state_partitions
    # default, 8 since r12) at 8 vs 4 vs 2 on the stateful streams
    spark.conf.set(CONF, "false")
    import contextlib

    import lambda_kafka_to_s3_parquet_spark.plans.streaming_queries as sq

    orig = sq._state_partitions
    acc2 = {}
    for r in range(3):
        for n in (8, 4, 2):
            @contextlib.contextmanager
            def patched(s, n=n):
                with orig(s, n):
                    yield
            sq._state_partitions = patched
            for name in names + ["w08_incremental_rollup"]:
                s0, t0 = steal(), time.perf_counter()
                df = specs[name].fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt, ds = time.perf_counter() - t0, steal() - s0
                print(f"SP {r} {name} n={n} wall={dt:.3f} steal={ds:.1f}",
                      flush=True)
                acc2.setdefault((name, n), []).append(dt)
                spark.catalog.clearCache()
    sq._state_partitions = orig
    for (name, n), ts in sorted(acc2.items()):
        print(f"{name} n={n}: min={min(ts):.3f} all={[round(x,2) for x in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
