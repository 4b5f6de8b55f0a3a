"""x41 A/B/C: localCheckpoint pin (current) vs no pin vs persist."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.plans.extensions import _t
from lambda_kafka_to_s3_parquet_spark.operators.similarity import (
    pq_encode,
    topk_ivfpq,
    topk_pq_adc,
    train_pq_codebooks,
)


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def x41_variant(spark, sf_dir, mode):
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    books = train_pq_codebooks(e)
    codes = pq_encode(e, books)
    if mode == "ckpt":
        codes = codes.localCheckpoint()
    elif mode == "persist":
        codes = codes.persist(StorageLevel.MEMORY_AND_DISK)
    flat = topk_pq_adc(codes, queries, books, corpus=e, k=10, shortlist=50)
    ivfpq = topk_ivfpq(
        e, queries, k=10, n_cells=16, nprobe=6, shortlist=50,
        codebooks=books, codes=codes,
    )
    return codes, (
        flat.select(F.lit("pq").alias("branch"), "*").unionByName(
            ivfpq.select(F.lit("ivfpq").alias("branch"), "*")
        ).orderBy("branch", "query_id", "rank")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="x41-ab")
    from lambda_kafka_to_s3_parquet_spark.session import load_table
    load_table(spark, sf_dir, "lineitem").count()
    modes = ["ckpt", "nopin", "persist"]
    acc = {}
    ref = None
    for r in range(3):
        for mode in modes:
            s0, t0 = steal(), time.perf_counter()
            codes, df = x41_variant(spark, sf_dir, mode)
            df.write.mode("overwrite").format("noop").save()
            dt, ds = time.perf_counter() - t0, steal() - s0
            print(f"RUN {r} {mode} wall={dt:.3f} steal={ds:.1f}", flush=True)
            acc.setdefault(mode, []).append(dt)
            if r == 0:
                rows = sorted(map(tuple, df.collect()))
                if ref is None:
                    ref = rows
                else:
                    print(f"  rows identical to ckpt: {rows == ref}",
                          flush=True)
            if mode == "persist":
                codes.unpersist()
            spark.catalog.clearCache()
        modes = modes[1:] + modes[:1]  # rotate order
    for m, ts in acc.items():
        print(f"{m}: min={min(ts):.3f} all={[round(x,2) for x in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
