"""MinHash build micro-bench (portable family) at sf0.1.

Variants:
  A  current: explode -> md5/conv/%p -> groupBy(64 min aggs)
  B1 explode+hbase only, single min agg       (isolate md5/conv cost)
  B2 64 aggs (same as A)                      (reference)
  C  numpy partial-min mapInArrow + final 64-min over tiny partials
Row-identity: A vs C signature vectors compared exactly.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.functions.text import (
    tokens,
    word_shingles,
)
from lambda_kafka_to_s3_parquet_spark.operators.dedup import (
    PORTABLE_MINHASH_P,
    minhash_vectors,
    portable_perm_constants,
)
from lambda_kafka_to_s3_parquet_spark.session import load_table

P = PORTABLE_MINHASH_P
K = 64
MULTS, ADDS = portable_perm_constants(K)


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def sh_frame(docs):
    sh = docs.select(
        F.col("doc_id").alias("_id"),
        F.explode(word_shingles(tokens("text"), 3)).alias("shingle"),
    )
    return sh.select(
        "_id",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
            % F.lit(P)
        ).alias("hbase"),
    )


def variant_A(docs):
    mins = sh_frame(docs).groupBy("_id").agg(
        *[
            F.min(
                (F.lit(MULTS[k]) * F.col("hbase") + F.lit(ADDS[k])) % F.lit(P)
            ).alias(f"h{k}")
            for k in range(K)
        ]
    )
    return mins.select(
        F.col("_id").alias("doc_id"),
        F.array(*[F.col(f"h{k}") for k in range(K)]).alias("sigs"),
    )


def variant_B1(docs):
    return sh_frame(docs).groupBy("_id").agg(F.min("hbase").alias("h"))


def make_partial_fn():
    mults = np.array(MULTS, dtype=np.int64)
    adds = np.array(ADDS, dtype=np.int64)

    def partial(batches):
        for b in batches:
            ids = b.column("_id").to_numpy(zero_copy_only=False)
            h = b.column("hbase").to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            ids_s, h_s = ids[order], h[order]
            uniq, starts = np.unique(ids_s, return_index=True)
            # (n, K) affine values; int64 exact: mult < 2^32, h < 2^31
            vals = (h_s[:, None] * mults[None, :] + adds[None, :]) % P
            mins = np.minimum.reduceat(vals, starts, axis=0)
            yield pa.record_batch(
                [
                    pa.array(uniq, type=pa.int64()),
                    pa.array(list(mins), type=pa.list_(pa.int64())),
                ],
                names=["_id", "pm"],
            )

    return partial


def variant_C(docs):
    sh = sh_frame(docs)
    partials = sh.mapInArrow(
        make_partial_fn(), "_id long, pm array<long>"
    )
    mins = partials.groupBy("_id").agg(
        *[
            F.min(F.element_at("pm", k + 1)).alias(f"h{k}")
            for k in range(K)
        ]
    )
    return mins.select(
        F.col("_id").alias("doc_id"),
        F.array(*[F.col(f"h{k}") for k in range(K)]).alias("sigs"),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="minhash-ab")
    load_table(spark, sf_dir, "lineitem").count()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = [
        ("A_current", variant_A),
        ("B1_hbase_only", variant_B1),
        ("C_numpy_partial", variant_C),
        ("lib_A", lambda d: minhash_vectors(
            d, "doc_id", "text", 16, 4, 3, "portable")),
    ]
    for r in range(3):
        for name, fn in variants:
            s0, t0 = steal(), time.perf_counter()
            noop(fn(docs))
            print(f"RUN {r} {name}: {time.perf_counter()-t0:.3f}s "
                  f"steal={steal()-s0:.1f}", flush=True)
    a = {r["doc_id"]: list(r["sigs"]) for r in variant_A(docs).collect()}
    c = {r["doc_id"]: list(r["sigs"]) for r in variant_C(docs).collect()}
    print("SIGS_IDENTICAL", a == c, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
