"""w09 phase profile at sf0.1: minhash build / banded dedup / store
append per batch, vs the full streaming replay."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.operators.dedup import (
    append_band_store,
    incremental_neardup_banded,
    minhash_vectors,
)
from lambda_kafka_to_s3_parquet_spark.session import load_table


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def t(label, f):
    s0, t0 = steal(), time.perf_counter()
    out = f()
    print(f"  {label}: {time.perf_counter()-t0:.3f}s steal={steal()-s0:.1f}",
          flush=True)
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="w09-profile")
    load_table(spark, sf_dir, "lineitem").count()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    twins = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzreplaymarker"))
    )
    print("n_docs", docs.count(), flush=True)
    for rep in range(2):
        base = tempfile.mkdtemp(prefix="w09prof_")
        store = f"{base}/store"
        out = f"{base}/out"
        print(f"REP {rep}", flush=True)
        for i, b in enumerate((docs, twins)):
            print(f" batch {i}", flush=True)
            # standalone minhash timing (same params as the stream)
            t("minhash_vectors(portable)+ckpt", lambda: minhash_vectors(
                b, "doc_id", "text", 16, 4, 3, "portable"
            ).localCheckpoint())
            surv = t("incremental_neardup_banded", lambda: (
                incremental_neardup_banded(
                    spark, b, store, 0.7, hash_family="portable"
                ).persist()
            ))
            t("land survivors", lambda: surv.drop("sigs").write.mode(
                "append").parquet(out))
            ws = surv.filter(F.col("sigs").isNotNull()).select(
                "doc_id", "sigs")
            t("append_band_store", lambda: append_band_store(
                spark, store, ws, id_col="doc_id", hash_family="portable"
            ))
            surv.unpersist()
        shutil.rmtree(base, ignore_errors=True)
    # full streaming replay for the machinery delta
    from lambda_kafka_to_s3_parquet_spark.plans.streaming_queries import (
        w09_incremental_neardup,
    )
    for rep in range(2):
        s0, t0 = steal(), time.perf_counter()
        df = w09_incremental_neardup(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        print(f"w09 full: {time.perf_counter()-t0:.3f}s "
              f"steal={steal()-s0:.1f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
