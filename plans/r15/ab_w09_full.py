"""Interleaved w09 full-replay A/B: Arrow-partial minhash vs old JVM path."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lambda_kafka_to_s3_parquet_spark import get_spark
import lambda_kafka_to_s3_parquet_spark.operators.dedup as dd
from lambda_kafka_to_s3_parquet_spark.plans import all_specs

def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0

new_minhash = dd.minhash_vectors

def old_minhash(docs, id_col="doc_id", text_col="text", n_bands=16,
                rows_per_band=4, shingle_n=3, hash_family="xxhash64"):
    if hash_family != "portable":
        return new_minhash(docs, id_col, text_col, n_bands, rows_per_band,
                           shingle_n, hash_family)
    n_hashes = n_bands * rows_per_band
    mults, adds = dd.portable_perm_constants(n_hashes)
    p = F.lit(dd.PORTABLE_MINHASH_P)
    from lambda_kafka_to_s3_parquet_spark.functions.text import tokens, word_shingles
    sh = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(tokens(text_col), shingle_n)).alias("shingle"),
    ).select(
        "_id",
        (F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long") % p).alias("hbase"),
    )
    mins = sh.groupBy("_id").agg(
        *[F.min((F.lit(mults[k]) * F.col("hbase") + F.lit(adds[k])) % p).alias(f"h{k}")
          for k in range(n_hashes)]
    )
    return mins.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"h{k}") for k in range(n_hashes)]).alias("sigs"),
    )

spark = get_spark(app_name="w09-ab")
from lambda_kafka_to_s3_parquet_spark.session import load_table
load_table(spark, "/root/testdata/sf0.1", "lineitem").count()
fn = dict(all_specs())["w09_incremental_neardup"].fn
variants = [("new", new_minhash), ("old", old_minhash)]
acc = {}
for r in range(3):
    for tag, mh in variants:
        dd.minhash_vectors = mh
        s0, t0 = steal(), time.perf_counter()
        df = fn(spark, "/root/testdata/sf0.1")
        df.write.mode("overwrite").format("noop").save()
        dt, ds = time.perf_counter()-t0, steal()-s0
        print(f"RUN {r} {tag} wall={dt:.3f} steal={ds:.1f}", flush=True)
        acc.setdefault(tag, []).append(dt)
        spark.catalog.clearCache()
    variants.reverse()
dd.minhash_vectors = new_minhash
for tag, ts in acc.items():
    print(f"{tag}: min={min(ts):.3f} all={[round(x,2) for x in ts]}")
spark.stop()
